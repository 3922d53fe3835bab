"""Conversion pass: trained fake-quant variables → packed integer model.

Quantization as a *conversion-time compiler pass* (SURVEY.md §7.5): the
latent float kernels stored by training (or by a reference Keras HDF5
checkpoint — see :mod:`qnx.convert.keras_h5`) are re-quantized with the
exact training-time math (:mod:`qnx.ops.quant`), BatchNorm is folded into
per-channel integer thresholds (:mod:`qnx.transforms.bn_fold`), and sign
patterns are bit-packed into int32 lanes (:mod:`qnx.ops.packing`).

Note the reference stores the LATENT float kernel, not the binarized one
(SURVEY.md §3.3) — getting H right here is what makes parity possible.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qnx.nn import inference as I
from qnx.ops import packing as P
from qnx.transforms.bn_fold import fold_bn_affine, fold_bn_sign
from qnx.utils.config import Config


def _np(x):
    return np.asarray(x)


def _binary_pattern(latent: np.ndarray, h: float) -> np.ndarray:
    """±1 sign pattern of binarize(latent, H), replicated in numpy float32
    with the exact op order of qnx.ops.quant.binary_tanh (IEEE f32 ops are
    deterministic, so this matches the jnp forward bit-for-bit without any
    device round-trip at convert time)."""
    latent = np.asarray(latent, np.float32)
    hs = np.clip((latent / np.float32(h) + np.float32(1.0)) / np.float32(2.0),
                 np.float32(0.0), np.float32(1.0)).astype(np.float32)
    return (2.0 * np.round(hs) - 1.0).astype(np.float32)


def _ternary_pattern(latent: np.ndarray, h: float, style: str):
    """{-1,0,+1} pattern and scale alpha, numpy mirror of
    qnx.ops.quant.ternarize / ternarize_twn forward values."""
    latent = np.asarray(latent, np.float32)
    if style == "dingke":
        wc = np.clip(latent, -h, h).astype(np.float32)
        r = (wc / np.float32(h)).astype(np.float32)
        t = np.where(r > 0.5, 1.0, np.where(r <= -0.5, -1.0, 0.0))
        return t.astype(np.float32), h
    delta = 0.7 * np.mean(np.abs(latent), dtype=np.float32)
    mask = np.abs(latent) > delta
    nnz = max(int(mask.sum()), 1)
    alpha = float(np.sum(np.where(mask, np.abs(latent), 0.0), dtype=np.float32) / nnz)
    t = np.where(mask, np.sign(latent), 0.0).astype(np.float32)
    return t, alpha


def _quant_grid(latent: np.ndarray, h: float, nb: int):
    """Integer grid z and scale alpha for the pow2-grid weight quantizer
    (qnx.ops.quant.quantize): Wq = alpha * z with

        z = clip(round(latent/H * m), -m, m-1),  alpha = H/m,  m = 2^(nb-1).

    np.round rounds half-to-even like jnp.round; op order mirrors quantize's
    f32 steps, and alpha*z == H*(z/m) bit-for-bit because scaling by a power
    of two is exact in f32.  z is int8-exact for nb <= 8."""
    latent = np.asarray(latent, np.float32)
    m = float(2 ** (nb - 1))
    r = (latent / np.float32(h)).astype(np.float32)
    z = np.clip(np.round((r * np.float32(m)).astype(np.float32)), -m, m - 1)
    return z.astype(np.float32), float(h) / m


def _bn(params: dict, stats: dict, name: str, eps: float):
    return dict(
        gamma=_np(params[name]["scale"]),
        beta=_np(params[name]["bias"]),
        mean=_np(stats[name]["mean"]),
        var=_np(stats[name]["var"]),
        eps=eps,
    )


def _engine_activation(cf: Config) -> str:
    """Canonical activation op for real-bit engine lowering.

    Every same-family activation of the reference's ``quantized_ops.py``
    surface lowers (VERDICT r4 Missing #2 — the previous rejection of
    binary_sigmoid / quantized_tanh was mathematically wrong):

    * binary family (abits=1): ``binary_tanh`` (±1 XNOR-popcount identity)
      and ``binary_sigmoid`` — with a in {0,1}, a = (t+1)/2 gives
      sum a*w = (s_pm1 + sum_w)/2 EXACTLY (the numerator is always even),
      so the packed engines fold alpha/2 + a per-channel (alpha/2)*sum_w
      bias offset, and the int8 engine just stores the {0,1} codes.
    * level family (abits>1): ``quantized_relu`` (unsigned level
      thresholds) and ``quantized_tanh`` — the value is affine in the level
      index, lowered via fold_bn_levels(mode='tanh') with signed int8 codes
      (int8 engine) or unsigned planes + (L-1)-scaled pad correction
      (bitplane engine).
    * relu family: ``relu`` (float activations, int8-weight engines).

    Cross-family overrides (e.g. quantized_relu in an abits=1 config) train
    fake-quant but are NOT IMPLEMENTED in the engines — the packed layout is
    derived from abits, so such a model must be evaluated with the
    fake-quant forward.  Documented in docs/PARITY.md 'Activation coverage'.
    """
    derived = cf.replace(activation=None).activation_name()
    canonical = {"relu": "relu", "binary": "binary_tanh",
                 "quant": "quantized_relu"}[derived]
    if cf.activation is None:
        return canonical
    family = {"relu": ("relu",),
              "binary": ("binary_tanh", "binary_sigmoid"),
              "quant": ("quantized_relu", "quantized_tanh")}[derived]
    if cf.activation not in family:
        raise ValueError(
            f"activation override {cf.activation!r} trains fake-quant but "
            f"its engine lowering is not implemented for this config's "
            f"{derived!r} activation family (implemented here: {family} or "
            "activation=None); evaluate it with the fake-quant forward "
            "instead — see docs/PARITY.md")
    return cf.activation


def _zo_fold_params(alpha: float, bias, pattern: np.ndarray, axes):
    """binary_sigmoid input-coding fold: the previous layer's activations
    are a = (t+1)/2 in {0,1}, so the popcount GEMM's ±1 output s relates to
    the true pre-activation by  sum a*w = (s + sum_w)/2  exactly (s + sum_w
    is even: both terms have the parity of the number of nonzero weights).
    Returns (alpha/2, bias + (alpha/2) * per-channel sum_w)."""
    sumw = np.asarray(pattern, np.float64).sum(axis=axes)
    b = np.zeros_like(sumw) if bias is None else np.asarray(bias, np.float64)
    return alpha / 2.0, b + (alpha / 2.0) * sumw


def _tanh_fold_bias(alpha_q: float, bias, pattern: np.ndarray, axes, nb: int):
    """quantized_tanh input-coding fold for UNSIGNED plane engines: planes
    carry u = v + (L-1), so  sum a*w = q*(sum u*w - (L-1)*sum_w); the
    constant -(L-1)*sum_w part folds into the bias (alpha_q = alpha*q)."""
    lm1 = 2 ** (nb - 1) - 1
    sumw = np.asarray(pattern, np.float64).sum(axis=axes)
    b = np.zeros_like(sumw) if bias is None else np.asarray(bias, np.float64)
    return b - alpha_q * lm1 * sumw


def validate_vgg_variables(variables: dict, cf: Config) -> None:
    """Up-front structural validation of a VGG variables pytree against the
    6-conv/2-dense/head template every VGG packing path assumes
    (VERDICT r3 #6): missing layers, broken channel chaining, or a flatten
    width inconsistent with the pool schedule fail HERE with an actionable
    message instead of as an opaque shape error deep inside bit-packing.

    Reference counterpart: the Keras model's fixed build_model topology
    (``[K] models/model_factory.py``, SURVEY.md §3.3) — any ingested HDF5
    that does not match it could never have been produced by the reference
    either."""
    params = variables.get("params", {})
    expected = ([f"conv_{i}" for i in range(6)]
                + [f"bn_conv_{i}" for i in range(6)]
                + ["dense_0", "dense_1", "bn_dense_0", "bn_dense_1",
                   "dense_out", "bn_out"])
    missing = [n for n in expected if n not in params]
    if missing:
        raise ValueError(
            f"VGG variables missing layers {missing}; present: "
            f"{sorted(params)} — expected the 6-conv/2-dense template "
            "(conv_0..5 + bn_conv_0..5, dense_0..1 + bn_dense_0..1, "
            "dense_out + bn_out)")

    def shape(name):
        return tuple(np.shape(params[name]["kernel"]))

    cin = cf.input_shape[-1]
    for i in range(6):
        s = shape(f"conv_{i}")
        if len(s) != 4:
            raise ValueError(f"conv_{i}: kernel must be (kh, kw, cin, cout), "
                             f"got {s}")
        if s[2] != cin:
            raise ValueError(
                f"conv_{i}: input channels {s[2]} do not chain from the "
                f"previous layer's {cin} output channels")
        cin = s[3]
        bns = np.shape(params[f"bn_conv_{i}"]["scale"])
        if bns != (cin,):
            raise ValueError(f"bn_conv_{i}: scale shape {bns} != ({cin},)")

    hin, win, _ = cf.input_shape
    fh, fw = hin // 8, win // 8  # three 2x2 pools (after conv_1/3/5)
    flat = fh * fw * cin
    s = shape("dense_0")
    if len(s) != 2:
        raise ValueError(f"dense_0: kernel must be 2-D (in, units), got {s}")
    if s[0] != flat:
        raise ValueError(
            f"dense_0: kernel {s} does not consume the flattened conv "
            f"output ({fh}x{fw}x{cin} = {flat} after three 2x2 pools of the "
            f"{hin}x{win} input)")
    k = s[1]
    for name in ("dense_1", "dense_out"):
        s = shape(name)
        if len(s) != 2:
            raise ValueError(f"{name}: kernel must be 2-D (in, units), "
                             f"got {s}")
        if s[0] != k:
            raise ValueError(
                f"{name}: input width {s[0]} does not chain from the "
                f"previous layer's {k} units")
        k = s[1]
    if k != cf.classes:
        raise ValueError(
            f"dense_out: {k} output units != cf.classes = {cf.classes}")


def pack_mlp(variables: dict, cf: Config) -> I.PackedMLP:
    """Lower a trained QuantMLP (full-bnn / full-tnn, abits=1) into a
    :class:`qnx.nn.inference.PackedMLP`."""
    if cf.architecture != "mlp":
        raise ValueError("pack_mlp expects an mlp config")
    if cf.abits != 1 or cf.network_type not in ("full-bnn", "full-tnn"):
        raise ValueError(
            "packed MLP path requires binary activations "
            f"(network_type full-bnn/full-tnn, abits=1); got {cf.network_type}"
        )
    sig = _engine_activation(cf) == "binary_sigmoid"
    ternary = cf.network_type == "full-tnn"
    params = variables["params"]
    quant = variables["quant"]
    stats = variables["batch_stats"]
    eps = cf.batch_norm_epsilon

    def layer_weights(name):
        latent = _np(params[name]["kernel"])
        h = float(quant[name]["H"])
        bias = _np(params[name]["bias"]) if "bias" in params[name] else None
        return latent, h, bias

    def in_fold(alpha, bias, pattern):
        """Fold params for this layer's INPUT coding (sigmoid: {0,1} bits)."""
        if sig:
            return _zo_fold_params(alpha, bias, pattern, axes=0)
        return alpha, bias

    # first layer: real-valued input -> float GEMM with quantized weights
    latent, h, bias = layer_weights("dense_0")
    if ternary:
        pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        w0 = (pattern * alpha).astype(np.float32)
    else:
        w0 = (_binary_pattern(latent, h) * h).astype(np.float32)
    bn0 = _bn(params, stats, "bn_0", eps)
    first = I.FloatDenseBits(
        w=jnp.asarray(w0),
        bias=None if bias is None else jnp.asarray(bias),
        bn_scale=jnp.asarray(bn0["gamma"]),
        bn_bias=jnp.asarray(bn0["beta"]),
        bn_mean=jnp.asarray(bn0["mean"]),
        bn_var=jnp.asarray(bn0["var"]),
        bn_eps=eps,
    )

    hidden = []
    for i in range(1, cf.num_hidden):
        latent, h, bias = layer_weights(f"dense_{i}")
        bn = _bn(params, stats, f"bn_{i}", eps)
        if ternary:
            pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
            mask, sign, nnz = P.pack_ternary_np(pattern, axis=0)
            a_eff, b_eff = in_fold(alpha, bias, pattern)
            thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                               eps, alpha=a_eff, bias=b_eff)
            hidden.append(I.TernaryDenseBits(
                mask=jnp.asarray(mask), sign=jnp.asarray(sign),
                nnz=jnp.asarray(nnz),
                sgn=jnp.asarray(thr.sgn), tau=jnp.asarray(thr.tau)))
        else:
            pattern = _binary_pattern(latent, h)
            a_eff, b_eff = in_fold(h, bias, pattern)
            thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                               eps, alpha=a_eff, bias=b_eff)
            hidden.append(I.PackedDenseBits(
                wp=jnp.asarray(P.pack_bits_np(pattern, axis=0)),
                sgn=jnp.asarray(thr.sgn), tau=jnp.asarray(thr.tau),
                k=latent.shape[0]))

    # head: integer GEMM + affine epilogue (BN folded, no sign)
    latent, h, bias = layer_weights("dense_out")
    bn = _bn(params, stats, "bn_out", eps)
    if ternary:
        pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        a_eff, b_eff = in_fold(alpha, bias, pattern)
        aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                             eps, alpha=a_eff, bias=b_eff)
        mask, sign, nnz = P.pack_ternary_np(pattern, axis=0)
        head = I.TernaryDenseLogits(
            mask=jnp.asarray(mask), sign=jnp.asarray(sign),
            nnz=jnp.asarray(nnz),
            a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0))
    else:
        pattern = _binary_pattern(latent, h)
        a_eff, b_eff = in_fold(h, bias, pattern)
        aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                             eps, alpha=a_eff, bias=b_eff)
        head = I.PackedDenseLogits(
            wp=jnp.asarray(P.pack_bits_np(pattern, axis=0)),
            a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0), k=latent.shape[0])

    return I.PackedMLP(first=first, hidden=tuple(hidden), head=head)


def pack_vgg_bitplane(variables: dict, cf: Config) -> I.PlaneVGG:
    """Lower a trained QuantVGG with n-bit activations (abits > 1) and
    ternary/binary weights into a :class:`qnx.nn.inference.PlaneVGG`
    (the CIFAR-10 'ternary weights + 2-bit activations' baseline config).

    Activations decompose into {0,1} bit-planes (x = q * sum 2^j b_j), the
    effective GEMM scale becomes alpha*q, and BN + quantized_relu fold into
    multi-level integer thresholds (fold_bn_levels)."""
    from qnx.kernels.xnor_conv import pack_conv_ternary_np
    from qnx.transforms.bn_fold import fold_bn_levels

    if cf.architecture != "vgg":
        raise ValueError("pack_vgg_bitplane expects a vgg config")
    if cf.abits < 2 or cf.network_type not in ("full-tnn", "full-bnn"):
        raise ValueError(
            "bitplane VGG path requires abits >= 2 with ternary/binary "
            f"weights; got {cf.network_type}/abits={cf.abits}"
        )
    tanh = _engine_activation(cf) == "quantized_tanh"
    mode = "tanh" if tanh else "relu"
    validate_vgg_variables(variables, cf)
    ternary = cf.network_type == "full-tnn"
    params = variables["params"]
    quant = variables.get("quant", {})
    stats = variables["batch_stats"]
    eps = cf.batch_norm_epsilon
    nb = cf.abits
    q = 2.0 ** (1 - nb)
    lm1 = 2 ** (nb - 1) - 1  # qtanh unsigned-index offset L-1
    hin, win, _ = cf.input_shape

    def in_bias(alpha, bias, pattern, axes=0):
        """Bias for this layer's INPUT coding: quantized_tanh planes carry
        unsigned u = v + (L-1), whose constant part folds in here."""
        if tanh:
            return _tanh_fold_bias(alpha * q, bias, pattern, axes, nb)
        return bias

    def get(name):
        latent = _np(params[name]["kernel"])
        bias = _np(params[name]["bias"]) if "bias" in params[name] else None
        h = float(quant[name]["H"]) if name in quant else None
        return latent, h, bias

    def weight_planes_conv(latent, h):
        """Returns (pattern, mask, msign, alpha) — pattern is also needed by
        the tanh branch for the (L-1)-scaled pad correction."""
        if ternary:
            pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        else:
            pattern, alpha = _binary_pattern(latent, h), h
        mask, sign, _ = pack_conv_ternary_np(pattern)
        return pattern, mask, mask & sign, alpha

    def weight_planes_dense(pattern):
        mask, sign, _ = P.pack_ternary_np(pattern, axis=0)
        return mask, mask & sign

    # first conv: float path -> planes
    latent, h, bias = get("conv_0")
    if h is None:
        w0 = latent.astype(np.float32)
    elif ternary:
        pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        w0 = (pattern * alpha).astype(np.float32)
    else:
        w0 = (_binary_pattern(latent, h) * h).astype(np.float32)
    bn = _bn(params, stats, "bn_conv_0", eps)
    first = I.FloatConvPlanes(
        w=jnp.asarray(w0),
        bias=None if bias is None else jnp.asarray(bias),
        bn_scale=jnp.asarray(bn["gamma"]), bn_bias=jnp.asarray(bn["beta"]),
        bn_mean=jnp.asarray(bn["mean"]), bn_var=jnp.asarray(bn["var"]),
        bn_eps=eps, nb=nb, pool=False, mode=mode,
    )

    convs = []
    sh, sw = hin, win
    for i in range(1, 6):
        if i in (2, 4):
            sh, sw = sh // 2, sw // 2
        latent, h, bias = get(f"conv_{i}")
        bn = _bn(params, stats, f"bn_conv_{i}", eps)
        pattern, mask, msign, alpha = weight_planes_conv(latent, h)
        if tanh:
            from qnx.kernels.xnor_conv import padding_correction

            corr = jnp.asarray(lm1 * padding_correction(pattern, sh, sw))
        else:
            corr = None
        lt = fold_bn_levels(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                            eps, nb, alpha=alpha * q,
                            bias=in_bias(alpha, bias, pattern, (0, 1, 2)),
                            mode=mode)
        convs.append(I.PlaneConvTernary(
            mask=jnp.asarray(mask), msign=jnp.asarray(msign),
            sgn=jnp.asarray(lt.sgn), tau=jnp.asarray(lt.tau), corr=corr,
            nb=nb, pool=i % 2 == 1, mode=mode))

    fh, fw = sh // 2, sw // 2
    c_last = _np(params["conv_5"]["kernel"]).shape[-1]
    denses = []
    for j in range(2):
        latent, h, bias = get(f"dense_{j}")
        bn = _bn(params, stats, f"bn_dense_{j}", eps)
        if ternary:
            pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        else:
            pattern, alpha = _binary_pattern(latent, h), h
        if j == 0:  # per-position packing to match the plane flatten
            n = pattern.shape[1]
            p3 = pattern.reshape(fh * fw, c_last, n)
            mask, sign, _ = P.pack_ternary_np(p3, axis=1)
            mask = mask.reshape(-1, n)
            sign = sign.reshape(-1, n)
            msign = mask & sign
        else:
            mask, msign = weight_planes_dense(pattern)
        lt = fold_bn_levels(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                            eps, nb, alpha=alpha * q,
                            bias=in_bias(alpha, bias, pattern), mode=mode)
        denses.append(I.PlaneDenseTernary(
            mask=jnp.asarray(mask), msign=jnp.asarray(msign),
            sgn=jnp.asarray(lt.sgn), tau=jnp.asarray(lt.tau), nb=nb,
            mode=mode))

    # head
    latent, h, bias = get("dense_out")
    bn = _bn(params, stats, "bn_out", eps)
    if "dense_out" not in quant:
        head = I.FloatDenseLogitsFromPlanes(
            w=jnp.asarray(latent.astype(np.float32)),
            bias=None if bias is None else jnp.asarray(bias),
            bn_scale=jnp.asarray(bn["gamma"]), bn_bias=jnp.asarray(bn["beta"]),
            bn_mean=jnp.asarray(bn["mean"]), bn_var=jnp.asarray(bn["var"]),
            bn_eps=eps, k=latent.shape[0], q=q, lvl0=lm1 if tanh else 0)
    else:
        if ternary:
            pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        else:
            pattern, alpha = _binary_pattern(latent, h), h
        aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                             eps, alpha=alpha * q,
                             bias=in_bias(alpha, bias, pattern))
        mask, msign = weight_planes_dense(pattern)
        head = I.PlaneDenseLogits(
            mask=jnp.asarray(mask), msign=jnp.asarray(msign),
            a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0))

    return I.PlaneVGG(first=first, convs=tuple(convs), denses=tuple(denses),
                      head=head)


def pack_int8(variables: dict, cf: Config):
    """Lower a trained model into the INT8-MXU engine
    (:mod:`qnx.nn.int8_engine`) — same integer semantics as the packed
    popcount engine.  Handles every quantized ``network_type``:

    * ``full-bnn`` / ``full-tnn`` / ``full-qnn`` — true integer path:
      weights as int8 ({-1,0,+1} or pow2-grid integers, wbits <= 8),
      activations as int8 ±1 (abits=1) or level indices (abits > 1),
      BN folded to integer thresholds.
    * ``bnn`` / ``tnn`` / ``qnn`` — relu network types (quantized weights,
      float relu activations, reference ``layers/quantized_layers.py``
      semantics): int8 weight storage + on-the-fly dequant, float compute
      (:class:`qnx.nn.int8_engine.I8WDense` et al.), bit-identical to the
      fake-quant forward.
    """
    from qnx.nn import int8_engine as E
    from qnx.transforms.bn_fold import fold_bn_levels

    if cf.network_type not in ("full-bnn", "full-tnn", "full-qnn",
                               "bnn", "tnn", "qnn"):
        raise ValueError(f"int8 engine requires a quantized network_type; "
                         f"got {cf.network_type}")
    if cf.network_type in ("full-qnn", "qnn") and cf.wbits > 8:
        raise ValueError(
            f"int8 engine holds pow2-grid weights as int8 integers, which "
            f"requires wbits <= 8; got wbits={cf.wbits}")
    act_op = _engine_activation(cf)
    if cf.architecture == "vgg":
        validate_vgg_variables(variables, cf)
    params = variables["params"]
    quant = variables.get("quant", {})
    stats = variables["batch_stats"]
    eps = cf.batch_norm_epsilon
    nb = cf.abits
    # int8 codes ARE activation values (up to the exact pow2 scale q_in), in
    # every encoding — including binary_sigmoid ({0,1} codes) and
    # quantized_tanh (SIGNED codes v with value q*v) — so no offset or pad
    # correction is ever needed here (VERDICT r4 Missing #2).
    act = {"binary_tanh": "pm1", "binary_sigmoid": "zo",
           "quantized_relu": "levels", "quantized_tanh": "tanh",
           "relu": "relu"}[act_op]
    q_in = 1.0 if act in ("pm1", "zo") else 2.0 ** (1 - nb)
    mode = "tanh" if act == "tanh" else "relu"

    def get(name):
        latent = _np(params[name]["kernel"])
        bias = _np(params[name]["bias"]) if "bias" in params[name] else None
        h = float(quant[name]["H"]) if name in quant else None
        return latent, h, bias

    def pattern_alpha(latent, h):
        if cf.network_type in ("full-tnn", "tnn"):
            return _ternary_pattern(latent, h, cf.ternary_style)
        if cf.network_type in ("full-qnn", "qnn"):
            return _quant_grid(latent, h, cf.wbits)
        return _binary_pattern(latent, h), h

    if cf.network_type in ("bnn", "tnn", "qnn"):
        return _pack_int8_relu(variables, cf, get, pattern_alpha, eps)

    def bn_of(name):
        return _bn(params, stats, name, eps)

    def fold_hidden(bn, alpha, bias):
        if act in ("pm1", "zo"):
            thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                               eps, alpha=alpha * q_in, bias=bias)
            return jnp.asarray(thr.sgn), jnp.asarray(thr.tau)
        lt = fold_bn_levels(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                            eps, nb, alpha=alpha * q_in, bias=bias, mode=mode)
        return jnp.asarray(lt.sgn), jnp.asarray(lt.tau)

    def first_quant_w(latent, h):
        """First layer weights as f32 values (quantized if not float)."""
        if h is None:
            return latent.astype(np.float32)
        pattern, alpha = pattern_alpha(latent, h)
        return (pattern * alpha).astype(np.float32)

    def bn_kwargs(bn):
        return dict(bn_scale=jnp.asarray(bn["gamma"]),
                    bn_bias=jnp.asarray(bn["beta"]),
                    bn_mean=jnp.asarray(bn["mean"]),
                    bn_var=jnp.asarray(bn["var"]), bn_eps=eps)

    def head_layer(name, bn_name):
        latent, h, bias = get(name)
        bn = bn_of(bn_name)
        if name not in quant:
            return E.I8FloatHead(
                w=jnp.asarray(latent.astype(np.float32)),
                bias=None if bias is None else jnp.asarray(bias),
                q=q_in, **bn_kwargs(bn))
        pattern, alpha = pattern_alpha(latent, h)
        aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                             eps, alpha=alpha * q_in, bias=bias)
        return E.I8DenseLogits(w8=jnp.asarray(pattern.astype(np.int8)),
                               a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0))

    if cf.architecture == "mlp":
        latent, h, bias = get("dense_0")
        first = E.I8FirstDense(
            w=jnp.asarray(first_quant_w(latent, h)),
            bias=None if bias is None else jnp.asarray(bias),
            act=act, nb=nb, **bn_kwargs(bn_of("bn_0")))
        hidden = []
        for i in range(1, cf.num_hidden):
            latent, h, bias = get(f"dense_{i}")
            pattern, alpha = pattern_alpha(latent, h)
            sgn, tau = fold_hidden(bn_of(f"bn_{i}"), alpha, bias)
            hidden.append(E.I8Dense(w8=jnp.asarray(pattern.astype(np.int8)),
                                    sgn=sgn, tau=tau, act=act))
        return E.I8MLP(first=first, hidden=tuple(hidden),
                       head=head_layer("dense_out", "bn_out"))

    if cf.architecture == "vgg":
        latent, h, bias = get("conv_0")
        first = E.I8FirstConv(
            w=jnp.asarray(first_quant_w(latent, h)),
            bias=None if bias is None else jnp.asarray(bias),
            act=act, nb=nb, pool=False, **bn_kwargs(bn_of("bn_conv_0")))
        convs = []
        for i in range(1, 6):
            latent, h, bias = get(f"conv_{i}")
            pattern, alpha = pattern_alpha(latent, h)
            sgn, tau = fold_hidden(bn_of(f"bn_conv_{i}"), alpha, bias)
            convs.append(E.I8Conv(w8=jnp.asarray(pattern.astype(np.int8)),
                                  sgn=sgn, tau=tau, act=act, pool=i % 2 == 1))
        denses = []
        for j in range(2):
            latent, h, bias = get(f"dense_{j}")
            pattern, alpha = pattern_alpha(latent, h)
            sgn, tau = fold_hidden(bn_of(f"bn_dense_{j}"), alpha, bias)
            denses.append(E.I8Dense(w8=jnp.asarray(pattern.astype(np.int8)),
                                    sgn=sgn, tau=tau, act=act))
        return E.I8VGG(first=first, convs=tuple(convs), denses=tuple(denses),
                       head=head_layer("dense_out", "bn_out"))

    raise ValueError(f"unknown architecture {cf.architecture!r}")


def _pack_int8_relu(variables: dict, cf: Config, get, pattern_alpha,
                    eps: float):
    """Relu-network-type lowering (``bnn`` / ``tnn`` / ``qnn``): quantized
    weights stored int8 + scalar dequant scale, float relu activations —
    the exact inference semantics of the reference's non-``full`` network
    types, where only weights are quantized (SURVEY.md §1.2 L4 table)."""
    from qnx.nn import int8_engine as E

    params = variables["params"]
    stats = variables["batch_stats"]

    def wq(name):
        latent, h, bias = get(name)
        if h is None:  # float boundary layer: store f32, alpha = 1
            w = jnp.asarray(latent.astype(np.float32))
            a = jnp.float32(1.0)
        else:
            pattern, alpha = pattern_alpha(latent, h)
            w = jnp.asarray(pattern.astype(np.int8))
            a = jnp.float32(alpha)
        return w, a, None if bias is None else jnp.asarray(bias)

    def bn_kwargs(bn_name):
        bn = _bn(params, stats, bn_name, eps)
        return dict(bn_scale=jnp.asarray(bn["gamma"]),
                    bn_bias=jnp.asarray(bn["beta"]),
                    bn_mean=jnp.asarray(bn["mean"]),
                    bn_var=jnp.asarray(bn["var"]), bn_eps=eps)

    if cf.architecture == "mlp":
        denses = []
        for i in range(cf.num_hidden):
            w, a, bias = wq(f"dense_{i}")
            denses.append(E.I8WDense(w=w, alpha=a, bias=bias,
                                     **bn_kwargs(f"bn_{i}")))
        w, a, bias = wq("dense_out")
        head = E.I8WHead(w=w, alpha=a, bias=bias, **bn_kwargs("bn_out"))
        return E.I8MLP(first=denses[0], hidden=tuple(denses[1:]), head=head)

    if cf.architecture == "vgg":
        convs = []
        for i in range(6):
            w, a, bias = wq(f"conv_{i}")
            convs.append(E.I8WConv(w=w, alpha=a, bias=bias, pool=i % 2 == 1,
                                   **bn_kwargs(f"bn_conv_{i}")))
        denses = []
        for j in range(2):
            w, a, bias = wq(f"dense_{j}")
            denses.append(E.I8WDense(w=w, alpha=a, bias=bias,
                                     **bn_kwargs(f"bn_dense_{j}")))
        w, a, bias = wq("dense_out")
        head = E.I8WHead(w=w, alpha=a, bias=bias, **bn_kwargs("bn_out"))
        return E.I8VGG(first=convs[0], convs=tuple(convs[1:]),
                       denses=tuple(denses), head=head)

    raise ValueError(f"unknown architecture {cf.architecture!r}")


def _pack_dense_per_position(pattern: np.ndarray, h: int, w: int, c: int):
    """Pack a (h*w*c, N) dense pattern whose input is the flatten of packed
    (h, w, Cw) conv bits: pack along C per spatial position so word layout
    matches the runtime flatten. Returns (wp (h*w*Cw, N), k_true)."""
    n = pattern.shape[1]
    p = pattern.reshape(h * w, c, n)
    wp = P.pack_bits_np(p, axis=1)  # (h*w, Cw, N)
    return wp.reshape(-1, n), h * w * c


def pack_vgg(variables: dict, cf: Config) -> I.PackedVGG:
    """Lower a trained QuantVGG (binary activations, abits=1) into a
    :class:`qnx.nn.inference.PackedVGG`.

    Multi-bit activations (abits>1, the CIFAR-10 TNN config) go through
    :func:`pack_vgg_bitplane` once available (Phase C)."""
    from qnx.kernels.xnor_conv import (pack_conv_ternary_np,
                                       pack_conv_weights_np,
                                       padding_correction)

    if cf.architecture != "vgg":
        raise ValueError("pack_vgg expects a vgg config")
    if cf.abits != 1 or cf.network_type not in ("full-bnn", "full-tnn"):
        raise ValueError(
            "packed VGG path requires binary activations (abits=1); "
            f"got {cf.network_type}/abits={cf.abits}"
        )
    sig = _engine_activation(cf) == "binary_sigmoid"
    validate_vgg_variables(variables, cf)
    ternary = cf.network_type == "full-tnn"
    params = variables["params"]
    quant = variables.get("quant", {})
    stats = variables["batch_stats"]
    eps = cf.batch_norm_epsilon
    hin, win, _ = cf.input_shape

    def conv_weights(name):
        latent = _np(params[name]["kernel"])  # (kh,kw,C,N)
        bias = _np(params[name]["bias"]) if "bias" in params[name] else None
        h = float(quant[name]["H"]) if name in quant else None
        return latent, h, bias

    def in_fold(alpha, bias, pattern, axes=0):
        """INPUT-coding fold.  binary_sigmoid additionally zeroes the conv
        border correction: the packed pad bit decodes to t = -1, which under
        a = (t+1)/2 is EXACTLY the fake-quant zero pad (a = 0) — the natural
        pad encoding is already right, unlike the ±1 domain."""
        if sig:
            return _zo_fold_params(alpha, bias, pattern, axes=axes)
        return alpha, bias

    # ---- first conv: float path -> bits
    latent, h, bias = conv_weights("conv_0")
    if h is None:  # float first layer (cf.first_layer_float)
        w0 = latent.astype(np.float32)
    elif ternary:
        pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        w0 = (pattern * alpha).astype(np.float32)
    else:
        w0 = (_binary_pattern(latent, h) * h).astype(np.float32)
    bn = _bn(params, stats, "bn_conv_0", eps)
    first = I.FloatConvBits(
        w=jnp.asarray(w0),
        bias=None if bias is None else jnp.asarray(bias),
        bn_scale=jnp.asarray(bn["gamma"]), bn_bias=jnp.asarray(bn["beta"]),
        bn_mean=jnp.asarray(bn["mean"]), bn_var=jnp.asarray(bn["var"]),
        bn_eps=eps, pool=False,
    )

    # ---- packed conv blocks 1..5 (pool after odd layers, spatial halves)
    convs = []
    sh, sw = hin, win  # spatial dims at the INPUT of each conv
    for i in range(1, 6):
        if i == 2 or i == 4:
            sh, sw = sh // 2, sw // 2
        latent, h, bias = conv_weights(f"conv_{i}")
        bn = _bn(params, stats, f"bn_conv_{i}", eps)
        pool = i % 2 == 1
        if ternary:
            pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
            mask, sign, nnz = pack_conv_ternary_np(pattern)
            corr = (np.zeros((sh, sw, pattern.shape[-1]), np.int32) if sig
                    else padding_correction(pattern, sh, sw))
            a_eff, b_eff = in_fold(alpha, bias, pattern, axes=(0, 1, 2))
            thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                               eps, alpha=a_eff, bias=b_eff)
            convs.append(I.TernaryConvBits(
                mask=jnp.asarray(mask), sign=jnp.asarray(sign),
                nnz=jnp.asarray(nnz), corr=jnp.asarray(corr),
                sgn=jnp.asarray(thr.sgn), tau=jnp.asarray(thr.tau), pool=pool))
        else:
            pattern = _binary_pattern(latent, h)
            wp, k = pack_conv_weights_np(pattern)
            corr = (np.zeros((sh, sw, pattern.shape[-1]), np.int32) if sig
                    else padding_correction(pattern, sh, sw))
            a_eff, b_eff = in_fold(h, bias, pattern, axes=(0, 1, 2))
            thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                               eps, alpha=a_eff, bias=b_eff)
            convs.append(I.PackedConvBits(
                wp=jnp.asarray(wp), corr=jnp.asarray(corr),
                sgn=jnp.asarray(thr.sgn), tau=jnp.asarray(thr.tau),
                k=k, pool=pool))

    # ---- dense stack: dense_0 consumes the per-position packed flatten
    fh, fw = sh // 2, sw // 2  # after conv_5's pool
    c_last = _np(params["conv_5"]["kernel"]).shape[-1]
    denses = []
    for j in range(2):
        name = f"dense_{j}"
        latent = _np(params[name]["kernel"])
        h = float(quant[name]["H"])
        bias = _np(params[name]["bias"]) if "bias" in params[name] else None
        bn = _bn(params, stats, f"bn_dense_{j}", eps)
        if ternary:
            pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        else:
            pattern, alpha = _binary_pattern(latent, h), h
        if j == 0:
            if ternary:
                # per-position two-plane packing
                n = pattern.shape[1]
                p3 = pattern.reshape(fh * fw, c_last, n)
                mask, sign, nnz = P.pack_ternary_np(p3, axis=1)
                mask = mask.reshape(-1, n)
                sign = sign.reshape(-1, n)
                nnz = nnz.sum(axis=0) if nnz.ndim == 2 else nnz
            else:
                wp, k = _pack_dense_per_position(pattern, fh, fw, c_last)
        else:
            if ternary:
                mask, sign, nnz = P.pack_ternary_np(pattern, axis=0)
            else:
                wp = P.pack_bits_np(pattern, axis=0)
                k = pattern.shape[0]
        a_eff, b_eff = in_fold(alpha, bias, pattern)
        thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                           eps, alpha=a_eff, bias=b_eff)
        if ternary:
            denses.append(I.TernaryDenseBits(
                mask=jnp.asarray(mask), sign=jnp.asarray(sign),
                nnz=jnp.asarray(nnz),
                sgn=jnp.asarray(thr.sgn), tau=jnp.asarray(thr.tau)))
        else:
            denses.append(I.PackedDenseBits(
                wp=jnp.asarray(wp), sgn=jnp.asarray(thr.sgn),
                tau=jnp.asarray(thr.tau), k=k))

    # ---- head
    name = "dense_out"
    latent = _np(params[name]["kernel"])
    bias = _np(params[name]["bias"]) if "bias" in params[name] else None
    bn = _bn(params, stats, "bn_out", eps)
    if name not in quant:  # float head over the binary activations
        head = I.FloatDenseLogitsFromBits(
            w=jnp.asarray(latent.astype(np.float32)),
            bias=None if bias is None else jnp.asarray(bias),
            bn_scale=jnp.asarray(bn["gamma"]), bn_bias=jnp.asarray(bn["beta"]),
            bn_mean=jnp.asarray(bn["mean"]), bn_var=jnp.asarray(bn["var"]),
            bn_eps=eps, k=latent.shape[0], coding="zo" if sig else "pm1")
    else:
        h = float(quant[name]["H"])
        if ternary:
            pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
            a_eff, b_eff = in_fold(alpha, bias, pattern)
            aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"],
                                 bn["var"], eps, alpha=a_eff, bias=b_eff)
            mask, sign, nnz = P.pack_ternary_np(pattern, axis=0)
            head = I.TernaryDenseLogits(
                mask=jnp.asarray(mask), sign=jnp.asarray(sign),
                nnz=jnp.asarray(nnz),
                a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0))
        else:
            pattern = _binary_pattern(latent, h)
            a_eff, b_eff = in_fold(h, bias, pattern)
            aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"],
                                 bn["var"], eps, alpha=a_eff, bias=b_eff)
            head = I.PackedDenseLogits(
                wp=jnp.asarray(P.pack_bits_np(pattern, axis=0)),
                a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0),
                k=latent.shape[0])

    return I.PackedVGG(first=first, convs=tuple(convs), denses=tuple(denses),
                       head=head)
