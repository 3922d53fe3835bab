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


def _bn(params: dict, stats: dict, name: str, eps: float):
    return dict(
        gamma=_np(params[name]["scale"]),
        beta=_np(params[name]["bias"]),
        mean=_np(stats[name]["mean"]),
        var=_np(stats[name]["var"]),
        eps=eps,
    )


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
            thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                               eps, alpha=alpha, bias=bias)
            hidden.append(I.TernaryDenseBits(
                mask=jnp.asarray(mask), sign=jnp.asarray(sign),
                nnz=jnp.asarray(nnz),
                sgn=jnp.asarray(thr.sgn), tau=jnp.asarray(thr.tau)))
        else:
            pattern = _binary_pattern(latent, h)
            thr = fold_bn_sign(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                               eps, alpha=h, bias=bias)
            hidden.append(I.PackedDenseBits(
                wp=jnp.asarray(P.pack_bits_np(pattern, axis=0)),
                sgn=jnp.asarray(thr.sgn), tau=jnp.asarray(thr.tau),
                k=latent.shape[0]))

    # head: integer GEMM + affine epilogue (BN folded, no sign)
    latent, h, bias = layer_weights("dense_out")
    bn = _bn(params, stats, "bn_out", eps)
    if ternary:
        pattern, alpha = _ternary_pattern(latent, h, cf.ternary_style)
        aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                             eps, alpha=alpha, bias=bias)
        mask, sign, nnz = P.pack_ternary_np(pattern, axis=0)
        head = I.TernaryDenseLogits(
            mask=jnp.asarray(mask), sign=jnp.asarray(sign),
            nnz=jnp.asarray(nnz),
            a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0))
    else:
        pattern = _binary_pattern(latent, h)
        aff = fold_bn_affine(bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                             eps, alpha=h, bias=bias)
        head = I.PackedDenseLogits(
            wp=jnp.asarray(P.pack_bits_np(pattern, axis=0)),
            a=jnp.asarray(aff.a), c=jnp.asarray(aff.c0), k=latent.shape[0])

    return I.PackedMLP(first=first, hidden=tuple(hidden), head=head)
