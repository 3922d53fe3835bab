"""Flax modules for fake-quant (STE) training — the layer zoo of the
reference framework, rebuilt functionally.

Reference counterparts (SURVEY.md §2.1, ``layers/quantized_layers.py`` /
``layers/binary_layers.py`` in the Keras lineage): ``QuantizedDense``,
``QuantizedConv2D``, ``BinaryDense``, ``BinaryConv2D``, ``TernaryDense``,
``TernaryConv2D``, plus the ``Clip`` weight constraint and the
``H='Glorot'`` weight-scale logic.  Unlike the Keras class hierarchy these
are thin flax modules around the pure STE ops in :mod:`qnx.ops.quant`; the
latent float kernel is the trainable param, quantization happens in ``call``
every forward (training only — inference uses the packed integer engine).

Each quantized layer records its resolved weight scale H in the ``quant``
variable collection so that (a) the post-update Clip constraint and the
per-kernel ``kernel_lr_multiplier`` (= 1/H for Glorot scaling,
arXiv:1511.00363) can be applied by the train loop, and (b) the converter
can re-quantize latent checkpoints with the exact same H.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from qnx.ops import quant as Q

Array = jax.Array
Dtype = Any


def _resolve_h(H, fan_in: int, fan_out: int) -> float:
    if isinstance(H, str):
        if H.lower() == "glorot":
            return Q.glorot_scale(fan_in, fan_out)
        raise ValueError(f"unknown H spec {H!r}")
    return float(H)


def _uniform_init(h: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-h, maxval=h)

    return init


class _QuantKernelMixin:
    """Shared latent-kernel creation + H bookkeeping."""

    def _latent_kernel(self, shape: Sequence[int], fan_in: int, fan_out: int):
        h = _resolve_h(self.H, fan_in, fan_out)
        kernel = self.param("kernel", _uniform_init(h), tuple(shape))
        # non-trainable metadata: resolved H and lr multiplier (1/H unless
        # overridden), consumed by qnx.train.loop and qnx.convert
        self.variable("quant", "H", lambda: jnp.float32(h))
        lr_mult = (1.0 / h) if self.kernel_lr_multiplier is None else float(
            self.kernel_lr_multiplier
        )
        self.variable("quant", "lr_mult", lambda: jnp.float32(lr_mult))
        return kernel, h


class BinaryDense(nn.Module, _QuantKernelMixin):
    """Dense layer with binarized {-H,+H} weights (BinaryConnect).

    Reference: ``BinaryDense`` in layers/binary_layers.py (reconstructed,
    SURVEY.md §2.1).  With ``stochastic=True`` the kernel is sampled
    Wb = +H w.p. hard_sigmoid(w/H) whenever a 'quant' rng is provided
    (training); without the rng it falls back to deterministic sign —
    which is exactly BinaryConnect's test-time rule."""

    features: int
    H: Any = "Glorot"
    use_bias: bool = False
    stochastic: bool = False
    kernel_lr_multiplier: float | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        kernel, h = self._latent_kernel((fan_in, self.features), fan_in, self.features)
        if self.stochastic and self.has_rng("quant"):
            wb = Q.binarize_stochastic(kernel, self.make_rng("quant"), h)
        else:
            wb = Q.binarize(kernel, h)
        y = jnp.matmul(x, wb, precision=Q.REFERENCE_PRECISION)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class TernaryDense(nn.Module, _QuantKernelMixin):
    """Dense layer with ternarized {-H,0,+H} weights.

    ``style='dingke'`` thresholds at ±0.5*H; ``style='twn'`` uses
    delta = 0.7*E|W| with learned-free scale alpha (arXiv:1605.04711)."""

    features: int
    H: Any = "Glorot"
    use_bias: bool = False
    style: str = "dingke"
    kernel_lr_multiplier: float | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        kernel, h = self._latent_kernel((fan_in, self.features), fan_in, self.features)
        wt = Q.ternarize(kernel, h) if self.style == "dingke" else Q.ternarize_twn(kernel)
        y = jnp.matmul(x, wt, precision=Q.REFERENCE_PRECISION)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class QuantizedDense(nn.Module, _QuantKernelMixin):
    """Dense layer with nb-bit pow2-grid quantized weights."""

    features: int
    nb: int = 4
    H: Any = "Glorot"
    use_bias: bool = False
    kernel_lr_multiplier: float | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        kernel, h = self._latent_kernel((fan_in, self.features), fan_in, self.features)
        wq = Q.quantize(kernel, self.nb, h)
        y = jnp.matmul(x, wq, precision=Q.REFERENCE_PRECISION)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def _conv(x: Array, kernel: Array, strides, padding) -> Array:
    """NHWC x HWIO conv (same conv the packed engine reproduces)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=Q.REFERENCE_PRECISION,
    )


class _QuantConvBase(nn.Module, _QuantKernelMixin):
    features: int = 0
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    H: Any = "Glorot"
    use_bias: bool = False
    kernel_lr_multiplier: float | None = None

    def _quantize_kernel(self, kernel: Array, h: float) -> Array:
        raise NotImplementedError

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        fan_in = kh * kw * cin
        fan_out = kh * kw * self.features
        kernel, h = self._latent_kernel(
            (kh, kw, cin, self.features), fan_in, fan_out
        )
        wq = self._quantize_kernel(kernel, h)
        y = _conv(x, wq, tuple(self.strides), self.padding)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class BinaryConv2D(_QuantConvBase):
    """Conv2D with binarized weights (reference BinaryConv2D); supports
    stochastic binarization like BinaryDense."""

    stochastic: bool = False

    def _quantize_kernel(self, kernel, h):
        if self.stochastic and self.has_rng("quant"):
            return Q.binarize_stochastic(kernel, self.make_rng("quant"), h)
        return Q.binarize(kernel, h)


class TernaryConv2D(_QuantConvBase):
    """Conv2D with ternarized weights (fork addition, SURVEY.md §2.1)."""

    style: str = "dingke"

    def _quantize_kernel(self, kernel, h):
        return Q.ternarize(kernel, h) if self.style == "dingke" else Q.ternarize_twn(kernel)


class QuantizedConv2D(_QuantConvBase):
    """Conv2D with nb-bit quantized weights (reference QuantizedConv2D)."""

    nb: int = 4

    def _quantize_kernel(self, kernel, h):
        return Q.quantize(kernel, self.nb, h)


class FloatDense(nn.Module):
    """Plain float dense (network_type='float' and first/last layers)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (x.shape[-1], self.features)
        )
        y = jnp.matmul(x, kernel, precision=Q.REFERENCE_PRECISION)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class FloatConv2D(nn.Module):
    """Plain float conv (float first layer of the CIFAR models)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (kh, kw, x.shape[-1], self.features),
        )
        y = _conv(x, kernel, tuple(self.strides), self.padding)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def make_activation(name: str, abits: int = 1) -> Callable[[Array], Array]:
    """Activation selector mirroring the reference's network_type/abits logic:
    'binary' -> binary_tanh, 'ternary'/'quant' -> quantized_relu(abits),
    'relu' -> float relu.

    Explicit op names (Config.activation override, VERDICT r3 #7) select the
    full reference ``quantized_ops.py`` surface: 'binary_tanh',
    'binary_sigmoid', 'quantized_relu', 'quantized_tanh'."""
    if name in ("binary", "binary_tanh"):
        return Q.binary_tanh
    if name == "binary_sigmoid":
        return Q.binary_sigmoid
    if name in ("quant", "ternary", "quantized_relu"):
        return lambda x: Q.quantized_relu(x, abits)
    if name == "quantized_tanh":
        return lambda x: Q.quantized_tanh(x, abits)
    if name == "relu":
        return jax.nn.relu
    if name == "none":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")
