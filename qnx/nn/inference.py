"""Packed-integer inference engine: pure ``params -> images -> logits``.

The TPU-native replacement for the reference's fake-quant ``model.predict``
(SURVEY.md §3.2: the reference has NO inference engine — this is the
north-star component).  A packed model is a pytree of int32 packed weights +
integer thresholds; the forward pass is a chain of

    bits --XNOR/ternary popcount GEMM--> int32 s --(sgn*s >= tau)--> bits

with float math only at the first layer (real-valued images in) and the
logit head (affine epilogue out).  Everything is jit-compatible; no layer
objects at inference (SURVEY.md §7.5).

Layer pytrees are ``flax.struct`` nodes so a whole model jits as one
argument; static shape metadata (true reduction length k) lives in
non-pytree fields.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from qnx.kernels.ternary_gemm import ternary_gemm
from qnx.kernels.xnor_gemm import xnor_gemm_popcount
from qnx.ops.packing import pack_bits

Array = jax.Array


# ---------------------------------------------------------------------------
# layer pytrees
# ---------------------------------------------------------------------------

class FloatDenseBits(struct.PyTreeNode):
    """Float-input layer producing sign bits: y = x@w (+bias) -> BN -> y>0.

    ``w`` is already quantized (e.g. ±H) but stored dense f32 because the
    input is real-valued; BN is replicated with flax.linen semantics
    ((x-mean)*rsqrt(var+eps)*scale + bias) for bit-exactness vs the
    fake-quant golden model."""

    w: Array                     # (K, N) f32
    bias: Any                    # (N,) f32 or None
    bn_scale: Array
    bn_bias: Array
    bn_mean: Array
    bn_var: Array
    bn_eps: float = struct.field(pytree_node=False, default=1e-4)

    def __call__(self, x: Array) -> Array:
        y = x @ self.w
        if self.bias is not None:
            y = y + self.bias
        mul = jax.lax.rsqrt(self.bn_var + self.bn_eps) * self.bn_scale
        z = (y - self.bn_mean) * mul + self.bn_bias
        return pack_bits(z, axis=-1)


class PackedDenseBits(struct.PyTreeNode):
    """Binary hidden layer: popcount GEMM + integer threshold -> bits."""

    wp: Array                    # (Kw, N) int32 packed
    sgn: Array                   # (N,) int32 in {+1,-1}
    tau: Array                   # (N,) int32
    k: int = struct.field(pytree_node=False, default=0)

    def __call__(self, bits: Array) -> Array:
        s = xnor_gemm_popcount(bits, self.wp, self.k)
        out_bits = (self.sgn[None, :] * s) >= self.tau[None, :]
        return pack_bits(out_bits, axis=-1)


class TernaryDenseBits(struct.PyTreeNode):
    """Ternary hidden layer: two-plane popcount GEMM + threshold -> bits."""

    mask: Array                  # (Kw, N) int32
    sign: Array                  # (Kw, N) int32
    nnz: Array                   # (N,) int32
    sgn: Array
    tau: Array

    def __call__(self, bits: Array) -> Array:
        s = ternary_gemm(bits, self.mask, self.sign, self.nnz)
        out_bits = (self.sgn[None, :] * s) >= self.tau[None, :]
        return pack_bits(out_bits, axis=-1)


class PackedDenseLogits(struct.PyTreeNode):
    """Binary output head: popcount GEMM + float affine -> logits."""

    wp: Array
    a: Array                     # (N,) f32
    c: Array                     # (N,) f32
    k: int = struct.field(pytree_node=False, default=0)

    def __call__(self, bits: Array) -> Array:
        s = xnor_gemm_popcount(bits, self.wp, self.k)
        return self.a[None, :] * s.astype(jnp.float32) + self.c[None, :]


class TernaryDenseLogits(struct.PyTreeNode):
    """Ternary output head."""

    mask: Array
    sign: Array
    nnz: Array
    a: Array
    c: Array

    def __call__(self, bits: Array) -> Array:
        s = ternary_gemm(bits, self.mask, self.sign, self.nnz)
        return self.a[None, :] * s.astype(jnp.float32) + self.c[None, :]


class FloatDenseLogits(struct.PyTreeNode):
    """Float output head (last_layer_float configs): logits = BN(x@w + b)."""

    w: Array
    bias: Any
    bn_scale: Array
    bn_bias: Array
    bn_mean: Array
    bn_var: Array
    bn_eps: float = struct.field(pytree_node=False, default=1e-4)

    def __call__(self, bits_as_pm1: Array) -> Array:
        y = bits_as_pm1 @ self.w
        if self.bias is not None:
            y = y + self.bias
        mul = jax.lax.rsqrt(self.bn_var + self.bn_eps) * self.bn_scale
        return (y - self.bn_mean) * mul + self.bn_bias


class PackedMLP(struct.PyTreeNode):
    """End-to-end packed MLP: first (float-in) -> hidden bits -> head."""

    first: FloatDenseBits
    hidden: Tuple[Any, ...]      # PackedDenseBits / TernaryDenseBits
    head: Any                    # *DenseLogits

    def __call__(self, images: Array) -> Array:
        x = images.reshape(images.shape[0], -1)
        bits = self.first(x)
        for layer in self.hidden:
            bits = layer(bits)
        return self.head(bits)


@jax.jit
def mlp_forward(model: PackedMLP, images: Array) -> Array:
    """Jitted packed forward: images in [-1,1] -> logits."""
    return model(images)
