"""Bit-plane GEMM: {0,1}-packed activation planes × ternary/binary weights.

Multi-bit quantized_relu activations decompose as ``x = q * sum_j 2^j b_j``
with b_j in {0,1} (SURVEY.md §2.4 n-bit configs). For one plane b and
ternary weights held as (mask, msign = mask & sign) packed planes:

    t[m, n] = sum_k b[m,k] * w[k,n]
            = 2 * popcount(b & msign) - popcount(b & mask)

(zero-valued activations and zero pads contribute nothing, so 'SAME' conv
over planes needs NO padding correction, unlike the ±1 domain).  Binary
weights are the mask == all-valid-bits special case.

The layer-level integer output is  s = sum_j 2^j t_j , and BN + the next
quantized_relu fold into per-channel multi-level integer thresholds
(:func:`qnx.transforms.bn_fold.fold_bn_levels`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xnor_gemm import _interpret_default, _popcount, check_block_shape

Array = jax.Array


def _plane_gemm_kernel(b_ref, mask_ref, msign_ref, out_ref, *, kw: int):
    tm, tn = out_ref.shape
    pos = jnp.zeros((tm, tn), jnp.int32)
    tot = jnp.zeros((tm, tn), jnp.int32)
    for i in range(kw):
        bc = b_ref[:, i:i + 1]
        pos = pos + _popcount(bc & msign_ref[i:i + 1, :])
        tot = tot + _popcount(bc & mask_ref[i:i + 1, :])
    out_ref[:] = 2 * pos - tot


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def plane_gemm(
    bp: Array,
    mask: Array,
    msign: Array,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """One activation plane through ternary/binary weights.

    bp: (M, Kw) {0,1}-packed plane; mask/msign: (Kw, N) weight planes
    (msign = mask & sign).  Returns (M, N) int32 = b @ w exactly.
    Blocks default via xnor_gemm.default_blocks (round-5 geometry scan).
    """
    from .xnor_gemm import default_blocks

    if interpret is None:
        interpret = _interpret_default()
    m, kw = bp.shape
    kw2, n = mask.shape
    assert kw == kw2 and mask.shape == msign.shape
    dbm, dbn = default_blocks(m, n)
    bm = min(block_m or dbm, m)
    bn = min(block_n or dbn, n)
    check_block_shape(bm, m, bn, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    return pl.pallas_call(
        functools.partial(_plane_gemm_kernel, kw=kw),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kw * 32,
            bytes_accessed=4 * (m * kw + 2 * kw * n + m * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bp, mask, msign)


def plane_conv(planes: Array, mask: Array, msign: Array,
               kh: int = 3, kw: int = 3, **gemm_kw) -> Array:
    """'SAME' stride-1 conv of P activation planes: (P, B, H, W, Cw) x
    (kh*kw*Cw, N) weight planes -> integer s = sum_j 2^j t_j, (B, H, W, N).

    Zero pads contribute nothing in the {0,1} domain — no correction."""
    from .xnor_conv import extract_packed_patches

    p, b, h, w, _ = planes.shape
    s = None
    for j in range(p):
        patches = extract_packed_patches(planes[j], kh, kw)
        t = plane_gemm(
            patches.reshape(b * h * w, -1), mask, msign, **gemm_kw
        ).reshape(b, h, w, -1)
        s = t if s is None else s + (t << j)
    return s


def levels_to_planes(level: Array, nbits: int) -> Array:
    """(..., C) int32 level indices -> (P, ..., Cw) packed {0,1} planes."""
    from qnx.ops.packing import pack_bits

    planes = [
        pack_bits((level >> j) & 1, axis=-1) for j in range(nbits)
    ]
    return jnp.stack(planes, axis=0)
