"""Two-plane ternary-weight popcount GEMM Pallas kernel.

Weights W ∈ {-1, 0, +1} are stored as two packed bit-planes (mask = nonzero,
sign = positive; :func:`qnx.ops.packing.pack_ternary`), binary ±1 activations
as packed sign bits.  Per output:

    dot[m, n] = nnz[n] - 2 * sum_kw popcount(mask[kw,n] & (xp[m,kw] ^ sign[kw,n]))

— one popcount per word pair (the mask AND makes zero-weights contribute
nothing, and ``nnz`` replaces the constant K of the binary kernel).  This is
the TPU-native equivalent of the reference's TernaryDense/TernaryConv2D
fake-quant layers (SURVEY.md §2.1), executing real 2-bit arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xnor_gemm import _interpret_default, _popcount, check_block_shape

Array = jax.Array


def _ternary_gemm_kernel(x_ref, mask_ref, sign_ref, nnz_ref, out_ref, *, kw: int):
    # statically unrolled over packed words — see _xnor_gemm_kernel for why
    tm, tn = out_ref.shape
    acc = jnp.zeros((tm, tn), jnp.int32)
    for i in range(kw):
        acc = acc + _popcount(
            mask_ref[i:i + 1, :] & (x_ref[:, i:i + 1] ^ sign_ref[i:i + 1, :])
        )
    out_ref[:] = nnz_ref[:] - 2 * acc


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def ternary_gemm(
    xp: Array,
    mask: Array,
    sign: Array,
    nnz: Array,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Packed ternary GEMM: (M,Kw) × two (Kw,N) planes → (M,N) int32.

    ``nnz`` is the per-output-column nonzero count (int32, shape (N,)).
    Blocks default via xnor_gemm.default_blocks (round-5 geometry scan:
    45.5 TMAC/s at 512×512 vs 34.0 at the old 256×256; tiny-N heads keep
    bm=256 for the scoped-vmem limit).
    """
    from .xnor_gemm import default_blocks

    if interpret is None:
        interpret = _interpret_default()
    m, kw = xp.shape
    kw2, n = mask.shape
    assert kw == kw2 and mask.shape == sign.shape and nnz.shape == (n,)
    dbm, dbn = default_blocks(m, n)
    bm = min(block_m or dbm, m)
    bn = min(block_n or dbn, n)
    check_block_shape(bm, m, bn, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    nnz2d = nnz.reshape(1, n)
    return pl.pallas_call(
        functools.partial(_ternary_gemm_kernel, kw=kw),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kw * 32,
            bytes_accessed=4 * (m * kw + 2 * kw * n + m * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, mask, sign, nnz2d)
