"""XNOR+popcount GEMM Pallas kernels (binary ±1 matmul on packed int32).

The north-star hot op (BASELINE.json): ``QuantizedDense`` becomes a kernel
that consumes sign-bit-packed activations/weights and computes

    dot[m, n] = K - 2 * sum_kw popcount(xp[m, kw] ^ wp[kw, n])

Two strategies are provided and benchmarked against each other
(SURVEY.md §7.4 item 1):

* ``popcount`` — Pallas VPU kernel over packed words: one XOR + popcount +
  add per 32 MACs. 32x memory density; compute bound by VPU int32 ops.
* ``int8`` — encode ±1 as int8 and use the MXU (int8 matmul at ~394 TOPS on
  v5e, ~2x bf16). 8x less dense than packed but far higher peak; XLA-level.

The fused inference layers in :mod:`qnx.nn` build on these plus the
BN-threshold epilogue (:mod:`qnx.kernels.fused_block`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret_default() -> bool:
    """Run Pallas in interpreter mode off-TPU (CPU test mesh)."""
    return jax.default_backend() != "tpu"


def _popcount(words: Array) -> Array:
    return lax.population_count(words)


def default_blocks(m: int, n: int) -> tuple:
    """Default (block_m, block_n) for the packed GEMM kernels.

    512×512 measured fastest at large shapes (round-5 geometry scan:
    65 TMAC/s vs 29.8 at 256×256 on 1024×4096×4096 — the per-grid-step
    x-block reloads halve and the per-word broadcast amortizes over more
    lanes).  Tiny-N outputs (classifier heads, n < 128) keep block_m=256:
    Mosaic lane-pads n up to 128 and bm=512 there exceeded the 16 MB
    scoped-vmem limit (observed on-chip on the (4096,·)×(·,10) MNIST head:
    'Scoped allocation with size 23.18M')."""
    return (512 if n >= 128 else 256), 512


def check_block_shape(bm: int, m: int, bn: int, n: int) -> None:
    """Enforce Mosaic's block-shape rule on EVERY backend.

    TPU lowering requires the last two dims of a block be divisible by
    (8, 128) respectively, or equal to the full array dims.  The Pallas
    interpreter accepts anything, so without this check a block size that
    passes the CPU test mesh can fail Mosaic on the chip (found by the
    round-3 on-chip suite run).  Raising here keeps interpret mode faithful
    to hardware."""
    if not (bm == m or bm % 8 == 0):
        raise ValueError(
            f"block_m={bm} is not Mosaic-lowerable for m={m}: the sublane "
            f"block dim must be a multiple of 8 or the full array dim")
    if not (bn == n or bn % 128 == 0):
        raise ValueError(
            f"block_n={bn} is not Mosaic-lowerable for n={n}: the lane "
            f"block dim must be a multiple of 128 or the full array dim")


def _xnor_gemm_kernel(x_ref, w_ref, out_ref, *, k: int, kw: int):
    """One (TM, TN) output tile: rank-1 popcount updates over the packed
    reduction axis.

    The loop over packed words is STATICALLY unrolled: Mosaic cannot prove
    lane-alignment for dynamic single-lane slices (``x_ref[:, pl.ds(i, 1)]``
    fails with "index in dimension 1 is a multiple of 128"), but static
    column extraction lowers to lane broadcasts and was measured fastest of
    the formulations that compile (static-unroll > chunked 3-D broadcast >
    XLA fused broadcast-reduce)."""
    tm, tn = out_ref.shape
    acc = jnp.zeros((tm, tn), jnp.int32)
    for i in range(kw):
        acc = acc + _popcount(x_ref[:, i:i + 1] ^ w_ref[i:i + 1, :])
    out_ref[:] = jnp.int32(k) - 2 * acc


@functools.partial(jax.jit, static_argnames=("k", "block_m", "block_n", "interpret"))
def xnor_gemm_popcount(
    xp: Array,
    wp: Array,
    k: int,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Packed binary GEMM via Pallas VPU popcount.

    Block defaults come from :func:`default_blocks` (round 5): the on-chip
    geometry scan (experiments/xnor_sol_variants.py, 1024×4096×4096)
    measured 29.8 TMAC/s at the old 256×256 vs **65.0 TMAC/s at 512×512**
    — the VERDICT r4 "0.75-SoL gap" was block geometry (per-grid-step
    x-block reloads and per-word broadcast amortization), not the
    instruction mix (multi-accumulator variants changed nothing).
    1024×512 and ×1024 blocks regress; small shapes clamp via min().

    Args:
      xp: (M, Kw) int32 — activations packed along K (``pack_bits(x, -1)``).
      wp: (Kw, N) int32 — weights packed along K (``pack_bits(w, 0)``).
      k: true (unpadded) reduction length.
    Returns:
      (M, N) int32 exact ±1 dot products.
    """
    if interpret is None:
        interpret = _interpret_default()
    m, kw = xp.shape
    kw2, n = wp.shape
    assert kw == kw2, (xp.shape, wp.shape)
    dbm, dbn = default_blocks(m, n)
    bm = min(block_m or dbm, m)
    bn = min(block_n or dbn, n)
    check_block_shape(bm, m, bn, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    return pl.pallas_call(
        functools.partial(_xnor_gemm_kernel, k=k, kw=kw),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=4 * (m * kw + kw * n + m * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp)


@jax.jit
def xnor_gemm_int8(x_pm1: Array, w_pm1: Array) -> Array:
    """MXU strategy: ±1 values held as int8, int8×int8→int32 matmul.

    XLA lowers this straight onto the MXU; at large shapes it beats the VPU
    popcount kernel (peak int8 ≈ 2× bf16 ≈ 8× f32 on v5e). Inputs are the
    *unpacked* ±1 tensors (int8)."""
    return lax.dot_general(
        x_pm1,
        w_pm1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def xnor_gemm(xp, wp, k, strategy: str = "popcount", **kw):
    """Strategy dispatcher used by benchmarks; see module docstring.

    Takes *packed* int32 word inputs.  ``popcount`` runs the Pallas VPU
    kernel directly on the words; ``int8`` unpacks to ±1 int8 and runs the
    MXU matmul (:func:`xnor_gemm_int8`) — the unpack cost is part of what
    that strategy pays, so benchmarking through this entry point compares
    the two fairly from the same packed representation."""
    if strategy == "popcount":
        return xnor_gemm_popcount(xp, wp, k, **kw)
    if strategy == "int8":
        from qnx.ops.packing import unpack_bits

        x = unpack_bits(xp, k, axis=-1)
        w = unpack_bits(wp, k, axis=0)
        return xnor_gemm_int8(x, w)
    raise ValueError(f"unknown strategy {strategy!r} for packed inputs")
