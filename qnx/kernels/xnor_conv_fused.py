"""Fused packed XNOR-popcount GEMM/conv + integer-threshold epilogue
Pallas kernels.

Round-1 measurement (experiments/gemm_shootout.py): the unfused packed VGG
spends ~75% of its time on glue — the int32 conv output ``s`` (32x the size
of the packed bits) and the threshold/pack epilogue round-trip HBM per layer
— while the popcount GEMM itself already runs at 28-31 TMAC/s (kernel-only
speed of light for the whole VGG ≈ 29 ms vs 115 ms measured).  These kernels
fuse the epilogue into the GEMM so the int32 accumulator never leaves VMEM:

    s    = K - 2 * sum_kw popcount(x ^ w)      (rank-1 updates, VPU)
    s   += corr[row % (H*W)]                    (zero-pad border correction)
    code = where(sgn * s >= tau, +1, -1)        (per-channel integer BN)

and write only int8 codes to HBM (32x less traffic than ``s``).  The conv
wrappers keep patch extraction in XLA *on packed words* (a 9x blow-up of the
32x-compressed bits — cheap data movement XLA pipelines well), then pool the
int8 codes and repack in XLA (packing along the lane axis needs cross-lane
shifts Mosaic cannot express; pooling codes after the monotone threshold
epilogue equals BinaryNet's pool-then-BN-then-sign ordering, window-min via
the negate trick on channels whose epilogue decreases, sgn < 0).

A fully in-kernel conv (tap gathering from a padded VMEM block) was tried
first and OOM'd scoped VMEM: each tap's shifted-window reshape materializes
a lane-padded relayout buffer, 9 of which exceed the 16 MB budget at useful
batch tiles.  The patch-GEMM formulation reuses the shootout's fastest
compiling inner loop unchanged.

Semantics are bit-identical to the unfused path
(:func:`qnx.kernels.xnor_conv.xnor_conv` + threshold + pool).  Reference
counterpart: none — the reference (SURVEY.md §1.2 L0) computes fake-quant
convs in float32 via TF's fused kernels; this is the build's speed-of-light
tier for the north-star XNOR+popcount path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xnor_conv import extract_packed_patches
from .xnor_gemm import _interpret_default, _popcount, check_block_shape

Array = jax.Array


# ---------------------------------------------------------------------------
# fused GEMM + epilogue kernel (shared by dense layers and conv-as-GEMM)
# ---------------------------------------------------------------------------

def _gemm_epi_kernel(*refs, kw: int, ternary: bool, has_corr: bool,
                     pool_w: int = 0):
    """One (row-tile, out-channel-tile) program instance.

    Positional refs (optional operands are only passed when present, to
    keep the scoped-VMEM footprint minimal — the dense 8192->1024 layer sits
    right at the 16 MB limit):

    x_ref:    (bm, Kw) int32 packed activation words (rows = batch or
              batch*spatial positions).
    w_ref:    (Kw, bn) int32 — binary: packed sign planes; ternary: mask.
    [sw_ref]: (Kw, bn) int32 ternary sign planes (ternary only).
    base_ref: (1, bn) int32 — popcount offset (binary: K; ternary: nnz).
    sgn/tau:  (1, bn) int32 threshold direction / value.
    [corr_ref]: (bm, bn) int32 row-periodic border correction (conv only).
    out_ref:  (bm, bn) int8 ±1 codes.
    """
    it = iter(refs)
    x_ref, w_ref = next(it), next(it)
    sw_ref = next(it) if ternary else None
    base_ref, sgn_ref, tau_ref = next(it), next(it), next(it)
    corr_ref = next(it) if has_corr else None
    out_ref = next(it)

    tm = refs[0].shape[0]
    tn = out_ref.shape[1]
    acc = jnp.zeros((tm, tn), jnp.int32)
    # statically unrolled rank-1 popcount updates — Mosaic lowers the
    # single-word column reads to lane broadcasts (fastest formulation
    # measured in experiments/gemm_shootout.py)
    for i in range(kw):
        col = x_ref[:, i:i + 1]
        if ternary:
            acc = acc + _popcount(
                w_ref[i:i + 1, :] & (col ^ sw_ref[i:i + 1, :]))
        else:
            acc = acc + _popcount(col ^ w_ref[i:i + 1, :])
    s = base_ref[0, :][None, :] - 2 * acc
    if has_corr:
        s = s + corr_ref[:]
    if pool_w:
        # h-half of the 2x2 maxpool on the integer conv output s itself
        # (BinaryNet pools s before BN+sign, so a plain max — no per-channel
        # direction flip — is exact here).  Rows are w-fastest, so adjacent
        # image rows are pool_w apart; splitting majors off the sublane dim
        # is a legal Mosaic reshape.  The w-half needs strided sublane
        # slicing (unsupported) and runs in XLA on the halved int8 codes.
        t = s.reshape(tm // (2 * pool_w), 2, pool_w, tn)
        s = jnp.max(t, axis=1).reshape(tm // 2, tn)
    u = sgn_ref[0, :][None, :] * s
    out_ref[:] = jnp.where(u >= tau_ref[0, :][None, :], 1, -1).astype(jnp.int8)


def _gemm_fused(xp, w_plane, s_plane, base, corr, sgn, tau, *, ternary,
                block_m, block_n, interpret, pool_w: int = 0):
    """corr: None, or (R, N) int32 applied row-periodically (R | block
    alignment handled by the caller: block_m must divide R or R divide
    block_m with block_m % R == 0).  pool_w > 0 fuses the h-half of a 2x2
    maxpool of the conv output (rows = w-fastest spatial positions of width
    pool_w; requires block_m % (2*pool_w) == 0): the output has m/2 rows."""
    if interpret is None:
        interpret = _interpret_default()
    m, kw = xp.shape
    n = w_plane.shape[1]
    assert w_plane.shape == (kw, n)
    bm, bn = min(block_m, m), min(block_n, n)
    check_block_shape(bm, m, bn, n)
    if pool_w:
        assert bm % (2 * pool_w) == 0 and m % bm == 0, (bm, pool_w, m)
        check_block_shape(bm // 2, m // 2, bn, n)  # pooled output block
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    base2 = jnp.broadcast_to(jnp.asarray(base, jnp.int32).reshape(-1), (n,))

    vec = lambda: pl.BlockSpec((1, bn), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)
    wspec = lambda: pl.BlockSpec((kw, bn), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM)
    operands = [xp, w_plane]
    specs = [pl.BlockSpec((bm, kw), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM), wspec()]
    if ternary:
        operands.append(s_plane)
        specs.append(wspec())
    operands += [base2.reshape(1, n),
                 jnp.asarray(sgn, jnp.int32).reshape(1, n),
                 jnp.asarray(tau, jnp.int32).reshape(1, n)]
    specs += [vec(), vec(), vec()]

    has_corr = corr is not None
    if has_corr:
        r = corr.shape[0]
        assert corr.shape == (r, n)
        if r <= bm:
            assert bm % r == 0, (bm, r)
            corr = jnp.tile(corr, (bm // r, 1))
            corr_blocks = 1
        else:
            assert r % bm == 0, (bm, r)
            corr_blocks = r // bm
        operands.append(corr)
        specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i % corr_blocks, j),
                                  memory_space=pltpu.VMEM))

    div = 2 if pool_w else 1
    return pl.pallas_call(
        functools.partial(_gemm_epi_kernel, kw=kw, ternary=ternary,
                          has_corr=has_corr, pool_w=pool_w),
        out_shape=jax.ShapeDtypeStruct((m // div, n), jnp.int8),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bm // div, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kw * 32,
            bytes_accessed=4 * (m * kw + 2 * kw * n) + m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=(
    "k", "block_m", "block_n", "interpret"))
def xnor_gemm_fused(
    xp: Array,
    wp: Array,
    k: int,
    sgn: Array,
    tau: Array,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Fused packed binary GEMM + threshold epilogue -> (M, N) int8 codes.
    Blocks default via xnor_gemm.default_blocks (round-5 geometry scan)."""
    from .xnor_gemm import default_blocks

    dbm, dbn = default_blocks(xp.shape[0], wp.shape[1])
    return _gemm_fused(xp, wp, wp, jnp.full((1,), k, jnp.int32), None, sgn,
                       tau, ternary=False, block_m=block_m or dbm,
                       block_n=block_n or dbn, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def ternary_gemm_fused(
    xp: Array,
    mask: Array,
    sign: Array,
    nnz: Array,
    sgn: Array,
    tau: Array,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Fused packed ternary GEMM + threshold epilogue -> (M, N) int8 codes.
    Blocks default via xnor_gemm.default_blocks (round-5 geometry scan)."""
    from .xnor_gemm import default_blocks

    dbm, dbn = default_blocks(xp.shape[0], mask.shape[1])
    return _gemm_fused(xp, mask, sign, nnz, None, sgn, tau, ternary=True,
                       block_m=block_m or dbm, block_n=block_n or dbn,
                       interpret=interpret)


# ---------------------------------------------------------------------------
# fused conv wrappers: XLA packed patches -> fused GEMM -> XLA pool on codes
# ---------------------------------------------------------------------------

def _conv_blocks(hw: int, m: int, n: int, pool_w: int = 0) -> tuple[int, int]:
    """Default (block_m, block_n) for conv-as-GEMM.

    Measured on v5e (experiments + /tmp sweep, batch-1024 VGG shapes): wide
    lane tiles amortize the per-word column broadcast, so bn = min(N, 512)
    is the dominant knob (conv 8x8 512->512: 15.7 -> 51.6 TMAC/s going
    bn 128 -> 512); bm = 512 for bn <= 256, 128 for bn = 512.  block_m must
    also keep the row-periodic corr blocks aligned (divide or be a multiple
    of the spatial period hw), divide the total row count, and — when the
    h-half maxpool is fused — be a multiple of 2*pool_w (image-row pairs)."""
    bn = min(n, 512)
    target = 512 if bn <= 256 else 128
    step = 2 * pool_w if pool_w else 1

    def legal(bm):
        # corr alignment + Mosaic block-shape rule (input AND pooled output)
        return (m % bm == 0 and (bm % hw == 0 or hw % bm == 0)
                and (bm == m or bm % 8 == 0)
                and (not pool_w or bm == m or (bm // 2) % 8 == 0))

    bm = max(step, (target // step) * step)
    while bm > step:
        if legal(bm):
            return bm, bn
        bm -= step
    return (step if legal(step) else m), bn


def _conv_fused(xp, w_plane, s_plane, base, corr, sgn, tau, *, ternary,
                pool, block_m, block_n, interpret):
    b, h, w, cw = xp.shape
    n = w_plane.shape[1]
    assert w_plane.shape == (9 * cw, n), (xp.shape, w_plane.shape)
    assert corr.shape == (h, w, n), (corr.shape, (h, w, n))
    patches = extract_packed_patches(xp, 3, 3).reshape(b * h * w, 9 * cw)
    pool_w = w if pool else 0
    bm, bn = _conv_blocks(h * w, b * h * w, n, pool_w)
    code = _gemm_fused(
        patches, w_plane, s_plane, base, corr.reshape(h * w, n), sgn, tau,
        ternary=ternary, block_m=bm if block_m is None else block_m,
        block_n=bn if block_n is None else block_n,
        interpret=interpret, pool_w=pool_w,
    )
    if not pool:
        return code.reshape(b, h, w, n)
    # w-half of the 2x2 maxpool (XLA, int8 codes; strided sublane slices
    # are not lowerable in Mosaic).  The kernel pooled the integer conv
    # output s directly for the h-half, so only this half needs the
    # window-min (negate) flip on channels whose epilogue decreases.
    code = code.reshape(b, h // 2, w, n)
    flip = (jnp.asarray(sgn).reshape(-1) < 0)[None, None, None, :]
    signed = jnp.where(flip, -code, code)
    p = jnp.maximum(signed[:, :, 0::2, :], signed[:, :, 1::2, :])
    return jnp.where(flip, -p, p)


@functools.partial(jax.jit, static_argnames=(
    "k", "pool", "block_m", "block_n", "interpret"))
def xnor_conv_fused(
    xp: Array,
    wp: Array,
    k: int,
    corr: Array,
    sgn: Array,
    tau: Array,
    *,
    pool: bool = False,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Fused packed binary 3x3 'SAME' stride-1 conv + threshold (+pool).

    Args:
      xp:   (B, H, W, Cw) int32 channel-packed sign bits.
      wp:   (9*Cw, N) int32 packed weights, tap-major (pack_conv_weights_np).
      k:    true reduction length (9 * C_in).
      corr: (H, W, N) int32 zero-pad correction (padding_correction).
      sgn, tau: (N,) int32 threshold direction / integer threshold.
      pool: fuse the 2x2/2 maxpool of the output codes.

    Returns:
      (B, H', W', N) int8 ±1 codes; H' = H/2, W' = W/2 when pool.
    """
    return _conv_fused(xp, wp, wp, jnp.full((1,), k, jnp.int32), corr, sgn,
                       tau, ternary=False, pool=pool, block_m=block_m,
                       block_n=block_n, interpret=interpret)


@functools.partial(jax.jit, static_argnames=(
    "pool", "block_m", "block_n", "interpret"))
def ternary_conv_fused(
    xp: Array,
    mask: Array,
    sign: Array,
    nnz: Array,
    corr: Array,
    sgn: Array,
    tau: Array,
    *,
    pool: bool = False,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Fused packed ternary-weight conv + threshold (+pool): two-plane
    popcount ``s = nnz - 2*popcount(mask & (x ^ sign))`` + corr."""
    return _conv_fused(xp, mask, sign, nnz, corr, sgn, tau, ternary=True,
                       pool=pool, block_m=block_m, block_n=block_n,
                       interpret=interpret)
