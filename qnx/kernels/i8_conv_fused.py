"""Fused int8 MXU conv + integer-threshold epilogue (+ optional maxpool)
Pallas kernel.

Why this kernel exists: XLA-TPU cannot fuse consumers into a convolution
(convs are monolithic ops, not fusion producers), so the int8 engine's
``conv -> threshold -> int8 codes`` chain round-trips the int32 conv output
``s`` through HBM — measured +0.29..0.34 ms/layer at batch 1024 on the
32x32/16x16 CIFAR VGG layers (4x the code bytes).  This kernel keeps ``s``
in VMEM: it computes the 3x3 'SAME' conv as 9 tap-GEMMs on the MXU
(int8 x int8 -> int32), applies the per-channel integer threshold epilogue
(sign codes, or multi-threshold level codes for abits > 1), optionally
2x2-maxpools the codes in-register, and writes only int8 codes to HBM.

Semantics are bit-identical to qnx.nn.int8_engine.I8Conv: zero padding is
exact (int8 zeros contribute nothing), thresholds come from the same
bn_fold pass, and pooling uses the same monotone-epilogue argument
(pool codes after thresholding == BinaryNet's pool-then-BN-then-sign).
Ternary weights need no special casing — w8 already holds {-1,0,+1}.

Reference counterpart: none — the reference (SURVEY.md §1.2 L0) leaves all
fusion to TF's f32 kernels; this is the build's speed-of-light tier
(BASELINE.json: "every bit-packed matmul kernel at speed-of-light").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _conv_epilogue_kernel(x_ref, w_ref, sgn_ref, tau_ref, out_ref, xpad_ref,
                          *, levels: int, pool: bool):
    """One (batch-tile, out-channel-tile) program instance.

    x_ref:   (bt, H, W, C) int8 activations (codes in {-1,+1} or levels)
    w_ref:   (9*C, bn) int8 weights, tap-major [(0,0) C rows, (0,1) C rows..]
    sgn_ref: (1, bn) int32;  tau_ref: (levels, bn) int32 (ascending)
    out_ref: (bt, H', W', bn) int8 codes (H'=H/2 when pool)
    xpad_ref: VMEM scratch (bt, H+2, W+2, C) int8 — zero-padded copy.
    """
    bt, h, w, c = x_ref.shape
    bn = out_ref.shape[-1]

    # zero-pad into scratch (exact 'SAME' semantics: int8 zeros are true
    # zeros in this encoding, no border correction needed)
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[:, 1:h + 1, 1:w + 1, :] = x_ref[:]

    # 9 tap-GEMMs accumulated in int32 (VMEM-resident; never touches HBM)
    acc = jnp.zeros((bt * h * w, bn), jnp.int32)
    for tap in range(9):
        dy, dx = tap // 3, tap % 3
        xt = xpad_ref[:, dy:dy + h, dx:dx + w, :].reshape(bt * h * w, c)
        acc = acc + jax.lax.dot_general(
            xt, w_ref[tap * c:(tap + 1) * c, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # integer threshold epilogue: code = sum_v 1[sgn*s >= tau_v] for level
    # encodings, or {-1,+1} from the single threshold for sign encoding.
    # All arithmetic stays int32 (Mosaic cannot relayout an (8,128)-tiled i1
    # mask onto (32,128) int8 tiles); the single int32->int8 convert happens
    # at the output write.
    u = sgn_ref[0, :][None, :] * acc
    if levels == 1:
        code = jnp.where(u >= tau_ref[0, :][None, :], 1, -1)
    else:
        code = jnp.zeros(u.shape, jnp.int32)
        for v in range(levels):
            code = code + (u >= tau_ref[v, :][None, :]).astype(jnp.int32)

    code = code.reshape(bt, h, w, bn)
    if pool:
        # h-half of the 2x2 maxpool, in-kernel: splitting h (a major dim)
        # is a legal Mosaic reshape, whereas strided slices on the sublane
        # dim (w) lower to unsupported gathers — the w-half happens in XLA
        # on the already-halved int8 output (see i8_conv_fused).
        # Monotone epilogue: pooling codes == pooling s, with the window-min
        # (negate trick) on channels whose epilogue decreases (sgn < 0).
        flip = (sgn_ref[0, :] < 0)[None, None, None, None, :]
        signed = jnp.where(
            flip, -code.reshape(bt, h // 2, 2, w, bn),
            code.reshape(bt, h // 2, 2, w, bn))
        p = jnp.max(signed, axis=2)
        code = jnp.where(flip[:, :, 0], -p, p)
    out_ref[:] = code.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("levels", "pool", "block_b", "block_n", "interpret"))
def i8_conv_fused(
    x8: Array,
    w8: Array,
    sgn: Array,
    tau: Array,
    *,
    levels: int = 1,
    pool: bool = False,
    block_b: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Fused 3x3 'SAME' stride-1 int8 conv + threshold (+2x2 maxpool).

    Args:
      x8:  (B, H, W, C) int8 activation codes.
      w8:  (3, 3, C, N) int8 weights in {-1, 0, +1}.
      sgn: (N,) int32 threshold direction (+1/-1).
      tau: (N,) int32 single threshold (levels=1), or (levels, N) ascending
           thresholds for level codes.
      levels: number of thresholds (1 -> ±1 sign codes, else level codes).
      pool: fuse a 2x2/2 maxpool of the output codes.

    Returns:
      (B, H', W', N) int8 codes, H' = H/2 if pool else H.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, h, w, c = x8.shape
    kh, kw, c2, n = w8.shape
    assert (kh, kw, c2) == (3, 3, c), (w8.shape, x8.shape)
    wcol = w8.reshape(9 * c, n)
    tau2 = tau.reshape(levels, n).astype(jnp.int32)
    sgn2 = sgn.reshape(1, n).astype(jnp.int32)

    if block_n is None:
        block_n = min(n, 256)
    if block_b is None:
        # VMEM budget per batch row: pad scratch + ~2 live tap temporaries
        # (int8) + int32 accumulator + epilogue temps. Mosaic stack-allocates
        # intermediates, so budget conservatively (~8 MB of the 16 MB VMEM).
        bytes_per_row = ((h + 2) * (w + 2) * c + 3 * h * w * c
                         + 5 * h * w * block_n)
        block_b = max(1, min(b, (8 * 2 ** 20) // max(bytes_per_row, 1)))
        while b % block_b:
            block_b -= 1
    ho, wo = (h // 2, w) if pool else (h, w)
    grid = (pl.cdiv(b, block_b), pl.cdiv(n, block_n))
    out = pl.pallas_call(
        functools.partial(_conv_epilogue_kernel, levels=levels, pool=pool),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, n), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, ho, wo, block_n),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b, h + 2, w + 2, c), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * n,
            bytes_accessed=b * h * w * c + 9 * c * n + b * ho * wo * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, wcol, sgn2, tau2)
    if pool:
        # w-half of the 2x2 maxpool (XLA, int8, with the same sgn<0
        # window-min flip as in-kernel; tensor is already h-halved)
        flip = (sgn < 0)[None, None, None, :]
        signed = jnp.where(flip, -out, out)
        p = jnp.maximum(signed[:, :, 0::2, :], signed[:, :, 1::2, :])
        out = jnp.where(flip, -p, p)
    return out
