"""Packed binary convolution: im2col over packed words + XNOR-popcount GEMM
+ zero-padding correction.

The reference's ``K.conv2d`` on fake-quant weights becomes (SURVEY.md §2.4
"XNOR conv"): patches of channel-packed sign bits are gathered by shifted
slicing (pure XLA data movement), reduced by the packed GEMM kernels, and
corrected for 'SAME' zero-padding.

Zero-padding correction (SURVEY.md §7.4 item 3): a zero pad is a third
symbol in the ±1 domain.  We pad the *packed* input with 0-bits, which
decode to -1, so

    s_packed[b,h,w,n] = s_zero_pad[b,h,w,n] - sum_{taps outside image} w[tap,n]

and the exact zero-pad conv is recovered with a precomputed, input-
independent correction  ``corr[h,w,n] = sum_{pad taps at (h,w)} w[tap,n]``
(built host-side by :func:`padding_correction`).  Interior positions have
corr = 0; only image borders carry nonzero entries.

Layout contract: activations NHWC packed along C (C bits -> Cw words per
position); weights HWIO packed along I per tap, concatenated tap-major
[(dy0,dx0) words..., (dy0,dx1) words...] to match patch extraction order.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qnx.ops.packing import packed_len
from .xnor_gemm import xnor_gemm_popcount
from .ternary_gemm import ternary_gemm

Array = jax.Array


def extract_packed_patches(xp: Array, kh: int, kw: int) -> Array:
    """(B, H, W, Cw) packed words -> (B, H, W, kh*kw*Cw) 'SAME' patches.

    Pads with all-zero words (= -1 bits, corrected downstream) and stacks
    the kh*kw shifted views along the last axis, tap-major."""
    b, h, w, cw = xp.shape
    ph, pw = kh // 2, kw // 2
    xpad = jnp.pad(xp, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    taps = [
        xpad[:, dy:dy + h, dx:dx + w, :]
        for dy in range(kh)
        for dx in range(kw)
    ]
    return jnp.concatenate(taps, axis=-1)


def pack_conv_weights_np(pattern: np.ndarray):
    """Host-side: (kh, kw, C, N) ±1 pattern -> (kh*kw*Cw, N) packed planes
    matching :func:`extract_packed_patches` order. Returns (wp, k_true)."""
    from qnx.ops.packing import pack_bits_np

    kh, kw, c, n = pattern.shape
    blocks = [
        pack_bits_np(pattern[dy, dx], axis=0)  # (Cw, N)
        for dy in range(kh)
        for dx in range(kw)
    ]
    return np.concatenate(blocks, axis=0), kh * kw * c


def pack_conv_ternary_np(pattern: np.ndarray):
    """Host-side ternary variant: returns (mask, sign, nnz) with shapes
    (kh*kw*Cw, N), (kh*kw*Cw, N), (N,)."""
    from qnx.ops.packing import pack_ternary_np

    kh, kw, c, n = pattern.shape
    masks, signs = [], []
    nnz = np.zeros(n, np.int32)
    for dy in range(kh):
        for dx in range(kw):
            m, s, z = pack_ternary_np(pattern[dy, dx], axis=0)
            masks.append(m)
            signs.append(s)
            nnz += z
    return np.concatenate(masks, 0), np.concatenate(signs, 0), nnz


def padding_correction(pattern: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host-side: corr[h, w, n] = sum over taps falling outside the image of
    sum_c pattern[dy, dx, c, n] (for ±1 or {-1,0,+1} patterns).

    Adding ``corr`` to the packed conv output yields the exact zero-padding
    conv result (see module docstring)."""
    kh, kw, _, n = pattern.shape
    ph, pw = kh // 2, kw // 2
    wsum = pattern.sum(axis=2, dtype=np.int64)  # (kh, kw, n)
    corr = np.zeros((h, w, n), np.int64)
    for dy in range(kh):
        for dx in range(kw):
            oy, ox = dy - ph, dx - pw
            # tap (dy,dx) at output (y,x) reads input (y+oy, x+ox)
            ys = np.arange(h)[:, None] + oy
            xs = np.arange(w)[None, :] + ox
            outside = (ys < 0) | (ys >= h) | (xs < 0) | (xs >= w)
            corr += outside[:, :, None] * wsum[dy, dx][None, None, :]
    return corr.astype(np.int32)


def xnor_conv(xp: Array, wp: Array, k: int, corr: Array,
              kh: int = 3, kw: int = 3, **gemm_kw) -> Array:
    """Packed binary 'SAME' conv, stride 1: (B,H,W,Cw) x (kh*kw*Cw, N) ->
    exact zero-pad conv output (B,H,W,N) int32."""
    b, h, w, _ = xp.shape
    patches = extract_packed_patches(xp, kh, kw)
    s = xnor_gemm_popcount(
        patches.reshape(b * h * w, -1), wp, k, **gemm_kw
    ).reshape(b, h, w, -1)
    return s + corr[None]


def ternary_conv(xp: Array, mask: Array, sign: Array, nnz: Array, corr: Array,
                 kh: int = 3, kw: int = 3, **gemm_kw) -> Array:
    """Packed ternary-weight 'SAME' conv, stride 1 (two-plane popcount)."""
    b, h, w, _ = xp.shape
    patches = extract_packed_patches(xp, kh, kw)
    s = ternary_gemm(
        patches.reshape(b * h * w, -1), mask, sign, nnz, **gemm_kw
    ).reshape(b, h, w, -1)
    return s + corr[None]
