"""Golden jnp implementations of the packed integer compute path.

These are the correctness oracles for the Pallas kernels in
:mod:`qnx.kernels`: pure ``jax.numpy`` programs over the packed int32 format
from :mod:`qnx.ops.packing`, runnable on any backend.  Kernel unit tests
assert exact int32 equality against these (SURVEY.md §4.2 item 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .packing import popcount

Array = jax.Array


def xnor_gemm_ref(xp: Array, wp: Array, k: int) -> Array:
    """Packed binary GEMM: (M, Kw) int32 × (Kw, N) int32 → (M, N) int32.

    dot[m, n] = k - 2 * sum_kw popcount(xp[m, kw] ^ wp[kw, n])
    where k is the true (unpadded) reduction length.
    """
    mism = jnp.sum(
        popcount(xp[:, :, None] ^ wp[None, :, :]), axis=1, dtype=jnp.int32
    )
    return jnp.int32(k) - 2 * mism


def ternary_gemm_ref(xp: Array, mask: Array, sign: Array, nnz: Array) -> Array:
    """Packed ternary-weight GEMM: binary ±1 activations × {-1,0,+1} weights.

    dot[m, n] = nnz[n] - 2 * sum_kw popcount(mask[kw, n] & (xp[m, kw] ^ sign[kw, n]))
    """
    mism = jnp.sum(
        popcount(mask[None, :, :] & (xp[:, :, None] ^ sign[None, :, :])),
        axis=1,
        dtype=jnp.int32,
    )
    return nnz[None, :].astype(jnp.int32) - 2 * mism


def bitplane_gemm_ref(planes: Array, mask: Array, sign: Array, nnz: Array,
                      scales: Array, offset_weight_sum: Array) -> Array:
    """Multi-bit activations × ternary/binary weights via bit-plane expansion.

    Activations are expressed as ``x = offset + sum_p scales[p] * b_p`` with
    ``b_p in {0,1}`` packed per plane; then for a ternary weight column
    ``dot = offset * sum(w) + sum_p scales[p] * (2*popcount(b_p & mask & sign)
    - popcount(b_p & mask))``.

    planes: (P, M, Kw) packed {0,1} planes; scales: (P,) float;
    offset_weight_sum: (N,) = offset * sum_k w[k, n] (precomputed, float).
    Returns float32 (M, N).
    """
    pos = jnp.sum(
        popcount(planes[:, :, :, None] & (mask & sign)[None, None, :, :]),
        axis=2, dtype=jnp.int32,
    )  # (P, M, N): bits where b_p=1 and w=+1
    tot = jnp.sum(
        popcount(planes[:, :, :, None] & mask[None, None, :, :]),
        axis=2, dtype=jnp.int32,
    )  # (P, M, N): bits where b_p=1 and w!=0
    per_plane = (2 * pos - tot).astype(jnp.float32)  # sum_k b_p * w
    acc = jnp.einsum("pmn,p->mn", per_plane, scales.astype(jnp.float32))
    return acc + offset_weight_sum[None, :].astype(jnp.float32)
