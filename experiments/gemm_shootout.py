"""Shootout of popcount-GEMM formulations on the real chip.

SOL: VPU int32 ~2.1 T ops/s, 3 ops per packed word (xor, popcount, add),
32 MACs per word => ~22 T MAC/s attainable. Round-1 kernel measured ~5.5
effective in the VGG; find the formulation + tiling that gets closest.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qnx.bench.microbench import time_fn_marginal

Array = jax.Array


# --- variant 1: round-1 outer-product, full K in block, static unroll ------
def _outer_kernel(x_ref, w_ref, o_ref, *, k, kw):
    tm, tn = o_ref.shape
    acc = jnp.zeros((tm, tn), jnp.int32)
    for i in range(kw):
        acc = acc + lax.population_count(x_ref[:, i:i + 1] ^ w_ref[i:i + 1, :])
    o_ref[:] = jnp.int32(k) - 2 * acc


@functools.partial(jax.jit, static_argnames=("k", "bm", "bn"))
def v_outer(xp, wp, k, bm=256, bn=256):
    m, kw = xp.shape
    _, n = wp.shape
    bm, bn = min(bm, m), min(bn, n)
    return pl.pallas_call(
        functools.partial(_outer_kernel, k=k, kw=kw),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn)),
        in_specs=[
            pl.BlockSpec((bm, kw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xp, wp)


# --- variant 2: grid over K with accumulation (smaller unroll) -------------
def _outer_acc_kernel(x_ref, w_ref, o_ref, *, k, bk):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, jnp.int32(k))

    acc = jnp.zeros(o_ref.shape, jnp.int32)
    for i in range(bk):
        acc = acc + lax.population_count(x_ref[:, i:i + 1] ^ w_ref[i:i + 1, :])
    o_ref[:] = o_ref[:] - 2 * acc


@functools.partial(jax.jit, static_argnames=("k", "bm", "bn", "bk"))
def v_outer_acc(xp, wp, k, bm=256, bn=256, bk=16):
    m, kw = xp.shape
    _, n = wp.shape
    bm, bn, bk = min(bm, m), min(bn, n), min(bk, kw)
    return pl.pallas_call(
        functools.partial(_outer_acc_kernel, k=k, bk=bk),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(kw, bk)),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, q: (i, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, q: (q, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, q: (i, j),
                               memory_space=pltpu.VMEM),
    )(xp, wp)


# --- variant 3: 3-D chunk, sublane=K-chunk, lane=N --------------------------
def _chunk3d_kernel(x_ref, w_ref, o_ref, *, k, kw, kc):
    tm, tn = o_ref.shape
    acc = jnp.zeros((tm, tn), jnp.int32)
    for c in range(0, kw, kc):
        t = x_ref[:, c:c + kc]                       # (tm, kc)
        wc = w_ref[c:c + kc, :]                      # (kc, tn)
        z = lax.population_count(t[:, :, None] ^ wc[None, :, :])
        acc = acc + jnp.sum(z, axis=1)
    o_ref[:] = jnp.int32(k) - 2 * acc


@functools.partial(jax.jit, static_argnames=("k", "bm", "bn", "kc"))
def v_chunk3d(xp, wp, k, bm=256, bn=128, kc=8):
    m, kw = xp.shape
    _, n = wp.shape
    bm, bn = min(bm, m), min(bn, n)
    return pl.pallas_call(
        functools.partial(_chunk3d_kernel, k=k, kw=kw, kc=min(kc, kw)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn)),
        in_specs=[
            pl.BlockSpec((bm, kw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xp, wp)


# --- variant 4: dot-form — x row-major, wT (N, Kw), reduce over lanes -------
def _lanered_kernel(x_ref, wt_ref, o_ref, *, k, bn):
    tm, tn = o_ref.shape
    cols = []
    for j in range(bn):
        v = lax.population_count(x_ref[:] ^ wt_ref[j:j + 1, :])  # (tm, kw)
        cols.append(jnp.sum(v, axis=1, keepdims=True))           # (tm, 1)
    o_ref[:] = jnp.int32(k) - 2 * jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "bm", "bn"))
def v_lanered(xp, wpt, k, bm=256, bn=128):
    m, kw = xp.shape
    n, _ = wpt.shape
    bm, bn = min(bm, m), min(bn, n)
    return pl.pallas_call(
        functools.partial(_lanered_kernel, k=k, bn=bn),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn)),
        in_specs=[
            pl.BlockSpec((bm, kw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, kw), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xp, wp)  # noqa: F821  (fixed below)


def main():
    shapes = [
        ("conv1-like", 262144, 1152, 128),
        ("conv3-like", 65536, 2304, 256),
        ("dense-mlp", 4096, 4096, 4096),
    ]
    for name, m, kt, n in shapes:
        kw = kt // 32
        xp = jax.random.randint(jax.random.PRNGKey(0), (m, kw), -(2**31), 2**31 - 1, jnp.int32)
        wp = jax.random.randint(jax.random.PRNGKey(1), (kw, n), -(2**31), 2**31 - 1, jnp.int32)
        macs = m * kt * n
        ref = None
        cands = {
            "outer-256x256": lambda a, b: v_outer(a, b, kt, 256, 256),
            "outer-512x256": lambda a, b: v_outer(a, b, kt, 512, 256),
            "outer-1024x128": lambda a, b: v_outer(a, b, kt, 1024, 128),
            "outeracc-256x256x16": lambda a, b: v_outer_acc(a, b, kt, 256, 256, 16),
            "outeracc-512x512x8": lambda a, b: v_outer_acc(a, b, kt, 512, 512, 8),
            "chunk3d-256x128x8": lambda a, b: v_chunk3d(a, b, kt, 256, 128, 8),
            "chunk3d-512x128x8": lambda a, b: v_chunk3d(a, b, kt, 512, 128, 8),
            "chunk3d-256x256x8": lambda a, b: v_chunk3d(a, b, kt, 256, 256, 8),
            "chunk3d-256x128x16": lambda a, b: v_chunk3d(a, b, kt, 256, 128, 16),
        }
        for cname, f in cands.items():
            try:
                out = jax.device_get(f(xp, wp))
                if ref is None:
                    ref = out
                ok = (out == ref).all()
                t = time_fn_marginal(f, xp, wp)
                print(f"{name:12s} {cname:22s}: {t*1e3:8.3f} ms  "
                      f"{macs/t/1e12:6.2f} TMAC/s  ok={bool(ok)}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:12s} {cname:22s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
