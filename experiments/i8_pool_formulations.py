"""Does the int8 engine's pool epilogue leave throughput on the table?

The engine's gap to whole-model MXU SoL (~6.0 vs 3.2 ms) is epilogue/pool
traffic (experiments/i8_conv_tapgemm.py).  This measures the three pooled
conv blocks end-to-end (conv + threshold + 2x2 maxpool) with:

  A. reduce_window on the int8 codes (current engine, threshold-before-pool)
  B. 4-way strided-slice + elementwise max on the int8 codes
  C. no pool at all (lower bound for the pool's cost)

B and A are bit-identical (max over the same four elements); if B wins,
adopt it in I8Conv.  Run ON the TPU:
    python experiments/i8_pool_formulations.py

MEASURED (v5e, 2026-08-21) — the pool epilogue is already FREE:

    32x32 128->128: A 1.185 ms | B 1.188 ms | C-no-pool 1.261 ms
    16x16 256->256: A 1.093 ms | B 0.998 ms | C-no-pool 1.107 ms
    8x8   512->512: A 0.874 ms | B 0.890 ms | C-no-pool 0.958 ms

A == B within jitter, and BOTH beat the pool-free conv: XLA fuses the
threshold+pool into the conv consumer, so pooling shrinks the HBM write 4x
and pays nothing.  Together with i8_conv_tapgemm.py (bare conv ~0.90 of
int8 MXU peak; tap reformulations much slower), this closes the int8
engine's per-chip perf investigation: the engine runs at the sum of its
best-known layer times, and the remaining gap to the 3.2 ms whole-model
MXU SoL is XLA's 3x3-conv MXU utilization, which no measured alternative
beats.  reduce_window stays (no change to the engine).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qnx.bench.microbench import time_fns_marginal_interleaved


def conv_thresh(x, w, tau):
    s = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return jnp.where(s >= tau, jnp.int8(1), jnp.int8(-1))


def pool_rw(y):
    return jax.lax.reduce_window(
        y, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_slice(y):
    a = jnp.maximum(y[:, 0::2, 0::2, :], y[:, 0::2, 1::2, :])
    b = jnp.maximum(y[:, 1::2, 0::2, :], y[:, 1::2, 1::2, :])
    return jnp.maximum(a, b)


def main(batch=1024, iters=16, repeats=3):
    shapes = [(32, 32, 128, 128), (16, 16, 256, 256), (8, 8, 512, 512)]
    rng = np.random.default_rng(0)
    for (h, wd, c, n) in shapes:
        x = jnp.asarray(rng.integers(0, 2, (batch, h, wd, c)) * 2 - 1,
                        jnp.int8)
        w = jnp.asarray(rng.integers(-1, 2, (3, 3, c, n)), jnp.int8)
        tau = jnp.asarray(rng.integers(-64, 64, (n,)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(jax.jit(lambda a, b, t: pool_rw(conv_thresh(a, b, t)))(
                x[:4], w, tau)),
            np.asarray(jax.jit(lambda a, b, t: pool_slice(conv_thresh(a, b, t)))(
                x[:4], w, tau)))
        res = time_fns_marginal_interleaved(
            {"A-reduce_window": (
                lambda a, b, t: pool_rw(conv_thresh(a, b, t)), (x, w, tau)),
             "B-slice-max": (
                lambda a, b, t: pool_slice(conv_thresh(a, b, t)), (x, w, tau)),
             "C-no-pool": (conv_thresh, (x, w, tau))},
            iters=iters, repeats=repeats)
        row = " | ".join(f"{k} {v['t']*1e3:7.3f} ms"
                         for k, v in res.items())
        print(f"{h}x{wd} {c}->{n}: {row}", flush=True)
    print("POOLFORM_DONE")


if __name__ == "__main__":
    main()
