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
