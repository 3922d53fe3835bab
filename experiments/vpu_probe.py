"""Probe VPU int32 primitive costs on the real chip.

Uses qnx.bench.microbench.time_fn_marginal (relay-safe, DCE-proof) to get
the marginal per-step cost of chained int32 ops inside a Pallas kernel.
Differences LONG vs SHORT chain lengths to strip kernel launch + DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qnx.bench.microbench import time_fn_marginal

BLOCK = (256, 1024)
GRID = 16                     # 4M elems
LONG, SHORT = 96, 32


def _chain_kernel(x_ref, y_ref, out_ref, *, mode: str, reps: int):
    x = x_ref[:]
    y = y_ref[:]
    acc = jnp.zeros_like(x)
    for i in range(reps):
        if mode == "xor":
            acc = acc ^ (x ^ y)
        elif mode == "pc":
            acc = acc + jax.lax.population_count(x ^ y)
        elif mode == "pconly":
            acc = jax.lax.population_count(acc ^ x)
        elif mode == "add":
            acc = acc + (x ^ y)
        elif mode == "mul":
            acc = acc * x + y
        elif mode == "csa":
            a = x ^ acc
            u = acc ^ a
            c = acc & a
            acc = (u ^ y) | c
        x = x + 1  # defeat CSE/hoisting
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def chain(x, y, mode, reps):
    bm, bn = BLOCK
    return pl.pallas_call(
        functools.partial(_chain_kernel, mode=mode, reps=reps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((bm, bn), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((bm, bn), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, y)


def main():
    bm, bn = BLOCK
    shape = (bm * GRID, bn)
    x = jax.random.randint(jax.random.PRNGKey(0), shape, -(2**31), 2**31 - 1, jnp.int32)
    y = jax.random.randint(jax.random.PRNGKey(1), shape, -(2**31), 2**31 - 1, jnp.int32)
    n = x.size
    for mode in ("xor", "add", "mul", "pc", "pconly", "csa"):
        t_long = time_fn_marginal(
            lambda a, b: chain(a, b, mode, LONG), x, y, iters=64)
        t_short = time_fn_marginal(
            lambda a, b: chain(a, b, mode, SHORT), x, y, iters=64)
        dt = t_long - t_short
        ns_per_step = dt / (LONG - SHORT) / n * 1e9
        tput = 1.0 / (ns_per_step * 1e-9) / 1e12 if ns_per_step > 0 else float("nan")
        print(f"{mode:7s}: {ns_per_step*1e3:8.3f} ps/elem/step  "
              f"({tput:6.2f} T elem-steps/s)  "
              f"[long {t_long*1e6:8.1f} us, short {t_short*1e6:8.1f} us]",
              flush=True)


if __name__ == "__main__":
    main()
