"""Can a tap-decomposed GEMM beat XLA's int8 conv on the MXU? (round 4)

The int8 engine of record runs at ~0.54 of the model's MXU speed of light;
the gap is XLA's 3x3 conv efficiency (0.62-0.88 SoL per layer, BASELINE.md
roofline).  Hypothesis: expressing the SAME-padded 3x3 conv as 9 shifted
(B*H*W, C) x (C, N) GEMM accumulations — each a dense MXU matmul with no
im2col materialization — may schedule better than XLA's native conv
lowering at these shapes.

Measures, per VGG conv shape: XLA lax.conv (current engine), tap-GEMM, and
the pure GEMM speed-of-light proxy (one (B*H*W, 9C) x (9C, N) matmul, no
shifts).  Exactness is asserted against lax.conv before timing.

Run ON the TPU:  python experiments/i8_conv_tapgemm.py

MEASURED (v5e, 2026-08-21) — hypothesis REFUTED:

    32x32 128->128: xla 0.898 ms (172 T, 0.90 of int8 peak) | tap 14.73 ms
    16x16 256->256: xla 0.951 ms (163 T, 0.85)              | tap  6.42 ms
    8x8   512->512: xla 0.471 ms (see caveat)               | tap  3.43 ms

Tap-GEMM is 7-16x SLOWER: each of the 9 accumulation steps round-trips the
(B,H,W,N) int32 accumulator through HBM (~0.5 GB read+write per tap at the
conv2 shape), so the formulation is memory-bound at ~1/9 of its GEMM rate.
XLA's native conv keeps the accumulator in registers/VMEM across taps —
the bare conv already runs at ~0.9 of the int8 MXU peak, so there is no
headroom for ANY reformulation that materializes intermediates.  The
engine's remaining gap to model SoL (0.54) is the threshold/pool epilogues
and the narrower early layers, not the conv kernels.  Caveats: the 8x8
xla number (328 T > 191 T peak) and the gemm-SoL column are harness
artifacts at sub-ms scale (the proxy was sized 8x too small; marginal
differences there are relay-jitter-dominated) — the conv2/conv4-shape
rows are the meaningful ones.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qnx.bench.microbench import time_fns_marginal_interleaved


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def conv_tapgemm(x, w):
    """SAME 3x3 int8 conv as 9 accumulated GEMMs over spatially shifted x.

    Each tap (dy, dx) contributes x[n, i+dy-1, j+dx-1, :] @ w[dy, dx] to
    output pixel (i, j).  Shifts are realized by zero-padding x once to
    (H+2, W+2) and slicing — zero rows/cols reproduce SAME's zero padding
    exactly, so the result is bit-identical to lax.conv."""
    b, h, wd, c = x.shape
    n = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, n), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (b, h, wd, c)).reshape(-1, c)
            acc = acc + jax.lax.dot_general(
                patch, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(b, h, wd, n)
    return acc


def gemm_sol_proxy(x9, w9):
    """Same MAC count as the conv, one dense GEMM: the MXU ceiling."""
    return jax.lax.dot_general(x9, w9, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def main(batch=1024, iters=8, repeats=3):
    shapes = [  # (H, W, Cin, Cout) — one quantized VGG conv per block (w128)
        (32, 32, 128, 128),
        (16, 16, 256, 256),
        (8, 8, 512, 512),
    ]
    rng = np.random.default_rng(0)
    for (h, wd, c, n) in shapes:
        x = jnp.asarray(rng.integers(0, 2, (batch, h, wd, c)) * 2 - 1,
                        jnp.int8)
        w = jnp.asarray(rng.integers(-1, 2, (3, 3, c, n)), jnp.int8)
        # exactness first (tiny batch)
        xs = x[:4]
        np.testing.assert_array_equal(
            np.asarray(jax.jit(conv_tapgemm)(xs, w)),
            np.asarray(jax.jit(conv_xla)(xs, w)))
        x9 = jnp.asarray(rng.integers(0, 2, (batch * h * wd // 8, 9 * c))
                         * 2 - 1, jnp.int8)  # /8 keeps the proxy quick
        w9 = jnp.asarray(rng.integers(-1, 2, (9 * c, n)), jnp.int8)
        res = time_fns_marginal_interleaved(
            {"xla-conv": (conv_xla, (x, w)),
             "tap-gemm": (conv_tapgemm, (x, w)),
             "gemm-sol": (gemm_sol_proxy, (x9, w9))},
            iters=iters, repeats=repeats)
        macs = batch * h * wd * 9 * c * n
        sol_t = res["gemm-sol"]["t"] * 8  # proxy ran 1/8 of the rows
        print(f"{h}x{wd} {c}->{n}: "
              f"xla {res['xla-conv']['t']*1e3:7.3f} ms "
              f"({macs/res['xla-conv']['t']/1e12:5.1f} T) | "
              f"tap {res['tap-gemm']['t']*1e3:7.3f} ms "
              f"({macs/res['tap-gemm']['t']/1e12:5.1f} T) | "
              f"gemm-SoL {sol_t*1e3:7.3f} ms "
              f"({macs/sol_t/1e12:5.1f} T)", flush=True)
    print("TAPGEMM_DONE")


if __name__ == "__main__":
    main()
