"""Per-kernel speed-of-light roofline report (BASELINE.json: "every
bit-packed matmul kernel at speed-of-light per chip").

For each hot kernel this measures marginal device time (qnx.bench.microbench)
and compares it against the binding resource on TPU v5e:

* MXU compute: int8 197 TMAC/s (394 TOPS spec; best measured 204), bf16
  98.5 (197 TFLOPS spec), f32-HIGHEST ~16.4 (6-pass bf16 decomposition);
* HBM bandwidth: 819 GB/s spec;
* VPU int32: ~3.9 T op/s theoretical (8x128 lanes x ~4 ALUs x 940 MHz) —
  the popcount GEMM does 32 MACs per (xor + popcount + add) word triple,
  so its compute roofline is ~41 TMAC/s.

``speed_of_light`` = max(t_compute, t_memory) under those peaks;
``sol_fraction`` = speed_of_light / measured. Run on the real chip:

    python -m qnx.bench.roofline            # table on stdout + JSONL

The reference has no such harness (SURVEY.md §5 "Tracing/profiling:
absent"); this module is the build-side equivalent tier.
"""
from __future__ import annotations

import json
import sys
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from qnx.bench.microbench import time_fn_marginal

# v5e peaks (spec; best single-kernel measurements on this chip reach
# 92-104% of these: int8 204 TMAC/s, bf16 92.6 TMAC/s)
V5E_PEAKS = {
    "int8_macs": 197e12,         # 394 TOPS spec
    "bf16_macs": 98.5e12,        # 197 TFLOPS spec
    "f32_highest_macs": 16.4e12, # bf16 peak / 6 (6-pass f32 decomposition)
    "hbm_bytes": 819e9,          # spec
    # Calibrated (round 5): best measured popcount-GEMM rate on this chip —
    # 65.0 TMAC/s × 3 ops / 32 MACs per word = 6.1e12 int32 ops/s at
    # 512×512 blocks (experiments/xnor_sol_variants.py, 2026-08-21).  The
    # previous 3.9e12 "8x128 lanes × 4 ALUs × 940 MHz" model undercounted
    # the VPU's sustained integer issue rate by ~1.6x, which is why round-4
    # fractions could exceed 1.0; fractions are now relative to this
    # measured ceiling.
    "vpu_int32_ops": 6.1e12,
}


@dataclass
class KernelResult:
    name: str
    t_measured_s: float
    macs: int
    bytes_moved: int
    peak_key: str
    ops_per_mac: float = 1.0  # VPU kernels: VPU ops issued per MAC-equiv

    @property
    def t_compute(self) -> float:
        return self.macs * self.ops_per_mac / V5E_PEAKS[self.peak_key]

    @property
    def t_memory(self) -> float:
        return self.bytes_moved / V5E_PEAKS["hbm_bytes"]

    @property
    def speed_of_light(self) -> float:
        return max(self.t_compute, self.t_memory)

    @property
    def bound(self) -> str:
        return "compute" if self.t_compute >= self.t_memory else "memory"

    def row(self) -> dict:
        return {
            "kernel": self.name,
            "measured_ms": round(self.t_measured_s * 1e3, 4),
            "tmacs": round(self.macs / self.t_measured_s / 1e12, 2),
            "sol_ms": round(self.speed_of_light * 1e3, 4),
            "sol_fraction": round(self.speed_of_light / self.t_measured_s, 3),
            "bound": self.bound,
        }


def _rand_pm1_i8(key, shape):
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int8) * 2 - 1


#: (hw, cin, cout, pool, tag) per measured VGG conv layer (width 128).
CONV_SHAPES = [(32, 128, 128, True, "conv2"),
               (16, 256, 256, True, "conv4"),
               (8, 512, 512, True, "conv6")]


def measure_kernels(batch: int = 1024, iters: int | None = None,
                    repeats: int = 5, gemm_k: int = 4096, gemm_n: int = 4096,
                    conv_shapes: list | None = None) -> list[KernelResult]:
    """Measure the hot kernels at headline shapes. Returns KernelResults."""
    from qnx.kernels.i8_conv_fused import i8_conv_fused
    from qnx.kernels.ternary_gemm import ternary_gemm
    from qnx.kernels.xnor_gemm import xnor_gemm_int8, xnor_gemm_popcount
    from qnx.ops.packing import pack_bits

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    out: list[KernelResult] = []

    # --- int8 MXU GEMM (MLP hidden layer shape: 4096x4096) ---
    m, k, n = batch, gemm_k, gemm_n
    x8 = _rand_pm1_i8(ks[0], (m, k))
    w8 = _rand_pm1_i8(ks[1], (k, n))
    t = time_fn_marginal(xnor_gemm_int8, x8, w8, iters=iters, repeats=repeats)
    out.append(KernelResult(
        "int8-MXU GEMM 1024x4096x4096", t, m * k * n,
        m * k + k * n + 4 * m * n, "int8_macs"))

    # --- popcount VPU GEMM (same logical shape, 32x packed) ---
    xp = pack_bits(x8.astype(jnp.float32), -1)
    wp = pack_bits(w8.astype(jnp.float32), 0)
    t = time_fn_marginal(
        lambda xp, wp: xnor_gemm_popcount(xp, wp, k), xp, wp,
        iters=iters, repeats=repeats)
    out.append(KernelResult(
        "popcount VPU GEMM 1024x4096x4096", t, m * k * n,
        4 * (m * k // 32 + (k // 32) * n + m * n), "vpu_int32_ops",
        ops_per_mac=3 / 32))

    # --- ternary two-plane GEMM ---
    mask = jnp.asarray(
        jax.random.bernoulli(ks[2], 0.7, (k // 32, n)).astype(jnp.int32))
    sign = wp & mask
    nnz = jnp.sum(jax.lax.population_count(mask), axis=0)
    t = time_fn_marginal(
        lambda xp, mask: ternary_gemm(xp, mask, sign, nnz), xp, mask,
        iters=iters, repeats=repeats)
    out.append(KernelResult(
        "ternary two-plane GEMM 1024x4096x4096", t, m * k * n,
        4 * (m * k // 32 + 2 * (k // 32) * n + m * n), "vpu_int32_ops",
        ops_per_mac=4 / 32))  # xor + and + popcount + add per 32-bit word

    # --- int8 conv layers (CIFAR VGG, width 128): XLA conv vs fused ---
    for (hw, cin, cout, _pool, tag) in (
            CONV_SHAPES if conv_shapes is None else conv_shapes):
        xc = _rand_pm1_i8(ks[3], (batch, hw, hw, cin))
        wc = jax.random.randint(ks[4], (3, 3, cin, cout), -1, 2, jnp.int8)
        sgn = jax.random.choice(ks[5], jnp.array([-1, 1], jnp.int32), (cout,))
        tau = jax.random.randint(ks[6], (1, cout), -20, 20, jnp.int32)
        macs = batch * hw * hw * 9 * cin * cout
        bts = batch * hw * hw * (cin + cout) + 9 * cin * cout

        def xla_conv(x, w):
            s = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            u = sgn[None, None, None, :] * s
            return jnp.where(u >= tau[0][None, None, None, :],
                             jnp.int8(1), jnp.int8(-1))

        t = time_fn_marginal(xla_conv, xc, wc, iters=iters, repeats=repeats)
        out.append(KernelResult(
            f"int8 conv+epilogue [XLA] {tag} {hw}x{hw} {cin}->{cout}",
            t, macs, bts, "int8_macs"))
        t = time_fn_marginal(
            lambda x, w: i8_conv_fused(x, w, sgn, tau), xc, wc,
            iters=iters, repeats=repeats)
        out.append(KernelResult(
            f"int8 conv+epilogue [Pallas fused] {tag} {hw}x{hw} {cin}->{cout}",
            t, macs, bts, "int8_macs"))

    # --- fused packed conv kernels (the round-2 VGG hot path): measured
    # end-to-end as the engine runs them — XLA packed-patch extraction +
    # Pallas popcount GEMM + in-kernel threshold/pool epilogue.  bytes_moved
    # counts the formulation's real traffic: packed input read, the 9x
    # patch materialization (write + read), weight planes, int8 codes out.
    from qnx.kernels.xnor_conv import (pack_conv_ternary_np,
                                       pack_conv_weights_np,
                                       padding_correction)
    from qnx.kernels.xnor_conv_fused import ternary_conv_fused, xnor_conv_fused
    import numpy as np

    rng = np.random.default_rng(0)
    for (hw, cin, cout, pool, tag) in (
            CONV_SHAPES if conv_shapes is None else conv_shapes):
        cw = cin // 32
        xpb = jnp.asarray(
            rng.integers(-2**31, 2**31, (batch, hw, hw, cw), np.int64)
            .astype(np.int32))
        sgn = jnp.asarray(rng.choice([-1, 1], cout).astype(np.int32))
        tau = jnp.asarray(rng.integers(-20, 20, cout).astype(np.int32))
        macs = batch * hw * hw * 9 * cin * cout
        hw_out = hw // 2 if pool else hw
        bts = 4 * (batch * hw * hw * cw            # packed input read
                   + 2 * batch * hw * hw * 9 * cw  # patch write + read
                   + 9 * cw * cout)                # weight planes
        bts += batch * hw_out * hw_out * cout      # int8 codes out

        patb = rng.choice([-1.0, 1.0], (3, 3, cin, cout)).astype(np.float32)
        wpb, ktrue = pack_conv_weights_np(patb)
        corrb = jnp.asarray(padding_correction(patb, hw, hw))
        t = time_fn_marginal(
            lambda x, w: xnor_conv_fused(x, w, ktrue, corrb, sgn, tau,
                                         pool=pool),
            xpb, jnp.asarray(wpb), iters=iters, repeats=repeats)
        out.append(KernelResult(
            f"xnor conv fused [patch-GEMM+pool] {tag} {hw}x{hw} {cin}->{cout}",
            t, macs, bts, "vpu_int32_ops", ops_per_mac=3 / 32))

        patt = rng.choice([-1.0, 0.0, 1.0], (3, 3, cin, cout)).astype(np.float32)
        maskb, signb, nnzb = pack_conv_ternary_np(patt)
        corrt = jnp.asarray(padding_correction(patt, hw, hw))
        t = time_fn_marginal(
            lambda x, m: ternary_conv_fused(
                x, m, jnp.asarray(signb), jnp.asarray(nnzb), corrt, sgn, tau,
                pool=pool),
            xpb, jnp.asarray(maskb), iters=iters, repeats=repeats)
        out.append(KernelResult(
            f"ternary conv fused [patch-GEMM+pool] {tag} {hw}x{hw} {cin}->{cout}",
            t, macs, bts + 4 * 9 * cw * cout, "vpu_int32_ops",
            ops_per_mac=4 / 32))

    # --- calibration GEMMs (context rows) ---
    xf = jax.random.normal(ks[7], (2048, 4096), jnp.bfloat16)
    wf = jax.random.normal(ks[8], (4096, 4096), jnp.bfloat16)
    t = time_fn_marginal(
        lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32),
        xf, wf, iters=iters, repeats=repeats)
    out.append(KernelResult(
        "bf16 MXU GEMM 2048x4096x4096 (calibration)", t,
        2048 * 4096 * 4096, 2 * (2048 * 4096 + 4096 * 4096) + 4 * 2048 * 4096,
        "bf16_macs"))
    return out


def main(argv=None):
    if jax.default_backend() not in ("tpu", "axon"):
        print("# WARNING: not on TPU — numbers are not rooflines",
              file=sys.stderr)
    results = measure_kernels()
    rows = [r.row() for r in results]
    width = max(len(r["kernel"]) for r in rows)
    print(f"{'kernel':<{width}}  {'ms':>9} {'TMAC/s':>8} {'SoL ms':>9} "
          f"{'SoL frac':>8}  bound")
    for r in rows:
        print(f"{r['kernel']:<{width}}  {r['measured_ms']:>9.4f} "
              f"{r['tmacs']:>8.2f} {r['sol_ms']:>9.4f} "
              f"{r['sol_fraction']:>8.3f}  {r['bound']}")
    for r in rows:
        print(json.dumps(r), file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
