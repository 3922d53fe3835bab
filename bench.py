"""Headline benchmark: CIFAR-10 VGG BNN inference, quantized engines vs the
XLA float32 baseline (BASELINE.json: "images/sec/chip on CIFAR-10 BNN",
target >= 5x float).

Baseline definition (measured, see BASELINE.md "Float baseline semantics"):
the reference computes in true float32 (TF-era f32 kernels).  On TPU, XLA's
*default* precision silently executes "f32" convs as bf16 multiplies on the
MXU (~6x faster than real f32: 94.7 vs 15.8 TMAC/s calibrated on this v5e),
so the honest float32 baseline is the same model under
``jax.default_matmul_precision('highest')``.  ``vs_baseline`` is reported
against that strict-f32 baseline; the relaxed default-precision (bf16-MXU)
ratio is also printed and included in the JSON line as
``vs_bf16_default_baseline`` — physics caps that ratio near the int8/bf16
MXU throughput ratio (~2x on v5e).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver (best engine), plus per-engine detail on stderr.  Timing uses the
marginal-device-time harness (qnx.bench.microbench): on this hardware
block_until_ready does not synchronize through the remote relay and a fixed
~20-30 ms round-trip must be excluded, so each engine is timed as the
difference between N chained forwards and one forward inside single jits.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from qnx.bench.microbench import time_fn_marginal
from qnx.convert.pack_model import pack_int8, pack_vgg
from qnx.models.factory import init_model
from qnx.nn.int8_engine import i8_forward
from qnx.nn.inference import vgg_forward
from qnx.utils.config import CIFAR10_BNN


def main(batch=1024, width=128, iters=32):
    cf = CIFAR10_BNN.replace(width=width)
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    variables = jax.device_get(variables)

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 3),
                                jnp.float32, -1.0, 1.0)

    # float32 baselines: same architecture, float weights/activations.
    # strict = true f32 arithmetic (the reference's); relaxed = XLA default
    # (bf16 multiplies on the MXU).
    # Baseline forward is the plain-XLA float twin (qnx.bench.float_baseline):
    # the model zoo's float layers pin true-f32 precision for bit-parity, so
    # they no longer measure what a default-precision float model costs.
    from qnx.bench.float_baseline import float_forward

    cf_f = cf.replace(network_type="float")
    _, vars_f = init_model(cf_f, jax.random.PRNGKey(0))

    with jax.default_matmul_precision("highest"):
        t_f32 = time_fn_marginal(
            lambda x, v: float_forward(v, cf_f, x), images, vars_f,
            iters=iters)
    t_bf16 = time_fn_marginal(
        lambda x, v: float_forward(v, cf_f, x), images, vars_f,
        iters=iters)

    results = {}
    i8 = pack_int8(variables, cf)
    results["int8-mxu"] = time_fn_marginal(
        lambda x, m: i8_forward(m, x), images, i8, iters=iters)

    packed = pack_vgg(variables, cf)
    results["popcount"] = time_fn_marginal(
        lambda x, m: vgg_forward(m, x), images, packed, iters=iters)

    ips_f32 = batch / t_f32
    ips_bf16 = batch / t_bf16
    for name, t in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"# {name}: {t*1e3:.2f} ms/batch ({batch/t:,.0f} img/s, "
              f"{batch/t/ips_f32:.2f}x f32, {batch/t/ips_bf16:.2f}x bf16-default)",
              file=sys.stderr)
    print(f"# float32(highest) baseline: {t_f32*1e3:.2f} ms/batch "
          f"({ips_f32:,.0f} img/s)", file=sys.stderr)
    print(f"# float-default (bf16-MXU) baseline: {t_bf16*1e3:.2f} ms/batch "
          f"({ips_bf16:,.0f} img/s)", file=sys.stderr)

    best_name, best_t = min(results.items(), key=lambda kv: kv[1])
    ips = batch / best_t
    print(json.dumps({
        "metric": f"images/s/chip CIFAR-10 VGG BNN ({best_name} engine) "
                  "vs float32(HIGHEST) XLA baseline",
        "value": round(ips, 1),
        "unit": "images/s",
        "vs_baseline": round(ips / ips_f32, 3),
        "vs_bf16_default_baseline": round(ips / ips_bf16, 3),
        "baseline_f32_ips": round(ips_f32, 1),
        "baseline_bf16_ips": round(ips_bf16, 1),
    }))
    return ips, ips / ips_f32


if __name__ == "__main__":
    main()
