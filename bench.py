"""Headline benchmark: CIFAR-10 VGG BNN inference, quantized engines vs the
XLA float32 baseline (BASELINE.json: "images/sec/chip on CIFAR-10 BNN",
target >= 5x float).

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


def main(batch=1024, width=128, iters=8):
    cf = CIFAR10_BNN.replace(width=width)
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    variables = jax.device_get(variables)

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 3),
                                jnp.float32, -1.0, 1.0)

    # float32 baseline: same architecture, float weights/activations
    cf_f = cf.replace(network_type="float")
    module_f, vars_f = init_model(cf_f, jax.random.PRNGKey(0))

    t_float = time_fn_marginal(
        lambda x, v: module_f.apply(v, x, train=False), images, vars_f,
        iters=iters)

    results = {}
    i8 = pack_int8(variables, cf)
    results["int8-mxu"] = time_fn_marginal(
        lambda x, m: i8_forward(m, x), images, i8, iters=iters)

    packed = pack_vgg(variables, cf)
    results["popcount"] = time_fn_marginal(
        lambda x, m: vgg_forward(m, x), images, packed, iters=iters)

    ips_float = batch / t_float
    for name, t in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"# {name}: {t*1e3:.2f} ms/batch ({batch/t:,.0f} img/s, "
              f"{batch/t/ips_float:.2f}x float)", file=sys.stderr)
    print(f"# float32 baseline: {t_float*1e3:.2f} ms/batch "
          f"({ips_float:,.0f} img/s)", file=sys.stderr)

    best_name, best_t = min(results.items(), key=lambda kv: kv[1])
    ips = batch / best_t
    print(json.dumps({
        "metric": f"images/s/chip CIFAR-10 VGG BNN ({best_name} engine)",
        "value": round(ips, 1),
        "unit": "images/s",
        "vs_baseline": round(ips / ips_float, 3),
    }))
    return ips, ips / ips_float


if __name__ == "__main__":
    main()
