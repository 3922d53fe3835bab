"""Headline benchmark: packed-integer inference vs XLA float32 baseline.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver.  Run on the real TPU chip; everything jitted (eager ops are
expensive through the remote-compile tunnel — see .claude/skills/verify).

Current flagship: MNIST-4096 MLP BNN (BinaryNet arch) through the
XNOR-popcount engine vs the same-architecture float32 model.  Switches to
the CIFAR-10 VGG BNN once the conv engine lands (BASELINE.json headline).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from qnx.convert.pack_model import pack_mlp
from qnx.models.factory import init_model
from qnx.utils.config import Config


def _time_it(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(batch=8192, dim=4096, num_hidden=3, iters=10):
    cf = Config(dataset="MNIST", architecture="mlp", network_type="full-bnn",
                dim=dim, num_hidden=num_hidden)
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    packed = pack_mlp(variables, cf)

    cf_float = cf.replace(network_type="float")
    module_f, vars_f = init_model(cf_float, jax.random.PRNGKey(0))

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 28, 28, 1),
                                jnp.float32, -1.0, 1.0)

    @jax.jit
    def packed_fwd(model, x):
        return model(x)

    @jax.jit
    def float_fwd(variables, x):
        return module_f.apply(variables, x, train=False)

    t_packed = _time_it(packed_fwd, packed, images, iters=iters)
    t_float = _time_it(float_fwd, vars_f, images, iters=iters)

    ips = batch / t_packed
    ips_float = batch / t_float
    result = {
        "metric": f"images/s/chip MNIST-{dim}x{num_hidden} MLP BNN packed inference",
        "value": round(ips, 1),
        "unit": "images/s",
        "vs_baseline": round(ips / ips_float, 3),
    }
    print(json.dumps(result))
    print(f"# packed: {t_packed*1e3:.2f} ms/batch ({ips:,.0f} img/s) | "
          f"float32: {t_float*1e3:.2f} ms/batch ({ips_float:,.0f} img/s)",
          file=sys.stderr)
    return result


if __name__ == "__main__":
    main()
