"""Per-config benchmark suite: all five BASELINE.json configs on one chip.

`bench.py` (repo root) is the driver-facing headline (CIFAR-10 VGG BNN);
this module measures every operative config — MNIST MLP BNN/TNN, CIFAR VGG
BNN/TNN, and the continuous-batching serving path — each against its own
float32(HIGHEST) and default-precision baselines. Results are recorded in
BASELINE.md.

    python -m qnx bench suite
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from qnx.bench.microbench import time_fn_marginal
from qnx.convert.pack_model import (pack_int8, pack_mlp, pack_vgg,
                                    pack_vgg_bitplane)
from qnx.models.factory import init_model
from qnx.nn.inference import mlp_forward, vgg_forward
from qnx.nn.int8_engine import i8_forward
from qnx.utils.config import (CIFAR10_BNN, CIFAR10_TNN, MNIST_BNN, MNIST_TNN)


def _baselines(cf, images, iters=None):
    # plain-XLA float forward (qnx.bench.float_baseline): the zoo's float
    # layers pin true-f32 precision for parity, so the baseline uses a
    # context-precision twin of the same architecture/params instead
    from qnx.bench.float_baseline import float_forward

    cf_f = cf.replace(network_type="float")
    _, variables = init_model(cf_f, jax.random.PRNGKey(0))
    fwd = lambda x, v: float_forward(v, cf_f, x)
    with jax.default_matmul_precision("highest"):
        t_f32 = time_fn_marginal(fwd, images, variables, iters=iters)
    t_bf16 = time_fn_marginal(fwd, images, variables, iters=iters)
    return t_f32, t_bf16


def _row(name, batch, t, t_f32, t_bf16):
    return {
        "config": name,
        "batch": batch,
        "ms_per_batch": round(t * 1e3, 3),
        "images_per_s": round(batch / t, 1),
        "vs_f32_highest": round(t_f32 / t, 2),
        "vs_bf16_default": round(t_bf16 / t, 2),
    }


def bench_mlp(cf, name, batch=4096):
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    variables = jax.device_get(variables)
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 28, 28, 1),
                                jnp.float32, -1.0, 1.0)
    t_f32, t_bf16 = _baselines(cf, images)
    rows = []
    i8 = pack_int8(variables, cf)
    t = time_fn_marginal(lambda x, m: i8_forward(m, x), images, i8)
    rows.append(_row(f"{name} int8-mxu", batch, t, t_f32, t_bf16))
    packed = pack_mlp(variables, cf)
    t = time_fn_marginal(lambda x, m: mlp_forward(m, x), images, packed)
    rows.append(_row(f"{name} popcount", batch, t, t_f32, t_bf16))
    return rows


def bench_vgg(cf, name, batch=1024, bitplane=False):
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    variables = jax.device_get(variables)
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 3),
                                jnp.float32, -1.0, 1.0)
    t_f32, t_bf16 = _baselines(cf, images)
    rows = []
    i8 = pack_int8(variables, cf)
    t = time_fn_marginal(lambda x, m: i8_forward(m, x), images, i8)
    rows.append(_row(f"{name} int8-mxu", batch, t, t_f32, t_bf16))
    if bitplane:
        bp = pack_vgg_bitplane(variables, cf)
        fwd = jax.jit(lambda m, x: m(x))
        t = time_fn_marginal(lambda x, m: fwd(m, x), images, bp)
        rows.append(_row(f"{name} bitplane", batch, t, t_f32, t_bf16))
    else:
        packed = pack_vgg(variables, cf)
        t = time_fn_marginal(lambda x, m: vgg_forward(m, x), images, packed)
        rows.append(_row(f"{name} popcount", batch, t, t_f32, t_bf16))
    return rows


def bench_serving(cf=CIFAR10_BNN, batch=1024, requests=8192):
    """Request-level continuous batching (uint8 ingest, futures, padding) —
    the 5th BASELINE.json config. Reported separately from raw engine
    throughput because it includes the host data plane."""
    from qnx.serve.engine import ServeEngine

    _, variables = init_model(cf, jax.random.PRNGKey(0))
    model = pack_int8(jax.device_get(variables), cf)
    reqs = np.random.RandomState(0).randint(
        0, 256, (requests, 32, 32, 3), np.uint8)
    with ServeEngine(model, batch_size=batch,
                     forward=lambda m, x: i8_forward(m, x)) as eng:
        eng.predict(reqs[:batch])  # warm/compile
        stats0 = eng.stats()
        eng.predict(reqs)
        stats = eng.stats()

    # measure the host->device transport (the serving bound on thin links:
    # this environment tunnels the chip through a relay at ~20-40 MB/s;
    # a host-attached TPU has ~16 GB/s PCIe)
    import time

    blob = reqs[:batch]  # uint8, the actual per-batch payload
    jax.device_get(jnp.asarray(blob)[:1, :1, :1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(jnp.asarray(blob)[:1, :1, :1, :1])
    h2d_mbps = blob.nbytes * 3 / (time.perf_counter() - t0) / 1e6
    return {
        "config": "cifar10-bnn-serve (request-level, uint8 ingest)",
        "requests": requests,
        "throughput_ips": round(stats["throughput_ips"], 1),
        "latency_ms_p50": round(stats["latency_ms_p50"], 2),
        "latency_ms_p99": round(stats["latency_ms_p99"], 2),
        "pad_fraction": round(stats["pad_fraction"], 4),
        "h2d_mbps_measured": round(h2d_mbps, 1),
        "note": "host request plane + H2D transport included; this "
                "environment's relay tunnel moves ~20-40 MB/s (PCIe on a "
                "host-attached TPU: ~16 GB/s), so the request-level rate "
                "is transport-bound here; raw engine rate is the headline "
                "row",
    }


def main(argv=None):
    rows = []
    rows += bench_vgg(CIFAR10_BNN, "cifar10-bnn")
    rows += bench_vgg(CIFAR10_TNN, "cifar10-tnn", bitplane=True)
    rows += bench_mlp(MNIST_BNN, "mnist-bnn")
    rows += bench_mlp(MNIST_TNN, "mnist-tnn")
    rows.append(bench_serving())
    for r in rows:
        print(json.dumps(r))
        sys.stdout.flush()
    return rows


if __name__ == "__main__":
    main()
