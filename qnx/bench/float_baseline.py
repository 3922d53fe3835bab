"""Plain-XLA float baseline forward for the benchmark harness.

The qnx model zoo's float layers pin ``precision=REFERENCE_PRECISION``
(true f32) because bit-parity is defined against the reference's f32
semantics (see qnx.ops.quant.REFERENCE_PRECISION).  A *benchmark baseline*
must instead measure what a plain XLA float model costs at the precision
under test — so this module re-implements the same MLP/VGG architectures as
pure jnp functions with NO explicit precision, inheriting whatever
``jax.default_matmul_precision`` context the caller sets:

    with jax.default_matmul_precision("highest"):   # strict f32 baseline
        t = time_fn_marginal(...)
    t = time_fn_marginal(...)                        # bf16-default baseline

Consumes the exact params pytree of ``init_model(cf.replace(
network_type='float'))`` so shapes/weights match the measured engines'
architecture one-for-one.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _bn(params, stats, name, eps, x):
    p, s = params[name], stats[name]
    mul = jax.lax.rsqrt(s["var"] + eps) * p["scale"]
    return (x - s["mean"]) * mul + p["bias"]


def _dense(params, name, x):
    y = x @ params[name]["kernel"]
    if "bias" in params[name]:
        y = y + params[name]["bias"]
    return y


def _conv(params, name, x):
    y = jax.lax.conv_general_dilated(
        x, params[name]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params[name]:
        y = y + params[name]["bias"]
    return y


def float_forward(variables: dict, cf, x: Array) -> Array:
    """Eval-mode forward of the float twin architecture (relu activations,
    BinaryNet layer ordering), precision inherited from context."""
    params, stats = variables["params"], variables["batch_stats"]
    eps = cf.batch_norm_epsilon
    if cf.architecture == "mlp":
        x = x.reshape(x.shape[0], -1)
        for i in range(cf.num_hidden):
            x = jax.nn.relu(_bn(params, stats, f"bn_{i}", eps,
                                _dense(params, f"dense_{i}", x)))
        return _bn(params, stats, "bn_out", eps, _dense(params, "dense_out", x))
    if cf.architecture == "vgg":
        for i in range(6):
            y = _conv(params, f"conv_{i}", x)
            if i % 2 == 1:
                y = jax.lax.reduce_window(
                    y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            x = jax.nn.relu(_bn(params, stats, f"bn_conv_{i}", eps, y))
        x = x.reshape(x.shape[0], -1)
        for j in range(2):
            x = jax.nn.relu(_bn(params, stats, f"bn_dense_{j}", eps,
                                _dense(params, f"dense_{j}", x)))
        return _bn(params, stats, "bn_out", eps, _dense(params, "dense_out", x))
    raise ValueError(f"unknown architecture {cf.architecture!r}")
