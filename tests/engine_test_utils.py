"""Shared train-then-golden helper for the engine parity test files.

On-chip, every distinct jit compile costs minutes through the relay
(BASELINE.md "per-file on-chip protocol"), and round 4's sweep timed out on
test files that re-trained the same config per test (VERDICT r4 Missing #4
/ Weak #6).  ``train_golden`` memoizes (config, shape, steps, batch) →
(ds, variables, gold) for the lifetime of the process, so every test that
shares a config shares its training run AND its compiled programs; configs
that differ only in wbits keep identical shapes/treedefs on purpose so the
jit cache carries across them.

Treat the returned pytrees as READ-ONLY — copy before mutating.
"""
import jax
import jax.numpy as jnp
import numpy as np

from qnx.data.datasets import synthetic
from qnx.train.loop import create_train_state, train_step
from qnx.utils.config import Config

MLP_CF = Config(dataset="synthetic-mnist", architecture="mlp", dim=64,
                num_hidden=3, network_type="full-bnn", H=1.0)
VGG_CF = Config(dataset="synthetic-cifar", architecture="vgg", width=8,
                dense_units=64, network_type="full-bnn", H=1.0,
                first_layer_float=True, last_layer_float=True)

_CACHE: dict = {}


def _argmax_match(out, gold):
    return float(np.mean(np.argmax(out, -1) == np.argmax(gold, -1)))


def train_golden(cf, shape, steps=5, batch=16):
    """Train ``steps`` small batches, return (ds, variables, gold_logits);
    memoized per (cf, shape, steps, batch)."""
    key = (cf, shape, steps, batch)
    if key in _CACHE:
        return _CACHE[key]
    ds = synthetic(shape, n_train=batch * steps, n_test=48)
    state = create_train_state(cf, jax.random.PRNGKey(0), steps_per_epoch=steps)
    x, y = jnp.asarray(ds.x_train), jnp.asarray(ds.y_train)
    for i in range(steps):
        state, _ = train_step(state, x[i * batch:(i + 1) * batch],
                              y[i * batch:(i + 1) * batch])
    variables = jax.device_get(
        {"params": state.params, "quant": state.quant,
         "batch_stats": state.batch_stats})
    gold = state.apply_fn(variables, jnp.asarray(ds.x_test), train=False)
    _CACHE[key] = (ds, variables, np.asarray(gold))
    return _CACHE[key]
