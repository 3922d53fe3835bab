"""Training-path tests: every network_type builds, steps, and learns.

Small dims for CPU speed; the real configs are exercised on TPU via
scripts/ and bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.data.datasets import load_dataset, synthetic
from qnx.models.factory import init_model
from qnx.train.loop import (TrainState, clip_constraint, create_train_state,
                            eval_step, evaluate, fit, train_step)
from qnx.utils.config import CONFIGS, Config

TINY_MLP = Config(dataset="digits", architecture="mlp", dim=64, num_hidden=2,
                  epochs=3, batch_size=64, lr_start=5e-3, lr_end=1e-3)
TINY_VGG = Config(dataset="synthetic-cifar", architecture="vgg", width=8,
                  dense_units=32, epochs=1, batch_size=16,
                  first_layer_float=True, last_layer_float=True)


@pytest.mark.parametrize("ntype", ["float", "bnn", "full-bnn", "tnn",
                                   "full-tnn", "qnn", "full-qnn"])
def test_mlp_builds_and_steps(ntype):
    cf = TINY_MLP.replace(network_type=ntype, wbits=4, abits=2)
    state = create_train_state(cf, jax.random.PRNGKey(0), steps_per_epoch=10)
    x = jnp.ones((8, 8, 8, 1))
    y = jnp.zeros((8,), jnp.int32)
    state2, metrics = train_step(state, x, y)
    assert jnp.isfinite(metrics["loss"])
    assert int(state2.step) == 1


def test_vgg_builds_and_steps():
    cf = TINY_VGG.replace(network_type="full-bnn")
    state = create_train_state(cf, jax.random.PRNGKey(0), steps_per_epoch=10)
    x = jnp.ones((2, 32, 32, 3))
    y = jnp.zeros((2,), jnp.int32)
    state, metrics = train_step(state, x, y)
    assert jnp.isfinite(metrics["loss"])


def test_clip_constraint_applied():
    cf = TINY_MLP.replace(network_type="full-bnn", H=0.25)
    state = create_train_state(cf, jax.random.PRNGKey(0), steps_per_epoch=10)
    # blow up a kernel then clip
    params = jax.tree.map(lambda p: p + 10.0, state.params)
    clipped = clip_constraint(params, state.quant)
    k = clipped["dense_0"]["kernel"]
    assert float(jnp.max(k)) <= 0.25 + 1e-6
    # BN params must NOT be clipped
    assert float(jnp.max(clipped["bn_0"]["scale"])) > 1.0


def test_quant_collection_has_h_and_lrmult():
    cf = TINY_MLP.replace(network_type="full-bnn", H="Glorot")
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    q = variables["quant"]["dense_0"]
    h = float(q["H"])
    assert h == pytest.approx(np.sqrt(1.5 / (64 + 64)), rel=1e-5)
    assert float(q["lr_mult"]) == pytest.approx(1.0 / h, rel=1e-5)


def test_float_layers_have_no_quant_metadata():
    cf = TINY_VGG.replace(network_type="full-bnn")
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    assert "conv_0" not in variables.get("quant", {})  # float first layer
    assert "conv_1" in variables["quant"]
    assert "dense_out" not in variables.get("quant", {})  # float last layer


def test_mlp_learns_digits():
    ds = load_dataset("digits")
    cf = TINY_MLP.replace(network_type="full-bnn", epochs=5)
    state, history = fit(cf, ds.as_tuples())
    acc = history[-1]["test"]["accuracy"]
    assert acc > 0.5, f"BNN failed to learn digits: acc={acc}"


def test_binary_weights_are_binary_in_forward():
    """The forward pass must use only ±H weights (fake-quant contract)."""
    cf = TINY_MLP.replace(network_type="full-bnn", H=1.0)
    state = create_train_state(cf, jax.random.PRNGKey(1), steps_per_epoch=10)
    # replacing latent kernel with its sign must not change the logits
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 1))
    logits1 = state.apply_fn(
        {"params": state.params, "quant": state.quant,
         "batch_stats": state.batch_stats}, x, train=False)
    signed = jax.tree.map(lambda p: p, state.params)
    k = signed["dense_0"]["kernel"]
    signed["dense_0"]["kernel"] = jnp.where(k > 0, 0.9, -0.9)  # same signs
    logits2 = state.apply_fn(
        {"params": signed, "quant": state.quant,
         "batch_stats": state.batch_stats}, x, train=False)
    np.testing.assert_allclose(logits1, logits2, atol=1e-5)
