"""Golden-model parity: fake-quant JAX forward vs packed-integer forward.

This operationalizes the north-star "accuracy Δ = 0%" (SURVEY.md §4.2 item
2).  With H=1 the fake-quant f32 GEMMs are exact integer sums, so argmax
must agree sample-for-sample; with H='Glorot' the fake-quant path itself
carries f32 rounding (order-dependent partial sums of ±H), so knife-edge
bit flips are possible in *either* direction — we require argmax agreement
on the overwhelming majority and identical test accuracy to within one
sample.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.convert.pack_model import pack_mlp
from qnx.data.datasets import load_dataset
from qnx.nn.inference import mlp_forward
from qnx.train.loop import create_train_state, fit
from qnx.utils.config import Config

BASE = Config(dataset="digits", architecture="mlp", dim=96, num_hidden=3,
              epochs=4, batch_size=64, lr_start=5e-3, lr_end=1e-3)


def _train(cf):
    ds = load_dataset("digits")
    state, history = fit(cf, ds.as_tuples())
    return ds, state, history


def _fake_quant_logits(state, x):
    return state.apply_fn(
        {"params": state.params, "quant": state.quant,
         "batch_stats": state.batch_stats}, x, train=False)


class TestBinaryParity:
    @pytest.fixture(scope="class")
    def trained(self):
        cf = BASE.replace(network_type="full-bnn", H=1.0)
        ds, state, history = _train(cf)
        return cf, ds, state, history

    def test_model_learned(self, trained):
        *_, history = trained
        assert history[-1]["test"]["accuracy"] > 0.6

    def test_argmax_parity_h1(self, trained):
        cf, ds, state, _ = trained
        x = jnp.asarray(ds.x_test)
        packed = pack_mlp(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, cf)
        gold = np.argmax(np.asarray(_fake_quant_logits(state, x)), -1)
        fast = np.argmax(np.asarray(mlp_forward(packed, x)), -1)
        match = float(np.mean(gold == fast))
        assert match == 1.0, f"argmax parity {match:.4f} < 1.0 at H=1"

    def test_accuracy_delta_zero(self, trained):
        cf, ds, state, history = trained
        packed = pack_mlp(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, cf)
        fast = np.argmax(np.asarray(mlp_forward(packed, jnp.asarray(ds.x_test))), -1)
        acc_packed = float(np.mean(fast == ds.y_test))
        # evaluate() accumulates the mean in f32, hence the 1e-6 tolerance —
        # the sample-level predictions are identical (test above)
        assert acc_packed == pytest.approx(
            history[-1]["test"]["accuracy"], abs=1e-6)


class TestBinaryParityGlorot:
    def test_argmax_parity_glorot(self):
        cf = BASE.replace(network_type="full-bnn", H="Glorot", epochs=3)
        ds, state, _ = _train(cf)
        x = jnp.asarray(ds.x_test)
        packed = pack_mlp(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, cf)
        gold = np.argmax(np.asarray(_fake_quant_logits(state, x)), -1)
        fast = np.argmax(np.asarray(mlp_forward(packed, x)), -1)
        match = float(np.mean(gold == fast))
        # fake-quant f32 rounding can flip knife-edge bits in either path
        assert match >= 0.995, f"argmax parity {match:.4f}"


class TestTernaryParity:
    def test_argmax_parity_ternary(self):
        cf = BASE.replace(network_type="full-tnn", H=1.0, epochs=4)
        ds, state, history = _train(cf)
        assert history[-1]["test"]["accuracy"] > 0.5
        x = jnp.asarray(ds.x_test)
        packed = pack_mlp(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, cf)
        gold = np.argmax(np.asarray(_fake_quant_logits(state, x)), -1)
        fast = np.argmax(np.asarray(mlp_forward(packed, x)), -1)
        match = float(np.mean(gold == fast))
        assert match == 1.0, f"ternary argmax parity {match:.4f}"


class TestLogitClosness:
    def test_head_logits_close(self):
        """Head affine epilogue must reproduce fake-quant logits to f32 eps."""
        cf = BASE.replace(network_type="full-bnn", H=1.0, epochs=2)
        ds, state, _ = _train(cf)
        x = jnp.asarray(ds.x_test[:64])
        packed = pack_mlp(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, cf)
        gold = np.asarray(_fake_quant_logits(state, x))
        fast = np.asarray(mlp_forward(packed, x))
        np.testing.assert_allclose(fast, gold, atol=1e-3, rtol=1e-3)
