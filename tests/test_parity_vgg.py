"""VGG conv-path parity: fake-quant golden vs packed conv engine.

Covers the zero-padding correction, integer maxpool (pool BEFORE BN+sign),
per-position flatten packing, and the float first/last layers of the
CIFAR-10 configs — all at H=1 so the fake-quant path is integer-exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.convert.pack_model import pack_vgg
from qnx.data.datasets import synthetic
from qnx.nn.inference import vgg_forward
from qnx.train.loop import create_train_state, train_step
from qnx.utils.config import Config

CF = Config(dataset="synthetic-cifar", architecture="vgg", width=8,
            dense_units=64, network_type="full-bnn", H=1.0,
            first_layer_float=True, last_layer_float=True,
            epochs=1, batch_size=16)


def _short_train(cf, steps=6, batch=16):
    ds = synthetic((32, 32, 3), n_train=batch * steps, n_test=64)
    state = create_train_state(cf, jax.random.PRNGKey(0), steps_per_epoch=steps)
    x = jnp.asarray(ds.x_train)
    y = jnp.asarray(ds.y_train)
    for i in range(steps):
        state, _ = train_step(state, x[i * batch:(i + 1) * batch],
                              y[i * batch:(i + 1) * batch])
    return ds, state


def _gold_logits(state, x):
    return state.apply_fn(
        {"params": state.params, "quant": state.quant,
         "batch_stats": state.batch_stats}, x, train=False)


class TestVggBinaryParity:
    @pytest.fixture(scope="class")
    def trained(self):
        ds, state = _short_train(CF)
        packed = pack_vgg(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, CF)
        return ds, state, packed

    def test_argmax_parity(self, trained):
        ds, state, packed = trained
        x = jnp.asarray(ds.x_test)
        gold = np.argmax(np.asarray(_gold_logits(state, x)), -1)
        fast = np.argmax(np.asarray(vgg_forward(packed, x)), -1)
        match = float(np.mean(gold == fast))
        assert match == 1.0, f"VGG argmax parity {match:.4f}"

    def test_logits_close(self, trained):
        ds, state, packed = trained
        x = jnp.asarray(ds.x_test[:16])
        gold = np.asarray(_gold_logits(state, x))
        fast = np.asarray(vgg_forward(packed, x))
        np.testing.assert_allclose(fast, gold, atol=1e-3, rtol=1e-3)


class TestVggTernaryParity:
    def test_argmax_parity_ternary(self):
        cf = CF.replace(network_type="full-tnn")
        ds, state = _short_train(cf)
        packed = pack_vgg(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, cf)
        x = jnp.asarray(ds.x_test)
        gold = np.argmax(np.asarray(_gold_logits(state, x)), -1)
        fast = np.argmax(np.asarray(vgg_forward(packed, x)), -1)
        match = float(np.mean(gold == fast))
        assert match == 1.0, f"ternary VGG argmax parity {match:.4f}"


class TestVggAllBinary:
    def test_binary_first_and_head(self):
        """No float boundary layers (first_layer_float=False): binarized
        first conv and packed head must still be exact."""
        cf = CF.replace(first_layer_float=False, last_layer_float=False)
        ds, state = _short_train(cf, steps=4)
        packed = pack_vgg(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, cf)
        x = jnp.asarray(ds.x_test[:32])
        gold = np.argmax(np.asarray(_gold_logits(state, x)), -1)
        fast = np.argmax(np.asarray(vgg_forward(packed, x)), -1)
        assert float(np.mean(gold == fast)) == 1.0


class TestPaddingCorrection:
    def test_zero_pad_conv_exact(self):
        """xnor_conv + corr == lax.conv with zero padding, random ±1."""
        from qnx.kernels.xnor_conv import (pack_conv_weights_np,
                                           padding_correction, xnor_conv)
        from qnx.ops.packing import pack_bits

        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        b, h, w, c, n = 2, 9, 7, 40, 24
        x = jnp.where(jax.random.bernoulli(k1, 0.5, (b, h, w, c)), 1.0, -1.0)
        wt = jnp.where(jax.random.bernoulli(k2, 0.5, (3, 3, c, n)), 1.0, -1.0)
        gold = jax.lax.conv_general_dilated(
            x, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ).astype(jnp.int32)
        wp, k = pack_conv_weights_np(np.asarray(wt))
        corr = padding_correction(np.asarray(wt), h, w)
        out = xnor_conv(pack_bits(x, -1), jnp.asarray(wp), k, jnp.asarray(corr))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(gold))


class TestVggTopologyValidation:
    """Mismatched variables fail at entry with actionable messages, not as
    shape errors deep inside packing (VERDICT r3 #6)."""

    def _variables(self):
        from qnx.models.factory import init_model

        _, variables = init_model(CF, jax.random.PRNGKey(0))
        return jax.device_get(variables)

    def test_missing_layer(self):
        v = self._variables()
        del v["params"]["conv_3"]
        with pytest.raises(ValueError, match=r"missing layers \['conv_3'\]"):
            pack_vgg(v, CF)

    def test_broken_channel_chaining(self):
        v = self._variables()
        k = np.asarray(v["params"]["conv_2"]["kernel"])
        v["params"]["conv_2"]["kernel"] = k[:, :, :-1, :]  # cin 16 -> 15
        with pytest.raises(ValueError, match="conv_2.*do not chain"):
            pack_vgg(v, CF)

    def test_flatten_width_mismatch(self):
        v = self._variables()
        k = np.asarray(v["params"]["dense_0"]["kernel"])
        v["params"]["dense_0"]["kernel"] = np.concatenate([k, k[:8]], axis=0)
        with pytest.raises(ValueError, match="dense_0.*flatten"):
            pack_vgg(v, CF)

    def test_wrong_class_count(self):
        v = self._variables()
        k = np.asarray(v["params"]["dense_out"]["kernel"])
        v["params"]["dense_out"]["kernel"] = k[:, :-1]
        with pytest.raises(ValueError, match="dense_out.*classes"):
            pack_vgg(v, CF)

    def test_int8_and_bitplane_paths_validate_too(self):
        from qnx.convert.pack_model import pack_int8, pack_vgg_bitplane

        v = self._variables()
        del v["params"]["bn_dense_1"]
        with pytest.raises(ValueError, match="missing layers"):
            pack_int8(v, CF)
        with pytest.raises(ValueError, match="missing layers"):
            pack_vgg_bitplane(v, CF.replace(network_type="full-tnn", abits=2))
