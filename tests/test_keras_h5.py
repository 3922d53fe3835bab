"""Converter round-trip tests (SURVEY.md §4.2 item 3): Keras HDF5 →
packed model, vs the same weights loaded natively — identical predictions.

Covers both on-disk formats: the legacy Keras-1/2 layout the reference
actually writes (layer_names/weight_names attrs), and Keras-3
``.weights.h5`` minted by the installed keras.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.convert.keras_h5 import (convert_keras_h5, read_keras_h5,
                                  variables_from_keras_h5, write_legacy_h5)
from qnx.convert.pack_model import pack_mlp
from qnx.nn.inference import mlp_forward
from qnx.train.loop import create_train_state, train_step
from qnx.utils.config import Config

CF = Config(dataset="digits", architecture="mlp", dim=64, num_hidden=2,
            network_type="full-bnn", H=1.0)


def _trained_variables(cf, steps=4):
    state = create_train_state(cf, jax.random.PRNGKey(0), steps_per_epoch=4)
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        x = jax.random.uniform(jax.random.fold_in(key, i), (32, 8, 8, 1),
                               minval=-1, maxval=1)
        y = jax.random.randint(jax.random.fold_in(key, 100 + i), (32,), 0, 10)
        state, _ = train_step(state, x, y)
    return {"params": state.params, "quant": state.quant,
            "batch_stats": state.batch_stats}


def _to_legacy_layers(variables, cf):
    """Serialize qnx MLP variables in the reference's legacy h5 shape."""
    p, s = variables["params"], variables["batch_stats"]
    layers = []
    names = [f"dense_{i}" for i in range(cf.num_hidden)] + ["dense_out"]
    bns = [f"bn_{i}" for i in range(cf.num_hidden)] + ["bn_out"]
    for i, (dn, bn) in enumerate(zip(names, bns)):
        dvars = [(f"{dn}/kernel:0", np.asarray(p[dn]["kernel"]))]
        if "bias" in p[dn]:
            dvars.append((f"{dn}/bias:0", np.asarray(p[dn]["bias"])))
        layers.append((f"binary_dense_{i+1}", dvars))
        layers.append((f"batch_normalization_{i+1}", [
            (f"{bn}/gamma:0", np.asarray(p[bn]["scale"])),
            (f"{bn}/beta:0", np.asarray(p[bn]["bias"])),
            (f"{bn}/moving_mean:0", np.asarray(s[bn]["mean"])),
            (f"{bn}/moving_variance:0", np.asarray(s[bn]["var"])),
        ]))
    return layers


class TestLegacyFormat:
    def test_roundtrip_identical_predictions(self, tmp_path):
        variables = _trained_variables(CF)
        path = str(tmp_path / "ref.h5")
        write_legacy_h5(path, _to_legacy_layers(variables, CF))

        packed_direct = pack_mlp(jax.device_get(variables), CF)
        packed_h5 = convert_keras_h5(path, CF)

        x = jax.random.uniform(jax.random.PRNGKey(9), (64, 8, 8, 1),
                               minval=-1, maxval=1)
        out_a = np.asarray(mlp_forward(packed_direct, x))
        out_b = np.asarray(mlp_forward(packed_h5, x))
        np.testing.assert_array_equal(out_a, out_b)

    def test_read_classifies_layers(self, tmp_path):
        variables = _trained_variables(CF)
        path = str(tmp_path / "ref.h5")
        write_legacy_h5(path, _to_legacy_layers(variables, CF))
        layers = read_keras_h5(path)
        kinds = [lv.kind for lv in layers]
        assert kinds == ["dense", "bn"] * 3

    def test_h_resolution_glorot(self, tmp_path):
        cf = CF.replace(H="Glorot")
        variables = _trained_variables(cf)
        path = str(tmp_path / "ref.h5")
        write_legacy_h5(path, _to_legacy_layers(variables, cf))
        v2 = variables_from_keras_h5(path, cf)
        h_expected = float(variables["quant"]["dense_0"]["H"])
        assert float(v2["quant"]["dense_0"]["H"]) == pytest.approx(
            h_expected, rel=1e-6)

    def test_wrong_layer_count_raises(self, tmp_path):
        variables = _trained_variables(CF)
        path = str(tmp_path / "ref.h5")
        write_legacy_h5(path, _to_legacy_layers(variables, CF))
        with pytest.raises(ValueError, match="dense layers"):
            variables_from_keras_h5(path, CF.replace(num_hidden=3))


VGG_CF = Config(dataset="CIFAR-10", architecture="vgg",
                network_type="full-bnn", width=128,
                first_layer_float=True, last_layer_float=True)

VGG_COMPUTE = [f"conv_{i}" for i in range(6)] + ["dense_0", "dense_1",
                                                 "dense_out"]
VGG_BNS = [f"bn_conv_{i}" for i in range(6)] + ["bn_dense_0", "bn_dense_1",
                                                "bn_out"]


def _vgg_variables(cf, seed=0):
    """Full-width VGG variables with randomized BN params/stats so a layer
    mis-ordering in conversion cannot hide behind identical defaults."""
    from qnx.models.factory import init_model

    _, variables = init_model(cf, jax.random.PRNGKey(seed))
    variables = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
    rng = np.random.default_rng(seed)
    p, s = variables["params"], variables["batch_stats"]
    for name in s:
        n = s[name]["mean"].shape[0]
        p[name]["scale"] = (1 + 0.2 * rng.standard_normal(n)).astype(np.float32)
        p[name]["bias"] = (0.2 * rng.standard_normal(n)).astype(np.float32)
        s[name]["mean"] = (0.2 * rng.standard_normal(n)).astype(np.float32)
        s[name]["var"] = rng.uniform(0.5, 1.5, n).astype(np.float32)
    return variables


def _vgg_ordered_weights(variables):
    """The VGG's weights in model order, one list per h5 'layer'."""
    p, s = variables["params"], variables["batch_stats"]
    out = []
    for cn, bn in zip(VGG_COMPUTE, VGG_BNS):
        ws = [np.asarray(p[cn]["kernel"])]
        if "bias" in p[cn]:
            ws.append(np.asarray(p[cn]["bias"]))
        out.append((cn, ws))
        out.append((bn, [np.asarray(p[bn]["scale"]), np.asarray(p[bn]["bias"]),
                         np.asarray(s[bn]["mean"]), np.asarray(s[bn]["var"])]))
    return out


def _assert_variables_equal(got, want):
    for coll in ("params", "batch_stats"):
        for lname in want[coll]:
            for vname in want[coll][lname]:
                np.testing.assert_array_equal(
                    np.asarray(got[coll][lname][vname]),
                    np.asarray(want[coll][lname][vname]),
                    err_msg=f"{coll}/{lname}/{vname}")


class TestVggFullWidth:
    """Full-size (width-128) reference-format checkpoint round-trip — the
    shipped CIFAR config's exact shapes, both on-disk layouts (VERDICT r2
    item 6). Parity: converted variables are leaf-exact vs the originals,
    and the int8 engine produces identical logits from either source."""

    def test_legacy_roundtrip_full_width(self, tmp_path):
        variables = _vgg_variables(VGG_CF)
        path = str(tmp_path / "vgg.h5")
        layers = [(f"layer_{i}_{name}",
                   [(f"{name}/w_{j}:0", a) for j, a in enumerate(ws)])
                  for i, (name, ws) in enumerate(_vgg_ordered_weights(variables))]
        write_legacy_h5(path, layers)
        got = variables_from_keras_h5(path, VGG_CF)
        _assert_variables_equal(got, variables)

    def test_keras3_roundtrip_full_width(self, tmp_path):
        keras = pytest.importorskip("keras")
        from keras import layers as kl

        m = keras.Sequential([keras.Input((32, 32, 3))])
        widths = [128, 128, 256, 256, 512, 512]
        for i, w in enumerate(widths):
            m.add(kl.Conv2D(w, 3, padding="same", use_bias=(i == 0)))
            if i % 2 == 1:
                m.add(kl.MaxPooling2D(2))
            m.add(kl.BatchNormalization())
        m.add(kl.Flatten())
        for units, bias in ((1024, False), (1024, False), (10, True)):
            m.add(kl.Dense(units, use_bias=bias))
            m.add(kl.BatchNormalization())

        variables = _vgg_variables(VGG_CF)
        ordered = iter(_vgg_ordered_weights(variables))
        for lyr in m.layers:
            if lyr.get_weights():
                _, ws = next(ordered)
                lyr.set_weights(ws)
        path = str(tmp_path / "vgg.weights.h5")
        m.save_weights(path)

        got = variables_from_keras_h5(path, VGG_CF)
        _assert_variables_equal(got, variables)

    def test_int8_forward_parity_from_h5(self, tmp_path):
        from qnx.convert.pack_model import pack_int8
        from qnx.nn.int8_engine import i8_forward

        variables = _vgg_variables(VGG_CF)
        path = str(tmp_path / "vgg.h5")
        write_legacy_h5(path, [
            (name, [(f"{name}/w_{j}:0", a) for j, a in enumerate(ws)])
            for name, ws in _vgg_ordered_weights(variables)])
        direct = pack_int8(variables, VGG_CF)
        via_h5 = pack_int8(variables_from_keras_h5(path, VGG_CF), VGG_CF)
        x = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 3),
                               minval=-1, maxval=1)
        np.testing.assert_array_equal(
            np.asarray(i8_forward(direct, x)), np.asarray(i8_forward(via_h5, x)))

    def test_chaining_detects_misordered_file(self, tmp_path):
        # A Keras-3 file whose auto-name indices imply a wrong order must be
        # rejected by the kernel-shape chaining check, not silently packed.
        import h5py

        path = str(tmp_path / "bad.weights.h5")
        with h5py.File(path, "w") as f:
            g = f.create_group("layers")
            # two "dense" layers whose shapes cannot chain in index order
            for name, shape in (("dense", (64, 32)), ("dense_1", (16, 10))):
                v = g.create_group(name).create_group("vars")
                v.create_dataset("0", data=np.zeros(shape, np.float32))
            for name, n in (("batch_normalization", 32),
                            ("batch_normalization_1", 10)):
                v = g.create_group(name).create_group("vars")
                for j in range(4):
                    v.create_dataset(str(j), data=np.ones(n, np.float32))
        with pytest.raises(ValueError, match="chaining"):
            read_keras_h5(path)


@pytest.mark.skipif(os.environ.get("QNX_SKIP_KERAS", "0") == "1",
                    reason="keras not available")
class TestKeras3Format:
    def test_keras3_weights_h5(self, tmp_path):
        keras = pytest.importorskip("keras")
        from keras import layers as kl

        rng = np.random.default_rng(0)
        m = keras.Sequential([keras.Input((64,))])
        for i in range(CF.num_hidden):
            m.add(kl.Dense(CF.dim, use_bias=False))
            m.add(kl.BatchNormalization(momentum=0.9, epsilon=1e-4))
        m.add(kl.Dense(10, use_bias=False))
        m.add(kl.BatchNormalization(momentum=0.9, epsilon=1e-4))
        # randomize weights/BN stats so folding is non-trivial (var kept > 0)
        for lyr in m.layers:
            ws = lyr.get_weights()
            if len(ws) == 4:  # BN: gamma, beta, moving_mean, moving_var
                lyr.set_weights([
                    (1 + 0.2 * rng.standard_normal(ws[0].shape)).astype(np.float32),
                    (0.2 * rng.standard_normal(ws[1].shape)).astype(np.float32),
                    (0.2 * rng.standard_normal(ws[2].shape)).astype(np.float32),
                    rng.uniform(0.5, 1.5, ws[3].shape).astype(np.float32),
                ])
            else:
                lyr.set_weights([
                    (0.5 * rng.standard_normal(w.shape)).astype(np.float32)
                    for w in ws])
        path = str(tmp_path / "k3.weights.h5")
        m.save_weights(path)

        cf = CF.replace(dim=CF.dim)
        variables = variables_from_keras_h5(path, cf)
        # kernels must round-trip exactly
        k0 = m.layers[0].get_weights()[0]
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["dense_0"]["kernel"]), k0)
        # bn stats order: gamma, beta, mean, var
        bn0 = m.layers[1].get_weights()
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["bn_0"]["scale"]), bn0[0])
        np.testing.assert_array_equal(
            np.asarray(variables["batch_stats"]["bn_0"]["var"]), bn0[3])

        packed = convert_keras_h5(path, cf)
        x = jax.random.uniform(jax.random.PRNGKey(2), (8, 64),
                               minval=-1, maxval=1).reshape(8, 8, 8, 1)
        out = mlp_forward(packed, x)
        assert out.shape == (8, 10)
        assert np.isfinite(np.asarray(out)).all()
