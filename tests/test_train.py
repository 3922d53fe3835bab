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


class TestActivationOverride:
    """Config.activation reaches the two previously config-dead reference
    ops — quantized_tanh and binary_sigmoid (VERDICT r3 #7)."""

    def test_quantized_tanh_values_in_forward(self):
        from qnx.ops.quant import quantized_tanh

        cf = TINY_MLP.replace(network_type="full-qnn", wbits=4, abits=3,
                              activation="quantized_tanh")
        state = create_train_state(cf, jax.random.PRNGKey(0), 10)
        # hidden activations must land on the symmetric +-(1-2^(1-nb)) grid:
        # probe by applying the op directly and via the model's activation
        x = jnp.linspace(-2, 2, 64)
        vals = np.unique(np.asarray(quantized_tanh(x, 3)))
        assert vals.min() == -0.75 and vals.max() == 0.75
        # training steps with the override
        xb = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 1), minval=-1)
        state, m = train_step(state, xb, jnp.zeros((8,), jnp.int32))
        assert jnp.isfinite(m["loss"])

    def test_binary_sigmoid_trains_and_learns(self):
        ds = load_dataset("digits")
        cf = TINY_MLP.replace(network_type="full-bnn",
                              activation="binary_sigmoid", epochs=5,
                              lr_start=5e-3, lr_end=1e-3)
        state, history = fit(cf, ds.as_tuples())
        assert history[-1]["test"]["accuracy"] > 0.5

    def test_quantized_tanh_learns(self):
        ds = load_dataset("digits")
        cf = TINY_MLP.replace(network_type="full-qnn", wbits=4, abits=2,
                              activation="quantized_tanh", epochs=5,
                              lr_start=5e-3, lr_end=1e-3)
        state, history = fit(cf, ds.as_tuples())
        assert history[-1]["test"]["accuracy"] > 0.5

    def test_engine_lowering_covers_same_family_overrides(self):
        """Round 5: binary_sigmoid / quantized_tanh DO lower (VERDICT r4
        Missing #2); only cross-family overrides remain unimplemented."""
        from qnx.convert.pack_model import pack_int8, pack_mlp

        cf = TINY_MLP.replace(network_type="full-bnn",
                              activation="binary_sigmoid")
        _, variables = init_model(cf, jax.random.PRNGKey(0))
        variables = jax.device_get(variables)
        pack_mlp(variables, cf)  # must not raise
        pack_int8(variables, cf)  # must not raise
        cross = cf.replace(activation="quantized_relu")
        with pytest.raises(ValueError, match="not implemented"):
            pack_mlp(variables, cross)

    def test_equivalent_override_allowed(self):
        from qnx.convert.pack_model import pack_mlp

        cf = TINY_MLP.replace(network_type="full-bnn",
                              activation="binary_tanh")
        _, variables = init_model(cf, jax.random.PRNGKey(0))
        pack_mlp(jax.device_get(variables), cf)  # must not raise


def test_fit_trains_on_tail_batch():
    """Keras `fit` semantics: the final partial batch IS trained on.
    70 samples at batch 32 -> 2 whole steps + one 6-sample step per epoch
    (VERDICT r3 #8); drop_remainder=True restores whole-batches-only."""
    ds = synthetic((8, 8, 1), n_train=70, n_test=20)
    cf = TINY_MLP.replace(dataset="digits", epochs=2, batch_size=32)
    state, _ = fit(cf, ds.as_tuples())
    assert int(state.step) == 2 * 3  # (2 full + 1 partial) steps x 2 epochs
    state, _ = fit(cf, ds.as_tuples(), drop_remainder=True)
    assert int(state.step) == 2 * 2


def test_fit_smaller_than_batch_dataset():
    ds = synthetic((8, 8, 1), n_train=20, n_test=8)
    cf = TINY_MLP.replace(dataset="digits", epochs=2, batch_size=64)
    state, history = fit(cf, ds.as_tuples())
    assert int(state.step) == 2  # one partial step per epoch
    assert np.isfinite(history[-1]["test"]["loss"])


def test_resume_is_bit_exact(tmp_path):
    """Interrupt-and-resume reproduces the uninterrupted run exactly:
    restore of Adam moments + step + epoch RNG replay (VERDICT r3 #4)."""
    ds = synthetic((8, 8, 1), n_train=128, n_test=32)
    cf = TINY_MLP.replace(dataset="digits", epochs=4, batch_size=32)

    state_full, hist_full = fit(cf, ds.as_tuples())

    d = str(tmp_path / "ckpt")
    fit(cf, ds.as_tuples(), ckpt_dir=d, stop_after=2)  # "killed" after 2
    state_res, hist_res = fit(cf, ds.as_tuples(), ckpt_dir=d, resume=True)
    assert [h["epoch"] for h in hist_res] == [2, 3]

    for a, b in zip(jax.tree.leaves(state_full.params),
                    jax.tree.leaves(state_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state_full.opt_state),
                    jax.tree.leaves(state_res.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state_full.step) == int(state_res.step)
    assert hist_full[-1]["test"] == hist_res[-1]["test"]


def test_resume_can_extend_epochs(tmp_path):
    """epochs may grow on resume — extending a finished run is the normal
    CLI flow (`--epochs 4 --resume` after a 2-epoch run) — and the LR
    schedule re-derives from the NEW epoch total (a saved-config schedule
    would decay the extension epochs to ~lr_end^2, silently freezing
    training)."""
    from qnx.train.loop import exp_decay_schedule

    ds = synthetic((8, 8, 1), n_train=64, n_test=16)
    cf2 = TINY_MLP.replace(dataset="digits", epochs=2, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf2, ds.as_tuples(), ckpt_dir=d)
    cf4 = cf2.replace(epochs=4)
    state, hist = fit(cf4, ds.as_tuples(), ckpt_dir=d, resume=True)
    assert [h["epoch"] for h in hist] == [2, 3]
    assert int(state.step) == 4 * 2  # 2 steps/epoch x 4 epochs total
    # schedule introspection: the resumed state's LR at an extension step
    # must match the 4-epoch schedule, not the saved 2-epoch one
    step = jnp.int32(3 * 2)  # first step of epoch 3
    want = float(exp_decay_schedule(cf4, 2)(step))
    stale = float(exp_decay_schedule(cf2, 2)(step))
    got = float(state.schedule(step))
    assert got == pytest.approx(want, rel=1e-6)
    assert got != pytest.approx(stale, rel=1e-3)


def test_resume_rejects_different_data(tmp_path):
    """The sidecar stores a data fingerprint: resuming on different data
    (e.g. a synthetic fallback after real files vanished) must fail loudly
    rather than silently mixing datasets."""
    ds_a = synthetic((8, 8, 1), n_train=64, n_test=16, seed=0)
    ds_b = synthetic((8, 8, 1), n_train=64, n_test=16, seed=99)
    cf2 = TINY_MLP.replace(dataset="digits", epochs=3, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf2, ds_a.as_tuples(), ckpt_dir=d, stop_after=1)
    with pytest.raises(ValueError, match="DIFFERENT data"):
        fit(cf2, ds_b.as_tuples(), ckpt_dir=d, resume=True)
    # same data resumes fine
    fit(cf2, ds_a.as_tuples(), ckpt_dir=d, resume=True)


def test_ckpt_every_skips_and_always_saves_last(tmp_path):
    import json
    import os

    ds = synthetic((8, 8, 1), n_train=64, n_test=16)
    cf3 = TINY_MLP.replace(dataset="digits", epochs=3, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf3, ds.as_tuples(), ckpt_dir=d, ckpt_every=2)
    with open(os.path.join(d, "train_state.config.json")) as f:
        assert json.load(f)["epochs_done"] == 3  # final epoch always saved
    # resume from the final save works
    state, hist = fit(cf3.replace(epochs=4), ds.as_tuples(), ckpt_dir=d,
                      resume=True, ckpt_every=2)
    assert [h["epoch"] for h in hist] == [3]


def test_resume_rejects_config_mismatch(tmp_path):
    ds = synthetic((8, 8, 1), n_train=64, n_test=16)
    cf = TINY_MLP.replace(dataset="digits", epochs=2, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf, ds.as_tuples(), ckpt_dir=d, stop_after=1)
    with pytest.raises(ValueError, match="config differs"):
        fit(cf.replace(dim=32), ds.as_tuples(), ckpt_dir=d, resume=True)


def test_resume_rejects_weights_only_checkpoint(tmp_path):
    from qnx.train.checkpoint import restore_train_state, save_checkpoint

    cf = TINY_MLP.replace(dataset="digits")
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    p = save_checkpoint(str(tmp_path / "w"), variables, cf)
    with pytest.raises(ValueError, match="weights-only"):
        restore_train_state(p, steps_per_epoch=4)


def test_fingerprint_v2_catches_reshuffle():
    """ADVICE r4 / VERDICT r4 Weak #5: a same-size reorder that preserves
    the v1 prefix sums must still change the fingerprint (strided sha)."""
    from qnx.train.loop import data_fingerprint

    x = np.zeros((400, 4), np.float32)
    x[10, 0], x[20, 0] = 1.0, 2.0
    y = np.zeros(400, np.int64)
    fp1 = data_fingerprint(x, y)
    x2 = x.copy()
    x2[10, 0], x2[20, 0] = 2.0, 1.0  # swap: identical sums, different order
    fp2 = data_fingerprint(x2, y)
    assert fp1["x_sum"] == fp2["x_sum"] and fp1["y_sum"] == fp2["y_sum"]
    assert fp1["sha"] != fp2["sha"]
    assert fp1["v"] == 2


def test_resume_accepts_legacy_v1_fingerprint(tmp_path):
    """A v1 (sums-only) checkpoint sidecar still resumes against a v2 run:
    comparison is over the keys both versions carry."""
    import json
    import os

    ds = synthetic((8, 8, 1), n_train=64, n_test=16)
    cf = TINY_MLP.replace(dataset="digits", epochs=2, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf, ds.as_tuples(), ckpt_dir=d, stop_after=1)
    scp = os.path.join(d, "train_state.config.json")
    with open(scp) as f:
        sc = json.load(f)
    sc["data_fp"] = {k: sc["data_fp"][k] for k in ("n", "x_sum", "y_sum")}
    with open(scp, "w") as f:
        json.dump(sc, f)
    fit(cf, ds.as_tuples(), ckpt_dir=d, resume=True)  # must not raise


def test_resume_rejects_drop_remainder_flip(tmp_path):
    """ADVICE r4: flipping drop_remainder between save and resume changes
    opt_steps (LR schedule + replayed batches) and must fail loudly."""
    ds = synthetic((8, 8, 1), n_train=70, n_test=16)  # 70/32 -> tail batch
    cf = TINY_MLP.replace(dataset="digits", epochs=3, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf, ds.as_tuples(), ckpt_dir=d, stop_after=1, drop_remainder=True)
    with pytest.raises(ValueError, match="optimizer steps"):
        fit(cf, ds.as_tuples(), ckpt_dir=d, resume=True)
    # matching batching still resumes
    fit(cf, ds.as_tuples(), ckpt_dir=d, resume=True, drop_remainder=True)


def test_restore_rejects_stale_sidecar(tmp_path):
    """ADVICE r4 (medium): a sidecar left stale by a crash between the orbax
    commit and the sidecar replace is detected by the step cross-check
    instead of silently re-training already-consumed epochs."""
    import json
    import os

    ds = synthetic((8, 8, 1), n_train=64, n_test=16)
    cf = TINY_MLP.replace(dataset="digits", epochs=3, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf, ds.as_tuples(), ckpt_dir=d, stop_after=2)
    scp = os.path.join(d, "train_state.config.json")
    with open(scp) as f:
        sc = json.load(f)
    sc["epochs_done"] = 1  # pretend the sidecar lagged the payload
    with open(scp, "w") as f:
        json.dump(sc, f)
    with pytest.raises(ValueError, match="internally inconsistent"):
        fit(cf, ds.as_tuples(), ckpt_dir=d, resume=True)


def test_stop_after_already_met_is_noop(tmp_path):
    """ADVICE r4: resuming a checkpoint whose epochs_done already meets
    stop_after must train nothing (previously it trained one extra epoch)."""
    ds = synthetic((8, 8, 1), n_train=64, n_test=16)
    cf = TINY_MLP.replace(dataset="digits", epochs=4, batch_size=32)
    d = str(tmp_path / "ckpt")
    fit(cf, ds.as_tuples(), ckpt_dir=d, stop_after=2)
    state, hist = fit(cf, ds.as_tuples(), ckpt_dir=d, resume=True,
                      stop_after=2)
    assert hist == []
    assert int(state.step) == 2 * 2  # unchanged: 2 epochs x 2 steps


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
