"""Stochastic binarization, dropout, SVHN loader, device-resident fit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.data.datasets import load_dataset
from qnx.ops import quant as Q
from qnx.train.loop import create_train_state, fit, train_step
from qnx.utils.config import Config

TINY = Config(dataset="digits", architecture="mlp", dim=48, num_hidden=2,
              epochs=2, batch_size=64, network_type="full-bnn", H=1.0)


class TestStochasticBinarize:
    def test_values_and_distribution(self):
        key = jax.random.PRNGKey(0)
        w = jnp.full((20000,), 0.5)  # p(+1) = hard_sigmoid(0.5) = 0.75
        wb = Q.binarize_stochastic(w, key, 1.0)
        vals = np.unique(np.asarray(wb))
        np.testing.assert_array_equal(vals, [-1.0, 1.0])
        frac = float(jnp.mean(wb > 0))
        assert abs(frac - 0.75) < 0.02

    def test_gradient_saturating_ste(self):
        key = jax.random.PRNGKey(1)
        g = jax.vmap(jax.grad(
            lambda w: Q.binarize_stochastic(w[None], key, 1.0).sum()
        ))(jnp.array([-2.0, 0.0, 2.0]))
        np.testing.assert_array_equal(g, jnp.array([0.0, 1.0, 0.0]))

    def test_layer_uses_rng_only_in_training(self):
        cf = TINY.replace(stochastic=True)
        state = create_train_state(cf, jax.random.PRNGKey(0), 4)
        x = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 1), minval=-1)
        y = jnp.zeros((8,), jnp.int32)
        # training step with rng works and is stochastic
        s1, m1 = train_step(state, x, y, jax.random.PRNGKey(3))
        s2, m2 = train_step(state, x, y, jax.random.PRNGKey(4))
        assert float(m1["loss"]) != float(m2["loss"])
        # eval (no rng) is deterministic sign binarization
        logits_a = state.apply_fn(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, x, train=False)
        logits_b = state.apply_fn(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, x, train=False)
        np.testing.assert_array_equal(np.asarray(logits_a), np.asarray(logits_b))


class TestDropout:
    def test_dropout_trains(self):
        cf = TINY.replace(dropout_rate=0.3)
        state = create_train_state(cf, jax.random.PRNGKey(0), 4)
        x = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 1), minval=-1)
        y = jnp.zeros((8,), jnp.int32)
        state, metrics = train_step(state, x, y, jax.random.PRNGKey(5))
        assert jnp.isfinite(metrics["loss"])

    def test_fit_with_dropout_learns(self):
        cf = TINY.replace(dropout_rate=0.2, epochs=4, lr_start=5e-3,
                          lr_end=1e-3)
        ds = load_dataset("digits")
        state, history = fit(cf, ds.as_tuples())
        assert history[-1]["test"]["accuracy"] > 0.4

    def test_fit_with_stochastic_runs(self):
        # stochastic binarization is high-variance at tiny width/epochs:
        # assert the loop runs and produces finite metrics, not accuracy
        cf = TINY.replace(stochastic=True, epochs=2)
        ds = load_dataset("digits")
        state, history = fit(cf, ds.as_tuples())
        assert np.isfinite(history[-1]["test"]["loss"])


class TestSvhn:
    def test_svhn_falls_back_offline(self):
        ds = load_dataset("SVHN")
        assert ds.x_train.shape[1:] == (32, 32, 3)
        assert ds.meta.get("fallback_for") == "SVHN" or ds.meta["source"] == "svhn-mat"

    def test_svhn_mat_parsing(self, tmp_path, monkeypatch):
        from scipy.io import savemat

        rng = np.random.default_rng(0)
        for split, n in (("train", 30), ("test", 12)):
            savemat(str(tmp_path / f"{split}_32x32.mat"), {
                "X": rng.integers(0, 256, (32, 32, 3, n)).astype(np.uint8),
                "y": np.concatenate([rng.integers(1, 10, n - 2), [10, 10]])
                     .reshape(-1, 1),
            })
        monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
        ds = load_dataset("SVHN")
        assert ds.meta["source"] == "svhn-mat"
        assert ds.x_train.shape == (30, 32, 32, 3)
        assert ds.x_train.min() >= -1 and ds.x_train.max() <= 1
        assert set(np.unique(ds.y_test)) <= set(range(10))  # label 10 -> 0


class TestLocalFileIngestion:
    """MNIST/CIFAR-10 file-drop paths (VERDICT r3 #5): tiny synthetic files
    in the exact on-disk formats, loaded via $QNX_DATA_DIR without any
    network or keras cache machinery."""

    def _assert_pm1(self, ds):
        assert ds.x_train.dtype == np.float32
        assert ds.x_train.min() >= -1 and ds.x_train.max() <= 1

    def test_mnist_idx_files(self, tmp_path, monkeypatch):
        import gzip
        import struct

        rng = np.random.default_rng(0)

        def write_idx(path, arr, gz=False):
            header = struct.pack(">BBBB", 0, 0, 8, arr.ndim) + b"".join(
                struct.pack(">I", d) for d in arr.shape)
            data = header + arr.astype(np.uint8).tobytes()
            (gzip.open if gz else open)(path, "wb").write(data)

        write_idx(tmp_path / "train-images-idx3-ubyte",
                  rng.integers(0, 256, (20, 28, 28)))
        write_idx(tmp_path / "train-labels-idx1-ubyte",
                  rng.integers(0, 10, (20,)))
        # mixed plain/.gz to cover both openers
        write_idx(tmp_path / "t10k-images-idx3-ubyte.gz",
                  rng.integers(0, 256, (8, 28, 28)), gz=True)
        write_idx(tmp_path / "t10k-labels-idx1-ubyte.gz",
                  rng.integers(0, 10, (8,)), gz=True)
        monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
        ds = load_dataset("MNIST")
        assert ds.meta["source"] == "local-idx"
        assert ds.x_train.shape == (20, 28, 28, 1)
        assert ds.x_test.shape == (8, 28, 28, 1)
        self._assert_pm1(ds)

    def test_mnist_npz(self, tmp_path, monkeypatch):
        rng = np.random.default_rng(1)
        np.savez(tmp_path / "mnist.npz",
                 x_train=rng.integers(0, 256, (10, 28, 28), dtype=np.uint8),
                 y_train=rng.integers(0, 10, 10, dtype=np.uint8),
                 x_test=rng.integers(0, 256, (4, 28, 28), dtype=np.uint8),
                 y_test=rng.integers(0, 10, 4, dtype=np.uint8))
        monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
        ds = load_dataset("MNIST")
        assert ds.meta["source"] == "local-npz"
        assert ds.x_train.shape == (10, 28, 28, 1)
        assert ds.y_test.dtype == np.int32
        self._assert_pm1(ds)

    def test_cifar10_pickle_batches(self, tmp_path, monkeypatch):
        import pickle

        rng = np.random.default_rng(2)
        bdir = tmp_path / "cifar-10-batches-py"
        bdir.mkdir()

        def write_batch(name, n):
            with open(bdir / name, "wb") as f:
                pickle.dump({
                    b"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
                    b"labels": rng.integers(0, 10, n).tolist(),
                }, f)

        for i in range(1, 6):
            write_batch(f"data_batch_{i}", 6)
        write_batch("test_batch", 5)
        monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
        ds = load_dataset("CIFAR-10")
        assert ds.meta["source"] == "local-batches"
        assert ds.x_train.shape == (30, 32, 32, 3)
        assert ds.x_test.shape == (5, 32, 32, 3)
        assert ds.y_train.dtype == np.int32
        self._assert_pm1(ds)

    def test_cifar10_pickle_channel_order(self, tmp_path, monkeypatch):
        """CIFAR batches store row-major (3, 32, 32) per image; the loader
        must emit NHWC with channels last."""
        import pickle

        bdir = tmp_path / "cifar-10-batches-py"
        bdir.mkdir()
        img = np.zeros((3, 32, 32), np.uint8)
        img[0] = 255  # pure red
        with open(bdir / "data_batch_1", "wb") as f:
            pickle.dump({b"data": img.reshape(1, 3072), b"labels": [3]}, f)
        for i in range(2, 6):
            with open(bdir / f"data_batch_{i}", "wb") as f:
                pickle.dump({b"data": np.zeros((1, 3072), np.uint8),
                             b"labels": [0]}, f)
        with open(bdir / "test_batch", "wb") as f:
            pickle.dump({b"data": np.zeros((1, 3072), np.uint8),
                         b"labels": [0]}, f)
        monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
        ds = load_dataset("CIFAR-10")
        np.testing.assert_array_equal(ds.x_train[0, :, :, 0], 1.0)   # R
        np.testing.assert_array_equal(ds.x_train[0, :, :, 1], -1.0)  # G
        assert ds.y_train[0] == 3

    def test_cifar10_npz(self, tmp_path, monkeypatch):
        rng = np.random.default_rng(3)
        np.savez(tmp_path / "cifar10.npz",
                 x_train=rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8),
                 y_train=rng.integers(0, 10, (6, 1), dtype=np.uint8),
                 x_test=rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8),
                 y_test=rng.integers(0, 10, (3, 1), dtype=np.uint8))
        monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
        ds = load_dataset("CIFAR-10")
        assert ds.meta["source"] == "local-npz"
        assert ds.x_train.shape == (6, 32, 32, 3)
        assert ds.y_train.shape == (6,)  # (N,1) keras-style labels raveled
        self._assert_pm1(ds)

    def test_bad_idx_magic_rejected(self, tmp_path):
        from qnx.data.datasets import _read_idx

        p = tmp_path / "bogus"
        p.write_bytes(b"\x00\x00\x09\x01" + b"\x00" * 8)
        with pytest.raises(ValueError, match="idx"):
            _read_idx(str(p))


class TestDeviceResidentFit:
    def test_fit_learns(self):
        ds = load_dataset("digits")
        cf = TINY.replace(epochs=4, lr_start=5e-3, lr_end=1e-3)
        state, history = fit(cf, ds.as_tuples())
        assert history[-1]["test"]["accuracy"] > 0.5
        n = ds.x_train.shape[0]
        steps = n // cf.batch_size + (1 if n % cf.batch_size else 0)
        assert int(state.step) == 4 * steps  # tail batch trained (Keras fit)


def test_svhn_preset_config():
    from qnx.utils.config import CONFIGS

    cf = CONFIGS["svhn-bnn"]
    assert cf.dataset == "SVHN" and cf.architecture == "vgg"
    assert cf.input_shape == (32, 32, 3)
    assert cf.network_type == "full-bnn"


def test_initialize_distributed_signature():
    """Multi-host bring-up helper exists; actual pod init needs a cluster
    (host-count is pure config — SURVEY.md §7.4 item 5)."""
    import inspect

    from qnx.parallel.mesh import initialize_distributed

    params = inspect.signature(initialize_distributed).parameters
    assert set(params) == {"coordinator_address", "num_processes",
                           "process_id"}


def test_corrupt_local_file_warns_and_falls_through(tmp_path, monkeypatch,
                                                    capsys):
    """A truncated local mnist.npz must not abort the resolution chain: a
    loud warning, then fall through to the next source."""
    (tmp_path / "mnist.npz").write_bytes(b"PK\x03\x04 truncated")
    monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
    ds = load_dataset("MNIST")
    assert ds.meta["source"] in ("keras", "synthetic")
    assert "unreadable" in capsys.readouterr().err


def test_corrupt_candidate_still_tries_next_in_same_dir(tmp_path,
                                                        monkeypatch, capsys):
    """ADVICE r4: each candidate file set is attempted INDEPENDENTLY — a
    corrupt mnist.npz must not prevent the idx files in the same directory
    from loading."""
    import struct

    (tmp_path / "mnist.npz").write_bytes(b"PK\x03\x04 truncated")
    rng = np.random.default_rng(0)

    def write_idx(path, arr):
        header = struct.pack(">BBBB", 0, 0, 8, arr.ndim) + b"".join(
            struct.pack(">I", d) for d in arr.shape)
        path.write_bytes(header + arr.astype(np.uint8).tobytes())

    write_idx(tmp_path / "train-images-idx3-ubyte",
              rng.integers(0, 256, (12, 28, 28)))
    write_idx(tmp_path / "train-labels-idx1-ubyte",
              rng.integers(0, 10, (12,)))
    write_idx(tmp_path / "t10k-images-idx3-ubyte",
              rng.integers(0, 256, (4, 28, 28)))
    write_idx(tmp_path / "t10k-labels-idx1-ubyte",
              rng.integers(0, 10, (4,)))
    monkeypatch.setenv("QNX_DATA_DIR", str(tmp_path))
    ds = load_dataset("MNIST")
    assert ds.meta["source"] == "local-idx"  # npz skipped, idx loaded
    assert "unreadable" in capsys.readouterr().err
