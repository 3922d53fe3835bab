"""Data pipeline: ``load_dataset(name)`` → arrays scaled to [-1, 1], NHWC.

Reference counterpart: ``utils/load_data.py`` (SURVEY.md §1.2 Lx) — MNIST /
CIFAR-10 / SVHN via keras.datasets / scipy.io, images scaled to [-1, 1] and
±1 one-hot targets for the squared-hinge loss.

Offline contingency (SURVEY.md §7.6 — this environment has no network and no
dataset files on disk): keras downloads are attempted first; on failure we
fall back to (a) sklearn's bundled ``digits`` (1797×8×8 real images), or
(b) a deterministic synthetic class-conditional dataset with the exact
MNIST/CIFAR shapes (prototype patterns + noise), which suffices for parity
tests (bit-exactness transfers) and throughput benchmarks (shape-dependent
only).  ``load_dataset`` records which source was used in ``meta``.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class DatasetBundle:
    x_train: np.ndarray
    y_train: np.ndarray
    x_test: np.ndarray
    y_test: np.ndarray
    meta: dict

    def as_tuples(self):
        return (self.x_train, self.y_train), (self.x_test, self.y_test)


def _scale_pm1(x_uint8: np.ndarray) -> np.ndarray:
    return (x_uint8.astype(np.float32) / 255.0) * 2.0 - 1.0


def _try_keras(name: str):
    try:
        import keras  # local import: heavy

        if name == "MNIST":
            (xt, yt), (xv, yv) = keras.datasets.mnist.load_data()
            xt, xv = xt[..., None], xv[..., None]
        elif name == "CIFAR-10":
            (xt, yt), (xv, yv) = keras.datasets.cifar10.load_data()
            yt, yv = yt.ravel(), yv.ravel()
        else:
            return None
        return DatasetBundle(
            _scale_pm1(xt), yt.astype(np.int32),
            _scale_pm1(xv), yv.astype(np.int32),
            {"source": "keras", "name": name},
        )
    except Exception:
        return None


def _digits():
    from sklearn.datasets import load_digits

    d = load_digits()
    x = (d.images.astype(np.float32) / 8.0) - 1.0  # values 0..16 -> [-1, 1]
    x = x[..., None]
    y = d.target.astype(np.int32)
    n = int(0.8 * len(y))
    return DatasetBundle(
        x[:n], y[:n], x[n:], y[n:], {"source": "sklearn-digits", "name": "digits"}
    )


def synthetic(shape=(28, 28, 1), classes: int = 10, n_train: int = 6000,
              n_test: int = 1000, noise: float = 0.35, seed: int = 0
              ) -> DatasetBundle:
    """Deterministic class-conditional images: per-class smooth prototype in
    [-1,1] plus Gaussian noise, clipped.  Learnable by the real models and
    shape-identical to the true datasets."""
    rng = np.random.default_rng(seed)
    h, w, c = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    protos = []
    for cls in range(classes):
        # distinct smooth pattern per class (frequency/phase keyed by class)
        fx, fy = 1 + cls % 4, 1 + (cls // 4)
        phase = cls * 0.7
        p = np.sin(2 * np.pi * fx * xx / w + phase) * np.cos(
            2 * np.pi * fy * yy / h - phase
        )
        protos.append(np.repeat(p[..., None], c, axis=-1))
    protos = np.stack(protos)  # (classes, h, w, c)

    def make(n, salt):
        r = np.random.default_rng(seed + salt)
        y = r.integers(0, classes, n).astype(np.int32)
        x = protos[y] + noise * r.standard_normal((n, h, w, c)).astype(np.float32)
        return np.clip(x, -1, 1).astype(np.float32), y

    xt, yt = make(n_train, 1)
    xv, yv = make(n_test, 2)
    return DatasetBundle(xt, yt, xv, yv,
                         {"source": "synthetic", "name": f"synthetic{shape}"})


def load_dataset(name: str) -> DatasetBundle:
    """MNIST | CIFAR-10 | digits | synthetic-mnist | synthetic-cifar.

    Real datasets fall back to synthetic twins when offline (meta['source']
    says which you got — bench reports must quote it)."""
    if name == "digits":
        return _digits()
    if name == "synthetic-mnist":
        return synthetic((28, 28, 1))
    if name == "synthetic-cifar":
        return synthetic((32, 32, 3))
    if name == "SVHN":
        real = _try_svhn()
        if real is not None:
            return real
        ds = synthetic((32, 32, 3))
        ds.meta.update({"fallback_for": "SVHN"})
        return ds
    if name in ("MNIST", "CIFAR-10"):
        real = _try_keras(name)
        if real is not None:
            return real
        shape = (28, 28, 1) if name == "MNIST" else (32, 32, 3)
        ds = synthetic(shape)
        ds.meta.update({"fallback_for": name})
        return ds
    raise ValueError(f"unknown dataset {name!r}")


def _try_svhn():
    """SVHN cropped-digits .mat files (reference: scipy.io on
    train_32x32.mat / test_32x32.mat). Looks in $QNX_DATA_DIR then
    ~/.keras/datasets; labels 10 -> 0 per SVHN convention."""
    import os

    for base in (os.environ.get("QNX_DATA_DIR"),
                 os.path.expanduser("~/.keras/datasets")):
        if not base:
            continue
        tr = os.path.join(base, "train_32x32.mat")
        te = os.path.join(base, "test_32x32.mat")
        if os.path.exists(tr) and os.path.exists(te):
            from scipy.io import loadmat

            def rd(path):
                m = loadmat(path)
                x = np.transpose(m["X"], (3, 0, 1, 2))  # HWCN -> NHWC
                y = m["y"].ravel().astype(np.int32) % 10
                return _scale_pm1(x), y

            xt, yt = rd(tr)
            xv, yv = rd(te)
            return DatasetBundle(xt, yt, xv, yv,
                                 {"source": "svhn-mat", "name": "SVHN"})
    return None


def to_pm1_onehot(y: np.ndarray, classes: int = 10) -> np.ndarray:
    """±1 one-hot targets for squared hinge (reference convention)."""
    out = -np.ones((y.shape[0], classes), np.float32)
    out[np.arange(y.shape[0]), y] = 1.0
    return out
