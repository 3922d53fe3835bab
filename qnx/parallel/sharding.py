"""Sharding rules: pytree-path → PartitionSpec, for training and serving.

Training (fake-quant): Megatron-style TP via GSPMD — every quantized kernel
is output-channel-sharded over the 'model' axis; per-channel vectors (BN
stats/params, biases, thresholds) follow their channel axis; the batch is
sharded over 'data'.  XLA inserts the all-gathers/reduce-scatters at layer
boundaries (SURVEY.md §7.5: "no hand-rolled comm" at the training level).
Packed-engine SERVING under a >1-way model axis instead runs the explicit
ring-overlapped forward (:mod:`qnx.parallel.tp_forward`, round 5): GSPMD
cannot partition the Pallas popcount custom calls, so the shard_map ring is
what actually splits popcount compute over these shardings.

Serving (packed): packed weight planes (Kw, N) are sharded over their
output-channel axis N, so popcount GEMM shards stay local and one
all-gather per layer boundary rebuilds the activation bits (SURVEY.md
§7.2 Phase E).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _divisible(leaf, axis: int, mesh: Mesh) -> bool:
    m = mesh.shape[MODEL_AXIS]
    shape = getattr(leaf, "shape", ())
    return len(shape) > axis and shape[axis] % m == 0 and shape[axis] >= m


def _spec_for_path(path: tuple, leaf, mesh: Mesh) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    last = names[-1] if names else ""
    ndim = getattr(leaf, "ndim", 0)
    if last == "kernel":
        if ndim == 2 and _divisible(leaf, 1, mesh):  # dense (K, N)
            return P(None, MODEL_AXIS)
        if ndim == 4 and _divisible(leaf, 3, mesh):  # conv HWIO
            return P(None, None, None, MODEL_AXIS)
    if ndim == 1 and last in ("bias", "scale", "mean", "var") and _divisible(
        leaf, 0, mesh
    ):
        return P(MODEL_AXIS)
    return P()


def train_state_shardings(mesh: Mesh, state: Any) -> Any:
    """NamedSharding pytree matching a TrainState (params/batch_stats TP-
    sharded, opt_state mirrors params, scalars replicated). Axes that don't
    divide the model-parallel degree (e.g. the 10-class head) replicate."""

    def assign(path, leaf):
        return NamedSharding(mesh, _spec_for_path(path, leaf, mesh))

    return jax.tree_util.tree_map_with_path(assign, state)


def packed_model_shardings(mesh: Mesh, model: Any) -> Any:
    """NamedSharding pytree for a packed inference model: every (Kw, N)
    plane and per-channel epilogue vector sharded over MODEL_AXIS on its
    channel axis; scalars and non-divisible axes (e.g. 10-class heads)
    replicated.

    Heuristic: 2-D planes shard on axis 1 (output channels); 1-D
    per-channel arrays on axis 0."""

    def assign(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 4 and _divisible(leaf, 3, mesh):  # conv HWIO weights
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        if ndim == 3 and _divisible(leaf, 2, mesh):  # (H, W, N) pad corr
            return NamedSharding(mesh, P(None, None, MODEL_AXIS))
        if ndim == 2 and _divisible(leaf, 1, mesh):  # (Kw|K|L-1, N) planes
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if ndim == 1 and _divisible(leaf, 0, mesh):  # per-channel vectors
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(assign, model)
