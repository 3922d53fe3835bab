"""Checkpoint / resume (SURVEY.md §5): orbax for training state, the
reference's ``ModelCheckpoint`` HDF5 equivalent.

``save_checkpoint`` / ``load_checkpoint`` persist the full variables pytree
(params + quant metadata + BN stats) plus the config, so a checkpoint alone
is sufficient to resume training or to convert to any inference engine.
Reference HDF5 checkpoints are ingested by :mod:`qnx.convert.keras_h5`
instead — both artifact kinds end at the same conversion pass.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp


def _write_sidecar_atomic(path: str, obj) -> None:
    """tmp-file + os.replace so a crash mid-write never leaves a truncated
    or stale-looking sidecar next to a newer orbax payload (ADVICE r4)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_checkpoint(path: str, variables: dict, cf) -> str:
    """Write an orbax checkpoint + config sidecar; returns the final path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(variables), force=True)
    ckptr.wait_until_finished()
    _write_sidecar_atomic(path + ".config.json", dataclasses.asdict(cf))
    return path


def save_train_state(path: str, state, cf, epochs_done: int,
                     data_fp: dict | None = None,
                     opt_steps: int | None = None) -> str:
    """Persist the FULL training state for exact resume (VERDICT r3 #4):
    variables (params + quant + batch_stats), the optimizer state (flattened
    to a leaf list — optax namedtuple nodes round-trip poorly through
    orbax's schema-less restore), the step counter, and the number of
    completed epochs.  The RNG stream is not stored: ``fit`` derives it
    deterministically from ``cf.seed`` and replays ``epochs_done`` splits,
    so a resumed run is bit-identical to an uninterrupted one.

    Reference counterpart: Keras ``ModelCheckpoint`` + ``load_weights``
    (``[K] Train.py``, SURVEY.md §3.3) — which resumes weights only; qnx
    additionally restores Adam moments, so resume is exact rather than
    optimizer-restarted.

    ``opt_steps`` (optimizer steps per epoch, after drop_remainder) is
    recorded in the sidecar so restore can (a) cross-check the orbax step
    counter against epochs_done — catching a crash that left a newer payload
    next to a stale sidecar — and (b) reject a resume whose batching
    (batch_size unchanged but drop_remainder flipped) would silently shift
    the LR schedule and replayed batches (ADVICE r4)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {
        "variables": jax.device_get(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}),
        "opt_leaves": [jax.device_get(x)
                       for x in jax.tree.leaves(state.opt_state)],
        "step": jax.device_get(state.step),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    _write_sidecar_atomic(path + ".config.json",
                          {"config": dataclasses.asdict(cf),
                           "epochs_done": int(epochs_done),
                           "data_fp": data_fp,
                           "opt_steps": None if opt_steps is None
                           else int(opt_steps)})
    return path


def restore_train_state(path: str, steps_per_epoch: int, cf=None,
                        data_fp: dict | None = None):
    """Load a :func:`save_train_state` checkpoint; returns
    ``(state, cf, epochs_done)`` with the optimizer state re-inflated into a
    fresh ``create_train_state`` skeleton (same treedef by construction).

    ``cf`` is the REQUESTED config for the resuming run: it must equal the
    saved config in every field except ``epochs`` (extending a run is the
    normal resume flow), and it — not the saved config — rebuilds the
    optimizer, so the exponential LR decay re-derives from the NEW epoch
    total exactly as re-running Keras fit with more epochs would.  With
    ``cf=None`` the saved config is used as-is.

    ``data_fp`` (from ``qnx.train.loop.data_fingerprint``) guards against
    silently resuming on different data — a real hazard in this codebase,
    where dataset loading falls back to synthetic twins by design."""
    import orbax.checkpoint as ocp

    from qnx.train.loop import create_train_state
    from qnx.utils.config import Config

    path = os.path.abspath(path)
    with open(path + ".config.json") as f:
        sidecar = json.load(f)
    if "config" not in sidecar:  # a weights-only save_checkpoint sidecar
        raise ValueError(
            f"{path} is a weights-only checkpoint (no train state); "
            "resume requires one written by save_train_state / fit(ckpt_dir=)")
    cf_saved = Config(**sidecar["config"])
    if cf is None:
        cf = cf_saved
    elif cf_saved.replace(epochs=cf.epochs) != cf:
        raise ValueError(
            "checkpoint config differs from the requested config:\n"
            f"  saved:     {cf_saved}\n  requested: {cf}")
    saved_fp = sidecar.get("data_fp")
    if data_fp is not None and saved_fp is not None:
        # compare on the keys both versions carry, so a v1 (sums-only)
        # checkpoint still loads against a v2 (sums + strided sha) run
        keys = (set(saved_fp) & set(data_fp)) - {"v"}
        if any(saved_fp[k] != data_fp[k] for k in keys):
            raise ValueError(
                "checkpoint was trained on DIFFERENT data than this run "
                f"(saved fingerprint {saved_fp}, current {data_fp}) — "
                "resuming would silently mix datasets (e.g. a synthetic "
                "fallback after real files went missing). Fix the data "
                "path or start fresh.")
    saved_opt_steps = sidecar.get("opt_steps")
    if saved_opt_steps is not None and saved_opt_steps != steps_per_epoch:
        raise ValueError(
            f"checkpoint was trained at {saved_opt_steps} optimizer steps "
            f"per epoch but this run derives {steps_per_epoch} — same "
            "config but different batching (drop_remainder flipped, or "
            "different data size) would silently shift the LR schedule "
            "and the replayed batches (ADVICE r4)")
    state = create_train_state(cf, jax.random.PRNGKey(cf.seed),
                               steps_per_epoch)
    # the fresh state gives orbax the exact target topology (same treedef
    # by construction), so restore is schema-checked rather than guessed
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
        {"variables": {"params": state.params, "quant": state.quant,
                       "batch_stats": state.batch_stats},
         "opt_leaves": list(jax.tree.leaves(state.opt_state)),
         "step": state.step})
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, target)
    treedef = jax.tree.structure(state.opt_state)
    opt_state = jax.tree.unflatten(treedef, payload["opt_leaves"])
    v = payload["variables"]
    state = state.replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=v["params"], quant=v.get("quant", {}),
        batch_stats=v.get("batch_stats", {}), opt_state=opt_state)
    epochs_done = int(sidecar["epochs_done"])
    if saved_opt_steps is not None:
        # fit() checkpoints only at epoch boundaries, so the payload's step
        # counter must equal epochs_done * opt_steps; a mismatch means the
        # sidecar is STALE relative to the payload (crash between the orbax
        # commit and the sidecar replace) — resuming would silently re-train
        # already-consumed epochs with an already-advanced state (ADVICE r4)
        if int(payload["step"]) != epochs_done * saved_opt_steps:
            raise ValueError(
                f"checkpoint is internally inconsistent: payload step "
                f"{int(payload['step'])} != epochs_done {epochs_done} * "
                f"opt_steps {saved_opt_steps} — the sidecar is stale "
                "relative to the orbax payload (likely a crash between the "
                "two writes); delete the checkpoint and restart from the "
                "last good one")
    return state, cf_saved, epochs_done


def load_checkpoint(path: str):
    """Returns (variables, cf). Restores on the current default device."""
    import orbax.checkpoint as ocp

    from qnx.utils.config import Config

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(path)
    with open(path + ".config.json") as f:
        cf = Config(**json.load(f))
    return variables, cf
