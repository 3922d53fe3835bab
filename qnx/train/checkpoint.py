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


def save_checkpoint(path: str, variables: dict, cf) -> str:
    """Write an orbax checkpoint + config sidecar; returns the final path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(variables), force=True)
    ckptr.wait_until_finished()
    with open(path + ".config.json", "w") as f:
        json.dump(dataclasses.asdict(cf), f, indent=1)
    return path


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
