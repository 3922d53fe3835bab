"""Structured JSONL metrics (SURVEY.md §5 observability): images/s, step
time, accuracy, collective time — one JSON object per line, greppable and
machine-readable.  The reference has only Keras progress bars."""
from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    """Append-only JSONL logger with wall-clock stamps."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        self._t0 = time.time()

    def log(self, **fields):
        rec = {"t": round(time.time() - self._t0, 3), **_jsonable(fields)}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        return rec

    def close(self):
        if self._f:
            self._f.close()


def _jsonable(obj):
    """Best-effort conversion of jax/numpy scalars and nested containers."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    if hasattr(obj, "tolist"):
        return obj.tolist()
    return obj
