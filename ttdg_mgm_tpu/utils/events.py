"""Event storage + writers (observability).

Capability of d2's ``EventStorage``/writers as used by the reference
(SURVEY.md section 5.5): a scalar store scoped to the train loop, a terminal
writer, a JSON-lines writer (``metrics.json``) and optional TensorBoard via
``tf.summary`` when TensorFlow is importable.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict


class EventStorage:
    _current = None

    def __init__(self, start_iter: int = 0):
        self.iter = start_iter
        self._history = defaultdict(list)
        self._latest = {}

    def put_scalar(self, name: str, value):
        value = float(value)
        self._history[name].append((self.iter, value))
        self._latest[name] = value

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def latest(self) -> dict:
        return dict(self._latest)

    def history(self, name: str):
        return list(self._history[name])

    def step(self):
        self.iter += 1

    def __enter__(self):
        EventStorage._current = self
        return self

    def __exit__(self, *a):
        EventStorage._current = None

    @classmethod
    def current(cls) -> "EventStorage | None":
        return cls._current


class JSONWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, storage: EventStorage):
        rec = {"iteration": storage.iter, **storage.latest(),
               "time": time.time()}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TerminalWriter:
    def __init__(self, logger=None):
        import logging

        self.logger = logger or logging.getLogger("ttdg_mgm_tpu")

    def write(self, storage: EventStorage):
        items = "  ".join(
            f"{k}: {v:.4g}" for k, v in sorted(storage.latest().items())
        )
        self.logger.info("iter %d  %s", storage.iter, items)


class TensorboardWriter:
    def __init__(self, log_dir: str):
        import tensorflow as tf  # baked in; host-side only

        self._w = tf.summary.create_file_writer(log_dir)

    def write(self, storage: EventStorage):
        import tensorflow as tf

        with self._w.as_default():
            for k, v in storage.latest().items():
                tf.summary.scalar(k, v, step=storage.iter)
