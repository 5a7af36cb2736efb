"""Device mesh and sharding helpers (the reference's DDP, TPU-native).

The reference's only parallelism is data-parallel DDP over NCCL
(SURVEY.md section 2.2: d2 ``launch`` + ``DistributedDataParallel``, gradient
all-reduce, ``broadcast_buffers=False``).  The TPU-native equivalent
(SURVEY.md section 5.8) is a 1-axis ``jax.sharding.Mesh`` over all devices:

* the batch is sharded over the ``data`` axis (``shard_batch``),
* params/optimizer/EMA state are replicated (``replicate``) — the
  ``broadcast_buffers=False`` semantics fall out naturally: replicated state
  is only ever updated by the (deterministic) jitted step, never re-broadcast,
* gradient averaging is XLA's job: ``jit`` of a loss over sharded batch +
  replicated params inserts the ``psum`` automatically.

A second ``model`` axis is reserved for tensor-parallel experiments; the
flagship model (~45M params) does not need it (SURVEY.md section 2.2), so all
shardings here keep it size 1 by default.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, *, model_axis: int = 1) -> Mesh:
    """1-D (or 2-D with a model axis) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_axis == 0
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(mesh: Mesh, batch):
    """Shard every leaf's leading (batch) axis over the ``data`` axis."""
    s = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, s)
