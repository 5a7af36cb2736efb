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
    """Replicate a pytree across the mesh.

    Multi-process (multi-host) meshes contain devices this process cannot
    address, so ``device_put`` is illegal there; every process holds the SAME
    host values (deterministic init/checkpoint load), and
    ``make_array_from_process_local_data`` assembles the global replicated
    array from them.
    """
    s = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree,
        )
    return jax.device_put(tree, s)


def shard_batch(mesh: Mesh, batch):
    """Shard every leaf's leading (batch) axis over the ``data`` axis.

    Every caller passes the GLOBAL batch (the loaders are seed-deterministic,
    so all processes hold identical host copies — the reference's shared-seed
    d2 sampler with per-rank splitting, ``data/build.py:241-255``).  In a
    multi-process mesh each process's shards are derived from the SHARDING
    (``make_array_from_callback`` hands each addressable device its own index
    into the global host copy), so meshes over device subsets or uneven
    process->device layouts stay correct; single-process meshes take the
    plain device_put path.
    """
    s = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

        return jax.tree.map(put, batch)
    return jax.device_put(batch, s)


def global_like(params, tree):
    """Route host inputs onto the mesh the ``params`` live on, replicated.

    In multi-process runs the train/eval state is a GLOBAL array (its mesh
    spans devices of every process); jit of ``f(params, plain_jnp_input)``
    then fails with 'incompatible devices'.  Inputs are identical on all
    processes (deterministic loaders), so replication is safe.  No-op in
    single-process mode."""
    if jax.process_count() == 1:
        return jax.tree.map(jax.numpy.asarray, tree)
    leaves = jax.tree.leaves(params)
    sh = getattr(leaves[0], "sharding", None) if leaves else None
    if not isinstance(sh, NamedSharding):
        return jax.tree.map(jax.numpy.asarray, tree)
    rs = NamedSharding(sh.mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rs, lambda idx: x[idx])

    return jax.tree.map(put, tree)
