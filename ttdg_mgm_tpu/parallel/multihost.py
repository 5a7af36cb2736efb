"""Multi-host (multi-process) initialization and helpers — the reference's
``launch(main, num_gpus, num_machines, machine_rank, dist_url)`` equivalent
(reference ``train_net.py:94-101``; SURVEY.md section 5.8).

The reference spawns one process per GPU and rendezvouses over a TCP
``dist_url``; collectives then run through torch.distributed/NCCL.  The
TPU-native shape is one process per HOST (each owning its local chips),
``jax.distributed.initialize`` for the rendezvous, and a single global
``jax.sharding.Mesh`` spanning every chip of every host — the jitted steps
are unchanged, XLA routes the gradient ``psum`` over ICI within a host and
DCN across hosts.

Host-side metric gathering (the reference's ``comm.gather`` of per-image
Dice lists, ``trainer.py:406,972``) maps to
``multihost_utils.process_allgather`` (re-exported here as
``allgather_metrics``).

CPU testing: ``initialize_multihost(..., cpu_gloo=True)`` enables the gloo
cross-process collective backend so N local processes x M virtual CPU
devices emulate an N-host pod slice (``tests/test_multihost.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize_multihost(dist_url: str | None = None, num_processes: int = 1,
                         process_id: int = 0, *, cpu_gloo: bool = False,
                         local_device_ids=None) -> None:
    """Join the multi-process rendezvous (reference ``launch``/``dist_url``).

    ``dist_url`` accepts the reference's ``tcp://host:port`` form or a bare
    ``host:port``; ``None``/"auto" lets JAX discover the coordinator from the
    TPU pod metadata (the common case on Cloud TPU slices, where every knob
    is auto-detected and this reduces to ``jax.distributed.initialize()``).
    """
    import os

    if cpu_gloo or os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # must be set before the backend initializes; without it, cross-
        # process collectives on CPU fail at dispatch ("none" implementation).
        # Auto-enabled for CPU runs (tests / CI); harmless on TPU pods, where
        # the platform pin means this branch is never taken.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if dist_url not in (None, "auto"):
        kwargs["coordinator_address"] = dist_url.removeprefix("tcp://")
        kwargs["num_processes"] = num_processes
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_batch(mesh, local_batch: dict):
    """Assemble the global data-sharded batch from each process's local shard
    (the reference's per-rank DataLoader split, ``data/build.py:241-255``).

    Every process passes its OWN ``global_batch_size / num_processes`` items;
    the returned arrays are global ``jax.Array``s sharded over the ``data``
    axis, feedable to the unchanged jitted steps.
    """
    s = NamedSharding(mesh, P("data"))
    return {
        k: jax.make_array_from_process_local_data(s, np.asarray(v))
        for k, v in local_batch.items()
    }


def allgather_metrics(tree):
    """Gather host-side metric values from every process (reference
    ``comm.gather``/``all_gather`` of loss dicts and per-image Dice lists).
    Returns stacked arrays with a leading ``process_count`` axis."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
