"""Spectral clustering on device.

Capability of reference
``adapteacher/modeling/GModule/utils/spectral_clustering.py:6-236``: graph
Laplacian (optionally degree-normalized) -> eigendecomposition -> k-means on
the ``cluster_num - 1`` smallest non-trivial eigenvectors, with the 2-cluster
sign shortcut.  TPU-first: ``jnp.linalg.eigh`` replaces ``torch.symeig``
(the matrices are num_graphs x num_graphs — tiny), and k-means is a
fixed-iteration ``lax.scan`` instead of a Python ``while`` loop.

Only exercised when ``num_clusters > 1`` (MGM-Mixture mode); the flagship TTA
path runs with a single cluster (reference ``multi_graph_matching.py:533``
passes the default ``num_clusters=1``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kmeans(x, k, key, iters: int = 50):
    """k-means++-lite: farthest-point init then Lloyd iterations via scan."""
    n = x.shape[0]
    # init: first center = argmax norm (deterministic), then farthest-point
    first = jnp.argmax(jnp.sum(jnp.square(x), axis=-1))
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def add_center(i, centers):
        d = jnp.min(
            jnp.sum(jnp.square(x[:, None, :] - centers[None, :, :]), axis=-1)
            + jnp.where(jnp.arange(k) >= i, 1e30, 0.0)[None, :],
            axis=1,
        )
        nxt = jnp.argmax(d)
        return centers.at[i].set(x[nxt])

    centers = jax.lax.fori_loop(1, k, add_center, centers0)

    def lloyd(centers, _):
        d = jnp.sum(jnp.square(x[:, None, :] - centers[None, :, :]), axis=-1)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
        new_centers = (onehot.T @ x) / counts[:, None]
        return new_centers, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=iters)
    d = jnp.sum(jnp.square(x[:, None, :] - centers[None, :, :]), axis=-1)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cluster_num", "normalized"))
def spectral_clustering(sim_matrix, cluster_num: int, *, normalized: bool = False, key=None):
    """Cluster assignment (n,) int32 from an (n, n) similarity matrix."""
    sim_matrix = sim_matrix.astype(jnp.float32)
    deg = jnp.sum(sim_matrix, axis=-1)
    lap = jnp.diag(deg) - sim_matrix
    if normalized:
        lap = lap / jnp.maximum(deg, 1e-12)[:, None]
        # non-symmetric random-walk Laplacian; eigh on symmetrized part matches
        # the reference's symeig-on-nonsymmetric quirk closely for these inputs
        lap = 0.5 * (lap + lap.T)
    e, v = jnp.linalg.eigh(lap)
    order = jnp.argsort(jnp.abs(e))
    take = order[1:cluster_num]
    feats = v[:, take]
    if cluster_num == 2:
        return (feats[:, 0] > 0).astype(jnp.int32)
    if key is None:
        key = jax.random.PRNGKey(0)
    return _kmeans(feats, cluster_num, key)
