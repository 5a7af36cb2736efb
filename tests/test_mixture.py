"""MGM-Mixture (multi-cluster GA-GM) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.graph.mgm import MGM3Unsup
from ttdg_mgm_tpu.graph.solvers import _cluster_affinity, ga_gm_mixture


def two_cluster_problem(n=4, univ=8, seed=0):
    """2 groups of 3 graphs; within-group graphs share identities, across
    groups the pairwise similarities are near zero."""
    rng = np.random.RandomState(seed)
    G, M = 6, n
    T = G * M
    Ugt = np.zeros((G, M, univ))
    for g in range(G):
        ids = rng.permutation(univ)[:n] if g < 3 else rng.permutation(univ)[:n]
        # group A uses identities 0..n-1, group B uses n..2n-1 (disjoint)
        base = 0 if g < 3 else n
        perm = rng.permutation(n)
        for i in range(n):
            Ugt[g, i, base + perm[i]] = 1
    W = np.zeros((T, T), np.float32)
    for i in range(G):
        for j in range(G):
            same = (i < 3) == (j < 3)
            blk = (Ugt[i] @ Ugt[j].T) if same else np.zeros((M, M))
            W[i * M:(i + 1) * M, j * M:(j + 1) * M] = blk + 0.01 * rng.rand(M, M)
    ms = jnp.full((G,), n, jnp.int32)
    return jnp.asarray(W), Ugt, ms


class TestMixture:
    def test_clusters_recovered(self):
        W, Ugt, ms = two_cluster_problem()
        G, M, univ = Ugt.shape
        T = G * M
        A = jnp.zeros((T, T), jnp.float32)
        U0 = jnp.asarray(Ugt.reshape(T, univ) + 0.2)
        U, clusters = ga_gm_mixture(A, W, U0, ms, univ, 2, quad_weight=0.5)
        c = np.asarray(clusters)
        # graphs 0-2 in one cluster, 3-5 in the other
        assert len(set(c[:3])) == 1 and len(set(c[3:])) == 1
        assert c[0] != c[3]
        assert np.isfinite(np.asarray(U)).all()

    def test_cluster_affinity_shape(self):
        W, Ugt, ms = two_cluster_problem(seed=1)
        G, M, univ = Ugt.shape
        T = G * M
        A = jnp.zeros((T, T), jnp.float32)
        alpha = _cluster_affinity(A, W, jnp.asarray(Ugt.reshape(T, univ)), ms, G, M)
        a = np.asarray(alpha)
        assert a.shape == (G, G)
        assert np.allclose(np.diag(a), 0.0)
        # within-group affinity dominates cross-group
        assert a[0, 1] > a[0, 4]

    def test_mgm3_with_clusters_smoke(self):
        key = jax.random.PRNGKey(0)
        G, M, D, C, univ = 4, 6, 16, 2, 6
        nodes = jax.random.normal(key, (G, M, D))
        mask = jnp.ones((G, M), bool)
        labels = jnp.where(mask, (jnp.arange(M)[None] % C) + 1, 0)
        U = jax.random.normal(jax.random.PRNGKey(1), (univ, D))
        mod = MGM3Unsup(num_classes=C, univ_size=univ, dim=D, num_clusters=2)
        params = mod.init(key, nodes, labels, mask, U)
        loss = mod.apply(params, nodes, labels, mask, U)
        assert np.isfinite(float(loss))
