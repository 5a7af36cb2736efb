"""On-device Hungarian vs scipy linear_sum_assignment (reference
utils/hungarian.py semantics: maximization, masked valid region)."""

import numpy as np
import jax.numpy as jnp

from ttdg_mgm_tpu.ops.lap import hungarian, hungarian_scipy


def _score(s, perm):
    return (s * perm).sum(axis=(-2, -1))


def test_square_random():
    rng = np.random.RandomState(0)
    s = rng.randn(16, 12, 12).astype(np.float32)
    got = np.array(hungarian(jnp.asarray(s)))
    ref = hungarian_scipy(s)
    # optimal assignment value must match (ties may permute assignments)
    np.testing.assert_allclose(_score(s, got), _score(s, ref), rtol=1e-5)
    assert (got.sum(-1) == 1).all() and (got.sum(-2) == 1).all()


def test_rectangular_masked():
    rng = np.random.RandomState(1)
    s = rng.randn(8, 10, 16).astype(np.float32)
    n1 = rng.randint(1, 11, size=8)
    n2 = np.minimum(16, n1 + rng.randint(0, 6, size=8))
    got = np.array(hungarian(jnp.asarray(s), jnp.asarray(n1), jnp.asarray(n2)))
    ref = hungarian_scipy(s, n1, n2)
    np.testing.assert_allclose(_score(s, got), _score(s, ref), rtol=1e-5, atol=1e-5)
    for b in range(8):
        assert got[b, n1[b] :, :].sum() == 0
        assert got[b, :, n2[b] :].sum() == 0
        assert got[b].sum() == n1[b]


def test_integer_costs_exact_assignment():
    rng = np.random.RandomState(2)
    s = rng.randint(0, 50, size=(4, 9, 9)).astype(np.float32)
    got = np.array(hungarian(jnp.asarray(s)))
    ref = hungarian_scipy(s)
    np.testing.assert_allclose(_score(s, got), _score(s, ref))


def test_large_batch_universe_shape():
    # the GA-GM projection shape: (G, MAX_NODES, UNIV) with n1<=32
    rng = np.random.RandomState(3)
    s = rng.randn(6, 64, 32).astype(np.float32)
    n1 = np.array([5, 17, 32, 1, 30, 12])
    got = np.array(hungarian(jnp.asarray(s), jnp.asarray(n1)))
    ref = hungarian_scipy(s, n1, [32] * 6)
    np.testing.assert_allclose(_score(s, got), _score(s, ref), rtol=1e-5)
