"""Golden tests for the masked log-domain Sinkhorn against a NumPy
re-implementation of pygmtools' semantics (reference utils/sinkhorn.py:87)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn, sinkhorn_auto


def np_sinkhorn_log(s, nrows=None, ncols=None, dummy_row=False, max_iter=10, tau=1.0):
    """NumPy port of pygmtools' log-space sinkhorn (pytorch backend semantics)."""
    s = np.array(s, dtype=np.float64)
    b, n1, n2 = s.shape
    nrows = np.full(b, n1) if nrows is None else np.asarray(nrows)
    ncols = np.full(b, n2) if ncols is None else np.asarray(ncols)

    log_s = s / tau
    out = np.zeros_like(s)
    for i in range(b):
        r, c = int(nrows[i]), int(ncols[i])
        m = log_s[i, :r, :c]
        if dummy_row and r < c:
            m = np.concatenate([m, np.full((c - r, c), -100.0)], axis=0)
        for it in range(max_iter):
            if it % 2 == 0:
                m = m - logsumexp(m, axis=1, keepdims=True)
            else:
                m = m - logsumexp(m, axis=0, keepdims=True)
        m = np.exp(m)
        out[i, :r, :c] = m[:r, :c]
    return out


def logsumexp(x, axis, keepdims):
    mx = np.max(x, axis=axis, keepdims=True)
    r = mx + np.log(np.sum(np.exp(x - mx), axis=axis, keepdims=True))
    return r if keepdims else np.squeeze(r, axis)


@pytest.mark.parametrize("tau,iters", [(1.0, 10), (0.05, 20), (0.005, 21)])
def test_sinkhorn_square_full(tau, iters):
    rng = np.random.RandomState(0)
    s = rng.randn(3, 8, 8).astype(np.float32)
    ref = np_sinkhorn_log(s, max_iter=iters, tau=tau)
    got = np.array(sinkhorn(jnp.asarray(s), tau=tau, max_iter=iters))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_sinkhorn_masked_rect_dummy_row():
    rng = np.random.RandomState(1)
    s = rng.randn(4, 10, 10).astype(np.float32)
    nrows = np.array([3, 5, 10, 7])
    ncols = np.array([6, 5, 10, 9])
    ref = np_sinkhorn_log(s, nrows, ncols, dummy_row=True, max_iter=20, tau=0.05)
    got = np.array(sinkhorn(jnp.asarray(s), nrows, ncols, tau=0.05, max_iter=20, dummy_row=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # invalid region must be exactly zero
    assert got[0, 3:, :].sum() == 0 and got[0, :, 6:].sum() == 0


def test_sinkhorn_doubly_stochastic():
    rng = np.random.RandomState(2)
    s = rng.randn(2, 6, 6).astype(np.float32)
    # odd iter count ends on a row normalization -> rows exactly 1, cols approx
    got = np.array(sinkhorn(jnp.asarray(s), tau=0.1, max_iter=101))
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(got.sum(-2), 1.0, atol=0.05)


def test_sinkhorn_auto_orientation():
    rng = np.random.RandomState(3)
    s = rng.randn(2, 8, 8).astype(np.float32)
    nrows = np.array([6, 4])
    ncols = np.array([4, 6])
    got = np.array(sinkhorn_auto(jnp.asarray(s), nrows, ncols, tau=0.05, max_iter=20))
    # instance 0 has rows>cols: reference transposes, solves, transposes back
    ref0 = np_sinkhorn_log(
        np.swapaxes(s[:1], 1, 2), ncols[:1], nrows[:1], dummy_row=True, max_iter=20, tau=0.05
    )
    np.testing.assert_allclose(got[0], np.swapaxes(ref0, 1, 2)[0], atol=1e-4)
    ref1 = np_sinkhorn_log(s[1:], nrows[1:], ncols[1:], dummy_row=True, max_iter=20, tau=0.05)
    np.testing.assert_allclose(got[1], ref1[0], atol=1e-4)


def test_sinkhorn_gradient_flows():
    import jax

    s = jnp.asarray(np.random.RandomState(4).randn(1, 5, 5).astype(np.float32))

    def f(x):
        return sinkhorn(x, tau=0.1, max_iter=10).sum() ** 2

    g = jax.grad(f)(s)
    assert np.isfinite(np.array(g)).all()
