"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn
from ttdg_mgm_tpu.ops.pallas.sinkhorn_pallas import sinkhorn_pallas


class TestSinkhornPallas:
    def test_parity_plain(self):
        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.randn(3, 12, 8).astype(np.float32))
        a = sinkhorn(s, tau=0.1, max_iter=20)
        b = sinkhorn_pallas(s, tau=0.1, max_iter=20, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_parity_dummy_rows_and_masks(self):
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.randn(4, 16, 16).astype(np.float32))
        nrows = jnp.asarray([4, 9, 16, 2])
        ncols = jnp.asarray([10, 12, 16, 8])
        a = sinkhorn(s, nrows, ncols, tau=0.05, max_iter=20, dummy_row=True)
        b = sinkhorn_pallas(s, nrows, ncols, tau=0.05, max_iter=20,
                            dummy_row=True, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
