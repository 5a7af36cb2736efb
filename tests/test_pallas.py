"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.graph.solvers import ga_gm
from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn
from ttdg_mgm_tpu.ops.pallas.gagm_pallas import ga_gm_fused
from ttdg_mgm_tpu.ops.pallas.sinkhorn_pallas import sinkhorn_pallas


class TestSinkhornPallas:
    def test_parity_plain(self):
        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.randn(3, 12, 8).astype(np.float32))
        a = sinkhorn(s, tau=0.1, max_iter=20)
        b = sinkhorn_pallas(s, tau=0.1, max_iter=20, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_gagm_fused_parity_structured(self):
        """Fused kernel == XLA solver on a well-separated matching problem
        (on random near-tie data, discrete rounding may legitimately diverge
        by tie-breaking)."""
        rng = np.random.RandomState(0)
        G, n, univ = 3, 5, 8
        perms = [rng.permutation(n) for _ in range(G)]
        Ugt = np.zeros((G, n, univ))
        for g in range(G):
            for i in range(n):
                Ugt[g, i, perms[g][i]] = 1
        T = G * n
        W = np.zeros((T, T), np.float32)
        for i in range(G):
            for j in range(G):
                W[i*n:(i+1)*n, j*n:(j+1)*n] = Ugt[i] @ Ugt[j].T + 0.05 * rng.rand(n, n)
        ms = jnp.full((G,), n, jnp.int32)
        A = jnp.zeros((T, T), jnp.float32)
        U0 = jnp.asarray(Ugt.reshape(T, univ) + 0.3 * rng.rand(T, univ))
        r = np.asarray(ga_gm(A, jnp.asarray(W), U0, ms, univ, quad_weight=0.5))
        f = np.asarray(ga_gm_fused(A, jnp.asarray(W), U0, ms, univ,
                                   quad_weight=0.5, interpret=True))
        np.testing.assert_allclose(r, f, atol=1e-5)

    def test_gagm_fused_exact_lap_finale_structured(self):
        """The in-kernel exact-LAP finale (production path since round 4)
        == the pure-XLA ga_gm with its JV-LAP terminal round, on a
        well-separated problem — forward orientation (nodes < universe)."""
        rng = np.random.RandomState(0)
        G, n, univ = 3, 5, 8
        perms = [rng.permutation(n) for _ in range(G)]
        Ugt = np.zeros((G, n, univ))
        for g in range(G):
            for i in range(n):
                Ugt[g, i, perms[g][i]] = 1
        T = G * n
        W = np.zeros((T, T), np.float32)
        for i in range(G):
            for j in range(G):
                W[i*n:(i+1)*n, j*n:(j+1)*n] = Ugt[i] @ Ugt[j].T + 0.05 * rng.rand(n, n)
        ms = jnp.full((G,), n, jnp.int32)
        A = jnp.zeros((T, T), jnp.float32)
        U0 = jnp.asarray(Ugt.reshape(T, univ) + 0.3 * rng.rand(T, univ))
        r = np.asarray(ga_gm(A, jnp.asarray(W), U0, ms, univ, quad_weight=0.5))
        f = np.asarray(ga_gm_fused(A, jnp.asarray(W), U0, ms, univ,
                                   quad_weight=0.5, interpret=True,
                                   final_hungarian=False,
                                   exact_lap_finale=True))
        np.testing.assert_allclose(r, f, atol=1e-5)
        np.testing.assert_allclose(f, Ugt.reshape(T, univ), atol=1e-5)

    def test_gagm_fused_exact_lap_finale_transposed(self):
        """Same, transposed orientation (nodes > universe slots, the
        flagship TTA shape) with ragged ms: the kernel's dummy-column
        rectangular LAP must agree with the XLA JV's transposed solve."""
        rng = np.random.RandomState(2)
        G, n, univ = 3, 10, 8
        perms = [rng.permutation(univ) for _ in range(G)]
        # 8 planted rows per graph; rows 8..9 carry weak noise only
        Ugt = np.zeros((G, n, univ))
        for g in range(G):
            for i in range(univ):
                Ugt[g, i, perms[g][i]] = 1
        T = G * n
        W = np.zeros((T, T), np.float32)
        for i in range(G):
            for j in range(G):
                W[i*n:(i+1)*n, j*n:(j+1)*n] = Ugt[i] @ Ugt[j].T + 0.02 * rng.rand(n, n)
        ms = jnp.asarray([n, n - 1, n], jnp.int32)
        A = jnp.zeros((T, T), jnp.float32)
        U0 = jnp.asarray(Ugt.reshape(T, univ) + 0.2 * rng.rand(T, univ))
        r = np.asarray(ga_gm(A, jnp.asarray(W), U0, ms, univ, quad_weight=0.5))
        f = np.asarray(ga_gm_fused(A, jnp.asarray(W), U0, ms, univ,
                                   quad_weight=0.5, interpret=True,
                                   final_hungarian=False,
                                   exact_lap_finale=True))
        np.testing.assert_allclose(r, f, atol=1e-5)

    def test_gagm_fused_lap_finale_one_iteration_same_input(self):
        """ONE finale iteration from an identical continuous state: the
        in-kernel power step + JV-LAP == the XLA final_hungarian_round.
        Isolates the finale from annealed-round numeric drift."""
        from ttdg_mgm_tpu.graph.solvers import final_hungarian_round

        rng = np.random.RandomState(3)
        G, n, univ = 4, 12, 6
        T = G * n
        W = jnp.asarray(rng.rand(T, T).astype(np.float32))
        A = jnp.asarray(rng.rand(T, T).astype(np.float32) * 0.1)
        U0 = jnp.asarray(rng.rand(T, univ).astype(np.float32))
        ms = jnp.asarray([n - (g % 2) for g in range(G)], jnp.int32)
        kw = dict(quad_weight=0.5, mgm_iter=1, sk_tau0=0.1, sk_gamma=0.5,
                  min_tau=0.2)
        f_cont = ga_gm_fused(A, W, U0, ms, univ, interpret=True,
                             final_hungarian=False, **kw)
        f_lap = ga_gm_fused(A, W, U0, ms, univ, interpret=True,
                            final_hungarian=False, exact_lap_finale=True,
                            lap_iter_cap=1, **kw)
        r_lap = final_hungarian_round(A, W, f_cont, ms, univ,
                                      quad_weight=0.5, mgm_iter=1)
        np.testing.assert_allclose(np.asarray(r_lap), np.asarray(f_lap),
                                   atol=1e-6)

    def test_gagm_fused_continuous_exact(self):
        """Single continuous (pre-discretization) iteration is bit-exact,
        including the transposed (nodes > universe) orientation and ragged
        ms.  The production composition (fused continuous rounds + exact
        JV-LAP terminal round, graph/mgm.py) must match the pure-XLA solver
        end to end."""
        from ttdg_mgm_tpu.graph.solvers import final_hungarian_round

        rng = np.random.RandomState(1)
        G, n, univ = 4, 12, 6
        T = G * n
        W = jnp.asarray(rng.rand(T, T).astype(np.float32))
        A = jnp.asarray(rng.rand(T, T).astype(np.float32) * 0.1)
        U0 = jnp.asarray(rng.rand(T, univ).astype(np.float32))
        ms = jnp.asarray([n - (g % 2) for g in range(G)], jnp.int32)
        kw = dict(quad_weight=0.5, mgm_iter=1, sk_tau0=0.1, sk_gamma=0.5,
                  min_tau=0.2)
        # continuous rounds: fused VMEM kernel vs pure-XLA, no discretization
        # (comparing post-LAP 0/1 matrices on random data is chaotic — any
        # sub-1e-6 numeric difference flips tie assignments)
        r_cont = np.asarray(ga_gm(A, W, U0, ms, univ, final_hungarian=False,
                                  **kw))
        f_cont = ga_gm_fused(A, W, U0, ms, univ, interpret=True,
                             final_hungarian=False, **kw)
        np.testing.assert_allclose(r_cont, np.asarray(f_cont), atol=1e-4)
        # production composition: continuous rounds + terminal exact-LAP
        # round equals the monolithic solver when fed the same continuous
        # state
        r = np.asarray(ga_gm(A, W, U0, ms, univ, **kw))
        f = np.asarray(final_hungarian_round(A, W, jnp.asarray(r_cont), ms,
                                             univ, quad_weight=0.5,
                                             tau=0.05))
        np.testing.assert_allclose(r, f, atol=1e-6)

    def test_parity_dummy_rows_and_masks(self):
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.randn(4, 16, 16).astype(np.float32))
        nrows = jnp.asarray([4, 9, 16, 2])
        ncols = jnp.asarray([10, 12, 16, 8])
        a = sinkhorn(s, nrows, ncols, tau=0.05, max_iter=20, dummy_row=True)
        b = sinkhorn_pallas(s, nrows, ncols, tau=0.05, max_iter=20,
                            dummy_row=True, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestWindowedRoiPool:
    """Windowed-DMA pooler (interpret mode) vs the XLA gather pooler."""

    def _feats(self, rng, B, sizes, C=32, dtype=np.float32):
        return [jnp.asarray(rng.randn(B, h, w, C).astype(dtype))
                for h, w in sizes]

    def test_parity_random(self):
        from ttdg_mgm_tpu.ops.pallas.roi_pool_pallas import (
            multilevel_roi_align_windowed)
        from ttdg_mgm_tpu.ops.roi_align import multilevel_roi_align

        rng = np.random.RandomState(0)
        B, K, C = 2, 12, 32
        sizes = [(64, 64), (32, 32), (16, 16), (8, 8)]
        feats = self._feats(rng, B, sizes, C)
        # compact boxes across scales, incl. near-border
        wh = rng.uniform(8, 120, (B, K, 2)).astype(np.float32)
        xy = rng.uniform(-4, 250, (B, K, 2)).astype(np.float32)
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_windowed(
            feats, rois, output_size=7, interpret=True)
        want = jax.vmap(lambda fs, b: multilevel_roi_align(
            fs, b, output_size=7, pack_corners=False))(feats, rois)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    def test_misfit_fallback_elongated(self):
        """Aspect-extreme ROIs exceed the 32-wide window; the budgeted
        gather fallback must keep them exact."""
        from ttdg_mgm_tpu.ops.pallas.roi_pool_pallas import (
            multilevel_roi_align_windowed)
        from ttdg_mgm_tpu.ops.roi_align import multilevel_roi_align

        rng = np.random.RandomState(1)
        B, K, C = 1, 8, 32
        sizes = [(64, 64), (32, 32), (16, 16), (8, 8)]
        feats = self._feats(rng, B, sizes, C)
        rois = np.array([[[2, 3, 250, 18],      # 248x15 -> p2, 62-wide window
                          [5, 10, 20, 200],     # tall    -> misfit in y
                          [0, 0, 40, 40],
                          [100, 100, 140, 150],
                          [1, 1, 230, 20],
                          [30, 2, 60, 30],
                          [8, 8, 9, 9],
                          [0, 0, 255, 255]]], np.float32)
        rois = jnp.asarray(rois)
        got = multilevel_roi_align_windowed(
            feats, rois, output_size=7, misfit_budget=4, interpret=True)
        want = jax.vmap(lambda fs, b: multilevel_roi_align(
            fs, b, output_size=7, pack_corners=False))(feats, rois)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    def test_train_pool_forward_and_grad_parity(self):
        """Differentiable windowed train pooler: forward AND feature
        gradients match the XLA gather pooler's autodiff (the backward is a
        hand-written windowed scatter-accumulate kernel)."""
        from ttdg_mgm_tpu.ops.pallas.roi_pool_pallas import (
            multilevel_roi_align_windowed_train)
        from ttdg_mgm_tpu.ops.roi_align import multilevel_roi_align

        rng = np.random.RandomState(3)
        B, K, C = 2, 10, 32
        sizes = [(64, 64), (32, 32), (16, 16), (8, 8)]
        feats = self._feats(rng, B, sizes, C)
        wh = rng.uniform(8, 110, (B, K, 2)).astype(np.float32)
        xy = rng.uniform(0, 140, (B, K, 2)).astype(np.float32)
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        cot = jnp.asarray(rng.randn(B, K, 7, 7, C).astype(np.float32))

        def loss_win(fs):
            out = multilevel_roi_align_windowed_train(
                fs, rois, output_size=7, interpret=True)
            return jnp.sum(out * cot)

        def loss_ref(fs):
            out = jax.vmap(lambda f, b: multilevel_roi_align(
                f, b, output_size=7, pack_corners=False))(fs, rois)
            return jnp.sum(out * cot)

        lw, gw = jax.value_and_grad(loss_win)(feats)
        lr, gr = jax.value_and_grad(loss_ref)(feats)
        np.testing.assert_allclose(float(lw), float(lr), rtol=1e-4)
        for a, b in zip(gw, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3)

    def test_train_pool_grad_with_misfits(self):
        """Cotangent of misfit ROIs must flow through the exact gather
        fallback (windowed cotangent zeroed at overwritten positions)."""
        from ttdg_mgm_tpu.ops.pallas.roi_pool_pallas import (
            multilevel_roi_align_windowed_train)
        from ttdg_mgm_tpu.ops.roi_align import multilevel_roi_align

        rng = np.random.RandomState(4)
        B, K, C = 1, 5, 32
        sizes = [(64, 64), (32, 32), (16, 16), (8, 8)]
        feats = self._feats(rng, B, sizes, C)
        rois = jnp.asarray(np.array([[[2, 3, 250, 18],   # elongated misfit
                                      [5, 10, 20, 200],  # tall misfit
                                      [0, 0, 40, 40],
                                      [100, 100, 140, 150],
                                      [8, 8, 24, 24]]], np.float32))
        cot = jnp.asarray(rng.randn(B, K, 7, 7, C).astype(np.float32))

        def loss_win(fs):
            out = multilevel_roi_align_windowed_train(
                fs, rois, output_size=7, misfit_budget=3, interpret=True)
            return jnp.sum(out * cot)

        def loss_ref(fs):
            out = jax.vmap(lambda f, b: multilevel_roi_align(
                f, b, output_size=7, pack_corners=False))(fs, rois)
            return jnp.sum(out * cot)

        lw, gw = jax.value_and_grad(loss_win)(feats)
        lr, gr = jax.value_and_grad(loss_ref)(feats)
        np.testing.assert_allclose(float(lw), float(lr), rtol=1e-4)
        for a, b in zip(gw, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3)

    def test_mask_pool_14(self):
        from ttdg_mgm_tpu.ops.pallas.roi_pool_pallas import (
            multilevel_roi_align_windowed)
        from ttdg_mgm_tpu.ops.roi_align import multilevel_roi_align

        rng = np.random.RandomState(2)
        B, K, C = 1, 6, 32
        sizes = [(48, 64), (24, 32), (12, 16), (8, 8)]
        feats = self._feats(rng, B, sizes, C)
        wh = rng.uniform(6, 90, (B, K, 2)).astype(np.float32)
        xy = rng.uniform(0, 150, (B, K, 2)).astype(np.float32)
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        got = multilevel_roi_align_windowed(
            feats, rois, output_size=14, interpret=True)
        want = jax.vmap(lambda fs, b: multilevel_roi_align(
            fs, b, output_size=14, pack_corners=False))(feats, rois)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
