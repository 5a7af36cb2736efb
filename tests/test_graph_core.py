"""Tests for the graph construction + matching core (attention, affinity,
solvers, universe, MGM).  The key property checked throughout is *padding
invariance*: computing on the same valid data with different physical padding
must give identical results — that is what makes the fixed-shape TPU design
equivalent to the reference's ragged computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttdg_mgm_tpu.graph.attention import MultiHeadAttention
from ttdg_mgm_tpu.graph.affinity import Affinity
from ttdg_mgm_tpu.graph.gcn import MAGNN
from ttdg_mgm_tpu.graph.losses import BCEFocalLoss, permutation_loss
from ttdg_mgm_tpu.graph.solvers import ga_gm, hippi
from ttdg_mgm_tpu.graph.universe import USup
from ttdg_mgm_tpu.graph.mgm import MGM3Unsup
from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn_project, sinkhorn_masked
from ttdg_mgm_tpu.ops.lap import hungarian_auto


def make_nodes(key, G, M, D, ms):
    k1, _ = jax.random.split(key)
    nodes = jax.random.normal(k1, (G, M, D))
    mask = np.zeros((G, M), bool)
    for g, m in enumerate(ms):
        mask[g, :m] = True
    mask = jnp.asarray(mask)
    return jnp.where(mask[..., None], nodes, 0.0), mask


class TestAttention:
    def test_masked_rows_sum_to_one_over_valid(self):
        key = jax.random.PRNGKey(0)
        nodes, mask = make_nodes(key, 2, 8, 16, [5, 8])
        mha = MultiHeadAttention(model_dim=16, num_heads=1)
        params = mha.init(key, nodes, mask)
        out, attn = mha.apply(params, nodes, mask)
        assert out.shape == (2, 8, 16)
        assert attn.shape == (2, 8, 8)
        # valid rows: attention over valid cols sums to 1
        row_sums = attn.sum(-1)
        np.testing.assert_allclose(row_sums[0, :5], 1.0, atol=1e-5)
        # no attention mass on invalid columns
        assert float(jnp.abs(attn[0, :, 5:]).max()) == 0.0
        # invalid output rows are zeroed
        assert float(jnp.abs(out[0, 5:]).max()) == 0.0

    def test_single_head_matches_numpy(self):
        key = jax.random.PRNGKey(1)
        nodes = jax.random.normal(key, (1, 6, 8))
        mask = jnp.ones((1, 6), bool)
        mha = MultiHeadAttention(model_dim=8, num_heads=1)
        params = mha.init(key, nodes, mask)
        out, attn = mha.apply(params, nodes, mask)

        p = jax.tree.map(np.asarray, params)["params"]
        x = np.asarray(nodes)[0]
        q = x @ p["linear_q"]["kernel"] + p["linear_q"]["bias"]
        k = x @ p["linear_k"]["kernel"] + p["linear_k"]["bias"]
        v = x @ p["linear_v"]["kernel"] + p["linear_v"]["bias"]
        logits = q @ k.T * (8 ** -0.5)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        a = e / e.sum(-1, keepdims=True)
        ctx = a @ v
        o = ctx @ p["linear_final"]["kernel"] + p["linear_final"]["bias"]
        resid = x + o
        mu = resid.mean(-1, keepdims=True)
        var = resid.var(-1, keepdims=True)
        ln = (resid - mu) / np.sqrt(var + 1e-6)
        ln = ln * p["layer_norm"]["scale"] + p["layer_norm"]["bias"]
        np.testing.assert_allclose(np.asarray(attn[0]), a, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[0]), ln, atol=1e-4)


class TestAffinity:
    def test_pairwise_equals_concat_mlp(self):
        """The split first layer must equal the reference's concat-MLP."""
        key = jax.random.PRNGKey(2)
        X = jax.random.normal(key, (5, 16))
        Y = jax.random.normal(jax.random.PRNGKey(3), (7, 16))
        aff = Affinity(d=16, hidden=32)
        params = aff.init(key, X, Y)
        M = aff.apply(params, X, Y)
        p = jax.tree.map(np.asarray, params)["params"]
        Xp = np.asarray(X) @ p["project_sr"]["kernel"]
        Yp = np.asarray(Y) @ p["project_tg"]["kernel"]
        W0 = np.concatenate([p["fc0_x"]["kernel"], p["fc0_y"]["kernel"]], axis=0)
        ref = np.zeros((5, 7))
        for i in range(5):
            for j in range(7):
                h = np.concatenate([Xp[i], Yp[j]]) @ W0 + p["fc0_x"]["bias"]
                h = np.maximum(h, 0)
                ref[i, j] = h @ p["fc1"]["kernel"][:, 0] + p["fc1"]["bias"][0]
        np.testing.assert_allclose(np.asarray(M), ref, atol=1e-4)


class TestSinkhornProject:
    def test_row_col_sums(self):
        key = jax.random.PRNGKey(4)
        s = jax.random.normal(key, (3, 10, 6))
        nrows = jnp.array([4, 10, 6])
        ncols = jnp.array([6, 6, 6])
        out = sinkhorn_project(s, nrows, ncols, tau=0.5, max_iter=200)
        out = np.asarray(out)
        # instance 0: 4 rows <= 6 cols: rows sum to 1 (up to iteration residual)
        np.testing.assert_allclose(out[0, :4].sum(-1), 1.0, atol=1e-3)
        assert np.abs(out[0, 4:]).max() == 0.0
        # instance 1: 10 rows > 6 cols: cols sum to 1
        np.testing.assert_allclose(out[1, :, :6].sum(0), 1.0, atol=1e-3)
        # padding zeroed
        assert np.abs(out[2, :, 6:]).max() if out.shape[-1] > 6 else 0.0 == 0.0

    def test_masked_matches_contiguous(self):
        key = jax.random.PRNGKey(5)
        s = jax.random.normal(key, (9, 4))
        row_mask = jnp.arange(9) < 7
        a = sinkhorn_masked(s, row_mask, tau=0.5, max_iter=20)
        b = sinkhorn_masked(s[:7], jnp.ones(7, bool), tau=0.5, max_iter=20)
        np.testing.assert_allclose(np.asarray(a[:7]), np.asarray(b), atol=1e-5)
        assert float(jnp.abs(a[7:]).max()) == 0.0


class TestHungarianAuto:
    def test_transposed_orientation(self):
        rng = np.random.RandomState(0)
        s = rng.randn(7, 4).astype(np.float32)
        out = np.asarray(hungarian_auto(jnp.asarray(s)))
        import scipy.optimize as opt

        r, c = opt.linear_sum_assignment(-s)
        ref = np.zeros_like(s)
        ref[r, c] = 1
        assert out.sum() == 4
        np.testing.assert_allclose(out, ref)


class TestSolvers:
    def _matching_problem(self, G=3, n=5, univ=8, noise=0.0, seed=0):
        """G graphs, each a permuted copy of n distinct universe identities."""
        rng = np.random.RandomState(seed)
        perms = [rng.permutation(n) for _ in range(G)]
        M = n
        T = G * M
        # ground-truth universe assignment: graph g node i -> identity perms[g][i]
        Ugt = np.zeros((G, M, univ))
        for g in range(G):
            for i in range(n):
                Ugt[g, i, perms[g][i]] = 1
        W = np.zeros((T, T), np.float32)
        for i in range(G):
            for j in range(G):
                blk = Ugt[i] @ Ugt[j].T
                W[i * M:(i + 1) * M, j * M:(j + 1) * M] = blk + noise * rng.rand(M, M)
        ms = jnp.full((G,), n, jnp.int32)
        return jnp.asarray(W), Ugt, ms

    def test_hippi_recovers_consistent_matching(self):
        W, Ugt, ms = self._matching_problem()
        G, M, univ = Ugt.shape
        U0 = jnp.asarray(Ugt.reshape(G * M, univ) + 0.1)
        U = np.asarray(hippi(W, U0, ms, univ))
        U = U.reshape(G, M, univ)
        for i in range(G):
            for j in range(G):
                pred = U[i] @ U[j].T
                np.testing.assert_allclose(pred, Ugt[i] @ Ugt[j].T, atol=0.15)

    def test_ga_gm_recovers_permutations(self):
        W, Ugt, ms = self._matching_problem(noise=0.05)
        G, M, univ = Ugt.shape
        T = G * M
        A = jnp.zeros((T, T), jnp.float32)  # no quadratic term -> pure linear
        rng = np.random.RandomState(1)
        U0 = jnp.asarray(Ugt.reshape(T, univ) + 0.3 * rng.rand(T, univ))
        U = np.asarray(ga_gm(A, W, U0, ms, univ, quad_weight=0.5))
        U = U.reshape(G, M, univ)
        # output rows are hard assignments (hungarian-projected)
        assert set(np.unique(U)) <= {0.0, 1.0}
        for i in range(G):
            for j in range(G):
                np.testing.assert_allclose(U[i] @ U[j].T, Ugt[i] @ Ugt[j].T, atol=1e-5)

    def test_ga_gm_padding_invariance(self):
        W, Ugt, ms = self._matching_problem(noise=0.02, seed=3)
        G, n, univ = Ugt.shape
        U0 = Ugt.reshape(G * n, univ) + 0.1

        def padded(Mpad):
            T = G * Mpad
            Wp = np.zeros((T, T), np.float32)
            U0p = np.zeros((T, univ), np.float32)
            Wnp = np.asarray(W)
            for i in range(G):
                for j in range(G):
                    Wp[i * Mpad:i * Mpad + n, j * Mpad:j * Mpad + n] = Wnp[
                        i * n:(i + 1) * n, j * n:(j + 1) * n
                    ]
                U0p[i * Mpad:i * Mpad + n] = U0[i * n:(i + 1) * n]
            A = jnp.zeros((T, T), jnp.float32)
            out = np.asarray(
                ga_gm(A, jnp.asarray(Wp), jnp.asarray(U0p), ms, univ, quad_weight=0.5)
            ).reshape(G, Mpad, univ)
            return out[:, :n, :]

        np.testing.assert_allclose(padded(n), padded(n + 3), atol=1e-5)


class TestUniverseAndMGM:
    def test_usup_loss_and_grads(self):
        key = jax.random.PRNGKey(7)
        G, M, D, C, univ = 3, 10, 32, 2, 8
        nodes, mask = make_nodes(key, G, M, D, [6, 10, 4])
        labels = jnp.where(mask, (jnp.arange(M)[None] % C) + 1, 0)
        mod = USup(num_classes=C, univ_size=univ, dim=D)
        params = mod.init(key, nodes, labels, mask)
        loss = mod.apply(params, nodes, labels, mask)
        assert np.isfinite(float(loss))

        g = jax.grad(lambda p: mod.apply(p, nodes, labels, mask))(params)
        gU = np.asarray(g["params"]["U"])
        assert np.isfinite(gU).all() and np.abs(gU).max() > 0

    def test_usup_padding_invariance(self):
        key = jax.random.PRNGKey(8)
        G, D, C, univ = 2, 16, 2, 6
        nodes, mask = make_nodes(key, G, 8, D, [5, 7])
        labels = jnp.where(mask, (jnp.arange(8)[None] % C) + 1, 0)
        mod = USup(num_classes=C, univ_size=univ, dim=D)
        params = mod.init(key, nodes, labels, mask)
        loss_a = float(mod.apply(params, nodes, labels, mask))

        pad = jnp.zeros((G, 4, D))
        nodes_b = jnp.concatenate([nodes, pad], axis=1)
        mask_b = jnp.concatenate([mask, jnp.zeros((G, 4), bool)], axis=1)
        labels_b = jnp.concatenate([labels, jnp.zeros((G, 4), jnp.int32)], axis=1)
        loss_b = float(mod.apply(params, nodes_b, labels_b, mask_b))
        np.testing.assert_allclose(loss_a, loss_b, atol=1e-5)

    def test_mgm3_loss_grads_flow_to_nodes_not_universe(self):
        key = jax.random.PRNGKey(9)
        G, M, D, C, univ = 4, 8, 32, 2, 8
        nodes, mask = make_nodes(key, G, M, D, [5, 8, 6, 7])
        labels = jnp.where(mask, (jnp.arange(M)[None] % C) + 1, 0)
        U = jax.random.normal(jax.random.PRNGKey(10), (univ, D))
        mod = MGM3Unsup(num_classes=C, univ_size=univ, dim=D)
        params = mod.init(key, nodes, labels, mask, U)
        loss = mod.apply(params, nodes, labels, mask, U)
        assert np.isfinite(float(loss)) and float(loss) > 0

        gn, gU = jax.grad(
            lambda n, u: mod.apply(params, n, labels, mask, u), argnums=(0, 1)
        )(nodes, U)
        assert np.abs(np.asarray(gn)).max() > 0, "TTA gradient must reach the nodes"
        # U only seeds GA-GM under stop_gradient -> no gradient
        assert np.abs(np.asarray(gU)).max() == 0.0

    def test_mgm3_padding_invariance(self):
        """Structured (well-separated) node clusters so GA-GM's discrete
        rounding is robust to fp-summation-order noise; with random near-tie
        inputs, padding-induced 1e-7 differences legitimately flip
        assignments (discrete solver) and the loss is not comparable."""
        key = jax.random.PRNGKey(11)
        G, D, C, univ = 3, 16, 2, 6
        M = 6
        ms = [4, 6, 5]
        rng = np.random.RandomState(0)
        protos = rng.randn(M, D).astype(np.float32) * 4.0  # distinct identities
        nodes_np = np.zeros((G, M, D), np.float32)
        mask_np = np.zeros((G, M), bool)
        for g, m in enumerate(ms):
            perm = rng.permutation(M)[:m]
            nodes_np[g, :m] = protos[perm] + 0.05 * rng.randn(m, D)
            mask_np[g, :m] = True
        nodes = jnp.asarray(nodes_np)
        mask = jnp.asarray(mask_np)
        labels = jnp.where(mask, (jnp.arange(M)[None] % C) + 1, 0)
        U = jax.random.normal(jax.random.PRNGKey(12), (univ, D))
        mod = MGM3Unsup(num_classes=C, univ_size=univ, dim=D)
        params = mod.init(key, nodes, labels, mask, U)
        loss_a = float(mod.apply(params, nodes, labels, mask, U))

        pad = jnp.zeros((G, 3, D))
        nodes_b = jnp.concatenate([nodes, pad], axis=1)
        mask_b = jnp.concatenate([mask, jnp.zeros((G, 3), bool)], axis=1)
        labels_b = jnp.concatenate([labels, jnp.zeros((G, 3), jnp.int32)], axis=1)
        loss_b = float(mod.apply(params, nodes_b, labels_b, mask_b, U))
        np.testing.assert_allclose(loss_a, loss_b, rtol=5e-3)


class TestLosses:
    def test_bce_focal_matches_formula(self):
        p = jnp.array([[0.9, 0.1], [0.4, 0.7]])
        t = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        out = float(BCEFocalLoss(gamma=2, alpha=0.25)(p, t))
        pn, tn = np.asarray(p), np.asarray(t)
        ref = (-0.25 * (1 - pn) ** 2 * tn * np.log(pn) - 0.75 * pn ** 2 * (1 - tn) * np.log(1 - pn)).mean()
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_perm_loss_mask_matches_ragged(self):
        rng = np.random.RandomState(0)
        s = rng.rand(6, 6).astype(np.float32) * 0.8 + 0.1
        gt = (rng.rand(6, 6) > 0.5).astype(np.float32)
        full = float(permutation_loss(jnp.asarray(s[:4, :5]), jnp.asarray(gt[:4, :5])))
        mask = np.zeros((6, 6), bool)
        mask[:4, :5] = True
        masked = float(permutation_loss(jnp.asarray(s), jnp.asarray(gt), jnp.asarray(mask)))
        np.testing.assert_allclose(full, masked, rtol=1e-6)

    def test_displacement_formula_and_mask(self):
        from ttdg_mgm_tpu.graph.losses import displacement

        s = jnp.asarray([[[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]])  # (1, 2, 3)
        p_src = jnp.asarray([[[0.0, 0.0], [1.0, 1.0]]])
        p_tgt = jnp.asarray([[[5.0, 5.0], [2.0, 3.0], [9.0, 9.0]]])
        d, gm = displacement(s, p_src, p_tgt, ns=jnp.asarray([1]))
        np.testing.assert_allclose(np.asarray(d[0]), [[2.0, 3.0], [4.0, 4.0]])
        np.testing.assert_allclose(np.asarray(gm[0]), [[1.0, 1.0], [0.0, 0.0]])
        d2, gm2 = displacement(s, p_src, p_tgt)
        assert gm2 is None and d2.shape == (1, 2, 2)

    def test_ilp_attention_loss_perfect_prediction_near_zero(self):
        from ttdg_mgm_tpu.graph.losses import ilp_attention_loss

        gt = jnp.eye(4)[None]
        near = jnp.clip(gt, 0.01, 0.99)
        good = float(ilp_attention_loss(near, gt))
        bad = float(ilp_attention_loss(jnp.full((1, 4, 4), 0.25), gt))
        assert good < 0.05 < bad
        # padded instance equals its cropped twin
        rng = np.random.RandomState(3)
        s = rng.rand(1, 5, 5).astype(np.float32) * 0.8 + 0.1
        gt5 = np.eye(5, dtype=np.float32)[None]
        crop = float(ilp_attention_loss(jnp.asarray(s[:, :3, :3]), jnp.asarray(gt5[:, :3, :3])))
        pad = float(ilp_attention_loss(jnp.asarray(s), jnp.asarray(gt5),
                                       src_ns=[3], tgt_ns=[3]))
        np.testing.assert_allclose(crop, pad, rtol=1e-5)

    def test_concat_matrix_symmetric_blocks(self):
        from ttdg_mgm_tpu.graph.losses import concat_matrix

        rng = np.random.RandomState(1)
        mats = jnp.asarray(rng.rand(2, 3, 3).astype(np.float32))
        big = concat_matrix(mats, [(0, 1), (1, 2)], num_blocks=3)
        assert big.shape == (9, 9)
        np.testing.assert_allclose(np.asarray(big[0:3, 3:6]), np.asarray(mats[0]))
        np.testing.assert_allclose(np.asarray(big[3:6, 0:3]), np.asarray(mats[0]).T)
        np.testing.assert_allclose(np.asarray(big[6:9, 3:6]), np.asarray(mats[1]).T)
        np.testing.assert_allclose(np.asarray(big), np.asarray(big).T)


class TestMAGNN:
    def test_shapes_and_mask(self):
        key = jax.random.PRNGKey(13)
        nodes, mask = make_nodes(key, 2, 6, 16, [4, 6])
        mod = MAGNN(nfeat=16, nhid=16)
        params = mod.init(key, nodes, mask)
        out = mod.apply(params, nodes, mask)
        assert out.shape == nodes.shape
        assert float(jnp.abs(out[0, 4:]).max()) == 0.0
