"""Loop-closing component tests: RANSAC Horn Sim3, essential-graph
optimization, and drift correction on a synthetic loopy trajectory."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import posegraph, sim3solver
from ygz_tpu.core import lie


class TestSim3Solver:
    def test_horn_exact(self):
        rng = np.random.RandomState(0)
        X2 = jnp.asarray(rng.randn(30, 3).astype(np.float32))
        S_true = {"q": lie.so3_exp(jnp.array([0.2, -0.1, 0.3])),
                  "t": jnp.array([1.0, -2.0, 0.5]),
                  "s": jnp.asarray(1.7)}
        X1 = lie.sim3_apply(S_true, X2)
        S = sim3solver.horn_sim3(X1, X2)
        np.testing.assert_allclose(float(S["s"]), 1.7, atol=1e-4)
        np.testing.assert_allclose(np.asarray(S["t"]), np.asarray(S_true["t"]),
                                   atol=1e-4)

    def test_horn_fix_scale(self):
        rng = np.random.RandomState(1)
        X2 = jnp.asarray(rng.randn(20, 3).astype(np.float32))
        S_true = {"q": lie.so3_exp(jnp.array([0.1, 0.2, -0.1])),
                  "t": jnp.array([0.3, 0.1, -0.2]), "s": jnp.asarray(1.0)}
        X1 = lie.sim3_apply(S_true, X2)
        S = sim3solver.horn_sim3(X1, X2, fix_scale=True)
        assert float(S["s"]) == 1.0
        np.testing.assert_allclose(np.asarray(S["t"]),
                                   np.asarray(S_true["t"]), atol=1e-4)

    def test_ransac_with_outliers(self):
        rng = np.random.RandomState(2)
        N = 60
        X2 = jnp.asarray((rng.randn(N, 3) * 2).astype(np.float32))
        S_true = {"q": lie.so3_exp(jnp.array([0.15, -0.2, 0.1])),
                  "t": jnp.array([0.8, -0.3, 1.2]), "s": jnp.asarray(2.2)}
        X1 = np.array(lie.sim3_apply(S_true, X2))
        X1[:15] += rng.uniform(2, 5, (15, 3))  # gross outliers
        S, inl, n = sim3solver.ransac_sim3(jnp.asarray(X1), X2,
                                           jnp.ones(N, bool), seed=3)
        inl = np.asarray(inl)
        assert int(n) >= 40
        assert inl[:15].sum() <= 2
        np.testing.assert_allclose(float(S["s"]), 2.2, rtol=0.02)


class TestOptimizeSim3:
    def _setup(self, rng, N=80, n_out=16, noise_px=0.7):
        """Two cameras seeing the same cloud; estimated S12 is perturbed;
        pixel observations are noisy; n_out correspondences are gross
        outliers (wrong pairing)."""
        fx = fy = 400.0
        cx, cy = 320.0, 240.0
        X2 = jnp.asarray(
            (rng.randn(N, 3) * np.array([1.5, 1.0, 0.8]) +
             np.array([0, 0, 6.0])).astype(np.float32))
        S_true = {"q": lie.so3_exp(jnp.array([0.10, -0.06, 0.15])),
                  "t": jnp.array([0.5, -0.2, 0.4]), "s": jnp.asarray(1.6)}
        X1 = lie.sim3_apply(S_true, X2)

        def proj(P):
            return jnp.stack([fx * P[:, 0] / P[:, 2] + cx,
                              fy * P[:, 1] / P[:, 2] + cy], -1)
        uv1 = proj(X1) + rng.randn(N, 2).astype(np.float32) * noise_px
        uv2 = proj(X2) + rng.randn(N, 2).astype(np.float32) * noise_px
        # gross outliers: shuffle the pairing of the first n_out rows
        X2o = np.asarray(X2).copy()
        uv2o = np.asarray(uv2).copy()
        perm = rng.permutation(n_out)
        X2o[:n_out] = X2o[perm]
        uv2o[:n_out] = uv2o[perm]
        # noisy initial estimate (what a minimal-3-point Horn would give)
        dS = {"q": lie.so3_exp(jnp.array([0.02, 0.015, -0.02])),
              "t": jnp.array([0.06, -0.04, 0.05]), "s": jnp.asarray(1.07)}
        S0 = lie.sim3_compose(dS, S_true)
        return (S_true, S0, X1, jnp.asarray(X2o), uv1, jnp.asarray(uv2o),
                fx, fy, cx, cy)

    def test_refines_noisy_sim3_with_outliers(self):
        """VERDICT r3 #3 acceptance: noisy synthetic Sim3, 20% outliers."""
        rng = np.random.RandomState(7)
        (S_true, S0, X1, X2, uv1, uv2, fx, fy, cx, cy) = self._setup(rng)
        N = X1.shape[0]
        ones = jnp.ones((N,))
        S, inl, n = sim3solver.optimize_sim3(
            S0, X1, X2, uv1, uv2, ones, ones, jnp.ones((N,), bool),
            fx, fy, cx, cy)
        inl = np.asarray(inl)
        assert int(n) >= 50
        assert inl[:16].sum() <= 2, "gross outliers must be rejected"
        # the refined estimate lands on the truth, much closer than S0
        err_s = abs(float(S["s"]) - float(S_true["s"]))
        err_s0 = abs(float(S0["s"]) - float(S_true["s"]))
        assert err_s < 0.01 and err_s < err_s0 / 5
        err_t = float(jnp.linalg.norm(S["t"] - S_true["t"]))
        assert err_t < 0.02

    def test_fix_scale_pins_scale(self):
        rng = np.random.RandomState(8)
        (S_true, S0, X1, X2, uv1, uv2, fx, fy, cx, cy) = \
            self._setup(rng, n_out=0)
        N = X1.shape[0]
        ones = jnp.ones((N,))
        S0 = dict(S0, s=jnp.asarray(1.0))
        S, _, n = sim3solver.optimize_sim3(
            S0, X1, X2, uv1, uv2, ones, ones, jnp.ones((N,), bool),
            fx, fy, cx, cy, fix_scale=True)
        np.testing.assert_allclose(float(S["s"]), 1.0, atol=1e-5)


class TestSearchBySim3:
    def test_mutual_agreement(self):
        """Direction disagreements are dropped; clean mutual pairs kept."""
        from ygz_tpu.matching import search
        rng = np.random.RandomState(9)
        N = 32
        desc = jnp.asarray(rng.randint(0, 2**31, (N, 8), dtype=np.int64)
                           .astype(np.uint32))
        uv = jnp.asarray((rng.rand(N, 2) * 400 + 50).astype(np.float32))
        level = jnp.zeros((N,), jnp.int32)
        mask = jnp.ones((N,), bool)
        rad = jnp.full((N,), 6.0)
        pred = jnp.zeros((N,), jnp.int32)
        # KF2 features = same descriptors, projections land exactly on
        # the matching feature -> every pair should agree mutually
        res = search.search_by_sim3(
            desc, uv, rad, pred, mask,
            desc, uv, rad, pred, mask,
            desc, uv, level, mask,
            desc, uv, level, mask)
        assert bool(jnp.all(res.mask))
        np.testing.assert_array_equal(np.asarray(res.idx), np.arange(N))
        # break direction B for half the points: their projection into
        # image 1 is pushed out of every window -> mutual check drops them
        uv_off = uv.at[: N // 2].add(1e4)
        res2 = search.search_by_sim3(
            desc, uv, rad, pred, mask,
            desc, uv_off, rad, pred, mask,
            desc, uv, level, mask,
            desc, uv, level, mask)
        m = np.asarray(res2.mask)
        assert not m[: N // 2].any()
        assert m[N // 2:].all()


class TestPoseGraph:
    def _chain(self, n=12, drift=0.02, seed=4):
        """Ground-truth circular trajectory; estimated poses accumulate
        drift; a loop edge closes first-last."""
        rng = np.random.RandomState(seed)
        gt, est = [], []
        T_gt = lie.se3_identity()
        T_est = lie.se3_identity()
        for k in range(n):
            gt.append(T_gt)
            est.append(T_est)
            step = jnp.asarray(np.array(
                [0.5, 0.0, 0.0, 0.0, 2 * np.pi / n, 0.0], np.float32))
            T_gt = lie.se3_compose(lie.se3_exp(step), T_gt)
            noise = jnp.asarray(
                np.concatenate([rng.randn(3) * drift,
                                rng.randn(3) * drift * 0.5]).astype(np.float32))
            T_est = lie.se3_compose(lie.se3_exp(step + noise), T_est)
        return gt, est

    def test_sim3_graph_reduces_loop_error(self):
        gt, est = self._chain()
        n = len(gt)
        S_nodes = lie.sim3_from_se3(
            {"q": jnp.stack([T["q"] for T in est]),
             "t": jnp.stack([T["t"] for T in est])})
        # edges: chain with ESTIMATED relative measurements (consistent),
        # plus the loop edge with the TRUE first-last relative pose
        ei = list(range(n - 1)) + [n - 1]
        ej = list(range(1, n)) + [0]
        Si = jax.tree.map(lambda a: a[jnp.asarray(ei[:-1])], S_nodes)
        Sj = jax.tree.map(lambda a: a[jnp.asarray(ej[:-1])], S_nodes)
        S_meas_chain = lie.sim3_compose(Si, lie.sim3_inverse(Sj))
        T_loop = lie.se3_compose(gt[-1], lie.se3_inverse(gt[0]))
        S_loop = lie.sim3_from_se3(jax.tree.map(lambda a: a[None], T_loop))
        S_meas = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                              S_meas_chain, S_loop)

        fixed = jnp.zeros(n, bool).at[0].set(True)
        out = posegraph.optimize_sim3_graph(
            S_nodes, jnp.ones(n, bool), fixed,
            jnp.asarray(ei), jnp.asarray(ej), S_meas,
            jnp.ones(n, bool), num_iters=15)

        def loop_err(S):
            Sa = jax.tree.map(lambda x: x[n - 1], S)
            Sb = jax.tree.map(lambda x: x[0], S)
            rel = lie.sim3_compose(Sa, lie.sim3_inverse(Sb))
            e = lie.sim3_log(lie.sim3_compose(
                lie.sim3_inverse(jax.tree.map(lambda x: x[0], S_loop)), rel))
            return float(jnp.linalg.norm(e))

        e0 = loop_err(S_nodes)
        e1 = loop_err(out)
        # equal-weight optimum spreads the loop error across the 13 edges,
        # leaving ~ e0/13 on the loop edge itself
        assert e1 < 0.15 * e0, (e0, e1)

    def test_total_pose_error_improves(self):
        gt, est = self._chain(seed=6)
        n = len(gt)
        S_nodes = lie.sim3_from_se3(
            {"q": jnp.stack([T["q"] for T in est]),
             "t": jnp.stack([T["t"] for T in est])})
        ei = np.array(list(range(n - 1)) + [n - 1], np.int32)
        ej = np.array(list(range(1, n)) + [0], np.int32)
        Si = jax.tree.map(lambda a: a[jnp.asarray(ei[:-1])], S_nodes)
        Sj = jax.tree.map(lambda a: a[jnp.asarray(ej[:-1])], S_nodes)
        S_meas_chain = lie.sim3_compose(Si, lie.sim3_inverse(Sj))
        T_loop = lie.se3_compose(gt[-1], lie.se3_inverse(gt[0]))
        S_loop = lie.sim3_from_se3(jax.tree.map(lambda a: a[None], T_loop))
        S_meas = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                              S_meas_chain, S_loop)
        out = posegraph.optimize_sim3_graph(
            S_nodes, jnp.ones(n, bool), jnp.zeros(n, bool).at[0].set(True),
            jnp.asarray(ei), jnp.asarray(ej), S_meas, jnp.ones(n, bool))

        def total_err(S):
            e = 0.0
            for k in range(n):
                Tk = {"q": S["q"][k], "t": S["t"][k] / S["s"][k]}
                d = lie.se3_log(lie.se3_compose(Tk, lie.se3_inverse(gt[k])))
                e += float(jnp.linalg.norm(d))
            return e

        assert total_err(out) < total_err(S_nodes)
