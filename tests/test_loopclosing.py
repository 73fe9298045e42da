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
