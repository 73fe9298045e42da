"""VI NavState optimization tests on the synthetic IMU trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import vi_ba
from ygz_tpu.core import lie
from ygz_tpu.imu import navstate as ns_mod
from ygz_tpu.imu import preintegration as pre_mod

from test_imu import simulate_trajectory, G_W

TBC = lie.se3_identity()  # body == camera for tests
FX = FY = 200.0
CX, CY = 160.0, 120.0


def make_vision(pts_w, ns, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    T_cw = ns_mod.navstate_to_tcw(ns, TBC)
    pc = np.asarray(lie.se3_apply(T_cw, jnp.asarray(pts_w)))
    u = FX * pc[:, 0] / pc[:, 2] + CX
    v = FY * pc[:, 1] / pc[:, 2] + CY
    uv = np.stack([u, v], 1) + rng.randn(len(pts_w), 2) * noise
    mask = pc[:, 2] > 0.1
    return jnp.asarray(uv.astype(np.float32)), jnp.asarray(mask)


class TestAnalyticVisionJacobian:
    def test_matches_jacfwd(self):
        """_vision_jac6 must equal jacfwd of the reprojection residual
        over the retraction's (dP, dphi) slots — with a NON-trivial Tbc
        so the body/camera chain is exercised."""
        rng = np.random.RandomState(3)
        Tbc = {"q": lie.quat_normalize(jnp.asarray(
            rng.randn(4).astype(np.float32))),
            "t": jnp.asarray(rng.randn(3).astype(np.float32) * 0.1)}
        ns = ns_mod.NavState(
            P=jnp.asarray(rng.randn(3).astype(np.float32)),
            V=jnp.asarray(rng.randn(3).astype(np.float32)),
            q=lie.quat_normalize(jnp.asarray(
                rng.randn(4).astype(np.float32))),
            bg=jnp.zeros(3), ba=jnp.zeros(3))
        pts = jnp.asarray(
            (rng.randn(40, 3) * 2 + np.array([0, 0, 8.0]))
            .astype(np.float32))
        uv = jnp.zeros((40, 2))

        def r_of(dx):
            c = ns_mod.retract(ns, dx)
            r, _ = vi_ba._vision_residuals(c, Tbc, pts, uv, FX, FY, CX, CY)
            return r

        J_ad = jax.jacfwd(r_of)(jnp.zeros(15))   # [N, 2, 15]
        J6 = vi_ba._vision_jac6(ns, Tbc, pts, FX, FY)
        slots = np.asarray(vi_ba._VIS_SLOTS)
        np.testing.assert_allclose(np.asarray(J_ad)[:, :, slots],
                                   np.asarray(J6), rtol=2e-3, atol=2e-3)
        # all other tangent slots have zero vision Jacobian
        others = [i for i in range(15) if i not in set(slots.tolist())]
        np.testing.assert_allclose(np.asarray(J_ad)[:, :, others], 0.0,
                                   atol=1e-5)


class TestPoseOptVI:
    def test_recovers_state(self):
        P, V, qs, imu = simulate_trajectory(100, seed=5)
        pre = pre_mod.preintegrate(jnp.asarray(imu), jnp.ones(len(imu), bool),
                                   jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3)
        ns_i = ns_mod.NavState(P=jnp.asarray(P[0]), V=jnp.asarray(V[0]),
                               q=jnp.asarray(qs[0]), bg=jnp.zeros(3),
                               ba=jnp.zeros(3))
        ns_true = ns_mod.NavState(P=jnp.asarray(P[-1]), V=jnp.asarray(V[-1]),
                                  q=jnp.asarray(qs[-1]), bg=jnp.zeros(3),
                                  ba=jnp.zeros(3))
        rng = np.random.RandomState(0)
        pts = np.stack([rng.uniform(-3, 3, 80), rng.uniform(-2, 2, 80),
                        rng.uniform(4, 9, 80)], 1).astype(np.float32)
        uv, mask = make_vision(pts, ns_true, noise=0.2)

        # perturb the initial guess
        dx = np.zeros(15, np.float32)
        dx[:3] = [0.05, -0.04, 0.03]
        dx[3:6] = [0.1, -0.05, 0.08]
        dx[6:9] = [0.02, 0.015, -0.01]
        ns0 = ns_mod.retract(ns_true, jnp.asarray(dx))

        ns, inlier, n_in, H = vi_ba.pose_optimization_vi(
            ns0, ns_i, pre, jnp.asarray(G_W), TBC,
            jnp.asarray(pts), uv, jnp.ones(80), mask,
            FX, FY, CX, CY)
        assert int(n_in) > 70
        np.testing.assert_allclose(np.asarray(ns.P), P[-1], atol=5e-3)
        np.testing.assert_allclose(np.asarray(ns.V), V[-1], atol=5e-2)
        # marginal prior must be PSD and informative
        ev = np.linalg.eigvalsh(np.asarray(H))
        assert ev.min() > -1e-3 and ev.max() > 1.0


class TestWindowBA:
    def test_window_converges(self):
        n_kf, spk = 6, 40
        P, V, qs, imu = simulate_trajectory(n_kf * spk + 1, seed=7)
        kf_idx = np.arange(0, n_kf * spk, spk)  # exactly n_kf keyframes
        rng = np.random.RandomState(1)
        pts = np.stack([rng.uniform(-3, 3, 120), rng.uniform(-2, 2, 120),
                        rng.uniform(4, 9, 120)], 1).astype(np.float32)

        ns_true, pres, obs_kf, obs_pt, obs_uv, obs_m = [], [], [], [], [], []
        for k, idx in enumerate(kf_idx):
            ns = ns_mod.NavState(P=jnp.asarray(P[idx]), V=jnp.asarray(V[idx]),
                                 q=jnp.asarray(qs[idx]), bg=jnp.zeros(3),
                                 ba=jnp.zeros(3))
            ns_true.append(ns)
            uv, m = make_vision(pts, ns, noise=0.3, seed=k)
            obs_kf.append(np.full(len(pts), k, np.int32))
            obs_pt.append(pts)
            obs_uv.append(np.asarray(uv))
            obs_m.append(np.asarray(m))
        for a, b in zip(kf_idx[:-1], kf_idx[1:]):
            pres.append(pre_mod.preintegrate(
                jnp.asarray(imu[a:b]), jnp.ones(b - a, bool),
                jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3))

        ns_stack = jax.tree.map(lambda *x: jnp.stack(x), *ns_true)
        # perturb all but the first
        rngp = np.random.RandomState(2)
        dx = np.zeros((n_kf, 15), np.float32)
        dx[1:, :9] = rngp.randn(n_kf - 1, 9) * 0.02
        ns_pert = jax.vmap(ns_mod.retract)(ns_stack, jnp.asarray(dx))

        prob = vi_ba.ViWindowProblem(
            ns=ns_pert,
            pre=jax.tree.map(lambda *x: jnp.stack(x), *pres),
            pre_mask=jnp.ones(n_kf - 1, bool),
            kf_mask=jnp.ones(n_kf, bool),
            kf_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
            obs_kf=jnp.asarray(np.concatenate(obs_kf)),
            obs_pt=jnp.asarray(np.concatenate(obs_pt)),
            obs_uv=jnp.asarray(np.concatenate(obs_uv).astype(np.float32)),
            obs_inv_sigma2=jnp.ones(n_kf * len(pts)),
            obs_mask=jnp.asarray(np.concatenate(obs_m)),
            bg_hat=jnp.zeros(3), ba_hat=jnp.zeros(3))

        out = vi_ba.local_ba_navstate(prob, jnp.asarray(G_W), TBC,
                                      FX, FY, CX, CY)
        # 0.3 px vision noise at ~6 m depth bounds P to ~1 cm and (via the
        # 0.2 s KF spacing) V to ~0.1 — verified by running from truth
        for k in range(n_kf):
            err = np.linalg.norm(np.asarray(out.P[k]) - P[kf_idx[k]])
            assert err < 2e-2, (k, err)
            verr = np.linalg.norm(np.asarray(out.V[k]) - V[kf_idx[k]])
            assert verr < 0.15, (k, verr)


class TestJointMarginalization:
    """The Frame-Frame joint mode (reference PoseOptimization
    /root/reference/src/Optimizer.cc:278-618): previous state free under
    its own prior, and the returned prior H equals the true marginal
    information of the current state (dense-solve check)."""

    def _setup(self):
        P, V, qs, imu = simulate_trajectory(100, seed=9)
        pre = pre_mod.preintegrate(jnp.asarray(imu), jnp.ones(len(imu), bool),
                                   jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3)
        ns_l = ns_mod.NavState(P=jnp.asarray(P[0]), V=jnp.asarray(V[0]),
                               q=jnp.asarray(qs[0]), bg=jnp.zeros(3),
                               ba=jnp.zeros(3))
        ns_c_true = ns_mod.NavState(P=jnp.asarray(P[-1]),
                                    V=jnp.asarray(V[-1]),
                                    q=jnp.asarray(qs[-1]), bg=jnp.zeros(3),
                                    ba=jnp.zeros(3))
        rng = np.random.RandomState(3)
        pts = np.stack([rng.uniform(-3, 3, 60), rng.uniform(-2, 2, 60),
                        rng.uniform(4, 9, 60)], 1).astype(np.float32)
        uv, mask = make_vision(pts, ns_c_true, noise=0.0)
        return ns_l, ns_c_true, pre, pts, uv, mask

    def test_joint_recovers_and_prior_matches_dense_schur(self):
        ns_l, ns_c_true, pre, pts, uv, mask = self._setup()
        prior_H = jnp.eye(15) * 1e4   # confident prior on the last state
        dx = np.zeros(15, np.float32)
        dx[:3] = [0.04, -0.03, 0.02]
        ns0 = ns_mod.retract(ns_c_true, jnp.asarray(dx))
        bw = (1.9e-3, 3.0e-1)

        ns, inlier, n_in, H, ns_l_opt = vi_ba.pose_optimization_vi(
            ns0, ns_l, pre, jnp.asarray(G_W), TBC,
            jnp.asarray(pts), uv, jnp.ones(60), mask,
            FX, FY, CX, CY, prior_H=prior_H, prior_ns=ns_l,
            bias_hat=(jnp.zeros(3), jnp.zeros(3)), bias_walk=bw,
            return_last=True)
        assert int(n_in) > 50
        np.testing.assert_allclose(np.asarray(ns.P), np.asarray(ns_c_true.P),
                                   atol=1e-2)

        # dense check: rebuild the stacked 30-dof residual at the solution
        # with the same weights, form the joint Hessian by jacfwd, and
        # Schur-eliminate the last block; must equal the returned prior
        info_imu = vi_ba._imu_info(pre)
        info_bw = vi_ba._bias_walk_info(pre, bw)
        w = np.asarray(jnp.where(inlier, 1.0, 0.0))

        def stacked(dxj):
            l = ns_mod.retract(ns_l_opt, dxj[:15])
            c = ns_mod.retract(ns, dxj[15:])
            r_imu = ns_mod.imu_residual_biased(l, c, pre, jnp.asarray(G_W),
                                               jnp.zeros(3), jnp.zeros(3))
            rv, _ = vi_ba._vision_residuals(c, TBC, jnp.asarray(pts), uv,
                                            FX, FY, CX, CY)
            r_pr = vi_ba._prior_residual(l, ns_l)
            r_bw = jnp.concatenate([c.bg - l.bg, c.ba - l.ba])
            return r_imu, rv, r_pr, r_bw

        J = jax.jacfwd(stacked)(jnp.zeros(30))
        J_imu, Jv, J_pr, J_bw = [np.asarray(j) for j in J]
        Hd = J_imu.T @ np.asarray(info_imu) @ J_imu
        Hd += np.einsum("nad,nae,n->de", Jv, Jv, w)
        Hd += J_pr.T @ np.asarray(prior_H) @ J_pr
        Hd += J_bw.T @ np.asarray(info_bw) @ J_bw
        Hll = Hd[:15, :15] + np.eye(15) * 1e-6
        expect = Hd[15:, 15:] - Hd[15:, :15] @ np.linalg.solve(
            Hll, Hd[:15, 15:])
        got = np.asarray(H)
        scale = np.abs(expect).max()
        np.testing.assert_allclose(got, expect, atol=2e-3 * scale)


class TestWindowBAPoints:
    def test_points_recovered(self):
        """Window BA with free map points (reference point vertices,
        /root/reference/src/Optimizer.cc:1077-1115): perturbed points AND
        poses both converge back."""
        n_kf, spk, n_pts = 6, 40, 100
        P, V, qs, imu = simulate_trajectory(n_kf * spk + 1, seed=11)
        kf_idx = np.arange(0, n_kf * spk, spk)
        rng = np.random.RandomState(4)
        pts = np.stack([rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts),
                        rng.uniform(4, 9, n_pts)], 1).astype(np.float32)

        ns_true, pres, obs_kf, obs_pid, obs_uv, obs_m = [], [], [], [], [], []
        for k, idx in enumerate(kf_idx):
            ns = ns_mod.NavState(P=jnp.asarray(P[idx]), V=jnp.asarray(V[idx]),
                                 q=jnp.asarray(qs[idx]), bg=jnp.zeros(3),
                                 ba=jnp.zeros(3))
            ns_true.append(ns)
            uv, m = make_vision(pts, ns, noise=0.02, seed=k)
            obs_kf.append(np.full(n_pts, k, np.int32))
            obs_pid.append(np.arange(n_pts, dtype=np.int32))
            obs_uv.append(np.asarray(uv))
            obs_m.append(np.asarray(m))
        for a, b in zip(kf_idx[:-1], kf_idx[1:]):
            pres.append(pre_mod.preintegrate(
                jnp.asarray(imu[a:b]), jnp.ones(b - a, bool),
                jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3))

        ns_stack = jax.tree.map(lambda *x: jnp.stack(x), *ns_true)
        rngp = np.random.RandomState(5)
        dx = np.zeros((n_kf, 15), np.float32)
        dx[1:, :9] = rngp.randn(n_kf - 1, 9) * 0.02
        ns_pert = jax.vmap(ns_mod.retract)(ns_stack, jnp.asarray(dx))
        pts_pert = pts + rngp.randn(n_pts, 3).astype(np.float32) * 0.05

        prob = vi_ba.ViWindowProblem(
            ns=ns_pert,
            pre=jax.tree.map(lambda *x: jnp.stack(x), *pres),
            pre_mask=jnp.ones(n_kf - 1, bool),
            kf_mask=jnp.ones(n_kf, bool),
            kf_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
            obs_kf=jnp.asarray(np.concatenate(obs_kf)),
            obs_pt=jnp.zeros((n_kf * n_pts, 3)),
            obs_uv=jnp.asarray(np.concatenate(obs_uv).astype(np.float32)),
            obs_inv_sigma2=jnp.ones(n_kf * n_pts),
            obs_mask=jnp.asarray(np.concatenate(obs_m)),
            bg_hat=jnp.zeros(3), ba_hat=jnp.zeros(3))
        points = vi_ba.ViWindowPoints(
            pos=jnp.asarray(pts_pert), mask=jnp.ones(n_pts, bool),
            obs_pt_id=jnp.asarray(np.concatenate(obs_pid)))

        out_ns, out_pos = vi_ba.local_ba_navstate(
            prob, jnp.asarray(G_W), TBC, FX, FY, CX, CY, iters=10,
            points=points, bias_walk=(1.9e-3, 3.0e-1))
        for k in range(n_kf):
            err = np.linalg.norm(np.asarray(out_ns.P[k]) - P[kf_idx[k]])
            assert err < 2e-2, (k, err)
        pt_err = np.linalg.norm(np.asarray(out_pos) - pts, axis=1)
        pt_err0 = np.linalg.norm(pts_pert - pts, axis=1)
        # perturbed by 0.05*sqrt(3)~0.09; joint BA must pull them back to
        # the (small-baseline) triangulation noise floor
        assert np.median(pt_err) < 0.02, np.median(pt_err)
        assert np.median(pt_err) < 0.25 * np.median(pt_err0)
