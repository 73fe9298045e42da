"""Bundle adjustment tests on synthetic multi-view scenes: pose-only
optimization, Schur-complement local BA, outlier gating."""

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import ba
from ygz_tpu.core import camera as cam_mod
from ygz_tpu.core import lie

CAM = cam_mod.Camera(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                     width=320, height=240, bf=20.0)


def make_scene(n_kf=4, n_mp=60, seed=0, noise_px=0.3):
    """Random points in front of a small camera trajectory; returns ground
    truth poses/points and noisy observations."""
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.uniform(-2, 2, n_mp),
                    rng.uniform(-1.5, 1.5, n_mp),
                    rng.uniform(4, 8, n_mp)], axis=1).astype(np.float32)
    poses = []
    for k in range(n_kf):
        xi = np.concatenate([rng.uniform(-0.2, 0.2, 3),
                             rng.uniform(-0.05, 0.05, 3)]).astype(np.float32)
        xi[0] += 0.3 * k  # baseline along x
        poses.append(lie.se3_exp(jnp.asarray(xi)))
    kf_q = jnp.stack([p["q"] for p in poses])
    kf_t = jnp.stack([p["t"] for p in poses])

    obs_kf, obs_mp, obs_uv = [], [], []
    for k in range(n_kf):
        pc = np.asarray(lie.se3_apply(poses[k], jnp.asarray(pts)))
        u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
        v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
        vis = (pc[:, 2] > 0.1) & (u > 0) & (u < CAM.width) & (v > 0) & (v < CAM.height)
        for m in np.where(vis)[0]:
            obs_kf.append(k)
            obs_mp.append(m)
            obs_uv.append([u[m] + rng.randn() * noise_px,
                           v[m] + rng.randn() * noise_px])
    O = len(obs_kf)
    obs = ba.Observations(
        kf=jnp.asarray(np.array(obs_kf, np.int32)),
        mp=jnp.asarray(np.array(obs_mp, np.int32)),
        uv=jnp.asarray(np.array(obs_uv, np.float32)),
        ur=jnp.full((O,), -1.0, jnp.float32),
        inv_sigma2=jnp.ones((O,), jnp.float32),
        mask=jnp.ones((O,), bool))
    return kf_q, kf_t, jnp.asarray(pts), obs


class TestPoseOptimization:
    def test_recovers_pose(self):
        kf_q, kf_t, pts, obs = make_scene(n_kf=1, noise_px=0.0)
        T_true = {"q": kf_q[0], "t": kf_t[0]}
        # perturb
        T0 = lie.se3_retract(T_true, jnp.array([0.05, -0.04, 0.03, 0.02, -0.01, 0.015]))
        sel = np.asarray(obs.kf) == 0
        T, inlier, n = ba.pose_optimization(
            T0, pts[obs.mp[sel]], obs.uv[sel],
            jnp.full((int(sel.sum()),), -1.0), obs.inv_sigma2[sel], obs.mask[sel],
            CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf)
        err = lie.se3_log(lie.se3_compose(lie.se3_inverse(T), T_true))
        assert float(jnp.linalg.norm(err)) < 1e-3
        assert int(n) == int(sel.sum())

    def test_rejects_outliers(self):
        kf_q, kf_t, pts, obs = make_scene(n_kf=1, noise_px=0.2, seed=3)
        T_true = {"q": kf_q[0], "t": kf_t[0]}
        sel = np.asarray(obs.kf) == 0
        uv = np.array(obs.uv[sel])
        n_out = 10
        uv[:n_out] += 40.0  # gross outliers
        T0 = lie.se3_retract(T_true, jnp.array([0.02, 0.02, -0.02, 0.01, 0.0, -0.01]))
        T, inlier, n = ba.pose_optimization(
            T0, pts[obs.mp[sel]], jnp.asarray(uv),
            jnp.full((int(sel.sum()),), -1.0), obs.inv_sigma2[sel], obs.mask[sel],
            CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf)
        inlier = np.asarray(inlier)
        assert not inlier[:n_out].any()
        assert inlier[n_out:].mean() > 0.9
        err = lie.se3_log(lie.se3_compose(lie.se3_inverse(T), T_true))
        # 0.2 px observation noise bounds accuracy to ~1e-2 here
        assert float(jnp.linalg.norm(err)) < 2e-2

    def test_stereo_observations(self):
        kf_q, kf_t, pts, obs = make_scene(n_kf=1, noise_px=0.0, seed=5)
        T_true = {"q": kf_q[0], "t": kf_t[0]}
        sel = np.asarray(obs.kf) == 0
        pc = np.asarray(lie.se3_apply(T_true, pts[obs.mp[sel]]))
        ur = np.asarray(obs.uv[sel][:, 0]) - CAM.bf / pc[:, 2]
        T0 = lie.se3_retract(T_true, jnp.array([0.03, 0.0, -0.02, 0.0, 0.01, 0.0]))
        T, inlier, n = ba.pose_optimization(
            T0, pts[obs.mp[sel]], obs.uv[sel], jnp.asarray(ur.astype(np.float32)),
            obs.inv_sigma2[sel], obs.mask[sel],
            CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf)
        err = lie.se3_log(lie.se3_compose(lie.se3_inverse(T), T_true))
        assert float(jnp.linalg.norm(err)) < 1e-3


class TestLocalBA:
    def _perturbed_problem(self, noise_px=0.3, seed=0):
        kf_q, kf_t, pts, obs = make_scene(n_kf=4, n_mp=60, seed=seed,
                                          noise_px=noise_px)
        rng = np.random.RandomState(seed + 10)
        dq = jnp.asarray(rng.randn(4, 6).astype(np.float32) * 0.01)
        # keep the first two KFs at truth and fix them: with mono-only
        # observations a single fixed camera leaves the scale gauge free
        dq = dq.at[:2].set(0.0)
        T_pert = lie.se3_retract({"q": kf_q, "t": kf_t}, dq)
        mp_pert = pts + jnp.asarray(rng.randn(*pts.shape).astype(np.float32) * 0.05)
        prob = ba.BAProblem(
            kf_q=T_pert["q"], kf_t=T_pert["t"], mp=mp_pert, obs=obs,
            kf_fixed=jnp.array([True, True, False, False]),
            kf_mask=jnp.ones((4,), bool),
            mp_mask=jnp.ones((pts.shape[0],), bool))
        return prob, kf_q, kf_t, pts

    def test_converges_to_truth(self):
        prob, kf_q, kf_t, pts, = self._perturbed_problem(noise_px=0.0)
        out, inlier = ba.local_bundle_adjustment(prob, CAM)
        for k in range(4):
            err = lie.se3_log(lie.se3_compose(
                lie.se3_inverse({"q": out.kf_q[k], "t": out.kf_t[k]}),
                {"q": kf_q[k], "t": kf_t[k]}))
            assert float(jnp.linalg.norm(err)) < 2e-3, (k, np.asarray(err))
        pt_err = np.linalg.norm(np.asarray(out.mp - pts), axis=1)
        assert pt_err.mean() < 5e-3

    def test_reduces_reprojection_error(self):
        prob, *_ = self._perturbed_problem(noise_px=0.3, seed=2)
        cost0 = ba._ba_cost(prob, prob.obs.mask, CAM.fx, CAM.fy, CAM.cx,
                            CAM.cy, CAM.bf, False)
        out, inlier = ba.local_bundle_adjustment(prob, CAM)
        cost1 = ba._ba_cost(out, prob.obs.mask, CAM.fx, CAM.fy, CAM.cx,
                            CAM.cy, CAM.bf, False)
        assert float(cost1) < 0.25 * float(cost0)
        assert np.asarray(inlier).mean() > 0.95

    def test_fixed_kf_stays(self):
        prob, kf_q, kf_t, _ = self._perturbed_problem(noise_px=0.1, seed=4)
        out, _ = ba.local_bundle_adjustment(prob, CAM)
        np.testing.assert_allclose(np.asarray(out.kf_q[0]), np.asarray(prob.kf_q[0]))
        np.testing.assert_allclose(np.asarray(out.kf_t[0]), np.asarray(prob.kf_t[0]))

    def test_jit_and_masked_padding(self):
        # padded slots (masked off) must not corrupt the solve
        prob, kf_q, kf_t, pts = self._perturbed_problem(noise_px=0.0, seed=6)
        K, M = 8, 100  # pad capacities
        O = prob.obs.kf.shape[0]
        Opad = O + 40
        pad_obs = ba.Observations(
            kf=jnp.zeros((Opad,), jnp.int32).at[:O].set(prob.obs.kf),
            mp=jnp.zeros((Opad,), jnp.int32).at[:O].set(prob.obs.mp),
            uv=jnp.zeros((Opad, 2)).at[:O].set(prob.obs.uv),
            ur=jnp.full((Opad,), -1.0).at[:O].set(prob.obs.ur),
            inv_sigma2=jnp.ones((Opad,)).at[:O].set(prob.obs.inv_sigma2),
            mask=jnp.zeros((Opad,), bool).at[:O].set(prob.obs.mask))
        prob_pad = ba.BAProblem(
            kf_q=jnp.tile(lie.quat_identity()[None], (K, 1)).at[:4].set(prob.kf_q),
            kf_t=jnp.zeros((K, 3)).at[:4].set(prob.kf_t),
            mp=jnp.zeros((M, 3)).at[:60].set(prob.mp),
            obs=pad_obs,
            kf_fixed=jnp.zeros((K,), bool).at[0].set(True),
            kf_mask=jnp.zeros((K,), bool).at[:4].set(True),
            mp_mask=jnp.zeros((M,), bool).at[:60].set(True))
        f = jax.jit(lambda p: ba.local_bundle_adjustment(p, CAM))
        out, inlier = f(prob_pad)
        for k in range(4):
            err = lie.se3_log(lie.se3_compose(
                lie.se3_inverse({"q": out.kf_q[k], "t": out.kf_t[k]}),
                {"q": kf_q[k], "t": kf_t[k]}))
            assert float(jnp.linalg.norm(err)) < 2e-3, (k, np.asarray(err))
        assert np.all(np.isfinite(np.asarray(out.mp)))
