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
