"""IMU subsystem tests: preintegration vs brute-force integration, bias
Jacobians, NavState prediction, and visual-inertial initialization on a
synthetic trajectory with known scale/gravity/biases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ygz_tpu.core import lie
from ygz_tpu.imu import preintegration as pre_mod
from ygz_tpu.imu import navstate as ns_mod
from ygz_tpu.imu import vi_init

G_W = np.array([0.0, 0.0, -9.81], np.float32)
DT = 0.005  # 200 Hz


def simulate_trajectory(n_steps, seed=0, bg=np.zeros(3), ba=np.zeros(3),
                        noise=0.0, amp=1.0, rot_amp=1.0):
    """Simulate a smooth 3D trajectory; return ground-truth states at each
    step plus IMU measurements (with optional bias/noise). `amp` scales
    the translational excitation, `rot_amp` the angular excitation
    (gravity/scale observability needs acceleration; large rotations at
    a narrow FOV mostly punish the vision front end)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n_steps) * DT
    # analytic position and orientation
    P = amp * np.stack([0.6 * np.sin(1.1 * t), 0.4 * np.sin(0.9 * t + 1.0),
                        0.3 * np.sin(0.7 * t)], 1)
    V = amp * np.stack([0.66 * np.cos(1.1 * t), 0.36 * np.cos(0.9 * t + 1.0),
                        0.21 * np.cos(0.7 * t)], 1)
    A = amp * np.stack([-0.726 * np.sin(1.1 * t),
                        -0.324 * np.sin(0.9 * t + 1.0),
                        -0.147 * np.sin(0.7 * t)], 1)
    yaw = rot_amp * 0.3 * np.sin(0.5 * t)
    pitch = rot_amp * 0.2 * np.sin(0.4 * t + 0.5)
    omega_w = rot_amp * np.stack([0.08 * np.cos(0.4 * t + 0.5),
                                  np.zeros_like(t),
                                  0.15 * np.cos(0.5 * t)], 1)

    qs = [np.array([1.0, 0, 0, 0], np.float32)]
    for i in range(1, n_steps):
        w = omega_w[i - 1]
        # body rates: omega_b = R_bw * omega_w
        R = np.asarray(lie.quat_to_matrix(jnp.asarray(qs[-1])))
        wb = R.T @ w
        dq = np.asarray(lie.so3_exp(jnp.asarray(wb * DT, dtype=jnp.float32)))
        qs.append(np.asarray(lie.quat_normalize(
            lie.quat_mul(jnp.asarray(qs[-1]), jnp.asarray(dq)))))
    qs = np.stack(qs)

    imu = np.zeros((n_steps - 1, 7), np.float32)
    for i in range(n_steps - 1):
        R = np.asarray(lie.quat_to_matrix(jnp.asarray(qs[i])))
        wb = R.T @ omega_w[i]
        ab = R.T @ (A[i] - G_W)  # specific force
        imu[i] = [DT, *(wb + bg + rng.randn(3) * noise),
                  *(ab + ba + rng.randn(3) * noise * 10)]
    return P.astype(np.float32), V.astype(np.float32), qs, imu


class TestPreintegration:
    def test_matches_state_propagation(self):
        P, V, qs, imu = simulate_trajectory(200)
        pre = pre_mod.preintegrate(jnp.asarray(imu),
                                   jnp.ones(len(imu), bool),
                                   jnp.zeros(3), jnp.zeros(3),
                                   1e-4, 1e-3)
        ns0 = ns_mod.NavState(P=jnp.asarray(P[0]), V=jnp.asarray(V[0]),
                              q=jnp.asarray(qs[0]), bg=jnp.zeros(3),
                              ba=jnp.zeros(3))
        ns1 = ns_mod.predict(ns0, pre, jnp.asarray(G_W))
        np.testing.assert_allclose(np.asarray(ns1.P), P[-1], atol=2e-3)
        np.testing.assert_allclose(np.asarray(ns1.V), V[-1], atol=5e-3)
        qe = np.asarray(ns1.q)
        sign = np.sign(np.dot(qe, qs[-1]))
        np.testing.assert_allclose(qe * sign, qs[-1], atol=1e-3)

    def test_masked_padding(self):
        P, V, qs, imu = simulate_trajectory(100)
        pad = np.zeros((50, 7), np.float32)
        imu_pad = np.concatenate([imu, pad])
        mask = np.concatenate([np.ones(len(imu), bool), np.zeros(50, bool)])
        a = pre_mod.preintegrate(jnp.asarray(imu), jnp.ones(len(imu), bool),
                                 jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3)
        b = pre_mod.preintegrate(jnp.asarray(imu_pad), jnp.asarray(mask),
                                 jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3)
        np.testing.assert_allclose(np.asarray(a.dP), np.asarray(b.dP),
                                   atol=1e-6)
        np.testing.assert_allclose(float(a.dt), float(b.dt), atol=1e-6)

    def test_bias_jacobians(self):
        # first-order correction must approximate re-integration at new bias
        P, V, qs, imu = simulate_trajectory(100, seed=1)
        dbg = np.array([0.01, -0.02, 0.015], np.float32)
        dba = np.array([0.05, 0.03, -0.04], np.float32)
        pre0 = pre_mod.preintegrate(jnp.asarray(imu), jnp.ones(len(imu), bool),
                                    jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3)
        pre1 = pre_mod.preintegrate(jnp.asarray(imu), jnp.ones(len(imu), bool),
                                    jnp.asarray(-dbg), jnp.asarray(-dba),
                                    1e-4, 1e-3)
        # integrating at bias -d == measurements shifted by +d: correct pre0
        # by delta = (-d) - 0 = -d ... bias_corrected(pre0, -(-dbg))?
        dP, dV, dR = pre_mod.bias_corrected(pre0, jnp.asarray(-dbg),
                                            jnp.asarray(-dba))
        np.testing.assert_allclose(np.asarray(dP), np.asarray(pre1.dP),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(dV), np.asarray(pre1.dV),
                                   atol=2e-3)
        sign = np.sign(np.dot(np.asarray(dR), np.asarray(pre1.dR)))
        np.testing.assert_allclose(np.asarray(dR) * sign,
                                   np.asarray(pre1.dR), atol=1e-3)

    def test_covariance_grows(self):
        _, _, _, imu = simulate_trajectory(100)
        pre = pre_mod.preintegrate(jnp.asarray(imu), jnp.ones(len(imu), bool),
                                   jnp.zeros(3), jnp.zeros(3), 1e-3, 1e-2)
        cov = np.asarray(pre.cov)
        assert np.all(np.linalg.eigvalsh(cov) >= -1e-10)
        assert np.trace(cov) > 0

    def test_imu_residual_zero_at_truth(self):
        P, V, qs, imu = simulate_trajectory(150, seed=2)
        pre = pre_mod.preintegrate(jnp.asarray(imu), jnp.ones(len(imu), bool),
                                   jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3)
        ns_i = ns_mod.NavState(P=jnp.asarray(P[0]), V=jnp.asarray(V[0]),
                               q=jnp.asarray(qs[0]), bg=jnp.zeros(3),
                               ba=jnp.zeros(3))
        ns_j = ns_mod.NavState(P=jnp.asarray(P[-1]), V=jnp.asarray(V[-1]),
                               q=jnp.asarray(qs[-1]), bg=jnp.zeros(3),
                               ba=jnp.zeros(3))
        r = ns_mod.imu_residual(ns_i, ns_j, pre, jnp.asarray(G_W))
        assert float(jnp.abs(r).max()) < 5e-3, np.asarray(r)


class TestViInit:
    def _window(self, n_kf=12, steps_per_kf=40, bg=np.zeros(3),
                ba=np.zeros(3), scale=3.7, seed=3):
        n_steps = n_kf * steps_per_kf + 1
        P, V, qs, imu = simulate_trajectory(n_steps, seed=seed, bg=bg, ba=ba)
        kf_idx = np.arange(0, n_steps, steps_per_kf)
        # vision gives camera centers at arbitrary scale; take Tbc=identity
        # so camera == body, centers = P / scale
        p_c = P[kf_idx] / scale
        q_wb = qs[kf_idx]
        pres = []
        for a, b in zip(kf_idx[:-1], kf_idx[1:]):
            pres.append(pre_mod.preintegrate(
                jnp.asarray(imu[a:b]), jnp.ones(b - a, bool),
                jnp.zeros(3), jnp.zeros(3), 1e-4, 1e-3))
        pre = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
        return (jnp.asarray(p_c), jnp.asarray(q_wb), pre,
                jnp.ones(len(kf_idx), bool))

    def test_recovers_gyro_bias(self):
        bg = np.array([0.02, -0.015, 0.01], np.float32)
        p_c, q_wb, pre, mask = self._window(bg=bg)
        bg_est = vi_init.estimate_gyro_bias(q_wb, pre, mask[:-1])
        np.testing.assert_allclose(np.asarray(bg_est), bg, atol=2e-3)

    def test_recovers_scale_and_gravity(self):
        p_c, q_wb, pre, mask = self._window(scale=3.7)
        res = vi_init.try_init_vio(p_c, q_wb, pre, mask, jnp.zeros(3))
        assert bool(res.ok)
        # vision centers are P / 3.7, so the metric scale factor is 3.7
        assert abs(float(res.scale) - 3.7) / 3.7 < 0.05, res.scale
        gw = np.asarray(res.gw)
        np.testing.assert_allclose(gw, G_W, atol=0.3)

    def test_recovers_accel_bias(self):
        ba = np.array([0.08, -0.05, 0.06], np.float32)
        p_c, q_wb, pre, mask = self._window(ba=ba, scale=2.0)
        res = vi_init.try_init_vio(p_c, q_wb, pre, mask, jnp.zeros(3))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.ba), ba, atol=0.03)


class TestCompose:
    def test_compose_matches_direct_integration(self):
        """compose(A, B) must equal integrating the concatenated rows:
        deltas, all five bias Jacobians, covariance."""
        from ygz_tpu.imu import preintegration as pre_mod
        rng = np.random.RandomState(3)
        nA, nB = 37, 53
        rows = np.concatenate(
            [np.full((nA + nB, 1), DT, np.float32),
             rng.randn(nA + nB, 6).astype(np.float32) * 0.3
             + np.array([0.05, -0.02, 0.1, 0.2, -9.7, 0.3], np.float32)],
            axis=1)
        bg = jnp.zeros(3)
        ba = jnp.zeros(3)
        gn, an = 1.7e-4, 2e-3

        def integ(r):
            pad = np.zeros((64, 7), np.float32)
            pad[:len(r)] = r
            m = np.arange(64) < len(r)
            return pre_mod.preintegrate(jnp.asarray(pad), jnp.asarray(m),
                                        bg, ba, gn, an)

        A = integ(rows[:nA])
        B = integ(rows[nA:])
        AB = pre_mod.compose(A, B)
        pad = np.zeros((128, 7), np.float32)
        pad[:len(rows)] = rows
        direct = pre_mod.preintegrate(
            jnp.asarray(pad), jnp.asarray(np.arange(128) < len(rows)),
            bg, ba, gn, an)

        for f in ("dP", "dV", "dR", "dt", "J_P_bg", "J_P_ba",
                  "J_V_bg", "J_V_ba", "J_R_bg", "cov"):
            va = np.asarray(getattr(AB, f))
            vd = np.asarray(getattr(direct, f))
            scale = max(1.0, np.abs(vd).max())
            assert np.allclose(va, vd, atol=2e-4 * scale), \
                (f, va, vd)
