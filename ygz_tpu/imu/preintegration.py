"""On-manifold IMU preintegration (Forster/Forssen style) as a lax.scan.

Parity target: the reference's IMUPreintegrator
(/root/reference/src/IMU/IMUPreintegrator.cpp:62-121) — delta P/V/R
updates, the five bias Jacobians, and 9x9 [P, V, Phi] covariance
propagation cov <- A cov A^T + Bg Sg Bg^T + Ca Sa Ca^T — but over a
PADDED measurement array with a validity mask so every frame's
preintegration compiles to the same program regardless of sample count.

Noise model defaults mirror the reference's hard-coded EuRoC-ish values
with their x10 / x100 inflation (/root/reference/src/IMU/imudata.cpp:19-29);
they are configurable through SlamConfig rather than compile-time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ygz_tpu.core import lie


class PreintState(NamedTuple):
    """Preintegrated IMU measurements between two frames/keyframes.

    dP, dV: [3]; dR: quaternion [4]; dt: scalar total time
    J_P_bg, J_P_ba, J_V_bg, J_V_ba, J_R_bg: [3,3] bias Jacobians
    cov: [9,9] covariance of [dP, dV, dPhi]
    """
    dP: jnp.ndarray
    dV: jnp.ndarray
    dR: jnp.ndarray
    dt: jnp.ndarray
    J_P_bg: jnp.ndarray
    J_P_ba: jnp.ndarray
    J_V_bg: jnp.ndarray
    J_V_ba: jnp.ndarray
    J_R_bg: jnp.ndarray
    cov: jnp.ndarray


def empty_preint(dtype=jnp.float32) -> PreintState:
    z3 = jnp.zeros(3, dtype)
    z33 = jnp.zeros((3, 3), dtype)
    return PreintState(
        dP=z3, dV=z3, dR=lie.quat_identity(dtype), dt=jnp.zeros((), dtype),
        J_P_bg=z33, J_P_ba=z33, J_V_bg=z33, J_V_ba=z33, J_R_bg=z33,
        cov=jnp.zeros((9, 9), dtype))


def preintegrate(imu: jnp.ndarray, mask: jnp.ndarray,
                 bg: jnp.ndarray, ba: jnp.ndarray,
                 gyro_noise: float, acc_noise: float) -> PreintState:
    """Integrate a padded IMU block.

    imu:  [n, 7] rows (dt, wx, wy, wz, ax, ay, az) — dt is the interval
          covered by this sample (host loader precomputes it)
    mask: [n] valid rows
    bg, ba: [3] gyro/accel biases to integrate about
    """
    sg2 = gyro_noise * gyro_noise
    sa2 = acc_noise * acc_noise

    def step(s: PreintState, row):
        m, dt, w, a = row
        dt = jnp.where(m, dt, 0.0)
        omega = (w - bg) * dt
        acc = a - ba

        dRm = lie.quat_to_matrix(s.dR)
        acc_hat = lie.hat(acc)
        dq = lie.so3_exp(omega)
        dR_inc = lie.quat_to_matrix(dq)
        Jr = lie.so3_right_jacobian(omega)

        dt2 = dt * dt
        # covariance propagation: state [dP, dV, dPhi]
        A = jnp.zeros((9, 9))
        I3 = jnp.eye(3)
        A = A.at[0:3, 0:3].set(I3)
        A = A.at[0:3, 3:6].set(I3 * dt)
        A = A.at[0:3, 6:9].set(-0.5 * dRm @ acc_hat * dt2)
        A = A.at[3:6, 3:6].set(I3)
        A = A.at[3:6, 6:9].set(-dRm @ acc_hat * dt)
        A = A.at[6:9, 6:9].set(dR_inc.T)
        Bg = jnp.zeros((9, 3)).at[6:9, :].set(Jr * dt)
        Ca = jnp.zeros((9, 3))
        Ca = Ca.at[0:3, :].set(0.5 * dRm * dt2)
        Ca = Ca.at[3:6, :].set(dRm * dt)
        cov = A @ s.cov @ A.T + sg2 * (Bg @ Bg.T) + sa2 * (Ca @ Ca.T)

        # bias Jacobians (order per the reference: P first with old V/R)
        J_P_ba = s.J_P_ba + s.J_V_ba * dt - 0.5 * dRm * dt2
        J_P_bg = s.J_P_bg + s.J_V_bg * dt \
            - 0.5 * dRm @ acc_hat @ s.J_R_bg * dt2
        J_V_ba = s.J_V_ba - dRm * dt
        J_V_bg = s.J_V_bg - dRm @ acc_hat @ s.J_R_bg * dt
        J_R_bg = dR_inc.T @ s.J_R_bg - Jr * dt

        # deltas (P with old V/R, V with old R, R last)
        dP = s.dP + s.dV * dt + 0.5 * dRm @ acc * dt2
        dV = s.dV + dRm @ acc * dt
        dR = lie.quat_normalize(lie.quat_mul(s.dR, dq))

        new = PreintState(dP=dP, dV=dV, dR=dR, dt=s.dt + dt,
                          J_P_bg=J_P_bg, J_P_ba=J_P_ba,
                          J_V_bg=J_V_bg, J_V_ba=J_V_ba, J_R_bg=J_R_bg,
                          cov=cov)
        # masked rows are no-ops
        out = jax.tree.map(lambda o, n: jnp.where(m, n, o), s, new)
        return out, None

    rows = (mask, imu[:, 0], imu[:, 1:4], imu[:, 4:7])
    state, _ = jax.lax.scan(step, empty_preint(), rows)
    return state


def bias_corrected(pre: PreintState, dbg, dba):
    """First-order bias update of the deltas (the optimizers evaluate
    residuals at bias + delta without re-integrating — the whole point of
    the bias Jacobians)."""
    dP = pre.dP + pre.J_P_bg @ dbg + pre.J_P_ba @ dba
    dV = pre.dV + pre.J_V_bg @ dbg + pre.J_V_ba @ dba
    dR = lie.quat_mul(pre.dR, lie.so3_exp(pre.J_R_bg @ dbg))
    return dP, dV, lie.quat_normalize(dR)


def compose(a: PreintState, b: PreintState) -> PreintState:
    """Exact composition of consecutive preintegrations (A: i->j, B:
    j->k) into the i->k preintegration — deltas, bias Jacobians, and
    covariance, all closed-form (standard on-manifold preintegration
    algebra).

    Used when keyframe culling merges two IMU gaps: re-integrating the
    concatenated rows needs a bigger padded buffer (a fresh device
    program per length bucket) and O(n) work; composition is O(1) and
    exact, so the per-gap buffers never grow past the base pad. The
    reference re-integrates on SetBadFlag instead
    (/root/reference/src/LocalMapping.cc:1419-1500) because its CPU
    loop is free to be dynamic."""
    RA = lie.quat_to_matrix(a.dR)
    RBT = lie.quat_to_matrix(b.dR).T
    dtB = b.dt
    hPB = lie.hat(b.dP)
    hVB = lie.hat(b.dV)

    dP = a.dP + a.dV * dtB + RA @ b.dP
    dV = a.dV + RA @ b.dV
    dR = lie.quat_normalize(lie.quat_mul(a.dR, b.dR))

    J_R_bg = RBT @ a.J_R_bg + b.J_R_bg
    J_V_bg = a.J_V_bg - RA @ hVB @ a.J_R_bg + RA @ b.J_V_bg
    J_V_ba = a.J_V_ba + RA @ b.J_V_ba
    J_P_bg = a.J_P_bg + a.J_V_bg * dtB - RA @ hPB @ a.J_R_bg \
        + RA @ b.J_P_bg
    J_P_ba = a.J_P_ba + a.J_V_ba * dtB + RA @ b.J_P_ba

    I3 = jnp.eye(3)
    Z3 = jnp.zeros((3, 3))
    F = jnp.block([[I3, I3 * dtB, -RA @ hPB],
                   [Z3, I3, -RA @ hVB],
                   [Z3, Z3, RBT]])
    G = jnp.block([[RA, Z3, Z3],
                   [Z3, RA, Z3],
                   [Z3, Z3, I3]])
    cov = F @ a.cov @ F.T + G @ b.cov @ G.T

    return PreintState(dP=dP, dV=dV, dR=dR, dt=a.dt + dtB,
                       J_P_bg=J_P_bg, J_P_ba=J_P_ba,
                       J_V_bg=J_V_bg, J_V_ba=J_V_ba, J_R_bg=J_R_bg,
                       cov=cov)
