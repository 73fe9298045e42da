"""Visual-inertial initialization: estimate gyro bias, metric scale,
gravity direction, and accelerometer bias from a vision-only trajectory
plus preintegrated IMU segments.

Parity target: LocalMapping::TryInitVIO (/root/reference/src/
LocalMapping.cc:189-723), which runs three estimation steps after a
vision-only global BA:
  1. gyro bias by Gauss-Newton on rotation-preintegration residuals
     (reference Optimizer::OptimizeInitialGyroBias, src/Optimizer.cc:1414)
  2. linear LS for scale + gravity vector from KF triples (:266-319)
  3. refinement with the |g| = 9.81 constraint, solving for scale,
     2-dof gravity correction, and accel bias (:322-401)

All three are small batched linear-algebra problems (the biggest is a
[3(N-2), 6] least squares) — solved directly with one SVD each.
Inputs are padded arrays over the keyframe window; invalid rows zero out.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ygz_tpu.core import lie
from ygz_tpu.imu.preintegration import PreintState


def _lstsq64(A, B):
    """Host float64 least squares for the tiny init systems.

    The [s, dthetaxy, ba] system is ill-conditioned at gentle excitation
    (gravity-direction and accel-bias columns are nearly collinear);
    float32 QR rounding (~1e-7 relative) blows up along the near-null
    direction into O(1) bias/direction errors EVEN ON EXACT DATA
    (observed: ba ~ 4.7 m/s^2, gravity 28 deg off, with ground-truth
    poses). The systems are [3T, 4..6] — a host f64 solve is free; the
    reference runs g2o/Eigen in double throughout for the same reason
    (SURVEY 'float64 islands')."""
    import numpy as _np
    x, *_ = _np.linalg.lstsq(_np.asarray(A, _np.float64),
                             _np.asarray(B, _np.float64), rcond=None)
    return jnp.asarray(x.astype(_np.float32))


class ViInitResult(NamedTuple):
    bg: jnp.ndarray        # [3]
    ba: jnp.ndarray        # [3]
    scale: jnp.ndarray     # []
    gw: jnp.ndarray        # [3] gravity in world (vision) frame
    ok: jnp.ndarray        # bool (rough conditioning check)


def estimate_gyro_bias(q_wb, pre: PreintState, pair_mask,
                       num_iters: int = 4):
    """GN for bg: minimize |log(dR_ij(bg)^T R_bw_i R_wb_j)|^2 over
    consecutive-KF pairs. q_wb: [K, 4] body-to-world rotations; pre:
    batched PreintState with leading dim K-1 (segment i -> i+1);
    pair_mask: [K-1]."""

    def residuals(bg):
        dR_corr = jax.vmap(
            lambda dRq, J: lie.quat_mul(dRq, lie.so3_exp(J @ bg))
        )(pre.dR, pre.J_R_bg)
        rel = jax.vmap(
            lambda qi, qj: lie.quat_mul(lie.quat_conj(qi), qj)
        )(q_wb[:-1], q_wb[1:])
        err = jax.vmap(
            lambda d, r: lie.so3_log(lie.quat_mul(lie.quat_conj(d), r))
        )(dR_corr, rel)
        return err  # [K-1, 3]

    def gn(i, bg):
        r = residuals(bg)
        J = jax.jacfwd(lambda b: jnp.where(pair_mask[:, None],
                                           residuals(b), 0.0))(bg)
        Jf = J.reshape(-1, 3)
        rf = jnp.where(pair_mask[:, None], r, 0.0).reshape(-1)
        H = Jf.T @ Jf
        g = -Jf.T @ rf
        dbg = jnp.linalg.solve(H + 1e-8 * jnp.eye(3), g)
        return bg + jnp.where(jnp.all(jnp.isfinite(dbg)), dbg, 0.0)

    return jax.lax.fori_loop(0, num_iters, gn, jnp.zeros(3))


def estimate_scale_gravity(p_c, q_wb, pre: PreintState, triple_mask, pbc):
    """Step 2: linear solve for [s, gw] from consecutive KF triples.

    p_c: [K, 3] CAMERA centers from vision (unscaled); q_wb: [K, 4] body
    rotations; pre: [K-1] preintegrations; pbc: [3] camera position in
    body frame (from Tbc). Solves A [s, gw] = B stacked over triples
    (reference /root/reference/src/LocalMapping.cc:266-319), unweighted
    like the reference: a per-triple IMU-covariance whitening was tried
    and REGRESSED the e2e — with real tracked poses the row error is
    vision-dominated, so IMU whitening mis-weights short-gap rows.
    """
    lam, k, B0, _ = _triple_terms(p_c, q_wb, pre, pbc)
    beta = k[:, None, None] * jnp.broadcast_to(jnp.eye(3),
                                               (lam.shape[0], 3, 3))
    A = jnp.concatenate([lam[..., None], beta], axis=-1)  # [T, 3, 4]
    B = B0
    w = triple_mask.astype(A.dtype)
    Af = (A * w[:, None, None]).reshape(-1, 4)
    Bf = (B * w[:, None]).reshape(-1)
    x = _lstsq64(Af, Bf)
    return x[0], x[1:4]  # s, gw


def _triple_terms(p_c, q_wb, pre: PreintState, pbc):
    """Shared per-triple quantities for steps 2/3. Derivation (VI-ORB):
    with body positions p_b = s*alpha - R_wb*pbc (alpha = vision camera
    centers) and the preintegrated kinematics, eliminating velocities over
    the triple (1,2,3) gives

      s*lam + k*g = B0 + zeta*ba,   k = 0.5*dt12*dt23*(dt12+dt23)
      lam  = (a2-a1)*dt23 - (a3-a2)*dt12
      B0   = (R2-R1)pbc*dt23 + (R2-R3)pbc*dt12
             + R1*dP12*dt23 - R2*dP23*dt12 - R1*dV12*dt12*dt23
      zeta = -(R1*Jp12*dt23 - R2*Jp23*dt12 - R1*Jv12*dt12*dt23)
             (the ba-sensitivity of -B0's preintegration terms)
    """
    dt12 = pre.dt[:-1]
    dt23 = pre.dt[1:]
    dp12 = pre.dP[:-1]
    dp23 = pre.dP[1:]
    dv12 = pre.dV[:-1]
    R1 = lie.quat_to_matrix(q_wb[:-2])
    R2 = lie.quat_to_matrix(q_wb[1:-1])
    R3 = lie.quat_to_matrix(q_wb[2:])
    a1, a2, a3 = p_c[:-2], p_c[1:-1], p_c[2:]

    lam = (a2 - a1) * dt23[:, None] - (a3 - a2) * dt12[:, None]
    k = 0.5 * dt12 * dt23 * (dt12 + dt23)
    B0 = (jnp.einsum("kij,j->ki", R2 - R1, pbc) * dt23[:, None]
          + jnp.einsum("kij,j->ki", R2 - R3, pbc) * dt12[:, None]
          + jnp.einsum("kij,kj->ki", R1, dp12) * dt23[:, None]
          - jnp.einsum("kij,kj->ki", R2, dp23) * dt12[:, None]
          - jnp.einsum("kij,kj->ki", R1, dv12) * (dt12 * dt23)[:, None])
    # d B0 / d ba (preintegration deltas move with the bias Jacobians)
    zeta = (jnp.einsum("kij,kjl->kil", R1, pre.J_P_ba[:-1])
            * dt23[:, None, None]
            - jnp.einsum("kij,kjl->kil", R2, pre.J_P_ba[1:])
            * dt12[:, None, None]
            - jnp.einsum("kij,kjl->kil", R1, pre.J_V_ba[:-1])
            * (dt12 * dt23)[:, None, None])
    return lam, k, B0, zeta


def refine_with_gravity_norm(p_c, q_wb, pre: PreintState, triple_mask,
                             pbc, gw0, gravity: float = 9.810,
                             ba_prior_weight: float = 0.0):
    """Step 3: with |g| fixed, solve [s, dthetaxy, ba] (reference
    /root/reference/src/LocalMapping.cc:322-401).

    ba_prior_weight > 0 appends a Tikhonov prior ba ~ 0 to the least
    squares: over short init windows with gentle rotation the accel
    bias is weakly observable and acts as the error sink for vision
    pose noise — a 2 deg rotation error otherwise solves to ~0.5 m/s^2
    of phantom bias plus an attenuated scale (the known VI-ORB
    weak-observability caveat; the reference mitigates with a 15 s
    window)."""
    gI = jnp.array([0.0, 0.0, -1.0])
    gwn = gw0 / jnp.maximum(jnp.linalg.norm(gw0), 1e-9)
    v = jnp.cross(gI, gwn)
    s_ang = jnp.linalg.norm(v)
    c_ang = jnp.dot(gI, gwn)
    ang = jnp.arctan2(s_ang, c_ang)
    axis = v / jnp.maximum(s_ang, 1e-9)
    R_wi = lie.quat_to_matrix(lie.so3_exp(axis * ang))
    g_hat = R_wi @ gI * gravity

    lam, k, B0, zeta = _triple_terms(p_c, q_wb, pre, pbc)
    # g = R_wi exp(dtheta) gI*G ~ g_hat - R_wi hat(gI*G) dtheta  (z unobs.)
    phi = -k[:, None, None] * (R_wi @ lie.hat(gI * gravity))[None, :, :2]
    C = jnp.concatenate([lam[..., None], phi, -zeta], axis=-1)  # [T, 3, 6]
    D = B0 - k[:, None] * g_hat[None, :]
    w = triple_mask.astype(C.dtype)
    Cf = (C * w[:, None, None]).reshape(-1, 6)
    Df = (D * w[:, None]).reshape(-1)
    if ba_prior_weight > 0.0:
        prior = jnp.concatenate(
            [jnp.zeros((3, 3), Cf.dtype),
             ba_prior_weight * jnp.eye(3, dtype=Cf.dtype)], axis=-1)
        Cf = jnp.concatenate([Cf, prior], axis=0)
        Df = jnp.concatenate([Df, jnp.zeros((3,), Df.dtype)])
    x = _lstsq64(Cf, Df)
    s = x[0]
    dtheta = jnp.concatenate([x[1:3], jnp.zeros(1)])
    ba = x[3:6]
    g_refined = R_wi @ lie.quat_to_matrix(lie.so3_exp(dtheta)) @ gI * gravity
    return s, g_refined, ba


def try_init_vio(p_c, q_wb, pre: PreintState, kf_mask, pbc,
                 gravity: float = 9.810,
                 ba_prior_weight: float = 0.0) -> ViInitResult:
    """Full three-step VI initialization over a padded KF window.

    p_c: [K, 3] camera centers (vision scale); q_wb: [K, 4] body-to-world
    rotations (from vision + Tbc); pre: batched [K-1] preintegrations
    (integrated at zero bias); kf_mask: [K]. ba_prior_weight: see
    refine_with_gravity_norm.
    """
    pair_mask = kf_mask[:-1] & kf_mask[1:]
    triple_mask = kf_mask[:-2] & kf_mask[1:-1] & kf_mask[2:]

    bg = estimate_gyro_bias(q_wb, pre, pair_mask)

    # re-correct preintegration deltas to the new gyro bias (first order)
    pre_c = pre._replace(
        dP=pre.dP + jnp.einsum("kij,j->ki", pre.J_P_bg, bg),
        dV=pre.dV + jnp.einsum("kij,j->ki", pre.J_V_bg, bg),
        dR=jax.vmap(lambda q, J: lie.quat_normalize(
            lie.quat_mul(q, lie.so3_exp(J @ bg))))(pre.dR, pre.J_R_bg))

    s0, gw0 = estimate_scale_gravity(p_c, q_wb, pre_c, triple_mask, pbc)
    s, gw, ba = refine_with_gravity_norm(p_c, q_wb, pre_c, triple_mask,
                                         pbc, gw0, gravity,
                                         ba_prior_weight=ba_prior_weight)
    ok = (s > 1e-3) & jnp.all(jnp.isfinite(gw)) & \
        (jnp.abs(jnp.linalg.norm(gw) - gravity) < 0.5 * gravity)
    return ViInitResult(bg=bg, ba=ba, scale=s, gw=gw, ok=ok)
