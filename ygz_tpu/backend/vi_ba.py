"""Visual-inertial NavState optimization: per-frame pose optimization with
an IMU edge + marginalization prior, and sliding-window VI bundle
adjustment.

Replaces the reference's inertial Optimizer entry points
(/root/reference/src/Optimizer.cc:278-618 PoseOptimization with
KeyFrame/Frame IMU constraints, :863-1279 LocalBundleAdjustmentNavState)
and the 1149-line hand-written g2o Jacobians of src/IMU/g2otypes.cpp:
every edge's linearization here comes from jax.jacfwd over the 15-dof
retraction — exact, batched, and impossible to get wrong by hand.

State blocks are full 15-dof NavStates (the reference splits PVR/Bias
into two g2o vertices purely to reuse its solver's block structure;
a single block is equivalent).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ygz_tpu.core import lie
from ygz_tpu.core.robust import CHI2_2DOF, huber_weight
from ygz_tpu.core.smallsolve import solve_spd_unrolled
from ygz_tpu.imu import navstate as ns_mod
from ygz_tpu.imu.preintegration import PreintState


def _vision_residuals(ns: ns_mod.NavState, Tbc, pts_w, uv, fx, fy, cx, cy):
    """Reprojection residuals through the NavState: [N, 2]."""
    T_cw = ns_mod.navstate_to_tcw(ns, Tbc)
    pc = lie.se3_apply(T_cw, pts_w)
    z = jnp.maximum(pc[..., 2], 1e-3)
    u = fx * pc[..., 0] / z + cx
    v = fy * pc[..., 1] / z + cy
    r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], -1)
    return r, pc[..., 2]


def _imu_info(pre: PreintState):
    """9x9 information matrix from the preintegration covariance. The
    covariance floor caps the information at ~1e6 so the float32 normal
    equations stay solvable next to vision terms (g2o runs in double;
    our f32 solves use this floor + Jacobi scaling instead)."""
    cov = pre.cov + jnp.eye(9) * 1e-6
    return jnp.linalg.inv(cov)


def _jacobi_solve(H, b, damping=1e-4):
    """Diagonally-preconditioned SPD solve: D^-1/2 H D^-1/2 y = D^-1/2 b.
    Keeps mixed-magnitude (IMU ~1e6, vision ~1e2) systems well-scaled
    in float32."""
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-8))
    Hs = H / d[:, None] / d[None, :]
    bs = b / d
    n = H.shape[0]
    y = jnp.linalg.solve(Hs + damping * jnp.eye(n), bs)
    return y / d


def pose_optimization_vi(ns0: ns_mod.NavState, ns_ref: ns_mod.NavState,
                         pre: PreintState, gw, Tbc,
                         pts_w, uv, inv_sigma2, mask,
                         fx, fy, cx, cy,
                         prior_H: Optional[jnp.ndarray] = None,
                         prior_ns: Optional[ns_mod.NavState] = None,
                         bias_hat: Optional[Tuple] = None,
                         rounds: int = 3, iters: int = 6,
                         marginalize: bool = True):
    """Optimize one frame's 15-dof NavState against a FIXED reference
    state (last KF or last frame) + vision + optional prior.

    Mirrors the reference's two inertial PoseOptimization overloads
    (src/Optimizer.cc:278-618, :619-861): IMU edge, projection edges,
    prior edge, chi2 re-classification rounds, and an output 15x15
    marginalization prior for the next frame.

    Returns (ns, inlier_mask, n_inliers, H_marg).
    """
    info_imu = _imu_info(pre)
    bg_hat, ba_hat = (ns_ref.bg, ns_ref.ba) if bias_hat is None else bias_hat

    def run_round(robust, inlier, ns_start):
        def gn(i, ns_cur):
            zero = jnp.zeros(15)

            def r_imu_fn(dx):
                ns = ns_mod.retract(ns_cur, dx)
                return ns_mod.imu_residual_biased(ns_ref, ns, pre, gw,
                                                  bg_hat, ba_hat)

            def r_vis_fn(dx):
                ns = ns_mod.retract(ns_cur, dx)
                rv, _ = _vision_residuals(ns, Tbc, pts_w, uv, fx, fy, cx, cy)
                return rv

            r_imu = r_imu_fn(zero)
            J_imu = jax.jacfwd(r_imu_fn)(zero)           # [9, 15]
            rv = r_vis_fn(zero)
            Jv = jax.jacfwd(r_vis_fn)(zero)              # [N, 2, 15]

            _, z = _vision_residuals(ns_cur, Tbc, pts_w, uv, fx, fy, cx, cy)
            chi2 = jnp.sum(rv * rv, -1) * inv_sigma2
            if robust:
                rw = huber_weight(jnp.sqrt(jnp.maximum(chi2, 1e-12)),
                                  CHI2_2DOF ** 0.5)
            else:
                rw = 1.0
            w = jnp.where(inlier & (z > 1e-3), inv_sigma2 * rw, 0.0)

            H = J_imu.T @ info_imu @ J_imu
            b = -J_imu.T @ info_imu @ r_imu
            H = H + jnp.einsum("nad,nae,n->de", Jv, Jv, w)
            b = b - jnp.einsum("nad,na,n->d", Jv, rv, w)
            if prior_H is not None and prior_ns is not None:
                # prior residual: difference of ns_cur from prior_ns in the
                # prior's tangent; J = d retract / d dx ~ I at 0
                dP = ns_cur.P - prior_ns.P
                dV = ns_cur.V - prior_ns.V
                dphi = lie.so3_log(lie.quat_mul(lie.quat_conj(prior_ns.q),
                                                ns_cur.q))
                dbias = jnp.concatenate([ns_cur.bg - prior_ns.bg,
                                         ns_cur.ba - prior_ns.ba])
                r_pr = jnp.concatenate([dP, dV, dphi, dbias])
                H = H + prior_H
                b = b - prior_H @ r_pr
            dx = _jacobi_solve(H, b, damping=1e-6)
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            return ns_mod.retract(ns_cur, dx)

        ns = jax.lax.fori_loop(0, iters, gn, ns_start)
        rv, z = _vision_residuals(ns, Tbc, pts_w, uv, fx, fy, cx, cy)
        chi2 = jnp.sum(rv * rv, -1) * inv_sigma2
        inlier = mask & (z > 1e-3) & (chi2 <= CHI2_2DOF)
        return ns, inlier

    ns, inlier = ns0, mask
    for rnd in range(rounds):
        ns, inlier = run_round(rnd < rounds - 1, inlier, ns)

    # marginalization: the full H at the solution becomes next frame's
    # prior (reference computes mMargCovInv, src/Optimizer.cc:560-618)
    H_marg = jnp.zeros((15, 15))
    if marginalize:
        zero = jnp.zeros(15)

        def r_imu_fn(dx):
            nsx = ns_mod.retract(ns, dx)
            return ns_mod.imu_residual_biased(ns_ref, nsx, pre, gw,
                                              bg_hat, ba_hat)

        def r_vis_fn(dx):
            nsx = ns_mod.retract(ns, dx)
            rv2, _ = _vision_residuals(nsx, Tbc, pts_w, uv, fx, fy, cx, cy)
            return rv2

        J_imu = jax.jacfwd(r_imu_fn)(zero)
        Jv = jax.jacfwd(r_vis_fn)(zero)
        w = jnp.where(inlier, inv_sigma2, 0.0)
        H_marg = J_imu.T @ info_imu @ J_imu \
            + jnp.einsum("nad,nae,n->de", Jv, Jv, w)

    return ns, inlier, jnp.sum(inlier.astype(jnp.int32)), H_marg


class ViWindowProblem(NamedTuple):
    """Sliding-window VI BA inputs (all padded to the window capacity W).

    ns:        NavState of arrays [W, ...]
    pre:       PreintState of arrays [W-1, ...] (segment i -> i+1)
    pre_mask:  [W-1] IMU segment validity
    kf_mask:   [W]
    kf_fixed:  [W] (the KF before the window is fixed — reference
               includes pKFPrevLocal as fixed, src/Optimizer.cc:939-972)
    obs_kf:    [O] window-local KF index
    obs_pt:    [O, 3] world points (held fixed — see note)
    obs_uv:    [O, 2]
    obs_inv_sigma2: [O]
    obs_mask:  [O]
    bg_hat, ba_hat: [3] biases the preintegrations were computed at
    """
    ns: ns_mod.NavState
    pre: PreintState
    pre_mask: jnp.ndarray
    kf_mask: jnp.ndarray
    kf_fixed: jnp.ndarray
    obs_kf: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_inv_sigma2: jnp.ndarray
    obs_mask: jnp.ndarray
    bg_hat: jnp.ndarray
    ba_hat: jnp.ndarray


def local_ba_navstate(prob: ViWindowProblem, gw, Tbc, fx, fy, cx, cy,
                      iters: int = 8):
    """Sliding-window visual-inertial BA over W NavStates (reference
    LocalBundleAdjustmentNavState, window size 10,
    /root/reference/src/Optimizer.cc:863-1279).

    Map points are held fixed here and re-refined by the vision local BA
    that runs in the same mapping step — a deliberate alternation
    (block-coordinate descent) instead of the reference's joint solve;
    each alternation is cheaper and the mapping step runs both.
    Returns the optimized NavStates.
    """
    W = prob.kf_mask.shape[0]
    D = W * 15

    def gn(i, ns_flat):
        ns = ns_flat
        zero = jnp.zeros((W, 15))

        def imu_res_all(dx):
            nsx = jax.vmap(ns_mod.retract)(ns, dx)
            def seg(k):
                ns_i = jax.tree.map(lambda a: a[k], nsx)
                ns_j = jax.tree.map(lambda a: a[k + 1], nsx)
                pre_k = jax.tree.map(lambda a: a[k], prob.pre)
                return ns_mod.imu_residual_biased(
                    ns_i, ns_j, pre_k, gw, prob.bg_hat, prob.ba_hat)
            return jax.vmap(seg)(jnp.arange(W - 1))      # [W-1, 9]

        def vis_res_all(dx):
            nsx = jax.vmap(ns_mod.retract)(ns, dx)
            ns_o = jax.tree.map(lambda a: a[prob.obs_kf], nsx)
            T_cw = jax.vmap(lambda n: ns_mod.navstate_to_tcw(n, Tbc))(ns_o)
            pc = lie.quat_rotate(T_cw["q"], prob.obs_pt) + T_cw["t"]
            z = jnp.maximum(pc[..., 2], 1e-3)
            u = fx * pc[..., 0] / z + cx
            v = fy * pc[..., 1] / z + cy
            return jnp.stack([u - prob.obs_uv[..., 0],
                              v - prob.obs_uv[..., 1]], -1)

        r_imu = imu_res_all(zero)                        # [W-1, 9]
        J_imu = jax.jacfwd(imu_res_all)(zero)            # [W-1, 9, W, 15]
        rv = vis_res_all(zero)                           # [O, 2]
        Jv = jax.jacfwd(vis_res_all)(zero)               # [O, 2, W, 15]

        info = jax.vmap(_imu_info)(prob.pre)             # [W-1, 9, 9]
        wseg = prob.pre_mask.astype(r_imu.dtype)
        chi2 = jnp.sum(rv * rv, -1) * prob.obs_inv_sigma2
        rw = huber_weight(jnp.sqrt(jnp.maximum(chi2, 1e-12)),
                          CHI2_2DOF ** 0.5)
        wv = jnp.where(prob.obs_mask, prob.obs_inv_sigma2 * rw, 0.0)

        Ji = J_imu.reshape(W - 1, 9, D)
        Jvf = Jv.reshape(-1, 2, D)
        H = jnp.einsum("sad,sab,sbe,s->de", Ji, info, Ji, wseg)
        b = -jnp.einsum("sad,sab,sb,s->d", Ji, info, r_imu, wseg)
        H = H + jnp.einsum("oad,oae,o->de", Jvf, Jvf, wv)
        b = b - jnp.einsum("oad,oa,o->d", Jvf, rv, wv)

        free = (prob.kf_mask & ~prob.kf_fixed)
        fvec = jnp.repeat(free, 15)
        H = jnp.where(fvec[:, None] & fvec[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(fvec, 0.0, 1.0))
        b = jnp.where(fvec, b, 0.0)
        dx = _jacobi_solve(H, b, damping=1e-5)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(W, 15)
        dx = jnp.where(free[:, None], dx, 0.0)
        return jax.vmap(ns_mod.retract)(ns, dx)

    return jax.lax.fori_loop(0, iters, gn, prob.ns)
