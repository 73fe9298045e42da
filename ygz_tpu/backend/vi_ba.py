"""Visual-inertial NavState optimization: per-frame pose optimization with
an IMU edge + marginalization prior, and sliding-window VI bundle
adjustment with map-point vertices.

Replaces the reference's inertial Optimizer entry points
(/root/reference/src/Optimizer.cc:278-618 PoseOptimization with
KeyFrame/Frame IMU constraints, :863-1279 LocalBundleAdjustmentNavState)
and the 1149-line hand-written g2o Jacobians of src/IMU/g2otypes.cpp:
every pose-side linearization here comes from jax.jacfwd over the 15-dof
retraction — exact, batched, and impossible to get wrong by hand; the
point-side Jacobians are analytic (a 2x3 projection block) so points can
be Schur-eliminated without materializing an [O, 2, P, 3] tensor.

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
from ygz_tpu.imu import navstate as ns_mod
from ygz_tpu.imu.preintegration import PreintState

# Huber delta on the 15-dof prior edge (reference thHuberNavState =
# sqrt(30.5779), /root/reference/src/Optimizer.cc:348)
PRIOR_HUBER = 30.5779 ** 0.5


def _vision_residuals(ns: ns_mod.NavState, Tbc, pts_w, uv, fx, fy, cx, cy):
    """Reprojection residuals through the NavState: [N, 2]."""
    T_cw = ns_mod.navstate_to_tcw(ns, Tbc)
    pc = lie.se3_apply(T_cw, pts_w)
    z = jnp.maximum(pc[..., 2], 1e-3)
    u = fx * pc[..., 0] / z + cx
    v = fy * pc[..., 1] / z + cy
    r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], -1)
    return r, pc[..., 2]


def _vision_jac6(ns: ns_mod.NavState, Tbc, pts_w, fx, fy):
    """Analytic d(r_vis)/d[dP, dphi]: [N, 2, 6] under the NavState
    retraction (additive P; right-multiplicative body-frame phi,
    navstate.retract). Vision touches only these 6 of the 15 tangent
    dims — jacfwd over the full 15 costs 15 forward passes over all N
    projection edges per GN iteration, ~2/3 of the fused VI step's
    device time (the reference hand-codes the same blocks in
    g2otypes.cpp EdgeNavStatePVRPointXYZ::linearizeOplus).

    Chain: x_b = R_wb^T (X - P);  x_c = R_bc^T (x_b - t_bc);
      d x_b/d dP   = -R_wb^T
      d x_b/d dphi = hat(x_b)   (right perturbation R_wb e^{phi^})
    """
    Rwb = lie.quat_to_matrix(ns.q)                       # [3, 3]
    xb = lie.quat_rotate(lie.quat_conj(ns.q)[None], pts_w - ns.P[None])
    Rbc = lie.quat_to_matrix(Tbc["q"])
    xc = (xb - Tbc["t"][None]) @ Rbc                     # rows R_bc^T x
    z = jnp.maximum(xc[..., 2], 1e-3)
    zi = 1.0 / z
    zi2 = zi * zi
    zero = jnp.zeros_like(z)
    duv_dxc = jnp.stack([
        jnp.stack([fx * zi, zero, -fx * xc[..., 0] * zi2], -1),
        jnp.stack([zero, fy * zi, -fy * xc[..., 1] * zi2], -1)], -2)
    # [N, 3, 6] = [d x_b/d dP | d x_b/d dphi]
    N = xb.shape[0]
    dxb = jnp.concatenate([
        jnp.broadcast_to(-Rwb.T, (N, 3, 3)), lie.hat(xb)], axis=-1)
    return duv_dxc @ (Rbc.T @ dxb)                       # [N, 2, 6]


# tangent slots the vision Jacobian touches: dP (0:3) and dphi (6:9)
_VIS_SLOTS = (0, 1, 2, 6, 7, 8)


def _imu_info(pre: PreintState):
    """9x9 information matrix from the preintegration covariance. The
    covariance floor caps the information at ~1e6 so the float32 normal
    equations stay solvable next to vision terms (g2o runs in double;
    our f32 solves use this floor + Jacobi scaling instead)."""
    cov = pre.cov + jnp.eye(9) * 1e-6
    return jnp.linalg.inv(cov)


def _bias_walk_info(pre: PreintState, bias_walk):
    """6x6 information of the bias random-walk edge over one segment
    (reference EdgeNavStateBias information = (walk_cov * dt)^-1,
    /root/reference/src/Optimizer.cc:394-417)."""
    sg, sa = bias_walk
    dt = jnp.maximum(pre.dt, 1e-3)
    inv = jnp.concatenate([jnp.full((3,), 1.0 / (sg * sg * dt)),
                           jnp.full((3,), 1.0 / (sa * sa * dt))])
    return jnp.diag(inv)


def _prior_residual(ns, prior_ns):
    """15-dof difference of ns from the prior anchor, in the anchor's
    tangent (reference EdgeNavStatePriorPVRBias error)."""
    dphi = lie.so3_log(lie.quat_mul(lie.quat_conj(prior_ns.q), ns.q))
    return jnp.concatenate([ns.P - prior_ns.P, ns.V - prior_ns.V, dphi,
                            ns.bg - prior_ns.bg, ns.ba - prior_ns.ba])


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


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "rounds", "iters",
                     "marginalize", "bias_walk", "return_last"))
def pose_optimization_vi(ns0: ns_mod.NavState, ns_ref: ns_mod.NavState,
                         pre: PreintState, gw, Tbc,
                         pts_w, uv, inv_sigma2, mask,
                         fx, fy, cx, cy,
                         prior_H: Optional[jnp.ndarray] = None,
                         prior_ns: Optional[ns_mod.NavState] = None,
                         bias_hat: Optional[Tuple] = None,
                         rounds: int = 2, iters: int = 5,
                         marginalize: bool = True,
                         bias_walk: Optional[Tuple] = None,
                         return_last: bool = False):
    """Optimize one frame's 15-dof NavState against the previous state.

    Two modes, mirroring the reference's two inertial PoseOptimization
    overloads:

    * ``prior_H is None`` — the reference state is held FIXED (the
      KeyFrame overload, /root/reference/src/Optimizer.cc:619-861):
      IMU edge + projection edges + chi2 re-classification rounds.
    * ``prior_H/prior_ns given`` — the Frame-Frame overload
      (:278-618): the previous frame's state is a FREE vertex anchored
      by its own marginal prior (prior_H at prior_ns, Huber'd at
      sqrt(30.5779)), jointly optimized with the current frame through
      the IMU edge (plus a bias random-walk edge when ``bias_walk``
      noise densities are given). The returned H_marg is the TRUE
      marginal information of the current frame: the joint 30x30
      Hessian at the solution with the previous state Schur-eliminated
      — exactly what the reference's computeMarginals + inverse
      produces (:599-616), replacing round-2's H*0.5 discount.

    Returns (ns, inlier_mask, n_inliers, H_marg).
    """
    info_imu = _imu_info(pre)
    bg_hat, ba_hat = (ns_ref.bg, ns_ref.ba) if bias_hat is None else bias_hat
    joint = prior_H is not None and prior_ns is not None
    info_bw = _bias_walk_info(pre, bias_walk) if (joint and bias_walk) \
        else None

    def states(ns_l, ns_c, dx):
        l = ns_mod.retract(ns_l, dx[:15]) if joint else ns_l
        c = ns_mod.retract(ns_c, dx[15:])
        return l, c

    def joint_system(ns_l, ns_c, w_vis, w_prior):
        """Build the 30x30 GN system at (ns_l, ns_c) with given vision
        weights; returns (H, b).

        AD width is kept minimal per edge — vision touches only the
        CURRENT state (15 tangents, not 30), the prior only the LAST,
        and the bias-walk Jacobian is a constant +/-selection written
        analytically. Differentiating every edge over the full 30-dof
        joint tangent compiled to an XLA:CPU program so large that LLVM
        took >15 min (and intermittently segfaulted) on the test hosts;
        edge-local AD plus explicit block assembly is the same math at
        less than half the graph size."""
        zero = jnp.zeros(30)

        def r_imu_fn(dx):
            l, c = states(ns_l, ns_c, dx)
            return ns_mod.imu_residual_biased(l, c, pre, gw, bg_hat, ba_hat)

        r_imu = r_imu_fn(zero)
        J_imu = jax.jacfwd(r_imu_fn)(zero)               # [9, 30]
        rv, _ = _vision_residuals(ns_c, Tbc, pts_w, uv, fx, fy, cx, cy)
        Jv6 = _vision_jac6(ns_c, Tbc, pts_w, fx, fy)     # [N, 2, 6]

        H = J_imu.T @ info_imu @ J_imu
        b = -J_imu.T @ info_imu @ r_imu
        H66 = jnp.einsum("nad,nae,n->de", Jv6, Jv6, w_vis)
        b6 = -jnp.einsum("nad,na,n->d", Jv6, rv, w_vis)
        import numpy as _np
        rows = 15 + _np.asarray(_VIS_SLOTS)
        H = H.at[_np.ix_(rows, rows)].add(H66)
        b = b.at[rows].add(b6)
        if joint:
            # prior on the LAST state, anchored at its marginal estimate
            def r_pr_l(dl):
                return _prior_residual(ns_mod.retract(ns_l, dl), prior_ns)
            r_pr = r_pr_l(jnp.zeros(15))
            J_pr = jax.jacfwd(r_pr_l)(jnp.zeros(15))     # [15, 15]
            Hp = prior_H * w_prior
            H = H.at[:15, :15].add(J_pr.T @ Hp @ J_pr)
            b = b.at[:15].add(-(J_pr.T @ Hp @ r_pr))
            if info_bw is not None:
                # r_bw = [c.bg - l.bg; c.ba - l.ba]: J wrt the (dbg, dba)
                # tangent slots (indices 9:15 of each state) is exactly
                # -I6 (last) / +I6 (current) under the additive bias
                # retraction — no AD needed
                r_bw = jnp.concatenate([ns_c.bg - ns_l.bg,
                                        ns_c.ba - ns_l.ba])
                Hbw = info_bw                             # [6, 6]
                H = H.at[9:15, 9:15].add(Hbw)
                H = H.at[24:30, 24:30].add(Hbw)
                H = H.at[9:15, 24:30].add(-Hbw)
                H = H.at[24:30, 9:15].add(-Hbw)
                b = b.at[9:15].add(Hbw @ r_bw)
                b = b.at[24:30].add(-(Hbw @ r_bw))
        else:
            # last state fixed: freeze its block
            fvec = jnp.concatenate([jnp.zeros(15, bool), jnp.ones(15, bool)])
            H = jnp.where(fvec[:, None] & fvec[None, :], H, 0.0)
            H = H + jnp.diag(jnp.where(fvec, 0.0, 1.0))
            b = jnp.where(fvec, b, 0.0)
        return H, b

    def run_round(robust, inlier, ns_l_start, ns_c_start):
        def gn(i, carry):
            ns_l, ns_c = carry
            rv, z = _vision_residuals(ns_c, Tbc, pts_w, uv, fx, fy, cx, cy)
            chi2 = jnp.sum(rv * rv, -1) * inv_sigma2
            if robust:
                rw = huber_weight(jnp.sqrt(jnp.maximum(chi2, 1e-12)),
                                  CHI2_2DOF ** 0.5)
            else:
                rw = 1.0
            w = jnp.where(inlier & (z > 1e-3), inv_sigma2 * rw, 0.0)
            if joint and robust:
                r_pr = _prior_residual(ns_l, prior_ns)
                c_pr = r_pr @ (prior_H @ r_pr)
                w_pr = huber_weight(jnp.sqrt(jnp.maximum(c_pr, 1e-12)),
                                    PRIOR_HUBER)
            else:
                w_pr = 1.0
            H, b = joint_system(ns_l, ns_c, w, w_pr)
            dx = _jacobi_solve(H, b, damping=1e-6)
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            return states(ns_l, ns_c, dx)

        ns_l, ns_c = jax.lax.fori_loop(0, iters, gn,
                                       (ns_l_start, ns_c_start))
        rv, z = _vision_residuals(ns_c, Tbc, pts_w, uv, fx, fy, cx, cy)
        chi2 = jnp.sum(rv * rv, -1) * inv_sigma2
        inlier = mask & (z > 1e-3) & (chi2 <= CHI2_2DOF)
        return ns_l, ns_c, inlier

    ns_l, ns_c, inlier = ns_ref, ns0, mask
    for rnd in range(rounds):
        ns_l, ns_c, inlier = run_round(rnd < rounds - 1, inlier, ns_l, ns_c)

    # marginalization: the joint Hessian at the solution with the previous
    # state Schur-eliminated becomes the next frame's prior (reference
    # computeMarginals on the current frame's vertices + inverse,
    # /root/reference/src/Optimizer.cc:599-616)
    H_marg = jnp.zeros((15, 15))
    if marginalize:
        w = jnp.where(inlier, inv_sigma2, 0.0)
        Hj, _ = joint_system(ns_l, ns_c, w, 1.0)
        if joint:
            Hll = Hj[:15, :15] + jnp.eye(15) * 1e-6
            Hlc = Hj[:15, 15:]
            H_marg = Hj[15:, 15:] - Hlc.T @ jnp.linalg.solve(Hll, Hlc)
        else:
            H_marg = Hj[15:, 15:]

    out = (ns_c, inlier, jnp.sum(inlier.astype(jnp.int32)), H_marg)
    return out + (ns_l,) if return_last else out


class ViWindowProblem(NamedTuple):
    """Sliding-window VI BA inputs (all padded to the window capacity W).

    ns:        NavState of arrays [W, ...]
    pre:       PreintState of arrays [W-1, ...] (segment i -> i+1)
    pre_mask:  [W-1] IMU segment validity
    kf_mask:   [W]
    kf_fixed:  [W] (the KF before the window is fixed — reference
               includes pKFPrevLocal as fixed, src/Optimizer.cc:939-972)
    obs_kf:    [O] window-local KF index
    obs_pt:    [O, 3] world points (used when no point table is given)
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


class ViWindowPoints(NamedTuple):
    """Optional map-point block for the window BA: positions are FREE
    variables, Schur-eliminated per 3x3 block (reference
    LocalBundleAdjustmentNavState point vertices,
    /root/reference/src/Optimizer.cc:1077-1115).

    pos:       [P, 3] world positions
    mask:      [P]   point validity
    obs_pt_id: [O]   local point index per observation row
    """
    pos: jnp.ndarray
    mask: jnp.ndarray
    obs_pt_id: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "iters", "bias_walk"))
def local_ba_navstate(prob: ViWindowProblem, gw, Tbc, fx, fy, cx, cy,
                      iters: int = 8,
                      points: Optional[ViWindowPoints] = None,
                      bias_walk: Optional[Tuple] = None):
    """Sliding-window visual-inertial BA over W NavStates (reference
    LocalBundleAdjustmentNavState, window size 10,
    /root/reference/src/Optimizer.cc:863-1279).

    With ``points`` given, map-point positions are optimized jointly and
    Schur-eliminated (the reference's point vertices, :1077-1115);
    returns (NavStates, point positions). Without it, points are held
    fixed (round-2 behavior) and only NavStates return. ``bias_walk``
    adds the reference's bias random-walk edges between consecutive
    window states (EdgeNavStateBias, :1009-1036).
    """
    W = prob.kf_mask.shape[0]
    D = W * 15
    use_pts = points is not None
    info_bw = None
    if bias_walk is not None:
        info_bw = jax.vmap(lambda p: _bias_walk_info(p, bias_walk))(prob.pre)

    def point_positions(state):
        return state[1] if use_pts else prob.obs_pt

    eyeW = jnp.eye(W)
    # bias-walk Jacobian is CONSTANT: r_bw[s] = [bias(s+1) - bias(s)],
    # i.e. -I6 on segment-start tangent slots 9:15 and +I6 on the
    # segment-end slots — assembled once, no AD (see joint_system's
    # rationale: full-width jacfwd of every edge made the XLA:CPU
    # program pathologically large)
    S6 = jnp.zeros((6, 15)).at[:, 9:15].set(jnp.eye(6))
    J_bw_const = ((-S6)[None, :, None, :] * eyeW[:-1][:, None, :, None]
                  + S6[None, :, None, :] * eyeW[1:][:, None, :, None]
                  ).reshape(W - 1, 6, D)

    def gn(i, state):
        ns = state[0] if use_pts else state
        pos_tab = state[1] if use_pts else None
        pts_obs = pos_tab[points.obs_pt_id] if use_pts else prob.obs_pt

        # IMU edges: per-segment AD over the 30-dof (i, j) pair tangent
        # only — each segment touches exactly two states, so the dense
        # [W-1, 9, W*15] Jacobian is two 15-wide blocks per row
        ns_i = jax.tree.map(lambda a: a[:-1], ns)
        ns_j = jax.tree.map(lambda a: a[1:], ns)

        def seg_res(d2, n_i, n_j, pre_k):
            ni = ns_mod.retract(n_i, d2[:15])
            nj = ns_mod.retract(n_j, d2[15:])
            return ns_mod.imu_residual_biased(ni, nj, pre_k, gw,
                                              prob.bg_hat, prob.ba_hat)

        zero30 = jnp.zeros((W - 1, 30))
        r_imu = jax.vmap(seg_res)(zero30, ns_i, ns_j, prob.pre)  # [W-1, 9]
        J_seg = jax.vmap(jax.jacfwd(seg_res))(
            zero30, ns_i, ns_j, prob.pre)                # [W-1, 9, 30]
        Ji = (J_seg[:, :, None, :15] * eyeW[:-1][:, None, :, None]
              + J_seg[:, :, None, 15:] * eyeW[1:][:, None, :, None]
              ).reshape(W - 1, 9, D)

        # vision edges: per-observation AD over the OBSERVING state's
        # 15-dof tangent; scattered into the dense [O, 2, D] layout the
        # accumulation einsums expect (vision never couples two KFs)
        ns_o = jax.tree.map(lambda a: a[prob.obs_kf], ns)

        def obs_res(dc, n_o, pt, uvo):
            nx = ns_mod.retract(n_o, dc)
            T_cw = ns_mod.navstate_to_tcw(nx, Tbc)
            pc = lie.quat_rotate(T_cw["q"], pt) + T_cw["t"]
            z = jnp.maximum(pc[2], 1e-3)
            return jnp.stack([fx * pc[0] / z + cx - uvo[0],
                              fy * pc[1] / z + cy - uvo[1]])

        zero15 = jnp.zeros((prob.obs_kf.shape[0], 15))
        rv = jax.vmap(obs_res)(zero15, ns_o, pts_obs, prob.obs_uv)  # [O, 2]
        # analytic pose-side block (see _vision_jac6): vision touches
        # only (dP, dphi); the 15-wide jacfwd here was the window BA's
        # dominant per-iteration cost
        J6 = jax.vmap(lambda n_o, pt: _vision_jac6(
            n_o, Tbc, pt[None], fx, fy)[0])(ns_o, pts_obs)  # [O, 2, 6]
        import numpy as _np
        _slots = _np.asarray(_VIS_SLOTS)
        J_po = jnp.zeros((prob.obs_kf.shape[0], 2, 15)) \
            .at[:, :, _slots].set(J6)                    # [O, 2, 15]
        onehot = eyeW[prob.obs_kf]                       # [O, W]
        Jvf = (J_po[:, :, None, :] * onehot[:, None, :, None]
               ).reshape(-1, 2, D)

        info = jax.vmap(_imu_info)(prob.pre)             # [W-1, 9, 9]
        wseg = prob.pre_mask.astype(r_imu.dtype)
        chi2 = jnp.sum(rv * rv, -1) * prob.obs_inv_sigma2
        rw = huber_weight(jnp.sqrt(jnp.maximum(chi2, 1e-12)),
                          CHI2_2DOF ** 0.5)
        wv = jnp.where(prob.obs_mask, prob.obs_inv_sigma2 * rw, 0.0)

        H = jnp.einsum("sad,sab,sbe,s->de", Ji, info, Ji, wseg)
        b = -jnp.einsum("sad,sab,sb,s->d", Ji, info, r_imu, wseg)
        H = H + jnp.einsum("oad,oae,o->de", Jvf, Jvf, wv)
        b = b - jnp.einsum("oad,oa,o->d", Jvf, rv, wv)
        if info_bw is not None:
            r_bw = jnp.concatenate(
                [ns.bg[1:] - ns.bg[:-1], ns.ba[1:] - ns.ba[:-1]], -1)
            J_bw = J_bw_const
            H = H + jnp.einsum("sad,sab,sbe,s->de", J_bw, info_bw, J_bw,
                               wseg)
            b = b - jnp.einsum("sad,sab,sb,s->d", J_bw, info_bw, r_bw, wseg)

        free = (prob.kf_mask & ~prob.kf_fixed)
        fvec = jnp.repeat(free, 15)

        if use_pts:
            # analytic point Jacobian: dr/dX = (dr/dpc) @ R_cw  [O, 2, 3]
            ns_o = jax.tree.map(lambda a: a[prob.obs_kf], ns)
            T_cw = jax.vmap(lambda n: ns_mod.navstate_to_tcw(n, Tbc))(ns_o)
            R_cw = lie.quat_to_matrix(T_cw["q"])         # [O, 3, 3]
            pc = lie.quat_rotate(T_cw["q"], pts_obs) + T_cw["t"]
            z = jnp.maximum(pc[..., 2], 1e-3)
            A = jnp.stack([
                jnp.stack([fx / z, jnp.zeros_like(z),
                           -fx * pc[..., 0] / (z * z)], -1),
                jnp.stack([jnp.zeros_like(z), fy / z,
                           -fy * pc[..., 1] / (z * z)], -1)], -2)  # [O,2,3]
            Jp = jnp.einsum("oab,obc->oac", A, R_cw)     # [O, 2, 3]
            wv_pt = wv * points.mask[points.obs_pt_id]
            P = points.pos.shape[0]
            pid = points.obs_pt_id
            # block accumulations via segment_sum over the point id
            Hpp = jax.ops.segment_sum(
                jnp.einsum("oad,oae,o->ode", Jp, Jp, wv_pt), pid,
                num_segments=P)                          # [P, 3, 3]
            bp = jax.ops.segment_sum(
                -jnp.einsum("oad,oa,o->od", Jp, rv, wv_pt), pid,
                num_segments=P)                          # [P, 3]
            Cx = jax.ops.segment_sum(
                jnp.einsum("oad,oae,o->ode", Jvf, Jp, wv_pt), pid,
                num_segments=P)                          # [P, D, 3]
            Hpp_r = Hpp + jnp.eye(3) * 1e-2              # LM damping
            Hpp_inv = jnp.linalg.inv(Hpp_r)
            # Schur complement onto the pose block
            H = H - jnp.einsum("pde,pef,pgf->dg", Cx, Hpp_inv, Cx)
            b = b - jnp.einsum("pde,pef,pf->d", Cx, Hpp_inv, bp)

        H = jnp.where(fvec[:, None] & fvec[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(fvec, 0.0, 1.0))
        b = jnp.where(fvec, b, 0.0)
        dx = _jacobi_solve(H, b, damping=1e-5)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dxm = jnp.where(free[:, None], dx.reshape(W, 15), 0.0)
        ns_new = jax.vmap(ns_mod.retract)(ns, dxm)
        if not use_pts:
            return ns_new
        # back-substitute the point update: dX = Hpp^-1 (bp - Cx^T dx)
        dX = jnp.einsum("pef,pf->pe", Hpp_inv,
                        bp - jnp.einsum("pde,d->pe", Cx, dx))
        dX = jnp.where(jnp.isfinite(dX).all(-1, keepdims=True), dX, 0.0)
        pos_new = jnp.where(points.mask[:, None], pos_tab + dX, pos_tab)
        return ns_new, pos_new

    if use_pts:
        return jax.lax.fori_loop(0, iters, gn, (prob.ns, points.pos))
    return jax.lax.fori_loop(0, iters, gn, prob.ns)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def window_cost(prob: ViWindowProblem, gw, Tbc, fx, fy, cx, cy,
                ns=None, pos_tab=None, obs_pt_id=None):
    """Total chi2 of a window problem at (ns, pos_tab) — IMU edges with
    their preintegration information + Huber-weighted vision edges. Used
    to guard plain-GN polishes (local_ba_navstate has no accept/reject
    step control; a divergent run must be detectable and revertible —
    the post-init global polish diverged 6x in map scale on a bad
    velocity seed before this guard existed)."""
    ns = prob.ns if ns is None else ns
    pts = prob.obs_pt if pos_tab is None else pos_tab[obs_pt_id]
    ns_i = jax.tree.map(lambda a: a[:-1], ns)
    ns_j = jax.tree.map(lambda a: a[1:], ns)
    r_imu = jax.vmap(lambda a, b, p: ns_mod.imu_residual_biased(
        a, b, p, gw, prob.bg_hat, prob.ba_hat))(ns_i, ns_j, prob.pre)
    info = jax.vmap(_imu_info)(prob.pre)
    c_imu = jnp.sum(jnp.einsum("sa,sab,sb->s", r_imu, info, r_imu)
                    * prob.pre_mask)

    ns_o = jax.tree.map(lambda a: a[prob.obs_kf], ns)
    T_cw = jax.vmap(lambda n: ns_mod.navstate_to_tcw(n, Tbc))(ns_o)
    pc = lie.quat_rotate(T_cw["q"], pts) + T_cw["t"]
    z = jnp.maximum(pc[..., 2], 1e-3)
    rv = jnp.stack([fx * pc[..., 0] / z + cx - prob.obs_uv[..., 0],
                    fy * pc[..., 1] / z + cy - prob.obs_uv[..., 1]], -1)
    chi2 = jnp.sum(rv * rv, -1) * prob.obs_inv_sigma2
    from ygz_tpu.core.robust import huber_rho
    c_vis = jnp.sum(jnp.where(prob.obs_mask,
                              huber_rho(chi2, CHI2_2DOF), 0.0))
    return c_imu + c_vis
