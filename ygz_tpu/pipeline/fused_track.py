"""The per-frame hot path as ONE device program.

The reference spends its 20 ms/frame budget in a single thread walking
sparse alignment -> direct local-map search -> pose optimization
(/root/reference/src/Tracking.cc:371-523). A literal translation — one
host call per stage with scalar gates in between — is hostile to an
accelerator behind a dispatch boundary: every eager op costs ~4 ms of
enqueue latency on a tunneled TPU and every scalar readback ~11 ms, so a
frame dissolves into hundreds of milliseconds of queueing. This module
fuses the whole cascade into one jitted step whose only host-visible
output is the new frame state plus a single small `bundle` vector of
gate scalars; the tracker reads that bundle once per frame (or, in
pipelined mode, one frame late so consecutive frames overlap on device).

The math is identical to the unfused path in tracking.py (which remains
as the fallback cascade): TrackWithSparseAlignment
(/root/reference/src/Tracking.cc:2061-2105) then TrackLocalMapDirect
(:2107-2172), then the bookkeeping the reference does inline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ygz_tpu.backend import ba
from ygz_tpu.core import lie
from ygz_tpu.ops import align
from ygz_tpu.pipeline import map_ops
from ygz_tpu.utils.config import SlamConfig

# bundle layout (float32[8]):
B_GATE1 = 0      # tracked-in-last-frame count (>=30 enables sparse align)
B_MOTION_OK = 1  # sparse-align update stayed inside the sanity bounds
B_N_HIT = 2      # direct local-map hits
B_N_IN = 3       # pose-opt inliers
B_REF_OBS = 4    # bound features in the reference KF (keyframe policy)
B_OK = 5         # full-path success (all gates)
B_REF_OBS3 = 6   # ref-KF features whose point has >=3 observations —
                 # the reference's nRefMatches = TrackedMapPoints(minObs=3)
                 # (/root/reference/src/Tracking.cc:1353-1358)
B_FINITE = 7     # VI step: all outputs finite (chain validity — a VI
                 # frame whose vision fails is still committed on the
                 # IMU prediction, so only non-finite breaks the chain)


class FusedStepOut(NamedTuple):
    T_cw: dict            # optimized pose (valid when bundle[B_OK])
    T_sa: dict            # sparse-align pose (fallback init when not ok)
    velocity: dict        # T_cur_last from the optimized pose
    T_c_ref: dict         # pose relative to the reference KF (trajectory)
    fr_uv: jnp.ndarray    # [N, 2] direct-match positions (level 0)
    fr_level: jnp.ndarray # [N]
    fr_feat_mask: jnp.ndarray  # [N] inlier mask
    fr_mp_idx: jnp.ndarray     # [N] map-point binding
    mp_visible: jnp.ndarray    # [M] updated counters
    mp_found: jnp.ndarray      # [M]
    bundle: jnp.ndarray        # [8] float32 gate scalars


@functools.partial(jax.jit, static_argnames=("cfg",))
def fused_direct_step(ms, last_pyr, last_uv, last_mp_idx, last_feat_mask,
                      T_last, velocity, cur_pyr, cand_idx, cand_valid,
                      ref_kf, cfg: SlamConfig) -> FusedStepOut:
    cam = cfg.camera
    scales = tuple(float(s) for s in cfg.scale_factors)
    inv_s2_tab = jnp.asarray(cfg.inv_level_sigma2)

    # ---- stage 1: sparse direct frame-to-frame alignment -----------------
    tracked = (last_mp_idx >= 0) & last_feat_mask
    gate1 = jnp.sum(tracked.astype(jnp.int32))
    mp_ids = jnp.where(tracked, last_mp_idx, 0)
    pts_w = ms.mp_pos[mp_ids]
    pts_last = lie.se3_apply(T_last, pts_w)
    valid_sa = tracked & ms.mp_mask[mp_ids] & (pts_last[:, 2] > 0.05)

    # compact to SA_CAP lanes: the alignment cost is gather-bound and
    # linear in lanes; 256 well-tracked patches constrain 6 DoF as well
    # as 1000 (the reference SVO-style aligner runs on a similar count).
    # min_level=1 matches the reference exactly — it never aligns on the
    # full-resolution level (SparseImgAlign(nLevels-1, 1),
    # /root/reference/src/Tracking.cc:207).
    SA_CAP = 256
    from ygz_tpu.pipeline.mapping_kernels import _compact
    sa_idx, sa_valid = _compact(valid_sa, SA_CAP)
    T_rel, _ = align.sparse_image_align(
        velocity, last_pyr, cur_pyr, last_uv[sa_idx], pts_last[sa_idx],
        sa_valid, cam, scales, max_level=min(cfg.n_levels - 1, 3),
        min_level=1)
    xi = lie.se3_log(lie.se3_compose(T_rel, lie.se3_inverse(velocity)))
    motion_ok = jnp.all(jnp.isfinite(xi)) & \
        (jnp.linalg.norm(xi[3:]) <= 0.5) & (jnp.linalg.norm(xi[:3]) <= 1.0)
    T_sa = lie.se3_compose(T_rel, T_last)

    # ---- stage 2: direct local-map search + pose optimization ------------
    uv_m, lvl_m, success, visible = map_ops.search_local_points_direct(
        ms, cand_idx, T_sa, cur_pyr, cam, cfg.n_levels, cfg.scale_factor)
    success = success & cand_valid
    n_hit = jnp.sum(success.astype(jnp.int32))

    pts_c = ms.mp_pos[cand_idx]
    inv_s2 = inv_s2_tab[jnp.clip(lvl_m, 0, cfg.n_levels - 1)]
    if jax.default_backend() == "tpu" and cam.bf == 0:
        from ygz_tpu.ops import pallas_pose
        T, inlier, n_in = pallas_pose.pose_optimization_fused(
            T_sa, pts_c, uv_m, inv_s2, success,
            cam.fx, cam.fy, cam.cx, cam.cy)
    else:
        T, inlier, n_in = ba.pose_optimization(
            T_sa, pts_c, uv_m, jnp.full(uv_m.shape[:1], -1.0), inv_s2,
            success, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)

    # ---- frame feature table from the direct matches ----------------------
    C = cand_idx.shape[0]
    N = cfg.n_features
    take = min(C, N)
    fr_uv = jnp.zeros((N, 2)).at[:take].set(uv_m[:take])
    fr_level = jnp.zeros((N,), jnp.int32).at[:take].set(lvl_m[:take])
    fr_feat_mask = jnp.zeros((N,), bool).at[:take].set(inlier[:take])
    fr_mp_idx = jnp.full((N,), -1, jnp.int32).at[:take].set(
        jnp.where(inlier[:take], cand_idx[:take], -1))

    # ---- bookkeeping -------------------------------------------------------
    mp_visible = ms.mp_visible.at[cand_idx].add(
        (visible & cand_valid).astype(jnp.int32))
    mp_found = ms.mp_found.at[cand_idx].add(
        (inlier & cand_valid).astype(jnp.int32))
    velocity_new = lie.se3_compose(T, lie.se3_inverse(T_last))
    T_ref = {"q": ms.kf_q[ref_kf], "t": ms.kf_t[ref_kf]}
    T_c_ref = lie.se3_compose(T, lie.se3_inverse(T_ref))
    ref_row = ms.kf_mp_idx[ref_kf]
    ref_bound = (ref_row >= 0) & ms.kf_feat_mask[ref_kf]
    ref_obs = jnp.sum(ref_bound.astype(jnp.int32))
    # nRefMatches analogue in the SAME units as n_in: ref-KF points with
    # >=3 observations that are IN the direct candidate set — the
    # reference compares frame inliers against TrackedMapPoints(3)
    # (/root/reference/src/Tracking.cc:1353-1358, 1408-1410); comparing
    # a 512-lane cache's inliers against the ref KF's full bound count
    # made every frame "weak" and spammed keyframes at the min-gap floor
    M = ms.mp_pos.shape[0]
    in_cand = jnp.zeros((M + 1,), bool).at[
        jnp.where(cand_valid, cand_idx, M)].set(True, mode="drop")[:M]
    ref_obs3 = jnp.sum((ref_bound
                        & (ms.mp_obs_count[jnp.maximum(ref_row, 0)] >= 3)
                        & in_cand[jnp.maximum(ref_row, 0)]
                        ).astype(jnp.int32))

    ok = motion_ok & (gate1 >= 30) & (n_in >= 30)
    bundle = jnp.stack([
        gate1.astype(jnp.float32), motion_ok.astype(jnp.float32),
        n_hit.astype(jnp.float32), n_in.astype(jnp.float32),
        ref_obs.astype(jnp.float32), ok.astype(jnp.float32),
        ref_obs3.astype(jnp.float32), jnp.float32(0)])
    return FusedStepOut(
        T_cw=T, T_sa=T_sa, velocity=velocity_new, T_c_ref=T_c_ref,
        fr_uv=fr_uv, fr_level=fr_level, fr_feat_mask=fr_feat_mask,
        fr_mp_idx=fr_mp_idx, mp_visible=mp_visible, mp_found=mp_found,
        bundle=bundle)


class FusedViStepOut(NamedTuple):
    T_cw: dict            # final pose (VI-refined, or IMU-predicted when
                          # vision is weak — mirrors the sync cascade)
    ns: object            # NavState after refinement (new last_ns)
    prior_H: jnp.ndarray  # [15,15] marginal info for the NEXT frame
    T_c_ref: dict
    fr_uv: jnp.ndarray
    fr_level: jnp.ndarray
    fr_feat_mask: jnp.ndarray
    fr_mp_idx: jnp.ndarray
    mp_visible: jnp.ndarray
    mp_found: jnp.ndarray
    bundle: jnp.ndarray   # [8] float32 (layout above; B_FINITE used)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fused_vi_step(ms, last_pyr, last_uv, last_mp_idx, last_feat_mask,
                  T_last, last_ns, prior_H, imu, imu_mask, bg_hat, ba_hat,
                  gw, Tbc, cur_pyr, cand_idx, cand_valid, ref_kf,
                  cfg: SlamConfig) -> FusedViStepOut:
    """The post-init VI per-frame hot loop as ONE device program:
    IMU preintegration -> NavState prediction -> sparse direct alignment
    (initialized from the prediction) -> direct local-map search -> plain
    pose opt -> joint NavState refinement with the IMU edge + marginal
    prior. Math identical to VioTracker._track_frame/_refine_navstate
    (the synchronous cascade, which remains as the fallback); reference
    hot path: /root/reference/src/Tracking.cc:1994-2105 (PredictNavState-
    ByIMU + TrackWithIMU) + src/Optimizer.cc:278-618 (the Frame-Frame VI
    PoseOptimization).

    Vision-weak semantics ride INSIDE the program: when the direct
    local-map stage fails its gates the outputs select the IMU-predicted
    state with empty bindings (the reference's bTrackOK=false branch
    keeps the prediction too) — the frame still commits, so a pipelined
    chain only breaks on non-finite outputs (B_FINITE).
    """
    from ygz_tpu.backend import vi_ba
    from ygz_tpu.imu import navstate as ns_mod
    from ygz_tpu.imu import preintegration as pre_mod

    cam = cfg.camera
    scales = tuple(float(s) for s in cfg.scale_factors)
    inv_s2_tab = jnp.asarray(cfg.inv_level_sigma2)

    # ---- IMU preintegration + prediction ---------------------------------
    pre_f = pre_mod.preintegrate(imu, imu_mask, bg_hat, ba_hat,
                                 cfg.gyro_noise, cfg.acc_noise)
    ns_pred = ns_mod.predict(last_ns, pre_f, gw)
    T_pred = ns_mod.navstate_to_tcw(ns_pred, Tbc)

    # ---- sparse direct alignment from the IMU prediction ------------------
    tracked = (last_mp_idx >= 0) & last_feat_mask
    gate1 = jnp.sum(tracked.astype(jnp.int32))
    mp_ids = jnp.where(tracked, last_mp_idx, 0)
    pts_last = lie.se3_apply(T_last, ms.mp_pos[mp_ids])
    valid_sa = tracked & ms.mp_mask[mp_ids] & (pts_last[:, 2] > 0.05)
    T_vel = lie.se3_compose(T_pred, lie.se3_inverse(T_last))
    SA_CAP = 256  # see fused_direct_step
    from ygz_tpu.pipeline.mapping_kernels import _compact
    sa_idx, sa_valid = _compact(valid_sa, SA_CAP)
    T_rel, _ = align.sparse_image_align(
        T_vel, last_pyr, cur_pyr, last_uv[sa_idx], pts_last[sa_idx],
        sa_valid, cam, scales, max_level=min(cfg.n_levels - 1, 3),
        min_level=1)
    xi = lie.se3_log(lie.se3_compose(T_rel, lie.se3_inverse(T_vel)))
    sa_ok = jnp.all(jnp.isfinite(xi)) & \
        (jnp.linalg.norm(xi[3:]) <= 0.5) & (jnp.linalg.norm(xi[:3]) <= 1.0)
    use_sa = sa_ok & (gate1 >= 30)
    T_sa = lie.se3_compose(T_rel, T_last)
    T_init = jax.tree.map(lambda a, b: jnp.where(use_sa, a, b), T_sa, T_pred)

    # ---- direct local-map search + plain pose opt -------------------------
    uv_m, lvl_m, success, visible = map_ops.search_local_points_direct(
        ms, cand_idx, T_init, cur_pyr, cam, cfg.n_levels, cfg.scale_factor)
    success = success & cand_valid
    n_hit = jnp.sum(success.astype(jnp.int32))
    pts_c = ms.mp_pos[cand_idx]
    inv_s2 = inv_s2_tab[jnp.clip(lvl_m, 0, cfg.n_levels - 1)]
    if jax.default_backend() == "tpu" and cam.bf == 0:
        from ygz_tpu.ops import pallas_pose
        T_v, inlier, n_in_v = pallas_pose.pose_optimization_fused(
            T_init, pts_c, uv_m, inv_s2, success,
            cam.fx, cam.fy, cam.cx, cam.cy)
    else:
        T_v, inlier, n_in_v = ba.pose_optimization(
            T_init, pts_c, uv_m, jnp.full(uv_m.shape[:1], -1.0), inv_s2,
            success, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    vis_ok = (n_hit >= 30) & (n_in_v >= 30)

    # ---- joint NavState refinement (IMU edge + marginal prior) ------------
    ns0 = ns_mod.tcw_to_navstate(T_v, Tbc, V=ns_pred.V,
                                 bg=bg_hat, ba=ba_hat)
    vi_mask = inlier & ms.mp_mask[cand_idx]
    ns_ref, vi_inlier, n_vi, H_new = vi_ba.pose_optimization_vi(
        ns0, last_ns, pre_f, gw, Tbc,
        pts_c, uv_m, inv_s2, vi_mask,
        cam.fx, cam.fy, cam.cx, cam.cy,
        prior_H=prior_H, prior_ns=last_ns,
        bias_hat=(bg_hat, ba_hat),
        bias_walk=(cfg.gyro_bias_walk, cfg.acc_bias_walk))

    # ---- vision-weak select (reference keeps the IMU prediction) ----------
    ns_out = jax.tree.map(lambda a, b: jnp.where(vis_ok, a, b),
                          ns_ref, ns_pred)
    T_out = ns_mod.navstate_to_tcw(ns_out, Tbc)
    H_out = jnp.where(vis_ok, H_new, prior_H)

    C = cand_idx.shape[0]
    N = cfg.n_features
    take = min(C, N)
    keep = inlier & (vi_inlier | ~vi_mask) & vis_ok
    fr_uv = jnp.zeros((N, 2)).at[:take].set(uv_m[:take])
    fr_level = jnp.zeros((N,), jnp.int32).at[:take].set(lvl_m[:take])
    fr_feat_mask = jnp.zeros((N,), bool).at[:take].set(
        (inlier & vis_ok)[:take])
    fr_mp_idx = jnp.full((N,), -1, jnp.int32).at[:take].set(
        jnp.where(keep[:take], cand_idx[:take], -1))

    mp_visible = ms.mp_visible.at[cand_idx].add(
        (visible & cand_valid & vis_ok).astype(jnp.int32))
    mp_found = ms.mp_found.at[cand_idx].add(
        (inlier & cand_valid & vis_ok).astype(jnp.int32))
    T_ref = {"q": ms.kf_q[ref_kf], "t": ms.kf_t[ref_kf]}
    T_c_ref = lie.se3_compose(T_out, lie.se3_inverse(T_ref))
    ref_row = ms.kf_mp_idx[ref_kf]
    ref_bound = (ref_row >= 0) & ms.kf_feat_mask[ref_kf]
    ref_obs = jnp.sum(ref_bound.astype(jnp.int32))
    M = ms.mp_pos.shape[0]
    in_cand = jnp.zeros((M + 1,), bool).at[
        jnp.where(cand_valid, cand_idx, M)].set(True, mode="drop")[:M]
    ref_obs3 = jnp.sum((ref_bound
                        & (ms.mp_obs_count[jnp.maximum(ref_row, 0)] >= 3)
                        & in_cand[jnp.maximum(ref_row, 0)]
                        ).astype(jnp.int32))  # see fused_direct_step

    finite = jnp.all(jnp.isfinite(T_out["q"])) \
        & jnp.all(jnp.isfinite(T_out["t"])) \
        & jnp.all(jnp.isfinite(ns_out.P)) & jnp.all(jnp.isfinite(ns_out.V))
    bundle = jnp.stack([
        gate1.astype(jnp.float32), use_sa.astype(jnp.float32),
        n_hit.astype(jnp.float32),
        jnp.where(vis_ok, n_vi, 0).astype(jnp.float32),
        ref_obs.astype(jnp.float32), vis_ok.astype(jnp.float32),
        ref_obs3.astype(jnp.float32), finite.astype(jnp.float32)])
    return FusedViStepOut(
        T_cw=T_out, ns=ns_out, prior_H=H_out, T_c_ref=T_c_ref,
        fr_uv=fr_uv, fr_level=fr_level, fr_feat_mask=fr_feat_mask,
        fr_mp_idx=fr_mp_idx, mp_visible=mp_visible, mp_found=mp_found,
        bundle=bundle)
