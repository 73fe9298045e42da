"""Relocalization: BoW candidate retrieval + hypothesis-batched linear-PnP
RANSAC + pose refinement.

Replaces the reference Relocalization path (/root/reference/src/Tracking.cc:
1742-1894) and its EPnP solver (/root/reference/src/PnPsolver.cc, 963 LoC).
Where the reference iterates EPnP RANSAC 5 hypotheses at a time per
candidate KF, here B=192 oversampled POSIT pose hypotheses solve as one
batched Horn/depth iteration, all hypotheses score against all matches in
one broadcast, and the winner is refit from its full inlier set and
polished by the standard pose optimizer. POSIT is planarity-safe where
both DLT (critical quadrics) and naive EPnP (rank collapse) need special
cases — the right property for plane-dominant SLAM maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import ba, sim3solver
from ygz_tpu.core import lie
from ygz_tpu.matching import search, vocabulary
from ygz_tpu.pipeline import frame as frame_mod


@functools.partial(jax.jit, static_argnames=("n_hyp", "n_sample"))
def pnp_ransac(pts_w, uv, mask, K, n_hyp: int = 192, seed: int = 0,
               inlier_px: float = 5.0, n_sample: int = 12):
    """Batched PnP RANSAC over oversampled POSIT hypotheses.
    pts_w [N,3], uv [N,2] -> (R [3,3], t [3], inliers [N], n_inliers).

    Samples are larger than minimal (12): POSIT's weak-perspective
    seed benefits from spatial spread, and on TPU the extra rows in the
    batched Horn are free."""
    N = pts_w.shape[0]
    key = jax.random.PRNGKey(seed)
    logits = jnp.where(mask, 0.0, -1e9)
    samp = jax.random.categorical(key, logits[None, None, :], axis=-1,
                                  shape=(n_hyp, n_sample))

    # normalized image coords
    Kinv = jnp.linalg.inv(K)
    uvh = jnp.concatenate([uv, jnp.ones((N, 1))], axis=1) @ Kinv.T
    xn = uvh[:, :2]

    X = pts_w[samp]          # [B, n_sample, 3]
    x = xn[samp]             # [B, n_sample, 2]

    def solve_posit(Xb, xb, w=None, iters: int = 10):
        """Batched perspective pose via alternating Horn/depth iteration
        (DeMenthon-style POSIT, with a similarity Horn as the inner
        solve). Why not DLT: the algebraic 12x12 DLT is near-degenerate
        whenever the sampled points lie near a quadric through the
        camera center — SLAM maps are plane-dominant, and on the
        two-plane synthetic world DLT returns 80+ px reprojection error
        from PERFECT correspondences. POSIT iterates
          depths s_i -> camera points Q_i = s_i f_i -> Horn(X -> Q) ->
          new depths s_i = (R X_i + t) . f_i
        and every step is planarity-safe (Horn handles coplanar sets).
        Returns (R [B,3,3], t [B,3])."""
        f = jnp.concatenate([xb, jnp.ones(xb.shape[:-1] + (1,))], -1)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # bearings
        s = jnp.ones(xb.shape[:-1])
        R = t = None
        for _ in range(iters):
            Q = s[..., None] * f
            S = sim3solver.horn_sim3(Q, Xb, w=w)   # Q ~ c R X + t
            c = jnp.maximum(S["s"], 1e-9)
            R = lie.quat_to_matrix(S["q"])
            t = S["t"] / c[..., None]               # (R, t/c) same bearings
            pc = jnp.einsum("...ij,...nj->...ni", R, Xb) + t[..., None, :]
            s = jnp.maximum(jnp.sum(pc * f, axis=-1), 1e-3)
        return R, t

    R, t = solve_posit(X, x)

    def score(Rb, tb):
        pc = jnp.einsum("bij,nj->bni", Rb, pts_w) + tb[:, None, :]
        zc = pc[..., 2]
        good_z = zc > 1e-3
        up = K[0, 0] * pc[..., 0] / jnp.maximum(zc, 1e-3) + K[0, 2]
        vp = K[1, 1] * pc[..., 1] / jnp.maximum(zc, 1e-3) + K[1, 2]
        err = (up - uv[None, :, 0]) ** 2 + (vp - uv[None, :, 1]) ** 2
        inl = good_z & (err < inlier_px ** 2) & mask[None, :]
        return inl

    inl = score(R, t)
    n = jnp.sum(inl, axis=1)
    best = jnp.argmax(n)
    R_best, t_best, inl_best, n_best = R[best], t[best], inl[best], n[best]

    # all-inlier refit: re-solving from ALL current inliers and rescoring
    # recovers inliers a 12-point hypothesis missed. Monotone: the refit
    # is only adopted when it scores at least as well.
    for _ in range(2):
        w = inl_best.astype(jnp.float32)[None, :]
        R_ref, t_ref = solve_posit(pts_w[None], xn[None], w=w)
        inl_ref = score(R_ref, t_ref)[0]
        n_ref = jnp.sum(inl_ref)
        adopt = n_ref >= n_best
        R_best = jnp.where(adopt, R_ref[0], R_best)
        t_best = jnp.where(adopt, t_ref[0], t_best)
        inl_best = jnp.where(adopt, inl_ref, inl_best)
        n_best = jnp.where(adopt, n_ref, n_best)

    return R_best, t_best, inl_best, n_best


def _pose_opt_bound(tracker, fr, T0, mp_bind):
    """Pose-optimize over the frame's current feature->map-point binding
    array. Returns (T, mp_bind with outliers unbound, n_inliers)."""
    cfg = tracker.cfg
    mask = (mp_bind >= 0) & fr.feat_mask
    ids = jnp.where(mask, mp_bind, 0)
    pts = tracker.ms.mp_pos[ids]
    ur = fr.ur if fr.ur is not None \
        else jnp.full(fr.uv.shape[:1], -1.0)
    inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[
        jnp.clip(fr.level, 0, cfg.n_levels - 1)]
    T, inlier, n_in = ba.pose_optimization(
        T0, pts, fr.uv, ur, inv_s2, mask & tracker.ms.mp_mask[ids],
        cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy,
        cfg.camera.bf)
    mp_bind = jnp.where(inlier | ~mask, mp_bind, -1)
    return T, mp_bind, int(n_in)


def _guided_rescue(tracker, fr, k, T, mp_bind, radius_px, ratio=0.9):
    """Wide-window guided re-search against candidate KF k's map points
    at the current pose estimate, adding matches to unbound features
    (reference SearchByProjection escalation,
    /root/reference/src/Tracking.cc:1813-1877)."""
    cfg = tracker.cfg
    ms = tracker.ms
    kf_mp = ms.kf_mp_idx[k]
    kf_valid = ms.kf_feat_mask[k] & (kf_mp >= 0)
    ids = jnp.where(kf_valid, kf_mp, 0)
    # skip points already bound to a feature
    already = jnp.zeros((cfg.max_map_points,), bool).at[
        jnp.where(mp_bind >= 0, mp_bind, 0)].set(mp_bind >= 0)
    valid = kf_valid & ms.mp_mask[ids] & ~already[ids]

    pc = lie.se3_apply(T, ms.mp_pos[ids])
    z = jnp.maximum(pc[:, 2], 1e-6)
    uv_proj = jnp.stack([cfg.camera.fx * pc[:, 0] / z + cfg.camera.cx,
                         cfg.camera.fy * pc[:, 1] / z + cfg.camera.cy], -1)
    valid = valid & (pc[:, 2] > 0.05)
    radius = radius_px * tracker.scales[
        jnp.clip(ms.kf_level[k], 0, cfg.n_levels - 1)]
    free = fr.feat_mask & (mp_bind < 0)
    res = search.search_by_projection(
        ms.mp_desc[ids], uv_proj, radius, ms.kf_level[k], valid,
        fr.desc, fr.uv, fr.level, free, ratio=ratio)
    return mp_bind.at[jnp.where(res.mask, res.idx, cfg.n_features)].set(
        ids.astype(jnp.int32), mode="drop")


def _reloc_candidates(tracker, scores: np.ndarray, cap: int = 5):
    """Covisibility-group score accumulation (reference
    DetectRelocalizationCandidates, /root/reference/src/
    KeyFrameDatabase.cc:193-280): each candidate's score is the SUM over
    its best covisible group, the group's best member represents it, and
    only groups within 0.75 of the best accumulated score survive.
    A lone high-scoring KF in an unrelated neighborhood ranks below a
    moderately-scoring KF whose whole neighborhood agrees."""
    from ygz_tpu.pipeline import mapstate as ms_mod
    ms = tracker.ms
    alive = np.where((scores > 0) & np.asarray(ms.kf_mask))[0]
    if len(alive) == 0:
        return []
    # seed with the top scorers only (group accumulation over every alive
    # KF would be O(K) covisibility queries)
    seeds = alive[np.argsort(-scores[alive])][:3 * cap]
    acc = []
    for k in seeds:
        counts = np.asarray(ms_mod.covisibility_counts(ms, int(k)))
        group = np.where(counts >= 15)[0]
        group = np.append(group, k)
        g_scores = scores[group]
        g_scores = np.where(g_scores > 0, g_scores, 0.0)
        best_in_group = int(group[np.argmax(g_scores)])
        acc.append((float(g_scores.sum()), best_in_group))
    best_acc = max(a for a, _ in acc)
    keep = sorted({b for a, b in acc if a >= 0.75 * best_acc},
                  key=lambda b: -scores[b])[:cap]
    # fill remaining slots with plain top scorers: group accumulation
    # RANKS well but on small maps can collapse to one group whose
    # representative fails geometric verification — the per-candidate
    # PnP gate downstream is the real filter
    for k in seeds:
        if len(keep) >= cap:
            break
        if int(k) not in keep:
            keep.append(int(k))
    return keep


def relocalize(tracker, fr: frame_mod.Frame) -> bool:
    """BoW-rank candidate KFs, match descriptors, PnP-RANSAC, refine,
    then escalate with guided wide-window re-searches when below the
    accept bar (reference: DetectRelocalizationCandidates + PnPsolver
    loop + PoseOptimization + 2x guided SearchByProjection,
    /root/reference/src/Tracking.cc:1742-1894)."""
    cfg = tracker.cfg
    fr2 = frame_mod.extract_features(fr, cfg)
    tracker._copy_frame_fields(fr, fr2)
    if int(jnp.sum(fr.feat_mask)) < 50:
        return False
    accept_th = cfg.reloc_accept

    word_ids = vocabulary.transform(tracker.vocab, fr.desc, fr.feat_mask)
    qvec = vocabulary.bow_vector(tracker.vocab, word_ids, fr.feat_mask)
    scores = vocabulary.score_against_database(
        qvec, tracker.ms.kf_bow, tracker.ms.kf_mask)
    order = _reloc_candidates(tracker, np.asarray(scores))

    # tracker state is mutated per attempt (ref_kf drives the local-map
    # gate below); snapshot so a failed attempt doesn't leave the tracker
    # pointed at an arbitrary rejected candidate
    saved = (tracker.ref_kf, tracker._ref_obs_cache, tracker.last_inliers,
             tracker.velocity)
    for k in order:
        k = int(k)
        kf_mp = tracker.ms.kf_mp_idx[k]
        kf_valid = tracker.ms.kf_feat_mask[k] & (kf_mp >= 0)
        res = search.search_by_descriptor(
            tracker.ms.kf_desc[k], tracker.ms.kf_angle[k], kf_valid,
            fr.desc, fr.angle, fr.feat_mask, ratio=0.75)
        if int(jnp.sum(res.mask)) < 15:
            continue
        mp_ids = jnp.where(kf_valid, kf_mp, 0)
        pts = tracker.ms.mp_pos[mp_ids]
        uv = fr.uv[res.idx]
        R, t, inl, n = pnp_ransac(pts, uv, res.mask, cfg.camera.K,
                                  seed=fr.frame_id)
        if int(n) < 10:
            continue
        T0 = {"q": lie.matrix_to_quat(R), "t": t}
        mp_bind = jnp.full((cfg.n_features,), -1, jnp.int32).at[
            jnp.where(res.mask & inl, res.idx, cfg.n_features)].set(
            mp_ids.astype(jnp.int32), mode="drop")
        T, mp_bind, n_in = _pose_opt_bound(tracker, fr, T0, mp_bind)
        if n_in < 10:
            continue
        if n_in < accept_th:
            # first rescue: wide window (10 px x scale), coarse ratio
            mp_bind = _guided_rescue(tracker, fr, k, T, mp_bind,
                                     radius_px=10.0, ratio=0.9)
            T, mp_bind, n_in = _pose_opt_bound(tracker, fr, T, mp_bind)
            if n_in < accept_th // 2:
                continue
            # confirmation pass: re-match in a NARROW window around the
            # refined pose — wide-window matches can confirm a wrong
            # pose (observed: 24 "inliers" on a 0.7-error pose); a
            # correct pose gains matches here, a wrong one loses them
            mp_bind = _guided_rescue(tracker, fr, k, T, mp_bind,
                                     radius_px=3.0, ratio=0.9)
            T, mp_bind, n_in = _pose_opt_bound(tracker, fr, T, mp_bind)
        if n_in < accept_th:
            continue
        fr.T_cw = T
        fr.mp_idx = mp_bind
        tracker.ref_kf = k
        tracker.last_inliers = n_in
        tracker.velocity = None
        tracker._ref_obs_cache = None
        # final gate: the pose must also track against the LOCAL MAP
        # around the candidate — a wrong pose can self-confirm on one
        # KF's points via wide-window matches, but not on the wider
        # neighborhood (observed failure: 24 one-KF "inliers" on a
        # 0.7-error pose). On failure, try the next candidate instead
        # of surfacing a poisoned pose.
        if not tracker._track_local_map_features(fr):
            fr.T_cw = None
            fr.mp_idx = None
            (tracker.ref_kf, tracker._ref_obs_cache, tracker.last_inliers,
             tracker.velocity) = saved
            continue
        return True
    return False
