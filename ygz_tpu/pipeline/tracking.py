"""The tracking front end: per-frame pose estimation as a cascade of
jitted device steps orchestrated by a small host state machine.

State machine and cascade mirror the reference Tracking
(/root/reference/src/Tracking.cc): NOT_INITIALIZED -> OK/LOST with
  1. sparse direct frame-to-frame alignment        (:387, TrackWithSparseAlignment)
  2. fallback: feature motion-model tracking       (:390, TrackWithMotionModel)
  3. fallback: reference-keyframe BoW tracking     (:392, TrackReferenceKeyFrame)
  4. LOST: relocalization                          (:397)
then local-map refinement, direct first (:478 TrackLocalMapDirect with the
map-point cache, feature fallback), velocity update, keyframe decision.

The host only ever reads back a handful of scalars per frame (inlier
counts, success flags); all pixel/geometry math stays on device in a few
fused jit calls.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import ba
from ygz_tpu.core import lie
from ygz_tpu.matching import search, vocabulary
from ygz_tpu.ops import align
from ygz_tpu.pipeline import frame as frame_mod
from ygz_tpu.pipeline import initializer, map_ops, mapstate
from ygz_tpu.pipeline.mapstate import MapState
from ygz_tpu.utils.config import SlamConfig

# tracking states (reference include/Tracking.h:88-94)
NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3


@functools.partial(jax.jit, static_argnames=("cam",))
def _pose_opt_jit(T0, pts, uv, ur, inv_sigma2, mask, cam):
    if jax.default_backend() == "tpu" and cam.bf == 0:
        # mono on TPU: single-dispatch fused Pallas kernel (~10x lower
        # latency than the op-by-op XLA path)
        from ygz_tpu.ops import pallas_pose
        return pallas_pose.pose_optimization_fused(
            T0, pts, uv, inv_sigma2, mask, cam.fx, cam.fy, cam.cx, cam.cy)
    return ba.pose_optimization(T0, pts, uv, ur, inv_sigma2, mask,
                                cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)


@functools.partial(jax.jit, static_argnames=("cam", "scales", "max_level"))
def _sparse_align_jit(T_init, pyr_ref, pyr_cur, uv_ref, pts_ref, mask, cam,
                      scales, max_level):
    return align.sparse_image_align(T_init, pyr_ref, pyr_cur, uv_ref,
                                    pts_ref, mask, cam, tuple(scales),
                                    max_level)


@jax.jit
def _project_points_jit(T_cw, pts_w, fx, fy, cx, cy):
    pc = lie.se3_apply(T_cw, pts_w)
    z = jnp.maximum(pc[..., 2], 1e-6)
    uv = jnp.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], -1)
    return uv, pc[..., 2]


class Tracker:
    """Host orchestration of the tracking cascade. Owns the MapState and
    slot-allocation bookkeeping; local mapping is invoked synchronously on
    keyframe creation (determinism first — SURVEY.md §7.6)."""

    def __init__(self, cfg: SlamConfig, vocab: vocabulary.Vocabulary,
                 mapper=None):
        self.cfg = cfg
        self.vocab = vocab
        self.ms: MapState = mapstate.make_empty(
            cfg.max_keyframes, cfg.max_map_points, cfg.n_features,
            cfg.n_words)
        self.mapper = mapper  # LocalMapping (set after construction)
        self.state = NO_IMAGES_YET
        self.last_frame: Optional[frame_mod.Frame] = None
        self.init_frame: Optional[frame_mod.Frame] = None
        self.velocity: Optional[dict] = None   # T_cur_last of previous step
        self.ref_kf: int = 0
        self.n_kf: int = 0
        self.mp_alloc = np.zeros((cfg.max_map_points,), bool)  # host mirror
        self.direct_cache: Optional[np.ndarray] = None  # candidate mp ids
        self.direct_cache_len = 512
        self.last_kf_frame_id = 0
        self.last_inliers = 0
        self.trajectory: List[dict] = []  # per-frame records
        self.direct_failed = False
        self.last_reloc_frame_id = -10_000
        self.scales = jnp.asarray(cfg.scale_factors)

    # ------------------------------------------------------------------
    def alloc_mp_slots(self, n: int) -> np.ndarray:
        free = np.where(~self.mp_alloc)[0]
        take = free[:n]
        self.mp_alloc[take] = True
        return take

    # ------------------------------------------------------------------
    def track(self, fr: frame_mod.Frame) -> Optional[dict]:
        """Process one frame; returns T_cw or None while not initialized."""
        if self.state == NO_IMAGES_YET:
            self.state = NOT_INITIALIZED

        if self.state == NOT_INITIALIZED:
            has_depth = (fr.depth is not None
                         and int(jnp.sum(fr.depth > 0)) >= 100)
            if has_depth:
                self._stereo_initialization(fr)
            else:
                self._monocular_initialization(fr)
        else:
            self._track_frame(fr)

        if fr.T_cw is not None and self.state == OK:
            T_ref = {"q": self.ms.kf_q[self.ref_kf],
                     "t": self.ms.kf_t[self.ref_kf]}
            T_c_ref = lie.se3_compose(fr.T_cw, lie.se3_inverse(T_ref))
            self.trajectory.append(dict(
                frame_id=fr.frame_id, timestamp=fr.timestamp,
                ref_kf=self.ref_kf,
                T_c_ref={k: np.asarray(v) for k, v in T_c_ref.items()},
                lost=False))
        elif self.state == LOST:
            self.trajectory.append(dict(frame_id=fr.frame_id,
                                        timestamp=fr.timestamp, lost=True))
        self.last_frame = fr
        return fr.T_cw

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def _stereo_initialization(self, fr: frame_mod.Frame):
        """Stereo/RGB-D bootstrap: the first frame with enough depth
        becomes KF0 and its close features become map points directly
        (reference StereoInitialization, /root/reference/src/Tracking.cc:
        661-709)."""
        cfg = self.cfg
        fr.T_cw = lie.se3_identity()
        self.ms = self._insert_kf_from_frame(
            fr, 0, jnp.full((cfg.n_features,), -1, jnp.int32))
        self.n_kf = 1
        self.ref_kf = 0
        self._create_depth_map_points(fr, 0)
        fr.mp_idx = self.ms.kf_mp_idx[0]
        self.ms = map_ops.bind_observations(self.ms)
        self.ms = map_ops.refresh_map_points(
            self.ms, jnp.ones((cfg.max_map_points,), bool),
            cfg.scale_factor, cfg.n_levels)
        self.state = OK
        self.velocity = None
        self.last_kf_frame_id = fr.frame_id
        self._rebuild_direct_cache()
        if self.mapper is not None:
            self.mapper.on_new_keyframe(self, 0, fr)

    def _create_depth_map_points(self, fr, slot: int, max_new: int = 512):
        """Create map points from stereo/RGB-D depth for features without
        one, closest-first (reference creates close points on KF insertion,
        /root/reference/src/Tracking.cc:1468-1525)."""
        cfg = self.cfg
        cam = cfg.camera
        close_th = cam.th_depth * cam.bf / cam.fx if cam.bf > 0 else 1e9
        depth = fr.depth
        bound = self.ms.kf_mp_idx[slot]
        ok = (fr.feat_mask & (depth > 0) & (depth < close_th)
              & (bound < 0))
        okn = np.asarray(ok)
        if okn.sum() == 0:
            return
        order = np.argsort(np.where(okn, np.asarray(depth), np.inf))
        take = order[:min(int(okn.sum()), max_new)]
        slots = self.alloc_mp_slots(len(take))
        take = take[:len(slots)]
        if len(slots) == 0:
            return
        f = jnp.asarray(take)
        sl = jnp.asarray(slots)
        from ygz_tpu.core.camera import unproject
        pc = unproject(cam, fr.uv[f], depth[f])
        T_wc = lie.se3_inverse(fr.T_cw)
        pw = lie.se3_apply(T_wc, pc)
        lvl = fr.level[f]
        patches = self._patches_at_levels(fr.pyramid, fr.uv[f], lvl)
        self.ms = map_ops.add_map_points(
            self.ms, sl, pw, fr.desc[f], _normals_from(pw, fr.T_cw),
            jnp.zeros((len(slots),)), jnp.full((len(slots),), 1e9),
            jnp.full((len(slots),), slot, jnp.int32), lvl, patches,
            jnp.full((len(slots),), slot, jnp.int32),
            jnp.ones((len(slots),), bool))
        self.ms = dataclasses.replace(
            self.ms, kf_mp_idx=self.ms.kf_mp_idx.at[slot, f].set(sl))
        if self.mapper is not None:
            self.mapper.recent.extend(
                (int(s), self.mapper.kf_count) for s in slots)

    def _monocular_initialization(self, fr: frame_mod.Frame):
        cfg = self.cfg
        fr2 = frame_mod.extract_features(fr, cfg)
        n_feat = int(jnp.sum(fr2.feat_mask))
        min_feat = self.cfg.init_min_matches
        if self.init_frame is None or not self.init_frame.extracted:
            if n_feat > min_feat:
                self.init_frame = fr2
            return
        if n_feat <= min_feat:
            self.init_frame = None
            return

        f0 = self.init_frame
        res = search.search_for_initialization(
            f0.desc, f0.uv, f0.angle, f0.feat_mask,
            fr2.desc, fr2.uv, fr2.angle, fr2.feat_mask)
        n_match = int(jnp.sum(res.mask))
        if n_match < self.cfg.init_min_matches:
            self.init_frame = fr2  # slide the init window forward
            return

        uv1 = f0.uv
        uv2 = fr2.uv[res.idx]
        init = initializer.initialize_two_view(
            uv1, uv2, res.mask, cfg.camera.K, seed=fr.frame_id)
        if not bool(init.success):
            return

        self._create_initial_map(f0, fr2, res, init)

    def _create_initial_map(self, f0, f1, match_res, init):
        """Two KFs + triangulated points + global BA + median-depth
        normalization (reference CreateInitialMapMonocular,
        /root/reference/src/Tracking.cc:779-894)."""
        cfg = self.cfg
        good = np.asarray(match_res.mask & init.good)
        pts = np.asarray(init.points)

        # scale so median depth == 1
        med_depth = float(np.median(pts[good][:, 2]))
        if med_depth <= 0 or good.sum() < 50:
            return
        pts = pts / med_depth
        t1 = np.asarray(init.t) / med_depth

        T0 = lie.se3_identity()
        T1 = {"q": lie.matrix_to_quat(jnp.asarray(init.R)),
              "t": jnp.asarray(t1)}
        f0.T_cw, f1.T_cw = T0, T1

        # allocate map points
        idx_good = np.where(good)[0]
        slots = self.alloc_mp_slots(len(idx_good))
        n = len(slots)
        idx_good = idx_good[:n]

        f0_feat = jnp.asarray(idx_good)
        f1_feat = match_res.idx[f0_feat]

        # bind features -> map points
        mp_idx0 = jnp.full((cfg.n_features,), -1, jnp.int32).at[f0_feat].set(
            jnp.asarray(slots))
        mp_idx1 = jnp.full((cfg.n_features,), -1, jnp.int32).at[f1_feat].set(
            jnp.asarray(slots))

        self.ms = self._insert_kf_from_frame(f0, 0, mp_idx0)
        self.ms = self._insert_kf_from_frame(f1, 1, mp_idx1)
        self.n_kf = 2

        # patches from the creating KF (f1: fresher view), at feature level
        lvl = f1.level[f1_feat]
        s = self.scales[lvl]
        patches = self._patches_at_levels(f1.pyramid, f1.uv[f1_feat], lvl)
        pos_w = jnp.asarray(pts[np.asarray(idx_good)])
        self.ms = map_ops.add_map_points(
            self.ms, jnp.asarray(slots), pos_w,
            f1.desc[f1_feat],
            _normals_from(pos_w, T1),
            jnp.zeros((n,)), jnp.full((n,), 1e9),
            jnp.full((n,), 1, jnp.int32), lvl, patches,
            jnp.full((n,), 0, jnp.int32), jnp.ones((n,), bool))
        self.ms = map_ops.bind_observations(self.ms)
        self.ms = map_ops.refresh_map_points(
            self.ms, jnp.ones((cfg.max_map_points,), bool),
            cfg.scale_factor, cfg.n_levels)

        # global BA over the 2-KF map
        self.ms = self._run_global_ba(iters=20)

        self.ref_kf = 1
        self.state = OK
        self.velocity = None
        self.last_kf_frame_id = f1.frame_id
        self._rebuild_direct_cache()
        if self.mapper is not None:
            self.mapper.on_new_keyframe(self, 0, f0)
            self.mapper.on_new_keyframe(self, 1, f1)

    def _patches_at_levels(self, pyr, uv0, lvl):
        """Canonical patches sampled at each feature's own level."""
        C = uv0.shape[0]
        out = jnp.zeros((C, mapstate.MP_PATCH_SIDE ** 2))
        for l in range(self.cfg.n_levels):
            sel = lvl == l
            p = map_ops.extract_patches(pyr[l], uv0 / float(self.cfg.scale_factors[l]))
            out = jnp.where(sel[:, None], p, out)
        return out

    def _insert_kf_from_frame(self, fr, slot, mp_idx):
        word_ids = vocabulary.transform(self.vocab, fr.desc, fr.feat_mask)
        bow = vocabulary.bow_vector(self.vocab, word_ids, fr.feat_mask)
        ur = fr.ur if fr.ur is not None else jnp.full(fr.uv.shape[:1], -1.0)
        return map_ops.insert_keyframe(
            self.ms, slot, fr.T_cw, fr.timestamp, fr.frame_id,
            fr.uv, ur, fr.level, fr.angle, fr.desc, fr.feat_mask,
            mp_idx, bow)

    def _run_global_ba(self, iters=20):
        cfg = self.cfg
        obs = _gather_observations(self.ms, jnp.asarray(cfg.inv_level_sigma2))
        prob = ba.BAProblem(
            kf_q=self.ms.kf_q, kf_t=self.ms.kf_t, mp=self.ms.mp_pos, obs=obs,
            kf_fixed=jnp.zeros((cfg.max_keyframes,), bool).at[0].set(True),
            kf_mask=self.ms.kf_mask, mp_mask=self.ms.mp_mask)
        prob = ba.global_bundle_adjustment(prob, cfg.camera, iters=iters)
        return dataclasses.replace(self.ms, kf_q=prob.kf_q, kf_t=prob.kf_t,
                                   mp_pos=prob.mp)

    # ------------------------------------------------------------------
    # main per-frame cascade
    # ------------------------------------------------------------------
    def _track_frame(self, fr: frame_mod.Frame):
        cfg = self.cfg
        ok = False

        if self.state == OK:
            # 1) sparse direct alignment against the last frame
            if (self.velocity is not None and self.last_frame is not None
                    and self.last_frame.mp_idx is not None
                    and int(jnp.sum((self.last_frame.mp_idx >= 0)
                                    & self.last_frame.feat_mask)) >= 30):
                ok = self._track_sparse_align(fr)
            # 2) feature motion model
            if not ok and self.velocity is not None:
                ok = self._track_motion_model(fr)
            # 3) reference keyframe
            if not ok:
                ok = self._track_reference_keyframe(fr)
        if self.state == LOST or not ok:
            ok = self._relocalize(fr)
            if ok:
                self.last_reloc_frame_id = fr.frame_id

        if not ok:
            self.state = LOST
            self.velocity = None
            return

        # local map refinement
        if fr.desc is None:
            ok = self._track_local_map_direct(fr)
            if not ok:
                self.direct_failed = True
                fr2 = frame_mod.extract_features(fr, cfg)
                self._copy_frame_fields(fr, fr2)
                ok = self._track_local_map_features(fr)
        else:
            ok = self._track_local_map_features(fr)

        if not ok:
            self.state = LOST
            self.velocity = None
            return

        self.state = OK
        self.direct_failed = False
        if self.last_frame is not None and self.last_frame.T_cw is not None:
            self.velocity = lie.se3_compose(
                fr.T_cw, lie.se3_inverse(self.last_frame.T_cw))

        if self._need_new_keyframe(fr):
            self._create_new_keyframe(fr)

    def _copy_frame_fields(self, dst, src):
        for f in ("uv", "level", "angle", "desc", "feat_mask", "ur",
                  "depth", "mp_idx"):
            setattr(dst, f, getattr(src, f))

    # --- cascade stage 1: direct ------------------------------------
    def _track_sparse_align(self, fr) -> bool:
        last = self.last_frame
        tracked = (last.mp_idx >= 0) & last.feat_mask
        mp_ids = jnp.where(tracked, last.mp_idx, 0)
        pts_w = self.ms.mp_pos[mp_ids]
        pts_last = lie.se3_apply(last.T_cw, pts_w)
        valid = tracked & self.ms.mp_mask[mp_ids] & (pts_last[:, 2] > 0.05)

        T_init = self.velocity  # T_cur_last guess
        T_cur_last, _ = _sparse_align_jit(
            T_init, last.pyramid, fr.pyramid, last.uv, pts_last, valid,
            self.cfg.camera, tuple(float(s) for s in self.cfg.scale_factors),
            min(self.cfg.n_levels - 1, 3))
        # sanity: motion must stay bounded
        xi = lie.se3_log(lie.se3_compose(T_cur_last, lie.se3_inverse(T_init)))
        if not np.all(np.isfinite(np.asarray(xi))) or \
                float(jnp.linalg.norm(xi[3:])) > 0.5 or \
                float(jnp.linalg.norm(xi[:3])) > 1.0:
            return False
        fr.T_cw = lie.se3_compose(T_cur_last, last.T_cw)
        return True

    # --- cascade stage 2: feature motion model ----------------------
    def _track_motion_model(self, fr) -> bool:
        cfg = self.cfg
        fr2 = frame_mod.extract_features(fr, cfg)
        self._copy_frame_fields(fr, fr2)
        last = self.last_frame
        if last.mp_idx is None:
            return False
        T_pred = lie.se3_compose(self.velocity, last.T_cw)

        tracked = (last.mp_idx >= 0) & last.feat_mask
        mp_ids = jnp.where(tracked, last.mp_idx, 0)
        valid = tracked & self.ms.mp_mask[mp_ids]
        pts_w = self.ms.mp_pos[mp_ids]
        uv_proj, z = _project_points_jit(T_pred, pts_w, cfg.camera.fx,
                                         cfg.camera.fy, cfg.camera.cx,
                                         cfg.camera.cy)
        valid = valid & (z > 0.05)
        radius = 15.0 * self.scales[jnp.clip(last.level, 0, cfg.n_levels - 1)]
        res = search.search_by_projection(
            self.ms.mp_desc[mp_ids], uv_proj, radius,
            last.level, valid,
            fr.desc, fr.uv, fr.level, fr.feat_mask, ratio=0.9)
        n = int(jnp.sum(res.mask))
        if n < 20:
            return False
        return self._pose_opt_from_matches(fr, mp_ids, res, T_pred)

    # --- cascade stage 3: reference keyframe ------------------------
    def _track_reference_keyframe(self, fr) -> bool:
        cfg = self.cfg
        fr2 = frame_mod.extract_features(fr, cfg)
        self._copy_frame_fields(fr, fr2)
        k = self.ref_kf
        kf_mp = self.ms.kf_mp_idx[k]
        kf_valid = self.ms.kf_feat_mask[k] & (kf_mp >= 0)
        res = search.search_by_descriptor(
            self.ms.kf_desc[k], self.ms.kf_angle[k], kf_valid,
            fr.desc, fr.angle, fr.feat_mask, ratio=0.7)
        n = int(jnp.sum(res.mask))
        if n < 15:
            return False
        T_init = self.last_frame.T_cw if self.last_frame.T_cw is not None \
            else {"q": self.ms.kf_q[k], "t": self.ms.kf_t[k]}
        mp_ids = jnp.where(kf_valid, kf_mp, 0)
        return self._pose_opt_from_matches(fr, mp_ids, res, T_init)

    def _pose_opt_from_matches(self, fr, mp_ids, res, T_init) -> bool:
        """Common tail: bind matches, run pose optimization, unbind
        outliers. mp_ids: [Q] map point per query row; res: match into
        fr's features."""
        cfg = self.cfg
        pts = self.ms.mp_pos[mp_ids]
        uv = fr.uv[res.idx]
        lvl = fr.level[res.idx]
        inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[jnp.clip(lvl, 0, cfg.n_levels - 1)]
        T, inlier, n_in = _pose_opt_jit(
            T_init, pts, uv, jnp.full(uv.shape[:1], -1.0), inv_s2,
            res.mask, cfg.camera)
        n_in = int(n_in)
        if n_in < 10:
            return False
        fr.T_cw = T
        # bind inlier matches to the frame's features (out-of-bounds index
        # for non-inliers -> dropped by mode="drop")
        fr.mp_idx = jnp.full((cfg.n_features,), -1, jnp.int32).at[
            jnp.where(inlier, res.idx, cfg.n_features)].set(
            mp_ids.astype(jnp.int32), mode="drop")
        self.last_inliers = n_in
        return True

    # --- local map: direct path --------------------------------------
    def _rebuild_direct_cache(self):
        """Cache = map points seen by the covisible neighborhood of the
        reference KF (reference UpdateLocalMap + mvpDirectMapPointsCache,
        /root/reference/src/Tracking.cc:2174-2246)."""
        counts = np.asarray(mapstate.covisibility_counts(self.ms, self.ref_kf))
        local_kfs = list(np.argsort(-counts)[:10])
        local_kfs = [k for k in local_kfs if counts[k] > 0] + [self.ref_kf]
        ids = np.unique(np.concatenate(
            [np.asarray(self.ms.kf_mp_idx[k]) for k in local_kfs]))
        ids = ids[ids >= 0]
        mask = np.asarray(self.ms.mp_mask)[ids]
        ids = ids[mask]
        C = self.direct_cache_len
        if len(ids) >= C:
            ids = ids[:C]
        else:
            ids = np.concatenate([ids, np.zeros(C - len(ids), np.int64) - 1])
        self.direct_cache = ids

    def _track_local_map_direct(self, fr) -> bool:
        cfg = self.cfg
        if self.direct_cache is None:
            self._rebuild_direct_cache()
        cand = self.direct_cache
        cand_j = jnp.asarray(np.where(cand >= 0, cand, 0).astype(np.int32))
        cand_valid = jnp.asarray(cand >= 0)

        uv_m, lvl_m, success, visible = map_ops.search_local_points_direct(
            self.ms, cand_j, fr.T_cw, fr.pyramid, cfg.camera,
            cfg.n_levels, cfg.scale_factor)
        success = success & cand_valid
        n_hit = int(jnp.sum(success))
        if n_hit < cfg.cache_features:
            # refresh the cache from the current neighborhood and retry once
            self._rebuild_direct_cache()
            cand = self.direct_cache
            cand_j = jnp.asarray(np.where(cand >= 0, cand, 0).astype(np.int32))
            cand_valid = jnp.asarray(cand >= 0)
            uv_m, lvl_m, success, visible = map_ops.search_local_points_direct(
                self.ms, cand_j, fr.T_cw, fr.pyramid, cfg.camera,
                cfg.n_levels, cfg.scale_factor)
            success = success & cand_valid
            n_hit = int(jnp.sum(success))
        if n_hit < 30:
            return False

        pts = self.ms.mp_pos[cand_j]
        inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[
            jnp.clip(lvl_m, 0, cfg.n_levels - 1)]
        T, inlier, n_in = _pose_opt_jit(
            fr.T_cw, pts, uv_m, jnp.full(uv_m.shape[:1], -1.0), inv_s2,
            success, cfg.camera)
        n_in = int(n_in)
        if n_in < 30:
            return False
        fr.T_cw = T
        # record the direct matches as the frame's (virtual) features so the
        # next frame's sparse alignment can use them
        C = cand_j.shape[0]
        N = cfg.n_features
        take = min(C, N)
        fr.uv = jnp.zeros((N, 2)).at[:take].set(uv_m[:take])
        fr.level = jnp.zeros((N,), jnp.int32).at[:take].set(lvl_m[:take])
        fr.feat_mask = jnp.zeros((N,), bool).at[:take].set(inlier[:take])
        fr.mp_idx = jnp.full((N,), -1, jnp.int32).at[:take].set(
            jnp.where(inlier[:take], cand_j[:take], -1))
        fr.desc = None  # stays a direct frame
        self.last_inliers = n_in
        # bookkeeping: found/visible counters
        self.ms = dataclasses.replace(
            self.ms,
            mp_visible=self.ms.mp_visible.at[cand_j].add(
                visible.astype(jnp.int32)),
            mp_found=self.ms.mp_found.at[cand_j].add(inlier.astype(jnp.int32)))
        return True

    # --- local map: feature path --------------------------------------
    def _local_map_points(self):
        counts = np.asarray(mapstate.covisibility_counts(self.ms, self.ref_kf))
        local_kfs = [k for k in np.argsort(-counts)[:10] if counts[k] > 0]
        local_kfs.append(self.ref_kf)
        member = np.zeros((self.cfg.max_map_points,), bool)
        for k in local_kfs:
            ids = np.asarray(self.ms.kf_mp_idx[k])
            ids = ids[ids >= 0]
            member[ids] = True
        member &= np.asarray(self.ms.mp_mask)
        return np.where(member)[0]

    def _track_local_map_features(self, fr) -> bool:
        cfg = self.cfg
        if fr.desc is None:
            fr2 = frame_mod.extract_features(fr, cfg)
            self._copy_frame_fields(fr, fr2)
        ids = self._local_map_points()
        if len(ids) < 10:
            return False
        C = 2048
        idsp = np.full((C,), -1, np.int64)
        idsp[:min(len(ids), C)] = ids[:C]
        cand = jnp.asarray(np.where(idsp >= 0, idsp, 0).astype(np.int32))
        cand_valid = jnp.asarray(idsp >= 0)

        uv_proj, z = _project_points_jit(
            fr.T_cw, self.ms.mp_pos[cand], cfg.camera.fx, cfg.camera.fy,
            cfg.camera.cx, cfg.camera.cy)
        dist = jnp.linalg.norm(self.ms.mp_pos[cand]
                               - map_ops._cam_center(fr.T_cw)[None], axis=-1)
        pred_lvl = mapstate.predict_scale_level(
            dist, self.ms.mp_max_dist[cand], cfg.scale_factor, cfg.n_levels)
        visible = cand_valid & (z > 0.05) & \
            (uv_proj[:, 0] >= 0) & (uv_proj[:, 0] < cfg.camera.width) & \
            (uv_proj[:, 1] >= 0) & (uv_proj[:, 1] < cfg.camera.height)
        radius = 4.0 * self.scales[pred_lvl]
        res = search.search_by_projection(
            self.ms.mp_desc[cand], uv_proj, radius, pred_lvl, visible,
            fr.desc, fr.uv, fr.level, fr.feat_mask, ratio=0.8)
        # keep existing bindings from the coarse stage as well
        n_matches = int(jnp.sum(res.mask))
        if n_matches < 20:
            return False

        pts = self.ms.mp_pos[cand]
        uv = fr.uv[res.idx]
        lvl = fr.level[res.idx]
        inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[
            jnp.clip(lvl, 0, cfg.n_levels - 1)]
        T, inlier, n_in = _pose_opt_jit(
            fr.T_cw, pts, uv, jnp.full(uv.shape[:1], -1.0), inv_s2,
            res.mask, cfg.camera)
        n_in = int(n_in)
        # stricter floor right after relocalization (reference
        # /root/reference/src/Tracking.cc:1160-1170)
        recently_relocalized = (fr.frame_id - self.last_reloc_frame_id
                                < 2 * self.cfg.fps)
        threshold = 50 if recently_relocalized else 30
        if n_in < threshold:
            return False
        fr.T_cw = T
        fr.mp_idx = jnp.full((cfg.n_features,), -1, jnp.int32).at[
            jnp.where(inlier, res.idx, cfg.n_features)].set(
            cand.astype(jnp.int32), mode="drop")
        self.last_inliers = n_in
        self.ms = dataclasses.replace(
            self.ms,
            mp_visible=self.ms.mp_visible.at[cand].add(visible.astype(jnp.int32)),
            mp_found=self.ms.mp_found.at[cand].add(inlier.astype(jnp.int32)))
        return True

    # --- relocalization -----------------------------------------------
    def _relocalize(self, fr) -> bool:
        from ygz_tpu.pipeline import relocalization
        ok = relocalization.relocalize(self, fr)
        if ok:
            self.state = OK
        return ok

    # --- keyframe policy ----------------------------------------------
    def _need_new_keyframe(self, fr) -> bool:
        """Simplified reference policy (/root/reference/src/Tracking.cc:
        1318-1441): enough frames passed OR tracking weak vs the reference
        KF, with an absolute inlier floor."""
        cfg = self.cfg
        if self.n_kf >= cfg.max_keyframes - 2:
            return False
        frames_since = fr.frame_id - self.last_kf_frame_id
        ref_obs = int(jnp.sum((self.ms.kf_mp_idx[self.ref_kf] >= 0)
                              & self.ms.kf_feat_mask[self.ref_kf]))
        # reference uses mnMatchesInliers < nRefMatches*0.9 (Tracking.cc:
        # 1420-1428); react early so tracked-point count never decays to
        # the failure floor between keyframes
        weak = self.last_inliers < 0.8 * ref_obs
        long_gap = frames_since >= max(3, int(cfg.fps))
        recent = frames_since < 2
        return (not recent) and (weak or long_gap) and self.last_inliers > 30

    def _create_new_keyframe(self, fr):
        cfg = self.cfg
        was_direct = fr.desc is None
        direct_uv = fr.uv if was_direct else None
        direct_mp = fr.mp_idx if was_direct else None
        direct_mask = fr.feat_mask if was_direct else None
        if was_direct:
            fr.uv = None  # force re-extraction with real descriptors
            fr2 = frame_mod.extract_features(
                dataclasses.replace(fr, uv=None, level=None, angle=None,
                                    desc=None, feat_mask=None), cfg)
            self._copy_frame_fields(fr, fr2)
            # re-associate direct-tracked map points to extracted features
            # by projection proximity; direct points with no nearby corner
            # become features of their own with descriptors computed at
            # their aligned positions — the reference does the same by
            # describing pre-existing keypoints in ORBextractor
            # (/root/reference/src/ORBextractor.cc:1031-1127)
            (fr.uv, fr.level, fr.angle, fr.desc, fr.feat_mask,
             fr.mp_idx) = _merge_direct_features(
                direct_uv, direct_mp, direct_mask,
                fr.uv, fr.level, fr.angle, fr.desc, fr.feat_mask,
                fr.pyramid, cfg)

        slot = self.n_kf
        self.ms = self._insert_kf_from_frame(fr, slot, fr.mp_idx)
        self.n_kf += 1
        if fr.depth is not None:
            self._create_depth_map_points(fr, slot)
        self.ms = map_ops.bind_observations(self.ms)
        self.ref_kf = slot
        self.last_kf_frame_id = fr.frame_id
        if self.mapper is not None:
            self.mapper.on_new_keyframe(self, slot, fr)
        self._rebuild_direct_cache()


@functools.partial(jax.jit, static_argnums=(6,))
def _reassociate(direct_uv, direct_mp, direct_mask, kp_uv, kp_level,
                 kp_mask, n_features: int):
    """Bind direct-tracked map points to freshly extracted keypoints by
    nearest-neighbor proximity (<3 px). Returns (mp_idx [N], matched [C])."""
    d = jnp.sum((direct_uv[:, None, :] - kp_uv[None, :, :]) ** 2, axis=-1)
    feas = direct_mask[:, None] & kp_mask[None, :] & (direct_mp >= 0)[:, None]
    d = jnp.where(feas, d, 1e12)
    best = jnp.argmin(d, axis=1)
    bd = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
    ok = bd < 9.0
    out = jnp.full((n_features,), -1, jnp.int32)
    out = out.at[jnp.where(ok, best, n_features)].set(direct_mp, mode="drop")
    return out, ok


def _merge_direct_features(direct_uv, direct_mp, direct_mask,
                           kp_uv, kp_level, kp_angle, kp_desc, kp_mask,
                           pyr, cfg, max_carry: int = 256):
    """KF-creation feature table for a direct-tracked frame: extracted
    keypoints, with direct-tracked map points either re-associated to a
    nearby corner or appended as described features in the table's tail
    slots (overwriting the weakest detections)."""
    from ygz_tpu.ops import orb, pyramid as pyr_mod

    N = cfg.n_features
    mp_idx, matched = _reassociate(direct_uv, direct_mp, direct_mask,
                                   kp_uv, kp_level, kp_mask, N)
    leftover = direct_mask & (direct_mp >= 0) & ~matched
    n_left = int(jnp.sum(leftover))
    if n_left == 0:
        return kp_uv, kp_level, kp_angle, kp_desc, kp_mask, mp_idx

    idx = np.where(np.asarray(leftover))[0][:max_carry]
    C = len(idx)
    uv_d = direct_uv[jnp.asarray(idx)]
    # direct matches carry their search level; descriptors need the blurred
    # image of that level
    lvl_d = jnp.zeros((C,), jnp.int32)  # level-0 describe (aligned at lvl0-ish)
    blurred0 = pyr_mod.gaussian_blur(pyr[0])
    ang_d = orb.compute_orientations(blurred0, uv_d, jnp.ones(C, bool))
    desc_d = orb.compute_descriptors(blurred0, uv_d, ang_d,
                                     jnp.ones(C, bool))
    # overwrite the tail (weakest) feature slots
    tail = jnp.arange(N - C, N)
    kp_uv = kp_uv.at[tail].set(uv_d)
    kp_level = kp_level.at[tail].set(lvl_d)
    kp_angle = kp_angle.at[tail].set(ang_d)
    kp_desc = kp_desc.at[tail].set(desc_d)
    kp_mask = kp_mask.at[tail].set(True)
    mp_idx = mp_idx.at[tail].set(direct_mp[jnp.asarray(idx)])
    return kp_uv, kp_level, kp_angle, kp_desc, kp_mask, mp_idx


def _normals_from(pos_w, T_cw):
    c = map_ops._cam_center(T_cw)
    v = pos_w - c[None]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)


def _gather_observations(ms: MapState, inv_level_sigma2) -> ba.Observations:
    """Flatten every KF feature with a map-point link into the global
    observation table [K*N]."""
    K, N = ms.kf_mp_idx.shape
    kf_ids = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, N))
    valid = ms.kf_feat_mask & (ms.kf_mp_idx >= 0) & ms.kf_mask[:, None]
    n_lvl = inv_level_sigma2.shape[0]
    return ba.Observations(
        kf=kf_ids.reshape(-1),
        mp=jnp.where(valid, ms.kf_mp_idx, 0).reshape(-1),
        uv=ms.kf_uv.reshape(-1, 2),
        ur=ms.kf_ur.reshape(-1),
        inv_sigma2=inv_level_sigma2[
            jnp.clip(ms.kf_level, 0, n_lvl - 1)].reshape(-1),
        mask=valid.reshape(-1))
