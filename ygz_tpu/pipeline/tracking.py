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
from ygz_tpu.utils import prefetch as prefetch_mod
from ygz_tpu.utils import timing
from ygz_tpu.utils.config import SlamConfig
from ygz_tpu.utils.log import logger

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
        self.n_kf: int = 0          # alive keyframes
        self.kf_next: int = 0       # next never-used slot (high-water mark)
        self.kf_free: List[int] = []  # culled slots available for reuse
        self.direct_cache: bool = False   # device candidate set built?
        self.direct_cache_len = 512
        self.last_kf_frame_id = 0
        self.last_inliers = 0
        # direct-path inlier count right after the latest KF insertion:
        # the unit-consistent nRefMatches for the weak trigger (see
        # _need_new_keyframe)
        self._kf_inlier_baseline = None
        self.trajectory: List[dict] = []  # per-frame records
        self.direct_failed = False
        self.last_reloc_frame_id = -10_000
        self.localization_only = False
        # explicit new-KF signal for the loop closer: slots appended at
        # every KF creation (incl. initialization) and drained exactly
        # once by System — inferring from last_kf_frame_id comparisons
        # missed deferred (pipelined) KFs and double-fired on others
        self.new_kf_slots: List[int] = []
        self._ref_obs_cache: Optional[int] = None
        self._ref_obs3_cache: Optional[int] = None
        self._cand_j = None
        self._cand_valid = None
        self.scales = jnp.asarray(cfg.scale_factors)
        # pipelined mode: frames in flight before their gate bundles are
        # read back (depth D amortizes the device->host round trip — the
        # dominant steady-state cost on a tunneled device — over D
        # frames, one batched readback per D)
        self.pipeline_depth = 1
        self._pending: List[tuple] = []

    # ------------------------------------------------------------------
    def alloc_mp_slots(self, n: int) -> np.ndarray:
        """Free map-point slots for a HOST-side insertion (init /
        depth-point paths; the mapping step allocates on device from
        ~mp_mask). mp_mask is the single allocation truth: the caller
        must add_map_points with these slots before allocating again
        (one blocking readback — these paths run once per KF at most)."""
        free = np.where(~np.asarray(self.ms.mp_mask))[0]
        if len(free) < n:
            # power-of-two growth instead of silently refusing points
            self.ms = mapstate.grow(self.ms, mp_factor=2)
            self.cfg.max_map_points *= 2
            free = np.where(~np.asarray(self.ms.mp_mask))[0]
        return free[:n]

    def alloc_kf_slot(self) -> int:
        """Next keyframe slot: reuse culled slots first, grow the map when
        the high-water mark hits capacity (the reference has unbounded
        heap KFs; static shapes get there by bucketed growth)."""
        if self.kf_free:
            return self.kf_free.pop()
        if self.kf_next >= self.cfg.max_keyframes:
            self.ms = mapstate.grow(self.ms, kf_factor=2)
            self.cfg.max_keyframes *= 2
        slot = self.kf_next
        self.kf_next += 1
        return slot

    def on_keyframe_killed(self, k: int, anchor: Optional[int] = None,
                           T_dead_anchor: Optional[dict] = None):
        """Bookkeeping when mapping culls KF k: free the slot and
        re-anchor trajectory records referencing it through the
        temporally nearest alive KF (the reference stores Tcp relative to
        a reassigned parent at cull, /root/reference/src/System.cc:398-417).
        The mapping step's cull program computes (anchor, T_dead_anchor)
        on device at cull time and passes them here via the deferred
        stats bundle; when absent (direct callers) they are recomputed
        from the current map."""
        self.kf_free.append(k)
        self.n_kf -= 1
        if anchor is None or anchor < 0:
            anchor = self._nearest_alive_kf(k)
        if self.ref_kf == k:
            self.ref_kf = anchor
            self._ref_obs_cache = None
        recs = [r for r in self.trajectory
                if not r.get("lost") and r["ref_kf"] == k]
        if not recs:
            return
        if T_dead_anchor is None:
            T_dead = {"q": self.ms.kf_q[k], "t": self.ms.kf_t[k]}
            T_anchor = {"q": self.ms.kf_q[anchor], "t": self.ms.kf_t[anchor]}
            T_dead_anchor = lie.se3_compose(T_dead, lie.se3_inverse(T_anchor))
        qs = jnp.stack([jnp.asarray(r["T_c_ref"]["q"]) for r in recs])
        ts = jnp.stack([jnp.asarray(r["T_c_ref"]["t"]) for r in recs])
        new = _compose_batch_jit(qs, ts, T_dead_anchor["q"],
                                 T_dead_anchor["t"])
        for i, r in enumerate(recs):
            r["ref_kf"] = anchor
            r["T_c_ref"] = {"q": new["q"][i], "t": new["t"][i]}

    def _nearest_alive_kf(self, k: int) -> int:
        fid = np.asarray(self.ms.kf_frame_id)
        mask = np.asarray(self.ms.kf_mask)
        alive = np.where(mask)[0]
        alive = alive[alive != k]
        if len(alive) == 0:
            return 0
        return int(alive[np.argmin(np.abs(fid[alive] - fid[k]))])

    # ------------------------------------------------------------------
    def track(self, fr: frame_mod.Frame) -> Optional[dict]:
        """Process one frame; returns T_cw or None while not initialized."""
        if self.state == NO_IMAGES_YET:
            self.state = NOT_INITIALIZED

        if fr.depth_img is not None:
            self.depth_exact = True   # true depth sensor (mapping policy)
        if self.state == NOT_INITIALIZED:
            if fr.depth_img is not None or fr.right_pyr is not None:
                # metric sensors bootstrap from depth; extraction is lazy
                # on tracked frames but required here
                fr2 = frame_mod.extract_features(fr, self.cfg)
                self._copy_frame_fields(fr, fr2)
            has_depth = (fr.depth is not None
                         and int(jnp.sum(fr.depth > 0)) >= 100)
            if has_depth:
                self._stereo_initialization(fr)
            else:
                self._monocular_initialization(fr)
        else:
            self._track_frame(fr)

        if fr.T_cw is not None and self.state == OK:
            T_c_ref = fr.T_c_ref
            if T_c_ref is None:
                T_c_ref = _rel_to_kf_jit(self.ms, fr.T_cw, self.ref_kf)
            # store device arrays; export converts lazily (a per-frame
            # np.asarray here costs a device->host round trip per frame)
            self.trajectory.append(dict(
                frame_id=fr.frame_id, timestamp=fr.timestamp,
                ref_kf=self.ref_kf, T_c_ref=dict(T_c_ref),
                lost=False))
        elif self.state == LOST:
            self.trajectory.append(dict(frame_id=fr.frame_id,
                                        timestamp=fr.timestamp, lost=True))
        self.last_frame = fr
        return fr.T_cw

    # ------------------------------------------------------------------
    # pipelined tracking (deferred gate readback)
    # ------------------------------------------------------------------
    def track_pipelined(self, fr: frame_mod.Frame) -> Optional[dict]:
        """Throughput-mode tracking: enqueue this frame's fused step
        immediately (consuming the previous frame's DEVICE outputs without
        waiting for them), then resolve the PREVIOUS frame's gate bundle —
        by then it is usually already computed, so the device never idles
        between frames and the host never blocks on a fresh round trip.

        The gate decisions (fallbacks, keyframe insertion) therefore run
        one frame late — the TPU-native analogue of the reference's
        tracking/mapping thread decoupling: a failed frame is detected at
        frame N+1, dropped from the trajectory, and recovery re-tracks the
        current frame against the last known-good frame synchronously.
        """
        from ygz_tpu.pipeline import fused_track
        if self.state == NO_IMAGES_YET:
            self.state = NOT_INITIALIZED
        last = self.last_frame
        if (self.state != OK or self.velocity is None or last is None
                or last.mp_idx is None or last.T_cw is None or fr.extracted):
            # states that need synchronous handling (init, lost, fallback)
            self.flush_pipeline()
            return self.track(fr)
        if not self.direct_cache:
            self._rebuild_direct_cache()

        with timing.stage("track.fused_step"):
            out = fused_track.fused_direct_step(
                self.ms, last.pyramid, last.uv, last.mp_idx, last.feat_mask,
                last.T_cw, self.velocity, fr.pyramid,
                self._cand_j, self._cand_valid, self.ref_kf, self.cfg)
            timing.sync(out.bundle)
        # optimistic application (device values, no sync)
        fr.T_cw = out.T_cw
        fr.uv, fr.level = out.fr_uv, out.fr_level
        fr.feat_mask, fr.mp_idx = out.fr_feat_mask, out.fr_mp_idx
        fr.desc = None
        fr.T_c_ref = out.T_c_ref
        self.velocity = out.velocity
        # pre-step counter snapshot rides with the pending entry: if the
        # chain is later dropped, the optimistic visible/found increments
        # of the dropped frames are subtracted back out (the culling
        # heuristic feeds on the found/visible ratio — uncorrected drops
        # would slowly corrupt it). Snapshots are lazy device references;
        # the delta is only ever computed on the rare drop path.
        pre_counters = (self.ms.mp_visible, self.ms.mp_found)
        self.ms = dataclasses.replace(
            self.ms, mp_visible=out.mp_visible, mp_found=out.mp_found)

        self._pending.append((fr, out, pre_counters))
        # start the gate bundle's device->host copy NOW: it rides the
        # device stream behind the fused step, so the later drain's
        # device_get finds the bytes already host-side instead of paying
        # a ~27 ms tunnel round trip per drain
        prefetch_mod.host_prefetch(out.bundle)
        self.last_frame = fr
        # once the pipe exceeds `depth`, resolve the oldest frames but
        # KEEP depth/2 in flight: the youngest pending frame's device
        # work is still upload-gated (the image copy streams on its own
        # thread), so draining all-but-newest blocked ~a full pipeline
        # period per drain; the kept tail has depth/2 frames of slack —
        # by the next drain its work (and async host copy) is done and
        # the readback costs ~nothing. Gate decisions lag 1..1.5*depth
        # frames (vs 1..depth+1) — still bounded, same recovery path.
        if len(self._pending) > self.pipeline_depth:
            keep = max(1, self.pipeline_depth // 2)
            self._drain_pipeline(len(self._pending) - keep, next_fr=fr)
        return fr.T_cw

    def flush_pipeline(self):
        """Resolve all in-flight frames (call before export/shutdown or a
        synchronous fallback)."""
        if self._pending:
            self._drain_pipeline(len(self._pending), next_fr=None)

    def _drain_pipeline(self, k, next_fr):
        """Read back the oldest k pending gate bundles in ONE device
        round trip and commit each frame's record + late decisions in
        order. The batched readback is the point of depth>1: the
        per-readback latency on a tunneled device (~11 ms) otherwise
        bounds system FPS at ~1/latency regardless of device speed."""
        import jax as _jax
        pending, self._pending = self._pending[:k], self._pending[k:]
        map_pending = []
        if self.mapper is not None and self.mapper.pending:
            map_pending, self.mapper.pending = self.mapper.pending, []
        with timing.stage("track.drain_readback"):
            # ONE round trip for everything this drain needs: the frames'
            # gate bundles + the mapping steps' deferred stats bundles
            bundles, map_stats = _jax.device_get(
                ([o.bundle for _, o, _ in pending], map_pending))
        if map_stats and self.mapper is not None:
            self.mapper.resolve_pending(self, stats_np=map_stats)
        for i, (pfr, pout, ppre) in enumerate(pending):
            if not self._resolve_one(pfr, bundles[i], pout, ppre,
                                     next_fr=next_fr, tail=pending[i + 1:]):
                return  # failure path consumed the rest of the pipe

    def _rollback_counters(self, dropped_entries):
        """Subtract the dropped frames' optimistic visible/found
        increments (per-entry delta = post-step minus pre-step snapshot;
        deltas stay valid under interleaved map updates because each is
        local to its own step). `grow` may have widened the tables since
        an entry was enqueued — deltas are zero-padded up to the current
        capacity."""
        cur_v, cur_f = self.ms.mp_visible, self.ms.mp_found
        M = cur_v.shape[0]

        def pad(d):
            if d.shape[0] == M:
                return d
            return jnp.zeros((M,), d.dtype).at[:d.shape[0]].set(d)

        for _, out, (pre_v, pre_f) in dropped_entries:
            cur_v = cur_v - pad(out.mp_visible - pre_v)
            cur_f = cur_f - pad(out.mp_found - pre_f)
        self.ms = dataclasses.replace(self.ms, mp_visible=cur_v,
                                      mp_found=cur_f)

    def _resolve_one(self, pfr, b, pout, ppre, next_fr, tail):
        """Commit one resolved frame. Returns False if the chain broke:
        the remaining pending frames (which extended the invalid chain)
        are dropped and the CURRENT frame re-tracks synchronously."""
        from ygz_tpu.pipeline import fused_track
        ok = bool(b[fused_track.B_OK])
        if not ok:
            # the optimistic chain from pfr on is invalid: drop pfr and
            # every frame queued behind it (both the rest of this drain
            # and the still-in-flight newest frames), then re-track the
            # CURRENT frame from the last known-good state
            self._rollback_counters(
                [(pfr, pout, ppre)] + list(tail) + self._pending)
            dropped = [pfr] + [t[0] for t in tail] \
                + [p[0] for p in self._pending]
            self._pending = []
            for tfr in dropped:
                if next_fr is not None and tfr is next_fr:
                    continue  # re-tracked below; records itself
                self.trajectory.append(dict(frame_id=tfr.frame_id,
                                            timestamp=tfr.timestamp,
                                            lost=True))
            good = getattr(self, "_last_good", None)
            self.velocity = None
            if next_fr is not None:
                # reset the current frame's optimistic state and re-track
                next_fr.T_cw = None
                next_fr.uv = next_fr.level = next_fr.desc = None
                next_fr.feat_mask = next_fr.mp_idx = None
                next_fr.T_c_ref = None
                self.last_frame = good if good is not None else pfr
                self._track_frame(next_fr)
                if next_fr.T_cw is not None and self.state == OK:
                    self._record_frame(next_fr)
                    self._last_good = next_fr
                self.last_frame = next_fr
            else:
                self.state = LOST
            return False
        # success: commit pfr's record and late decisions
        self.last_inliers = int(b[fused_track.B_N_IN])
        self._ref_obs_cache = int(b[fused_track.B_REF_OBS])
        self._ref_obs3_cache = int(b[fused_track.B_REF_OBS3])
        self._record_frame(pfr)
        self._last_good = pfr
        if b[fused_track.B_N_HIT] < self.cfg.cache_features:
            self._rebuild_direct_cache()
        if self._need_new_keyframe(pfr):
            self._create_new_keyframe(pfr)
            # frames queued behind pfr cached T_c_ref against the OLD
            # reference KF — clear so _record_frame recomputes
            for tfr, _, _ in tail:
                tfr.T_c_ref = None
        return True

    def _record_frame(self, fr):
        T_c_ref = fr.T_c_ref
        if T_c_ref is None:
            T_c_ref = _rel_to_kf_jit(self.ms, fr.T_cw, self.ref_kf)
        self.trajectory.append(dict(
            frame_id=fr.frame_id, timestamp=fr.timestamp,
            ref_kf=self.ref_kf, T_c_ref=dict(T_c_ref), lost=False))

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
        self.kf_next = 1
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
        self.new_kf_slots.append(0)
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
        # PADDED to a static lane count (see _create_initial_map): a
        # variable take-length would recompile the insertion programs at
        # every keyframe
        N = min(cfg.n_features, max_new)
        order = np.argsort(np.where(okn, np.asarray(depth), np.inf))
        take_np = order[:min(int(okn.sum()), N)]
        slots_np = self.alloc_mp_slots(len(take_np))
        take_np = take_np[:len(slots_np)]
        if len(slots_np) == 0:
            return
        n = len(slots_np)
        valid_np = np.zeros((N,), bool)
        valid_np[:n] = True
        f_pad = np.zeros((N,), np.int32)
        f_pad[:n] = take_np
        sl_pad = np.zeros((N,), np.int32)
        sl_pad[:n] = slots_np
        vmask = jnp.asarray(valid_np)
        f = jnp.asarray(f_pad)
        sl = jnp.asarray(sl_pad)
        from ygz_tpu.core.camera import unproject
        pc = unproject(cam, fr.uv[f], depth[f])
        T_wc = lie.se3_inverse(fr.T_cw)
        pw = lie.se3_apply(T_wc, pc)
        lvl = fr.level[f]
        patches = self._patches_at_levels(fr.pyramid, fr.uv[f], lvl)
        self.ms = map_ops.add_map_points(
            self.ms, sl, pw, fr.desc[f], _normals_from(pw, fr.T_cw),
            jnp.zeros((N,)), jnp.full((N,), 1e9),
            jnp.full((N,), slot, jnp.int32), lvl, patches,
            jnp.full((N,), slot, jnp.int32), vmask)
        self.ms = dataclasses.replace(
            self.ms, kf_mp_idx=self.ms.kf_mp_idx.at[
                slot, jnp.where(vmask, f, cfg.n_features)].set(
                sl, mode="drop"))
        if self.mapper is not None:
            # born = the kf_count AFTER this keyframe is processed
            # (on_new_keyframe increments later): depth points created at
            # KF insertion must age like points created DURING mapping,
            # or the age>=2 & obs<=2 cull fires one round early — which
            # wiped the entire previous KF's points every insertion
            from ygz_tpu.pipeline import mapping_kernels as mk
            (self.mapper.ring_ids, self.mapper.ring_born,
             self.mapper.ring_head) = mk.ring_append_jit(
                self.mapper.ring_ids, self.mapper.ring_born,
                self.mapper.ring_head, sl, vmask,
                self.mapper.kf_count + 1)

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
        # photometric refinement of the match positions before geometry:
        # raw detector corners carry ~1 px view-dependent bias, which at
        # initialization baselines dominates triangulated depth
        uv2, _ = align.refine_matches_klt(
            f0.pyramid, uv1, f0.level, fr2.pyramid, uv2, res.mask,
            cfg.n_levels, tuple(float(s) for s in cfg.scale_factors))
        # disparity gate: demand real image-space parallax before trusting
        # two-view geometry (median match displacement >= ~8% of width —
        # the reference initializes on any consecutive pair and produces
        # noise-dominated maps at creeping motion; waiting costs nothing)
        disp = np.asarray(jnp.linalg.norm(uv2 - uv1, axis=-1))
        med_disp = float(np.median(disp[np.asarray(res.mask)]))
        if med_disp < max(8.0, 0.02 * cfg.camera.width):
            return
        init = initializer.initialize_two_view(
            uv1, uv2, res.mask, cfg.camera.K, seed=fr.frame_id,
            min_parallax_deg=2.0)
        logger.debug(
            "init try (%d,%d): matches=%d med_disp=%.1f success=%s used_h=%s"
            " n_good=%d |t|=%.3f", f0.frame_id, fr.frame_id, n_match,
            med_disp, bool(init.success), bool(init.used_h),
            int(jnp.sum(init.good)), float(jnp.linalg.norm(init.t)))
        if not bool(init.success):
            return
        if not self._create_initial_map(f0, fr2, res, init, uv2):
            # map rejected post-BA (insufficient true parallax): KEEP the
            # anchor frame — the pair needs a longer baseline, and
            # replacing f0 with the current frame would reset the
            # accumulated baseline to zero (observed: init pushed from
            # frame 7 to 21 on the orbit world)
            pass

    def _create_initial_map(self, f0, f1, match_res, init, uv2_refined):
        """Two KFs + triangulated points + global BA + median-depth
        normalization (reference CreateInitialMapMonocular,
        /root/reference/src/Tracking.cc:779-894). uv2_refined: the
        KLT-refined positions of f1's matched features (used as the KF's
        stored measurements for bound features)."""
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

        # allocate map points — PADDED to the static feature capacity:
        # a variable-length np.where index here used to give every init
        # attempt its own gather/scatter shapes, recompiling ~40 device
        # programs per attempt (minutes of warm-up on a tunneled TPU)
        N = cfg.n_features
        idx_good_np = np.where(good)[0][:N]
        slots_np = self.alloc_mp_slots(len(idx_good_np))
        n = len(slots_np)
        idx_good_np = idx_good_np[:n]
        valid_np = np.zeros((N,), bool)
        valid_np[:n] = True
        f0_pad = np.zeros((N,), np.int32)
        f0_pad[:n] = idx_good_np
        slots_pad = np.zeros((N,), np.int32)
        slots_pad[:n] = slots_np

        vmask = jnp.asarray(valid_np)
        f0_feat = jnp.asarray(f0_pad)
        f1_feat = match_res.idx[f0_feat]
        slots_j = jnp.asarray(slots_pad)

        # bind features -> map points (pad lanes scatter out of range)
        mp_idx0 = jnp.full((N,), -1, jnp.int32).at[
            jnp.where(vmask, f0_feat, N)].set(slots_j, mode="drop")
        mp_idx1 = jnp.full((N,), -1, jnp.int32).at[
            jnp.where(vmask, f1_feat, N)].set(slots_j, mode="drop")

        self.ms = self._insert_kf_from_frame(f0, 0, mp_idx0)
        self.ms = self._insert_kf_from_frame(f1, 1, mp_idx1)
        self.n_kf = 2
        self.kf_next = 2

        # patches from the creating KF (f1: fresher view), at the REFINED
        # feature positions (the KF's stored measurements below)
        uv1_ref = uv2_refined[f0_feat]
        lvl = f1.level[f1_feat]
        patches = self._patches_at_levels(f1.pyramid, uv1_ref, lvl)
        pos_w = jnp.asarray(pts[f0_pad])
        self.ms = map_ops.add_map_points(
            self.ms, slots_j, pos_w,
            f1.desc[f1_feat],
            _normals_from(pos_w, T1),
            jnp.zeros((N,)), jnp.full((N,), 1e9),
            jnp.full((N,), 1, jnp.int32), lvl, patches,
            jnp.full((N,), 0, jnp.int32), vmask)
        # f1's stored measurements are the refined match positions
        self.ms = dataclasses.replace(
            self.ms, kf_uv=self.ms.kf_uv.at[1, jnp.where(
                vmask, f1_feat, N)].set(uv1_ref, mode="drop"))
        self.ms = map_ops.bind_observations(self.ms)
        self.ms = map_ops.refresh_map_points(
            self.ms, jnp.ones((cfg.max_map_points,), bool),
            cfg.scale_factor, cfg.n_levels)
        # photometric refinement of both initial KFs' observations (the
        # patches live in f1's view; f0's detector corners get aligned)
        self._refine_kf_observations(0, f0)
        self._refine_kf_observations(1, f1)

        # global BA over the 2-KF map
        self.ms = self._run_global_ba(iters=20)

        # acceptance gate on an OBSERVABLE, with the post-BA rotation
        # (reliable to ~1 deg; the raw Faugeras/E decomposition's R can be
        # ~5 deg off, making any pre-BA parallax estimate meaningless):
        # median disparity of the bound observations after removing the
        # relative rotation. The translation-direction error of two-view
        # geometry scales as (pixel noise)/(parallax flow); measured on
        # the synthetic world, ~7 px true parallax -> 11 deg direction
        # error even after BA, >=10 px -> ~2 deg. The reference
        # initializes on any pair and suffers exactly this scale warp on
        # slow starts; waiting a few frames is free.
        R1 = np.asarray(lie.quat_to_matrix(self.ms.kf_q[1]))
        f1_np = np.asarray(match_res.idx)[idx_good_np]
        uv0_o = np.asarray(self.ms.kf_uv[0])[idx_good_np]
        uv1_o = np.asarray(self.ms.kf_uv[1])[f1_np]
        xn = np.concatenate(
            [(uv0_o - [cfg.camera.cx, cfg.camera.cy])
             / [cfg.camera.fx, cfg.camera.fy],
             np.ones((len(uv0_o), 1))], -1)
        rot = xn @ R1.T
        uv_inf = np.stack(
            [cfg.camera.fx * rot[:, 0] / rot[:, 2] + cfg.camera.cx,
             cfg.camera.fy * rot[:, 1] / rot[:, 2] + cfg.camera.cy], -1)
        # threshold in ABSOLUTE pixels: translation-direction error
        # scales as (pixel noise)/(parallax px), and detector noise does
        # not grow with resolution — a width-proportional bar demanded
        # 56 px at 752-wide frames where ~11 px already gives ~2 deg
        par_th = max(9.0, 0.015 * cfg.camera.width)
        med_par = float(np.median(np.linalg.norm(uv1_o - uv_inf, axis=-1)))
        if med_par < par_th:
            logger.debug("init rejected post-BA: rot-comp parallax "
                         "%.1f px < %.1f", med_par, par_th)
            # discard the tentative map entirely
            self.ms = mapstate.make_empty(
                cfg.max_keyframes, cfg.max_map_points, cfg.n_features,
                cfg.n_words)
            self.n_kf = 0
            self.kf_next = 0
            f0.T_cw = f1.T_cw = None
            f0.mp_idx = f1.mp_idx = None
            return False
        logger.debug("init accepted: rot-comp parallax %.1f px", med_par)

        self.ref_kf = 1
        self.state = OK
        self.velocity = None
        self.last_kf_frame_id = f1.frame_id
        self.new_kf_slots.extend([0, 1])
        self._rebuild_direct_cache()
        if self.mapper is not None:
            self.mapper.on_new_keyframe(self, 0, f0)
            self.mapper.on_new_keyframe(self, 1, f1)
        return True

    def _refine_kf_observations(self, slot, fr):
        """KLT-align the new KF's bound feature positions to their map
        points' canonical patches (map_ops.refine_bound_observations) —
        detector corners carry ~1 px view-dependent bias that dominates
        BA noise; photometric positions cut it ~5x."""
        cfg = self.cfg
        self.ms = _refine_kf_obs_jit(self.ms, slot, fr.pyramid, cfg)

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
        ur = fr.ur if fr.ur is not None else jnp.full(fr.uv.shape[:1], -1.0)
        return _insert_kf_jit(
            self.ms, self.vocab, slot, fr.T_cw,
            float(fr.timestamp), fr.frame_id, fr.uv, ur, fr.level,
            fr.angle, fr.desc, fr.feat_mask, mp_idx)

    def _run_global_ba(self, iters=20):
        cfg = self.cfg
        obs = _gather_observations(self.ms, jnp.asarray(cfg.inv_level_sigma2))
        prob = ba.BAProblem(
            kf_q=self.ms.kf_q, kf_t=self.ms.kf_t, mp=self.ms.mp_pos, obs=obs,
            kf_fixed=jnp.zeros((cfg.max_keyframes,), bool).at[0].set(True),
            kf_mask=self.ms.kf_mask, mp_mask=self.ms.mp_mask)
        prob = ba.global_bundle_adjustment(prob, cfg.camera, iters=iters,
                                           kf_major=True)
        return dataclasses.replace(self.ms, kf_q=prob.kf_q, kf_t=prob.kf_t,
                                   mp_pos=prob.mp)

    # ------------------------------------------------------------------
    # main per-frame cascade
    # ------------------------------------------------------------------
    def _track_frame(self, fr: frame_mod.Frame):
        cfg = self.cfg
        ok = False

        if self.state == OK:
            # 0) fused hot path: sparse align + direct local map + pose opt
            # in ONE device program with ONE scalar readback (fused_track)
            handled = self._try_fused_direct(fr)
            if handled:
                if self._need_new_keyframe(fr):
                    self._create_new_keyframe(fr)
                return
            if handled is False:
                # fused path lost the frame (direct + feature fallback
                # both failed); fall through to same-frame relocalization
                # (the reference relocalizes the failing frame itself,
                # /root/reference/src/Tracking.cc:396-408)
                logger.info("frame %d: fused+feature track failed, "
                            "relocalizing", fr.frame_id)
                self.state = LOST
                self.velocity = None
            if not ok and self.state == OK:
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
            if not ok and self.state == OK:
                ok = self._track_reference_keyframe(fr)
                if not ok:
                    logger.info("frame %d: full tracking cascade failed",
                                fr.frame_id)
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
                  "depth", "mp_idx", "blur_atlas"):
            setattr(dst, f, getattr(src, f))

    # --- fused hot path ----------------------------------------------
    def _try_fused_direct(self, fr):
        """Run the fused sparse-align + direct-local-map step
        (pipeline/fused_track.py). Returns:
          True  — frame fully tracked; all state applied.
          False — sparse align fine but the direct local map failed;
                  fr.T_cw holds the sparse-align pose and features are
                  extracted so the caller's feature path can refine.
          None  — preconditions absent or sparse align failed; caller
                  runs the full fallback cascade.
        """
        from ygz_tpu.pipeline import fused_track
        cfg = self.cfg
        last = self.last_frame
        if (self.velocity is None or last is None or last.mp_idx is None
                or last.T_cw is None or fr.extracted):
            return None
        if not self.direct_cache:
            self._rebuild_direct_cache()

        def run():
            return fused_track.fused_direct_step(
                self.ms, last.pyramid, last.uv, last.mp_idx, last.feat_mask,
                last.T_cw, self.velocity, fr.pyramid,
                self._cand_j, self._cand_valid, self.ref_kf, cfg)

        out = run()
        bundle = np.asarray(out.bundle)          # the ONE readback
        if bundle[fused_track.B_GATE1] < 30 or \
                not bundle[fused_track.B_MOTION_OK]:
            return None
        if bundle[fused_track.B_N_HIT] < cfg.cache_features:
            # refresh the direct cache from the current neighborhood and
            # retry once (reference cache-miss fallback,
            # /root/reference/src/Tracking.cc:2174-2246)
            self._rebuild_direct_cache()
            out = run()
            bundle = np.asarray(out.bundle)
            if bundle[fused_track.B_GATE1] < 30 or \
                    not bundle[fused_track.B_MOTION_OK]:
                return None
        if not bundle[fused_track.B_OK]:
            # sparse alignment held but the direct map lost it: hand the
            # aligned pose to the feature path
            self.direct_failed = True
            fr.T_cw = out.T_sa
            fr2 = frame_mod.extract_features(fr, cfg)
            self._copy_frame_fields(fr, fr2)
            ok = self._track_local_map_features(fr)
            if not ok:
                self.state = LOST
                self.velocity = None
                fr.T_cw = None
                return False
            self._finish_tracked_frame(fr)
            return True

        # success: apply everything computed on device (no host recompute)
        fr.T_cw = out.T_cw
        fr.uv, fr.level = out.fr_uv, out.fr_level
        fr.feat_mask, fr.mp_idx = out.fr_feat_mask, out.fr_mp_idx
        fr.desc = None  # stays a direct frame
        fr.T_c_ref = out.T_c_ref
        self.velocity = out.velocity
        self.ms = dataclasses.replace(
            self.ms, mp_visible=out.mp_visible, mp_found=out.mp_found)
        self.last_inliers = int(bundle[fused_track.B_N_IN])
        self._ref_obs_cache = int(bundle[fused_track.B_REF_OBS])
        self._ref_obs3_cache = int(bundle[fused_track.B_REF_OBS3])
        self.state = OK
        self.direct_failed = False
        return True

    def _finish_tracked_frame(self, fr):
        """Common epilogue for the fused fallback: state + velocity."""
        self.state = OK
        self.direct_failed = False
        if self.last_frame is not None and self.last_frame.T_cw is not None:
            self.velocity = lie.se3_compose(
                fr.T_cw, lie.se3_inverse(self.last_frame.T_cw))

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
        # per-point predicted scale from viewing distance (reference
        # PredictScale in SearchByProjection, /root/reference/src/
        # ORBmatcher.cc:1218-1260) — not the stale last-frame level, which
        # leaks accuracy on scale change
        cam_c = -lie.quat_rotate(lie.quat_conj(T_pred["q"]), T_pred["t"])
        dist = jnp.linalg.norm(pts_w - cam_c[None], axis=-1)
        pred_lvl = mapstate.predict_scale_level(
            dist, self.ms.mp_max_dist[mp_ids], cfg.scale_factor,
            cfg.n_levels)
        radius = 15.0 * self.scales[jnp.clip(pred_lvl, 0, cfg.n_levels - 1)]
        res = search.search_by_projection(
            self.ms.mp_desc[mp_ids], uv_proj, radius,
            pred_lvl, valid,
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
        # stereo/RGB-D frames contribute (u, v, u_r) rows (reference
        # EdgeStereoSE3ProjectXYZOnlyPose, /root/reference/src/Optimizer.cc:
        # 1704-1760); mono rows keep ur = -1
        ur = fr.ur[res.idx] if fr.ur is not None \
            else jnp.full(uv.shape[:1], -1.0)
        inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[jnp.clip(lvl, 0, cfg.n_levels - 1)]
        T, inlier, n_in = _pose_opt_jit(
            T_init, pts, uv, ur, inv_s2,
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
        /root/reference/src/Tracking.cc:2174-2246). One jitted program,
        no host readback — the candidate set lives on device."""
        self._cand_j, self._cand_valid = _direct_cache_jit(
            self.ms, self.ref_kf, self.direct_cache_len)
        self.direct_cache = True

    def _track_local_map_direct(self, fr) -> bool:
        cfg = self.cfg
        if not self.direct_cache:
            self._rebuild_direct_cache()
        cand_j, cand_valid = self._cand_j, self._cand_valid

        uv_m, lvl_m, success, visible = map_ops.search_local_points_direct(
            self.ms, cand_j, fr.T_cw, fr.pyramid, cfg.camera,
            cfg.n_levels, cfg.scale_factor)
        success = success & cand_valid
        n_hit = int(jnp.sum(success))
        if n_hit < cfg.cache_features:
            # refresh the cache from the current neighborhood and retry once
            self._rebuild_direct_cache()
            cand_j, cand_valid = self._cand_j, self._cand_valid
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
        ur = fr.ur[res.idx] if fr.ur is not None \
            else jnp.full(uv.shape[:1], -1.0)
        inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[
            jnp.clip(lvl, 0, cfg.n_levels - 1)]
        T, inlier, n_in = _pose_opt_jit(
            fr.T_cw, pts, uv, ur, inv_s2,
            res.mask, cfg.camera)
        n_in = int(n_in)
        # inlier floors scaled to the feature budget (the reference's
        # absolute 30/50 assume 1000 features,
        # /root/reference/src/Tracking.cc:1160-1170); stricter right
        # after relocalization
        recently_relocalized = (fr.frame_id - self.last_reloc_frame_id
                                < 2 * self.cfg.fps)
        threshold = max(15, self.cfg.n_features // 20) \
            if recently_relocalized else max(10, self.cfg.n_features // 33)
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
        if self.localization_only:
            # only-tracking mode never inserts keyframes (reference
            # /root/reference/src/Tracking.cc:1321-1324)
            return False
        frames_since = fr.frame_id - self.last_kf_frame_id
        if self._ref_obs_cache is None:
            row = self.ms.kf_mp_idx[self.ref_kf]
            bound = (row >= 0) & self.ms.kf_feat_mask[self.ref_kf]
            obs3 = bound & (self.ms.mp_obs_count[jnp.maximum(row, 0)] >= 3)
            both = np.asarray(jnp.stack([jnp.sum(bound), jnp.sum(obs3)]))
            self._ref_obs_cache = int(both[0])
            self._ref_obs3_cache = int(both[1])
        ref_obs = self._ref_obs_cache
        # the reference's gate is ((c1a | c1b | c1c) && c2)
        # (/root/reference/src/Tracking.cc:1397-1441) with
        #   c2  = inliers < nRefMatches * 0.9 (mono) && inliers > 15
        #   c1b = minFrames passed && mapping idle   (almost always true)
        #   c1c = inliers < 50
        # — so the effective mono trigger is c2: tracking must actually be
        # WEAK relative to the reference KF; there is no unconditional
        # time-based insert (c1a is also &&-ed with c2).
        #
        # nRefMatches translation: the reference's mnMatchesInliers and
        # nRefMatches both come from the same unbounded feature matcher,
        # so 0.9x compares like with like. Our direct inlier count is
        # capped by the candidate-cache size and the NCC gate, so the ref
        # KF's raw >=3-obs count is in DIFFERENT units (round 4 compared
        # them anyway and inserted a KF at every min-gap — 4x reference
        # cadence). The unit-consistent nRefMatches is the DIRECT inlier
        # count right after the reference KF was inserted (same matcher,
        # same cache): weak when tracking decays below 0.9 of that.
        ref_obs3 = self._ref_obs3_cache \
            if self._ref_obs3_cache is not None else ref_obs
        baseline = self._kf_inlier_baseline
        if baseline is None:
            baseline = min(ref_obs3, ref_obs)
        weak = self.last_inliers < 0.9 * baseline \
            or self.last_inliers < max(15, cfg.n_features // 20)  # c1c
        # time-based insert after ~1 s of strong tracking (the reference
        # reaches the same cadence through c1a/largetimegap + its fast
        # inlier decay on real footage; on slow synthetic worlds decay
        # alone can starve the map below the auto-reset/reloc floor).
        # Bounded cost: <= fps/long_gap keyframes per second.
        weak = weak or frames_since >= max(3, int(cfg.fps))
        # minimum spacing stands in for minFrames + the mapping-idle gate
        recent = frames_since < cfg.kf_min_gap_frames
        # reference queue<3 rule (Tracking.cc:1431): with the mapper busy
        # (unresolved per-KF stats), don't pile on more keyframes
        if self.mapper is not None and len(self.mapper.pending) >= 3:
            return False
        # visual-inertial before init: dense keyframes (~0.3 s apart).
        # The [s, g] least squares integrates gravity over KF gaps —
        # at 1 s gaps the 0.5*g*dt^2 term (~5 m) swamps the scale
        # signal (~0.1 m) and vision noise can flip the fitted scale
        # sign; the reference keeps 0.1-0.5 s KF spacing during its
        # 15 s VI init window for the same reason
        if cfg.use_imu and not getattr(self, "vins_inited", True):
            weak = weak or frames_since >= max(2, int(cfg.fps) // 3)
        elif cfg.use_imu:
            # cTimeGap (Tracking.cc:1412-1414): with IMU, insert every
            # 0.5 s regardless of c2 so the bias estimate cannot drift
            weak = weak or frames_since >= max(2, int(0.5 * cfg.fps))
        # metric sensors: keep the map stocked with FRESH depth anchors —
        # scale integrity comes from per-KF depth points, and a direct
        # tracker holds inliers high enough that the `weak` trigger alone
        # spaces KFs too far (observed: 4 vs 13 KFs, 17% scale drift on
        # the stereo e2e). Reference bNeedToInsertClose: tracked close
        # points < 100 (/root/reference/src/Tracking.cc:1386-1398); plus
        # a denser frame cap, mirroring its minFrames behaviour in
        # stereo/RGB-D runs.
        if cfg.camera.bf > 0 and not recent:
            if frames_since >= max(2, int(cfg.fps) // 3) \
                    and self.last_inliers > 30:
                return True
            if fr.T_cw is not None and fr.mp_idx is not None:
                tracked = (fr.mp_idx >= 0) & fr.feat_mask
                ids = jnp.where(tracked, fr.mp_idx, 0)
                z = lie.se3_apply(fr.T_cw, self.ms.mp_pos[ids])[:, 2]
                th = cfg.camera.bf / cfg.camera.fx * cfg.th_depth
                n_close = int(jnp.sum(tracked & self.ms.mp_mask[ids]
                                      & (z > 0) & (z < th)))
                if n_close < 100 and self.last_inliers > 30:
                    return True
        # inlier floor 15, as the reference's c2 (mnMatchesInliers > 15,
        # /root/reference/src/Tracking.cc:1408-1410): a weak-but-alive
        # frame is exactly when the map needs reinforcement — a higher
        # floor (30, rounds 1-3) starved feature-poor segments and lost
        # tracking where the reference would have inserted a keyframe.
        # `weak` is REQUIRED (no time-only insert) — the round-4 `or
        # long_gap` plus a mismatched weak bar inserted a KF every
        # min-gap (4x the reference cadence, ~200 ms of mapping each).
        return (not recent) and weak and self.last_inliers > 15

    def _create_new_keyframe(self, fr):
        with timing.stage("track.create_kf"):
            self._create_new_keyframe_inner(fr)

    def _create_new_keyframe_inner(self, fr):
        cfg = self.cfg
        was_direct = fr.desc is None
        direct_uv = fr.uv if was_direct else None
        direct_lvl = fr.level if was_direct else None
        direct_mp = fr.mp_idx if was_direct else None
        direct_mask = fr.feat_mask if was_direct else None
        if was_direct:
            fr.uv = None  # force re-extraction with real descriptors
            with timing.stage("track.kf.extract"):
                # occupancy-masked detection: cells holding direct-tracked
                # map points are excluded, so the budget goes to NEW
                # corners and the direct points carry over as described
                # features in _merge_direct_features (reference DSO mode,
                # /root/reference/src/ORBextractor.cc:1275-1386)
                occ = (direct_uv, direct_lvl,
                       direct_mask & (direct_mp >= 0))
                fr2 = frame_mod.extract_features(
                    dataclasses.replace(fr, uv=None, level=None, angle=None,
                                        desc=None, feat_mask=None), cfg,
                    occupied=occ)
                timing.sync(fr2.desc)
            self._copy_frame_fields(fr, fr2)
            # re-associate direct-tracked map points to extracted features
            # by projection proximity; direct points with no nearby corner
            # become features of their own with descriptors computed at
            # their aligned positions — the reference does the same by
            # describing pre-existing keypoints in ORBextractor
            # (/root/reference/src/ORBextractor.cc:1031-1127)
            with timing.stage("track.kf.merge_direct"):
                from ygz_tpu.ops import orb as orb_mod
                (fr.uv, fr.level, fr.angle, fr.desc, fr.feat_mask,
                 fr.mp_idx) = _merge_direct_features(
                    direct_uv, direct_lvl, direct_mp, direct_mask,
                    fr.uv, fr.level, fr.angle, fr.desc, fr.feat_mask,
                    fr.blur_atlas, orb_mod._pattern_selector(), cfg)
                timing.sync(fr.desc)
            if fr.depth_img is not None or fr.right_pyr is not None:
                # merged direct positions overwrote tail feature slots;
                # re-associate metric depth at the final uv table
                fr2 = frame_mod.associate_depth(fr, cfg)
                fr.ur, fr.depth = fr2.ur, fr2.depth

        with timing.stage("track.kf.alloc"):
            slot = self.alloc_kf_slot()
        with timing.stage("track.kf.insert"):
            self.ms = self._insert_kf_from_frame(fr, slot, fr.mp_idx)
            timing.sync(self.ms.kf_q)
        self.n_kf += 1
        # gate on the depth SOURCE, not the depth array: mono frames
        # carry an all--1 depth table (static shapes), and entering the
        # creation path costs a blocking host readback of the validity
        # mask per KF just to find zero candidates
        if fr.depth is not None and (fr.depth_img is not None
                                     or fr.right_pyr is not None):
            self._create_depth_map_points(fr, slot)
        with timing.stage("track.kf.bind"):
            self.ms = map_ops.bind_observations(self.ms)
            timing.sync(self.ms.mp_pos)
        with timing.stage("track.kf.refine_obs"):
            self._refine_kf_observations(slot, fr)
            timing.sync(self.ms.kf_uv)
        self.ref_kf = slot
        self.last_kf_frame_id = fr.frame_id
        if self.mapper is not None:
            self.mapper.on_new_keyframe(self, slot, fr)
        self._ref_obs_cache = None
        self._ref_obs3_cache = None
        # nRefMatches in the direct matcher's own units: the KF frame's
        # inlier count at creation time — identical in sync and pipelined
        # modes (a next-frame capture diverged them: in-flight frames ran
        # against the pre-KF candidate cache)
        self._kf_inlier_baseline = max(self.last_inliers, 1)
        fr.T_c_ref = None  # ref KF changed; recompute in track()
        # frames already enqueued in the pipeline cached their T_c_ref
        # against the PREVIOUS ref KF — clear so _record_frame
        # recomputes against the new one (else one grossly wrong
        # trajectory pose per KF insertion in pipelined runs)
        for pf, _, _ in self._pending:
            pf.T_c_ref = None
        self.new_kf_slots.append(slot)
        with timing.stage("track.kf.rebuild_cache"):
            self._rebuild_direct_cache()
            timing.sync(self._cand_j)


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


@functools.partial(jax.jit, static_argnames=("cfg", "max_carry"))
def _merge_direct_features(direct_uv, direct_lvl, direct_mp, direct_mask,
                           kp_uv, kp_level, kp_angle, kp_desc, kp_mask,
                           blur_atlas, selector, cfg, max_carry: int = 256):
    """KF-creation feature table for a direct-tracked frame: extracted
    keypoints, with direct-tracked map points either re-associated to a
    nearby corner or appended as described features in the table's tail
    slots (overwriting the weakest detections). One device program —
    leftover selection is a device compaction, not a host np.where.
    blur_atlas: the extraction pass's blurred-level atlas (reused; this
    program does no blurring of its own)."""
    from ygz_tpu.ops import orb, pyramid as pyr_mod
    from ygz_tpu.pipeline.mapping_kernels import _compact

    N = cfg.n_features
    mp_idx, matched = _reassociate(direct_uv, direct_mp, direct_mask,
                                   kp_uv, kp_level, kp_mask, N)
    leftover = direct_mask & (direct_mp >= 0) & ~matched
    idx, vmask = _compact(leftover, max_carry)
    lane = jnp.arange(max_carry)
    uv_d = direct_uv[idx]
    # describe each carried direct match at ITS OWN search level — a
    # level-0 descriptor for a point matched at a coarser level is
    # scale-mismatched and costs real matches downstream (observed: 16
    # vs 30 relocalization matches against direct-merged keyframes)
    lvl_d = jnp.clip(direct_lvl[idx], 0, cfg.n_levels - 1)
    h0, w0 = cfg.camera.height, cfg.camera.width
    sizes = pyr_mod.level_sizes(h0, w0, cfg.n_levels, cfg.scale_factor)
    xoffs = []
    x = 0
    for (_, w) in sizes:
        xoffs.append(x)
        x += w + pyr_mod.ATLAS_GUTTER
    ang_d, desc_d = orb.describe_keypoints_atlas(
        blur_atlas, tuple(xoffs), uv_d, lvl_d, vmask,
        tuple(float(s) for s in cfg.scale_factors), selector=selector)
    # overwrite the tail (weakest) feature slots, newest first; pad
    # lanes index out of range and drop. With C = #carried lanes, lane i
    # lands at N - C + i — computed on device via the carry count.
    C = jnp.sum(vmask.astype(jnp.int32))
    tgt = jnp.where(vmask, N - C + lane, N)
    kp_uv = kp_uv.at[tgt].set(uv_d, mode="drop")
    kp_level = kp_level.at[tgt].set(lvl_d, mode="drop")
    kp_angle = kp_angle.at[tgt].set(ang_d, mode="drop")
    kp_desc = kp_desc.at[tgt].set(desc_d, mode="drop")
    kp_mask = kp_mask.at[tgt].set(True, mode="drop")
    mp_idx = mp_idx.at[tgt].set(direct_mp[idx], mode="drop")
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


# ---------------------------------------------------------------------------
# fused host-free helpers (each eager op over a tunneled device costs
# 20-46 ms of dispatch; these fold the per-KF host glue into single
# jitted programs — see mapping_kernels module docstring)
# ---------------------------------------------------------------------------

@jax.jit
def _compose_batch_jit(qs, ts, q_da, t_da):
    """Batch re-anchor: T_c_ref' = T_c_ref . T_dead_anchor."""
    return lie.se3_compose({"q": qs, "t": ts}, {"q": q_da, "t": t_da})


@jax.jit
def _rel_to_kf_jit(ms, T_cw, ref_kf):
    T_ref = {"q": ms.kf_q[ref_kf], "t": ms.kf_t[ref_kf]}
    return lie.se3_compose(T_cw, lie.se3_inverse(T_ref))


@functools.partial(jax.jit, static_argnames=("cap",))
def _direct_cache_jit(ms, ref_kf, cap: int):
    """Direct-cache candidate set on device: union of the map points seen
    by the reference KF's 10 best covisible neighbors (+ itself), deduped
    and compacted to `cap` lanes. Returns (cand [cap] int32, valid [cap])."""
    from ygz_tpu.pipeline.mapping_kernels import _compact
    M = ms.mp_pos.shape[0]
    counts = mapstate.covisibility_counts(ms, ref_kf)
    vals, idx = jax.lax.top_k(counts, 10)
    kfs = jnp.where(vals > 0, idx.astype(jnp.int32), -1)
    kfs = jnp.concatenate([kfs, ref_kf[None].astype(jnp.int32)
                           if hasattr(ref_kf, "shape")
                           else jnp.asarray([ref_kf], jnp.int32)])
    rows = ms.kf_mp_idx[jnp.maximum(kfs, 0)]
    rvalid = (kfs >= 0)[:, None] & (rows >= 0) & \
        ms.kf_feat_mask[jnp.maximum(kfs, 0)] & \
        ms.mp_mask[jnp.maximum(rows, 0)]
    member = jnp.zeros((M + 1,), bool).at[
        jnp.where(rvalid, rows, M)].set(True, mode="drop")[:M]
    return _compact(member, cap)


@functools.partial(jax.jit, static_argnames=("k", "L"))
def _insert_kf_core(ms, node_desc, word_idf, node_valid, k: int, L: int,
                    slot, q, t, timestamp, frame_id, uv, ur, level, angle,
                    desc, feat_mask, mp_idx):
    voc = vocabulary.Vocabulary(k=k, L=L, node_desc=node_desc,
                                word_idf=word_idf, node_valid=node_valid)
    word_ids = vocabulary.transform(voc, desc, feat_mask)
    bow = vocabulary.bow_vector(voc, word_ids, feat_mask)
    return map_ops.insert_keyframe(
        ms, slot, {"q": q, "t": t}, timestamp, frame_id,
        uv, ur, level, angle, desc, feat_mask, mp_idx, bow)


def _insert_kf_jit(ms, vocab, slot, T_cw, timestamp, frame_id, uv, ur,
                   level, angle, desc, feat_mask, mp_idx):
    return _insert_kf_core(ms, vocab.node_desc, vocab.word_idf,
                           vocab.node_valid, vocab.k, vocab.L, slot,
                           T_cw["q"], T_cw["t"], timestamp, frame_id,
                           uv, ur, level, angle, desc, feat_mask, mp_idx)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _refine_kf_obs_jit(ms, slot, pyr, cfg: SlamConfig):
    """Photometric KF-observation refinement + consistent stereo column
    (see Tracker._refine_kf_observations docstring)."""
    uv_new, _ = map_ops.refine_bound_observations(
        ms, slot, pyr, cfg.camera, cfg.n_levels, cfg.scale_factor)
    # keep the stereo column consistent: the right-image match of a
    # rectified pair shifts with the left u at constant disparity
    # (disparity = bf/z depends only on the point's depth) — leaving
    # kf_ur at the old u silently corrupts the disparity by the
    # refinement shift (up to ~20% depth error at small baselines)
    ur_old = ms.kf_ur[slot]
    du = uv_new[:, 0] - ms.kf_uv[slot][:, 0]
    ur_new = jnp.where(ur_old >= 0, ur_old + du, ur_old)
    return dataclasses.replace(
        ms,
        kf_uv=ms.kf_uv.at[slot].set(uv_new),
        kf_ur=ms.kf_ur.at[slot].set(ur_new))
