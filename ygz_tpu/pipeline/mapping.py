"""Local mapping: the map-maintenance step that runs when a keyframe is
created — map-point culling, epipolar triangulation of new points,
duplicate fusion, and windowed local bundle adjustment.

Mirrors LocalMapping::Run's per-KF sequence (/root/reference/src/
LocalMapping.cc:777-854: ProcessNewKeyFrame -> MapPointCulling ->
CreateNewMapPoints -> SearchInNeighbors -> local BA) but synchronously
(determinism first; the reference's thread interleaving changes results
run-to-run) and with every per-feature loop replaced by batched device
ops. The local BA gathers a fixed-capacity window (poses + points + obs)
into a compact BAProblem, solves with the Schur engine, and scatters
results back.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import ba
from ygz_tpu.core import lie
from ygz_tpu.matching import search
from ygz_tpu.pipeline import map_ops, mapstate
from ygz_tpu.pipeline.initializer import triangulate
from ygz_tpu.utils.config import SlamConfig
from ygz_tpu.utils.log import logger

WINDOW_KF_CAP = 32        # window + fixed ring capacity for local BA
LOCAL_MP_CAP = 4096


class LocalMapping:
    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self._ba_mesh = None          # lazily resolved device mesh
        self._ba_mesh_checked = False
        # recently created points: (mp_id, kf_count_at_creation)
        self.recent: List[Tuple[int, int]] = []
        self.kf_count = 0
        self.last_stats: dict = {}   # per-KF diagnostics (logging/metrics)

    # ------------------------------------------------------------------
    def on_new_keyframe(self, tracker, slot: int, fr):
        self.kf_count += 1
        cfg = self.cfg
        self._cull_map_points(tracker)
        if tracker.n_kf >= 2 and fr is not None:
            self._create_new_map_points(tracker, slot, fr)
            self._fuse_neighbors(tracker, slot)
        if tracker.n_kf >= 3:
            self._local_ba(tracker, slot)
            self._cull_keyframes(tracker, slot)
        tracker.ms = map_ops.refresh_map_points(
            tracker.ms, jnp.ones((cfg.max_map_points,), bool),
            cfg.scale_factor, cfg.n_levels)
        if logger.isEnabledFor(10):  # DEBUG
            st = self.last_stats.get(slot, {})
            logger.debug(
                "KF %d: tri pairs=%s matches=%s created=%s skipped_bl=%s "
                "alive_mp=%d", slot, st.get("pairs"), st.get("matches"),
                st.get("created"), st.get("skipped_baseline"),
                int(np.asarray(tracker.ms.mp_mask).sum()))

    # ------------------------------------------------------------------
    def _cull_keyframes(self, tracker, slot: int):
        """Reference KeyFrameCulling (/root/reference/src/LocalMapping.cc:
        1419-1500): a covisible KF is redundant if >=90% of its map points
        are observed by at least 3 other keyframes. When IMU is on, the
        reference's VIO guards apply (:1440-1452): never cull recent KFs
        (frame-id gap <= 10), never the temporal predecessor of the
        current KF, never a KF within 0.15 s of it — the preintegration
        chain across a culled KF is re-stitched by the tracker's
        on_keyframe_killed (VioTracker merges the IMU gap into the
        successor, the reference's SetBadFlag + ComputePreInt path)."""
        ms = tracker.ms
        use_imu = self.cfg.use_imu
        if use_imu and not getattr(tracker, "vins_inited", False):
            # before VI init the preintegration chain is the init's
            # input: the reference effectively starves culling here (its
            # TryInitVIO thread holds FlagCopyInitKFs every few ms until
            # initialization, and KeyFrameCulling bails when it is set,
            # /root/reference/src/LocalMapping.cc:224-228, 1425-1427);
            # culling resumes with the VIO guards once inited
            return
        if use_imu:
            cur_ts = float(np.asarray(ms.kf_timestamp)[slot])
            order = list(getattr(tracker, "kf_order", []))
            pred = order[order.index(slot) - 1] \
                if slot in order and order.index(slot) > 0 else -1
            # the reference's "<= 10" guard is on KEYFRAME ids — it
            # protects the ten most recent keyframes, not a ten-frame
            # window (at the dense pre-init KF cadence a frame-id window
            # would thin the chain and wreck the [s,g,ba] conditioning)
            recent = set(order[-10:])
        obs_count = np.asarray(ms.mp_obs_count)
        for k in self._covisible(tracker, slot, 10):
            if k == slot or k == tracker.ref_kf or k <= 1:
                continue
            if use_imu:
                if k in recent:
                    continue
                if k == pred:
                    continue
                if float(np.asarray(ms.kf_timestamp)[k]) >= cur_ts - 0.15:
                    continue
            mp = np.asarray(ms.kf_mp_idx[k])
            valid = (mp >= 0) & np.asarray(ms.kf_feat_mask[k])
            ids = mp[valid]
            if len(ids) < 20:
                continue
            redundant = (obs_count[ids] >= 4).mean()
            if redundant > 0.9:
                tracker.ms = _kill_keyframe(tracker.ms, k)
                tracker.ms = map_ops.bind_observations(tracker.ms)
                tracker.on_keyframe_killed(k)
                break  # at most one per round, like the reference's pacing

    # ------------------------------------------------------------------
    def _cull_map_points(self, tracker):
        """Reference MapPointCulling (/root/reference/src/LocalMapping.cc:
        930-964): kill low found-ratio or under-observed recent points."""
        if not self.recent:
            return
        ms = tracker.ms
        found = np.asarray(ms.mp_found)
        visible = np.asarray(ms.mp_visible)
        obs = np.asarray(ms.mp_obs_count)
        kill, keep_recent = [], []
        for mp_id, born in self.recent:
            age = self.kf_count - born
            ratio = found[mp_id] / max(visible[mp_id], 1)
            if ratio < 0.25:
                kill.append(mp_id)
            elif age >= 2 and obs[mp_id] <= 2:
                kill.append(mp_id)
            elif age >= 3:
                pass  # graduated
            else:
                keep_recent.append((mp_id, born))
        self.recent = keep_recent
        if kill:
            tracker.ms = _kill_map_points(tracker.ms,
                                          jnp.asarray(np.array(kill, np.int32)))
            tracker.mp_alloc[np.array(kill)] = False
            tracker.ms = map_ops.bind_observations(tracker.ms)

    # ------------------------------------------------------------------
    def _covisible(self, tracker, slot: int, n: int) -> List[int]:
        counts = np.asarray(mapstate.covisibility_counts(tracker.ms, slot))
        order = np.argsort(-counts)
        return [int(k) for k in order[:n] if counts[k] >= 15]

    # ------------------------------------------------------------------
    def _create_new_map_points(self, tracker, slot: int, fr):
        """Reference CreateNewMapPoints (/root/reference/src/LocalMapping.cc:
        978-1227): triangulate unmatched features of the new KF against its
        best covisible neighbors with epipolar-gated matching."""
        cfg = self.cfg
        n_neighbors = 20 if cfg.camera.bf == 0 else 10
        neighbors = self._covisible(tracker, slot, n_neighbors)
        if not neighbors:
            # bootstrap: use the temporally nearest alive KF
            prev = tracker._nearest_alive_kf(slot)
            if prev == slot:
                return
            neighbors = [prev]

        ms = tracker.ms
        K = jnp.asarray(cfg.camera.K)
        T1 = {"q": ms.kf_q[slot], "t": ms.kf_t[slot]}
        c1 = map_ops._cam_center(T1)
        lvl_sigma2 = jnp.asarray(cfg.level_sigma2)

        # median scene depth in the new KF (for the baseline gate below)
        bound = ms.kf_mp_idx[slot]
        bound_ids = jnp.where(bound >= 0, bound, 0)
        depths = lie.se3_apply(T1, ms.mp_pos[bound_ids])[:, 2]
        dvalid = np.asarray((bound >= 0) & ms.kf_feat_mask[slot]
                            & ms.mp_mask[bound_ids])
        med_depth = float(np.median(np.asarray(depths)[dvalid])) \
            if dvalid.any() else 1.0

        free1 = ms.kf_feat_mask[slot] & (ms.kf_mp_idx[slot] < 0)
        if getattr(tracker, "depth_exact", False):
            # depth-SENSOR features (RGB-D) are excluded from parallax
            # triangulation: their depth is already known to sensor
            # accuracy, and a KF-to-KF baseline a few frames long is far
            # noisier — on the RGB-D e2e, letting culled depth points get
            # re-triangulated this way warped the map scale to 0.5x.
            # Stereo keeps triangulating: its SAD depth is itself a
            # one-baseline triangulation, no better than the KF pair's.
            free1 = free1 & ~(ms.kf_ur[slot] >= 0)
        stats = self.last_stats.setdefault(slot, dict(
            pairs=0, skipped_baseline=0, matches=0, created=0))
        for k2 in neighbors:
            T2 = {"q": ms.kf_q[k2], "t": ms.kf_t[k2]}
            c2 = map_ops._cam_center(T2)
            baseline = float(jnp.linalg.norm(c1 - c2))
            # mono gate: skip pairs whose baseline is tiny relative to the
            # scene depth (reference ratioBaselineDepth < 0.01 skip,
            # /root/reference/src/LocalMapping.cc:1010-1033)
            if baseline < 0.01 * med_depth:
                stats["skipped_baseline"] += 1
                continue
            stats["pairs"] += 1
            ms = tracker.ms
            free2 = ms.kf_feat_mask[k2] & (ms.kf_mp_idx[k2] < 0)
            F12 = _fundamental(T1, T2, K)
            res = search.search_for_triangulation(
                ms.kf_desc[slot], ms.kf_uv[slot], ms.kf_angle[slot], free1,
                ms.kf_desc[k2], ms.kf_uv[k2], ms.kf_angle[k2], free2,
                F12, ms.kf_level[k2], lvl_sigma2)
            n_match = int(jnp.sum(res.mask))
            stats["matches"] += n_match
            if n_match < 5:
                continue

            pos, good, gates = _triangulate_checked(
                T1, T2, K, ms.kf_uv[slot], ms.kf_uv[k2][res.idx],
                res.mask, ms.kf_level[slot],
                ms.kf_level[k2][res.idx], lvl_sigma2,
                cfg.scale_factor)
            if logger.isEnabledFor(10):
                logger.debug("  pair (%d,%d): %s", slot, k2,
                             {k: int(v) for k, v in gates.items()})
            good_np = np.asarray(good)
            n_new = int(good_np.sum())
            if n_new == 0:
                continue
            stats["created"] += n_new
            # PADDED to the static feature capacity: a variable-length
            # np.where index gives every (KF pair, count) its own
            # gather/scatter shapes — dozens of fresh device programs per
            # keyframe (the round-2 bench warm-up torrent)
            N = cfg.n_features
            idx1_np = np.where(good_np)[0][:N]
            slots_np = tracker.alloc_mp_slots(len(idx1_np))
            idx1_np = idx1_np[:len(slots_np)]
            if len(slots_np) == 0:
                continue
            n = len(slots_np)
            valid_np = np.zeros((N,), bool)
            valid_np[:n] = True
            f1_pad = np.zeros((N,), np.int32)
            f1_pad[:n] = idx1_np
            sl_pad = np.zeros((N,), np.int32)
            sl_pad[:n] = slots_np
            vmask = jnp.asarray(valid_np)
            f1 = jnp.asarray(f1_pad)
            f2 = res.idx[f1]
            sl = jnp.asarray(sl_pad)

            lvl = ms.kf_level[slot][f1]
            patches = tracker._patches_at_levels(fr.pyramid,
                                                 ms.kf_uv[slot][f1], lvl)
            posj = pos[f1]
            normal = posj - c1[None]
            normal = normal / jnp.maximum(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
            tracker.ms = map_ops.add_map_points(
                tracker.ms, sl, posj, ms.kf_desc[slot][f1], normal,
                jnp.zeros((N,)), jnp.full((N,), 1e9),
                jnp.full((N,), slot, jnp.int32), lvl, patches,
                jnp.full((N,), slot, jnp.int32), vmask)
            # bind in both KFs (pad lanes scatter out of range = drop)
            tracker.ms = dataclasses.replace(
                tracker.ms,
                kf_mp_idx=tracker.ms.kf_mp_idx
                .at[slot, jnp.where(vmask, f1, N)].set(sl, mode="drop")
                .at[k2, jnp.where(vmask, f2, N)].set(sl, mode="drop"))
            free1 = free1.at[jnp.where(vmask, f1, N)].set(
                False, mode="drop")
            self.recent.extend((int(s), self.kf_count) for s in slots_np)
        tracker.ms = map_ops.bind_observations(tracker.ms)

    # ------------------------------------------------------------------
    def _fuse_neighbors(self, tracker, slot: int):
        """Reference SearchInNeighbors (/root/reference/src/LocalMapping.cc:
        1228-1328), both directions: (a) the new KF's points project into
        each neighbor, (b) the union of the neighbors' points
        (vpFuseCandidates) projects into the new KF."""
        neighbors = self._covisible(tracker, slot, 10)
        slot_ids = self._kf_point_ids(tracker.ms, [slot])
        # forward: new KF's points into each neighbor (and itself, which
        # binds re-detected features of its own points)
        for k2 in neighbors + [slot]:
            self._fuse_into(tracker, k2, slot_ids)
        # reverse: neighbors' points into the new KF
        if neighbors:
            neigh_ids = self._kf_point_ids(tracker.ms, neighbors)
            self._fuse_into(tracker, slot, neigh_ids)
        tracker.ms = map_ops.bind_observations(tracker.ms)

    @staticmethod
    def _kf_point_ids(ms, kfs: List[int]) -> np.ndarray:
        ids = np.unique(np.concatenate(
            [np.asarray(ms.kf_mp_idx[k]) for k in kfs]))
        ids = ids[ids >= 0]
        return ids[np.asarray(ms.mp_mask)[ids]]

    def _fuse_into(self, tracker, k2: int, src_ids: np.ndarray):
        """Project `src_ids` map points into KF k2 and fuse: bind free
        features, merge duplicates (more-observed point wins). Points
        already bound in k2 are skipped — a point must not bind to a
        second feature of the same KF (would double-weight it in BA)."""
        cfg = self.cfg
        ms = tracker.ms
        if len(src_ids) == 0:
            return
        C = LOCAL_MP_CAP
        idsp = np.full((C,), -1, np.int64)
        idsp[:min(len(src_ids), C)] = src_ids[:C]
        cand = jnp.asarray(np.where(idsp >= 0, idsp, 0).astype(np.int32))
        cand_valid = jnp.asarray(idsp >= 0) & ms.mp_mask[cand]

        T2 = {"q": ms.kf_q[k2], "t": ms.kf_t[k2]}
        pc = lie.se3_apply(T2, ms.mp_pos[cand])
        z = pc[:, 2]
        uv = jnp.stack(
            [cfg.camera.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + cfg.camera.cx,
             cfg.camera.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + cfg.camera.cy],
            axis=-1)
        visible = cand_valid & (z > 0.05) & \
            (uv[:, 0] >= 0) & (uv[:, 0] < cfg.camera.width) & \
            (uv[:, 1] >= 0) & (uv[:, 1] < cfg.camera.height)
        dist = jnp.linalg.norm(ms.mp_pos[cand] - map_ops._cam_center(T2)[None],
                               axis=-1)
        pred = mapstate.predict_scale_level(dist, ms.mp_max_dist[cand],
                                            cfg.scale_factor, cfg.n_levels)
        radius = 3.0 * tracker.scales[pred]
        res = search.fuse_candidates(
            ms.mp_desc[cand], uv, radius, pred, visible,
            ms.kf_desc[k2], ms.kf_uv[k2], ms.kf_level[k2],
            ms.kf_feat_mask[k2])
        # binding/merging decision (host): feature already bound?
        m = np.asarray(res.mask)
        tgt = np.asarray(res.idx)
        existing = np.asarray(ms.kf_mp_idx[k2])
        bound_here = set(int(x) for x in existing[existing >= 0])
        obs_cnt = np.asarray(ms.mp_obs_count)
        candn = np.asarray(cand)
        bind_f, bind_mp, merges = [], [], []
        for i in np.where(m)[0]:
            mp_new = int(candn[i])
            f = int(tgt[i])
            cur = int(existing[f])
            if cur < 0:
                if mp_new in bound_here:
                    continue  # already observed via another feature of k2
                bind_f.append(f)
                bind_mp.append(mp_new)
                bound_here.add(mp_new)
            elif cur != mp_new:
                # merge: keep the more-observed point
                a, b = (mp_new, cur) if obs_cnt[mp_new] >= obs_cnt[cur] \
                    else (cur, mp_new)
                merges.append((a, b))   # a absorbs b
        if bind_f:
            # static-shape scatter: pad the bind list to the feature
            # capacity (pad lanes target row N = out of range, dropped) —
            # a bare jnp.asarray(bind_f) scatter compiles one program per
            # distinct bind COUNT, a fresh device compile on most KF frames
            N_cap = tracker.ms.kf_mp_idx.shape[1]
            f_pad = np.full((N_cap,), N_cap, np.int32)
            v_pad = np.full((N_cap,), -1, np.int32)
            nb = min(len(bind_f), N_cap)
            f_pad[:nb] = bind_f[:nb]
            v_pad[:nb] = bind_mp[:nb]
            tracker.ms = dataclasses.replace(
                tracker.ms,
                kf_mp_idx=tracker.ms.kf_mp_idx.at[
                    k2, jnp.asarray(f_pad)].set(
                    jnp.asarray(v_pad), mode="drop"))
        for keep, absorb in merges:
            if keep == absorb:
                continue
            tracker.ms = _replace_map_point(tracker.ms, absorb, keep)
            tracker.mp_alloc[absorb] = False

    # ------------------------------------------------------------------
    def _ba_mesh_or_none(self):
        """Resolve the device mesh for sharded local BA once. Auto mode
        (cfg.sharded_ba=None) enables it on a real multi-accelerator
        host; forced True builds a mesh over whatever devices exist
        (virtual CPU meshes in tests/dryruns)."""
        if self._ba_mesh_checked:
            return self._ba_mesh
        self._ba_mesh_checked = True
        want = self.cfg.sharded_ba
        if want is False:
            return None
        n = jax.device_count()
        auto_ok = n > 1 and jax.default_backend() != "cpu"
        if (want is None and auto_ok) or (want and n > 1):
            if LOCAL_MP_CAP % n == 0:
                from ygz_tpu.parallel import sharding
                self._ba_mesh = sharding.make_mesh()
                logger.info("local BA sharded over %d devices", n)
        return self._ba_mesh

    def _local_ba(self, tracker, slot: int):
        """Windowed BA: covisible KFs free, their observers fixed
        (reference LocalBundleAdjustment, /root/reference/src/Optimizer.cc:
        1844-2155), gathered into a compact fixed-capacity problem."""
        cfg = self.cfg
        ms = tracker.ms
        window = self._covisible(tracker, slot, 15) + [slot]
        window = sorted(set(window))

        # local point set
        member = np.zeros((cfg.max_map_points,), bool)
        for k in window:
            ids = np.asarray(ms.kf_mp_idx[k])
            member[ids[ids >= 0]] = True
        member &= np.asarray(ms.mp_mask)
        local_ids = np.where(member)[0][:LOCAL_MP_CAP]

        # fixed ring: KFs observing local points but not in window
        obs_kfs = np.asarray(mapstate.observers_of(
            ms, jnp.asarray(member)))
        fixed = [k for k in np.where(obs_kfs)[0] if k not in window]
        fixed = fixed[:WINDOW_KF_CAP - len(window)]
        sel = window + fixed
        if len(window) < 2 or len(local_ids) < 20:
            return
        n_sel = len(sel)
        sel_pad = sel + [0] * (WINDOW_KF_CAP - n_sel)
        sel_j = jnp.asarray(np.array(sel_pad, np.int32))
        kf_mask = jnp.asarray(
            np.arange(WINDOW_KF_CAP) < n_sel)
        kf_fixed = jnp.asarray(
            np.array([False] * len(window) + [True] * (WINDOW_KF_CAP - len(window))))
        # gauge: if fewer than 1 fixed KF, fix the oldest window KF
        if not fixed:
            kf_fixed = kf_fixed.at[0].set(True)

        lp = np.full((LOCAL_MP_CAP,), -1, np.int64)
        lp[:len(local_ids)] = local_ids
        lp_j = jnp.asarray(np.where(lp >= 0, lp, 0).astype(np.int32))
        mp_mask = jnp.asarray(lp >= 0)

        prob, obs_src = _gather_local_problem(
            ms, sel_j, kf_mask, kf_fixed, lp_j, mp_mask,
            jnp.asarray(cfg.inv_level_sigma2))
        mesh = self._ba_mesh_or_none()
        if mesh is not None:
            from ygz_tpu.parallel import sharding
            prob, inlier = sharding.sharded_local_ba(mesh, prob, cfg.camera)
        else:
            prob, inlier = _local_ba_jit(prob, cfg)

        # scatter back
        tracker.ms = _scatter_local_problem(tracker.ms, prob, sel_j, kf_mask,
                                            lp_j, mp_mask)
        # unbind outlier observations — static masked scatter (a
        # variable-length np.where gather here recompiled the unbind
        # program once per distinct outlier count, every local BA)
        drop_j = prob.obs.mask & ~inlier
        K_cap = tracker.ms.kf_mp_idx.shape[0]
        rows = jnp.where(drop_j, obs_src[0], K_cap)
        tracker.ms = dataclasses.replace(
            tracker.ms,
            kf_mp_idx=tracker.ms.kf_mp_idx.at[rows, obs_src[1]].set(
                -1, mode="drop"))
        tracker.ms = map_ops.bind_observations(tracker.ms)


# ---------------------------------------------------------------------------
# jitted helpers
# ---------------------------------------------------------------------------

def _fundamental(T1, T2, K):
    """F mapping pixels of KF1 to epipolar lines in KF2: x2' F12 x1 = 0."""
    T21 = lie.se3_compose(T2, lie.se3_inverse(T1))
    E = lie.hat(T21["t"]) @ lie.quat_to_matrix(T21["q"])
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


@jax.jit
def _triangulate_checked(T1, T2, K, uv1, uv2, mask, lvl1, lvl2, lvl_sigma2,
                         scale_factor):
    """DLT triangulation + the reference's acceptance gates: parallax,
    positive depth both views, reprojection chi2 < 5.991 sigma^2, scale
    consistency (/root/reference/src/LocalMapping.cc:1068-1200)."""
    P1 = K @ jnp.concatenate(
        [lie.quat_to_matrix(T1["q"]), T1["t"][:, None]], axis=1)
    P2 = K @ jnp.concatenate(
        [lie.quat_to_matrix(T2["q"]), T2["t"][:, None]], axis=1)
    X = triangulate(P1, P2, uv1, uv2)
    finite = jnp.all(jnp.isfinite(X), axis=1)

    pc1 = lie.se3_apply(T1, X)
    pc2 = lie.se3_apply(T2, X)
    c1 = map_ops._cam_center(T1)
    c2 = map_ops._cam_center(T2)

    r1 = X - c1[None]
    r2 = X - c2[None]
    n1 = jnp.linalg.norm(r1, axis=1)
    n2 = jnp.linalg.norm(r2, axis=1)
    cosp = jnp.sum(r1 * r2, 1) / jnp.maximum(n1 * n2, 1e-9)

    def reproj2(P, Xp, uv):
        p = Xp @ P[:, :3].T + P[:, 3]
        return jnp.sum((p[:, :2] / jnp.maximum(p[:, 2:], 1e-9) - uv) ** 2, 1)

    e1 = reproj2(P1, X, uv1)
    e2 = reproj2(P2, X, uv2)
    n_lvl = lvl_sigma2.shape[0]
    s1 = lvl_sigma2[jnp.clip(lvl1, 0, n_lvl - 1)]
    s2 = lvl_sigma2[jnp.clip(lvl2, 0, n_lvl - 1)]
    ratio_dist = n1 / jnp.maximum(n2, 1e-9)
    ratio_octave = (scale_factor ** lvl1.astype(jnp.float32)) \
        / (scale_factor ** lvl2.astype(jnp.float32))
    scale_ok = (ratio_dist < ratio_octave * 1.5 * scale_factor) & \
               (ratio_dist > ratio_octave / (1.5 * scale_factor))

    # parallax >= ~1.5 deg: below that, two-view depth is noise-dominated
    # and poisons BA (the reference's 0.9998 gate (~1.1 deg) plus its
    # baseline/median-depth pre-gate, folded into one stricter threshold)
    depth_ok = (pc1[:, 2] > 1e-3) & (pc2[:, 2] > 1e-3)
    par_ok = cosp < 0.99966
    chi_ok = (e1 < 5.991 * s1) & (e2 < 5.991 * s2)
    good = mask & finite & depth_ok & par_ok & chi_ok & scale_ok

    def cnt(x):
        return jnp.sum((mask & x).astype(jnp.int32))
    gates = dict(n=cnt(mask), depth=cnt(depth_ok), parallax=cnt(par_ok),
                 chi2=cnt(chi_ok), scale=cnt(scale_ok))
    return X, good, gates


def _gather_local_problem(ms, sel, kf_mask, kf_fixed, local_ids, mp_mask,
                          inv_level_sigma2):
    """Compact the window into a BAProblem with local indices."""
    KW = sel.shape[0]
    ML = local_ids.shape[0]
    M = ms.mp_pos.shape[0]
    N = ms.kf_mp_idx.shape[1]

    g2l = jnp.full((M + 1,), -1, jnp.int32)
    g2l = g2l.at[jnp.where(mp_mask, local_ids, M)].set(
        jnp.arange(ML, dtype=jnp.int32))
    g2l = g2l.at[M].set(-1)

    rows = ms.kf_mp_idx[sel]                          # [KW, N] global mp
    feat_ok = ms.kf_feat_mask[sel] & (rows >= 0) & kf_mask[:, None]
    loc = g2l[jnp.where(rows >= 0, rows, M)]          # [KW, N]
    valid = feat_ok & (loc >= 0)

    kf_rows = jnp.broadcast_to(
        jnp.arange(KW, dtype=jnp.int32)[:, None], (KW, N))
    n_lvl = inv_level_sigma2.shape[0]
    obs = ba.Observations(
        kf=kf_rows.reshape(-1),
        mp=jnp.where(valid, loc, 0).reshape(-1),
        uv=ms.kf_uv[sel].reshape(-1, 2),
        ur=ms.kf_ur[sel].reshape(-1),
        inv_sigma2=inv_level_sigma2[
            jnp.clip(ms.kf_level[sel], 0, n_lvl - 1)].reshape(-1),
        mask=valid.reshape(-1))
    prob = ba.BAProblem(
        kf_q=ms.kf_q[sel], kf_t=ms.kf_t[sel],
        mp=ms.mp_pos[local_ids], obs=obs,
        kf_fixed=kf_fixed, kf_mask=kf_mask, mp_mask=mp_mask)
    # source coordinates for outlier unbinding: (global kf slot, feature col)
    src = (jnp.broadcast_to(sel[:, None], (KW, N)).reshape(-1),
           jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (KW, N)
                            ).reshape(-1))
    return prob, src


@functools.partial(jax.jit, static_argnames=("cfg",))
def _local_ba_jit(prob, cfg: SlamConfig):
    return ba.local_bundle_adjustment(prob, cfg.camera)


@jax.jit
def _scatter_local_problem(ms, prob, sel, kf_mask, local_ids, mp_mask):
    kf_q = ms.kf_q.at[sel].set(
        jnp.where(kf_mask[:, None], prob.kf_q, ms.kf_q[sel]))
    kf_t = ms.kf_t.at[sel].set(
        jnp.where(kf_mask[:, None], prob.kf_t, ms.kf_t[sel]))
    mp_pos = ms.mp_pos.at[local_ids].set(
        jnp.where(mp_mask[:, None], prob.mp, ms.mp_pos[local_ids]))
    return dataclasses.replace(ms, kf_q=kf_q, kf_t=kf_t, mp_pos=mp_pos)


@jax.jit
def _kill_map_points(ms, ids):
    M = ms.mp_pos.shape[0]
    dead = jnp.zeros((M + 1,), bool).at[ids].set(True)[:M]
    mp_mask = ms.mp_mask & ~dead
    idx = ms.kf_mp_idx
    is_dead = dead[jnp.where(idx >= 0, idx, 0)] & (idx >= 0)
    kf_mp_idx = jnp.where(is_dead, -1, idx)
    return dataclasses.replace(ms, mp_mask=mp_mask, kf_mp_idx=kf_mp_idx)


@jax.jit
def _kill_keyframe(ms, k):
    """Remove a redundant keyframe: mask the slot, drop its observations,
    and re-point map points that used it as their reference KF to another
    alive observer (the reference reassigns mpRefKF in SetBadFlag) —
    stale references would break patch warps and scale ranges once the
    slot is recycled. (Parent/spanning-tree reassignment is implicit: the
    temporal chain and covisibility are recomputed from the arrays.)"""
    ms = dataclasses.replace(
        ms,
        kf_mask=ms.kf_mask.at[k].set(False),
        kf_feat_mask=ms.kf_feat_mask.at[k].set(False),
        kf_mp_idx=ms.kf_mp_idx.at[k].set(-1))
    # first alive observer per map point (segment_min over observations)
    K, N = ms.kf_mp_idx.shape
    M = ms.mp_pos.shape[0]
    valid = ms.kf_feat_mask & (ms.kf_mp_idx >= 0) & ms.kf_mask[:, None]
    mp = jnp.where(valid, ms.kf_mp_idx, M).reshape(-1)
    kf = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None],
                          (K, N)).reshape(-1)
    first_obs = jax.ops.segment_min(
        jnp.where(valid.reshape(-1), kf, K), mp, num_segments=M + 1)[:M]
    new_ref = jnp.where(first_obs < K, first_obs.astype(jnp.int32),
                        ms.mp_ref_kf)
    mp_ref_kf = jnp.where(ms.mp_ref_kf == k, new_ref, ms.mp_ref_kf)
    return dataclasses.replace(ms, mp_ref_kf=mp_ref_kf)


@jax.jit
def _replace_map_point(ms, absorb, keep):
    """MapPoint::Replace (/root/reference/include/MapPoint.h:89-93): every
    observation of `absorb` re-points to `keep`; absorb dies. A KF that
    observed BOTH keeps only its first binding of `keep` (the reference
    erases the duplicate observation in Replace) — a point bound to two
    features of one KF would double-weight it in BA."""
    idx = ms.kf_mp_idx
    kf_mp_idx = jnp.where(idx == absorb, keep, idx)
    hits = kf_mp_idx == keep                               # [K, N]
    first = jnp.argmax(hits, axis=1)                        # [K]
    n = kf_mp_idx.shape[1]
    dup = hits & (jnp.arange(n)[None, :] != first[:, None])
    kf_mp_idx = jnp.where(dup, -1, kf_mp_idx)
    mp_mask = ms.mp_mask.at[absorb].set(False)
    return dataclasses.replace(ms, kf_mp_idx=kf_mp_idx, mp_mask=mp_mask)
