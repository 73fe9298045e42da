"""Loop closing: BoW place recognition with consistency groups, Sim3
computation, loop correction, essential-graph optimization, and global BA.

Mirrors the reference LoopClosing thread (/root/reference/src/
LoopClosing.cc) run synchronously per keyframe:
  DetectLoop      (:104) min-score gate from covisibles + 3-consecutive
                  consistency groups
  ComputeSim3     (:218) descriptor matching + RANSAC Horn Sim3 +
                  guided projection search, accept >= 40 matches
  CorrectLoop     (:369) propagate the corrective Sim3 to the covisible
                  group, fuse duplicates, essential-graph optimization,
                  then full global BA
IMU mode disables loop correction entirely, as the reference does
(/root/reference/src/LoopClosing.cc:70-78) — gated in System.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import ba, posegraph, sim3solver
from ygz_tpu.core import lie
from ygz_tpu.matching import search, vocabulary
from ygz_tpu.pipeline import map_ops, mapstate
from ygz_tpu.utils.config import SlamConfig


class LoopClosing:
    def __init__(self, cfg: SlamConfig, consistency_th: int = 3):
        self.cfg = cfg
        self.consistency_th = consistency_th
        self.prev_groups: List[tuple] = []   # (set of KFs, consistency count)
        self.group_grace = 0   # rounds an empty detection keeps groups alive
        self.last_loop_kf: int = -1000
        self.n_loops = 0

    # ------------------------------------------------------------------
    def on_new_keyframe(self, tracker, slot: int):
        cand = self._detect_loop(tracker, slot)
        if cand is None:
            return False
        ok, S_cw = self._compute_sim3(tracker, slot, cand)
        if not ok:
            return False
        self._correct_loop(tracker, slot, cand, S_cw)
        self.last_loop_kf = slot
        self.n_loops += 1
        return True

    # ------------------------------------------------------------------
    def _detect_loop(self, tracker, slot: int) -> Optional[int]:
        """BoW retrieval gated by covisible min-score + consistency groups
        (reference DetectLoop, /root/reference/src/LoopClosing.cc:104-216)."""
        ms = tracker.ms
        if slot - self.last_loop_kf < 10 or tracker.n_kf < 12:
            return None
        counts = np.asarray(mapstate.covisibility_counts(ms, slot))
        covis = set(np.where(counts >= 15)[0].tolist())
        scores = np.asarray(vocabulary.score_against_database(
            ms.kf_bow[slot], ms.kf_bow, ms.kf_mask))
        # min reference score among covisibles
        if covis:
            min_score = max(min(scores[k] for k in covis), 1e-4)
        else:
            min_score = 0.05
        # candidates: good score, not covisible, not recent
        cand_mask = scores >= min_score
        for k in covis | {slot}:
            cand_mask[k] = False
        for k in range(tracker.n_kf):
            if abs(k - slot) <= 3:
                cand_mask[k] = False
        candidates = np.where(cand_mask)[0]
        if len(candidates) == 0:
            # one round of grace before dropping accumulated consistency:
            # a single empty detection right before a revisit otherwise
            # wipes the streak (the reference clears immediately;
            # observed failure mode in the round-1 loop experiments)
            if self.group_grace > 0:
                self.group_grace -= 1
            else:
                self.prev_groups = []
            return None
        self.group_grace = 1

        # consistency groups: a candidate's covisibility group must be seen
        # in `consistency_th` consecutive detections
        new_groups = []
        accepted = None
        for c in candidates:
            ccounts = np.asarray(mapstate.covisibility_counts(ms, int(c)))
            group = set(np.where(ccounts >= 15)[0].tolist()) | {int(c)}
            best_consistency = 0
            for pg, cnt in self.prev_groups:
                if group & pg:
                    best_consistency = max(best_consistency, cnt + 1)
            new_groups.append((group, best_consistency))
            if best_consistency >= self.consistency_th and accepted is None:
                accepted = int(c)
        self.prev_groups = new_groups
        return accepted

    # ------------------------------------------------------------------
    def _compute_sim3(self, tracker, slot: int, cand: int):
        """Match descriptors, solve Sim3 by RANSAC Horn, refine, verify
        (reference ComputeSim3, /root/reference/src/LoopClosing.cc:218-368)."""
        cfg = self.cfg
        ms = tracker.ms
        mp1 = ms.kf_mp_idx[slot]
        mp2 = ms.kf_mp_idx[cand]
        v1 = ms.kf_feat_mask[slot] & (mp1 >= 0)
        v2 = ms.kf_feat_mask[cand] & (mp2 >= 0)
        res = search.search_by_descriptor(
            ms.kf_desc[slot], ms.kf_angle[slot], v1,
            ms.kf_desc[cand], ms.kf_angle[cand], v2, ratio=0.75)
        if int(jnp.sum(res.mask)) < 20:
            return False, None

        # 3D-3D correspondences in each KF's camera frame
        ids1 = jnp.where(v1, mp1, 0)
        ids2 = jnp.where(v2, mp2, 0)[res.idx]
        T1 = {"q": ms.kf_q[slot], "t": ms.kf_t[slot]}
        T2 = {"q": ms.kf_q[cand], "t": ms.kf_t[cand]}
        X1 = lie.se3_apply(T1, ms.mp_pos[ids1])
        X2 = lie.se3_apply(T2, ms.mp_pos[ids2])
        valid = res.mask & ms.mp_mask[ids1] & ms.mp_mask[ids2]

        S12, inl, n_in = sim3solver.ransac_sim3(
            X1, X2, valid, fix_scale=False, seed=slot)
        if int(n_in) < 20:
            return False, None
        # corrected world->cam Sim3 of the current KF: S1_corrected maps
        # world through the loop KF's frame
        S_cand = lie.sim3_from_se3(T2)
        S_cw = lie.sim3_compose(S12, S_cand)   # world -> cam1 corrected
        return True, S_cw

    # ------------------------------------------------------------------
    def _correct_loop(self, tracker, slot: int, cand: int, S_cw):
        """Propagate the corrective Sim3 over the covisible group, remap
        their points, run the 7-DoF essential-graph optimization, then
        global BA (reference CorrectLoop, /root/reference/src/
        LoopClosing.cc:369-544)."""
        cfg = self.cfg
        ms = tracker.ms
        K = cfg.max_keyframes

        counts = np.asarray(mapstate.covisibility_counts(ms, slot))
        group = [slot] + [int(k) for k in np.where(counts >= 15)[0]]

        T_cur = {"q": ms.kf_q[slot], "t": ms.kf_t[slot]}
        # corrective transform in the current KF's frame
        S_cur_uncorr = lie.sim3_from_se3(T_cur)

        # per-group-KF corrected poses: S_k_corr = (S_k_uncorr ∘ S_cur^-1)
        # ∘ S_cw  == relative pose composed with corrected current
        group_j = jnp.asarray(np.array(group, np.int32))
        T_g = {"q": ms.kf_q[group_j], "t": ms.kf_t[group_j]}
        T_rel = lie.se3_compose(T_g, lie.se3_inverse(T_cur))  # cam_cur->cam_k
        S_corr = lie.sim3_compose(lie.sim3_from_se3(T_rel), S_cw)

        # remap the group's map points through old^-1 then corrected pose
        member = np.zeros((cfg.max_map_points,), bool)
        for k in group:
            ids = np.asarray(ms.kf_mp_idx[k])
            member[ids[ids >= 0]] = True
        member &= np.asarray(ms.mp_mask)
        mp_ids = np.where(member)[0]
        if len(mp_ids):
            mp_j = jnp.asarray(mp_ids.astype(np.int32))
            # use each point's reference KF if in group else current KF
            pos = ms.mp_pos[mp_j]
            pc = lie.se3_apply(T_cur, pos)               # old cam coords
            S_wc = lie.sim3_inverse(S_cw)
            new_pos = lie.sim3_apply(S_wc, pc)
            tracker.ms = dataclasses.replace(
                tracker.ms, mp_pos=tracker.ms.mp_pos.at[mp_j].set(new_pos))

        # write corrected group poses (SE3-ified: t/s)
        T_new = lie.se3_from_sim3(S_corr)
        tracker.ms = dataclasses.replace(
            tracker.ms,
            kf_q=tracker.ms.kf_q.at[group_j].set(T_new["q"]),
            kf_t=tracker.ms.kf_t.at[group_j].set(T_new["t"]))

        # essential-graph optimization over all KFs
        tracker.ms = posegraph.optimize_essential_graph(
            tracker.ms, loop_a=slot, loop_b=cand,
            fixed_kf=cand)

        # full global BA (reference spawns a thread; we run in place)
        tracker.ms = tracker._run_global_ba(iters=15)
        tracker._rebuild_direct_cache()
