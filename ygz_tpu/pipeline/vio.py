"""Visual-inertial tracking: the TrackMonoVI pipeline.

Mirrors the reference's VI flow (/root/reference/src/Tracking.cc GrabImageMonoVI
+ LocalMapping's VINS-init thread): frames carry the IMU samples since
their predecessor; keyframes accumulate preintegrations; once enough
trajectory has been observed (test.VINSInitTime, default 15 s) the
three-step initializer estimates biases/scale/gravity, the map is
rescaled to metric units, and tracking switches to IMU-predicted poses +
NavState pose optimization with a marginalization prior. Loop correction
stays disabled under IMU, as in the reference (src/LoopClosing.cc:70-78).

The reference polls TryInitVIO from a thread every 3 ms; here it runs
synchronously at keyframe creation — same semantics, deterministic.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import vi_ba
from ygz_tpu.core import lie
from ygz_tpu.imu import navstate as ns_mod
from ygz_tpu.imu import preintegration as pre_mod
from ygz_tpu.imu import vi_init
from ygz_tpu.pipeline import frame as frame_mod
from ygz_tpu.pipeline import mapstate
from ygz_tpu.pipeline.tracking import Tracker, OK, LOST
from ygz_tpu.utils import timing
from ygz_tpu.utils.config import SlamConfig

IMU_PAD = 256       # per-gap IMU block capacity (KF preintegrations)
FRAME_IMU_PAD = 16  # per-frame block inside the fused VI step. The
                    # in-program preintegration is a sequential scan, so
                    # its device cost is linear in the PAD, not the real
                    # row count (~10 rows/frame at 200 Hz IMU / 20 fps;
                    # measured ~85 us/row on chip). Frames with more
                    # rows (startup delay bursts) fall back to the
                    # synchronous cascade — see track_pipelined.


def _pad_imu(rows: Optional[np.ndarray], cap: int = IMU_PAD):
    out = np.zeros((cap, 7), np.float32)
    m = np.zeros((cap,), bool)
    if rows is not None and len(rows):
        n = min(len(rows), cap)
        out[:n] = rows[:n]
        m[:n] = True
    return jnp.asarray(out), jnp.asarray(m)


class VioTracker(Tracker):
    def __init__(self, cfg: SlamConfig, vocab, mapper=None):
        super().__init__(cfg, vocab, mapper=mapper)
        if cfg.Tbc is not None:
            Tbc_m = jnp.asarray(np.asarray(cfg.Tbc, np.float32))
            self.Tbc = lie.se3_from_matrix(Tbc_m)
        else:
            self.Tbc = lie.se3_identity()
        self.vins_inited = False
        self.gw = jnp.array([0.0, 0.0, -cfg.gravity])
        self.bg = jnp.zeros(3)
        self.ba = jnp.zeros(3)
        # per-KF state keyed by slot (dict: capacities can grow)
        self.kf_ns: dict = {}    # slot -> NavState
        self.kf_pre: dict = {}   # slot -> PreintState from the previous KF
        self.kf_imu_rows: dict = {}  # slot -> raw IMU rows of that gap
        self.kf_order: List[int] = []   # KF slots in temporal order
        self.imu_since_kf: List[tuple] = []  # (frame_id, rows) blocks
        self.imu_since_frame: Optional[np.ndarray] = None
        self.last_ns: Optional[ns_mod.NavState] = None
        self.prior_H = None
        self.first_frame_time: Optional[float] = None
        if jax.default_backend() == "cpu":
            self._warm_vi_programs()

    # ------------------------------------------------------------------
    def _warm_vi_programs(self):
        """Compile the post-init per-frame/per-KF VI programs NOW, while
        the process's JIT state is young.

        XLA:CPU's JIT intermittently segfaults in libgcc's unwinder when
        a big program is first compiled or cache-loaded deep into a
        long-running process (hundreds of registered JIT frame tables;
        see tests/conftest.py lore). In a VIO run those programs
        naturally first load only after VI initialization — minutes and
        hundreds of programs in — exactly the window where the crash
        reproduces. Warming them at construction costs one compile
        (cached across runs) and makes every later call an in-memory
        executable-cache hit. CPU-only: XLA:TPU does not use the LLVM
        JIT."""
        cfg = self.cfg
        N = cfg.n_features
        pre_f = self._preintegrate_rows(None)
        ns = ns_mod.NavState(P=jnp.zeros(3), V=jnp.zeros(3),
                             q=lie.quat_identity(), bg=jnp.zeros(3),
                             ba=jnp.zeros(3))
        pts = jnp.concatenate([jnp.zeros((N, 2)), jnp.ones((N, 1))], -1)
        uv = jnp.zeros((N, 2))
        ones = jnp.ones((N,))
        mask = jnp.zeros((N,), bool)
        cam = cfg.camera
        bw = (cfg.gyro_bias_walk, cfg.acc_bias_walk)
        for pH in (None, jnp.eye(15)):
            out = vi_ba.pose_optimization_vi(
                ns, ns, pre_f, self.gw, self.Tbc, pts, uv, ones, mask,
                cam.fx, cam.fy, cam.cx, cam.cy,
                prior_H=pH, prior_ns=None if pH is None else ns,
                bias_hat=(self.bg, self.ba), bias_walk=bw)
            jax.block_until_ready(out[0].P)
        # the (now fixed-capacity) window BA program
        total = cfg.local_window_size + self.MAX_FIXED_RING
        P = self.WINDOW_MP_CAP
        O = total * N
        ns_w = jax.tree.map(lambda a: jnp.broadcast_to(a, (total,)
                                                       + a.shape), ns)
        pre_w = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (total - 1,) + a.shape), pre_f)
        prob = vi_ba.ViWindowProblem(
            ns=ns_w, pre=pre_w,
            pre_mask=jnp.zeros((total - 1,), bool),
            kf_mask=jnp.ones((total,), bool),
            kf_fixed=jnp.zeros((total,), bool).at[0].set(True),
            obs_kf=jnp.zeros((O,), jnp.int32),
            obs_pt=jnp.zeros((O, 3)),
            obs_uv=jnp.zeros((O, 2)),
            obs_inv_sigma2=jnp.ones((O,)),
            obs_mask=jnp.zeros((O,), bool),
            bg_hat=jnp.zeros(3), ba_hat=jnp.zeros(3))
        pts_w = vi_ba.ViWindowPoints(
            pos=jnp.concatenate([jnp.zeros((P, 2)), jnp.ones((P, 1))], -1),
            mask=jnp.zeros((P,), bool),
            obs_pt_id=jnp.zeros((O,), jnp.int32))
        out_ns, _ = vi_ba.local_ba_navstate(
            prob, self.gw, self.Tbc, cam.fx, cam.fy, cam.cx, cam.cy,
            iters=5, points=pts_w, bias_walk=bw)
        jax.block_until_ready(out_ns.P)

    # ------------------------------------------------------------------
    def track(self, fr: frame_mod.Frame):
        self._ingest_imu(fr)
        return super().track(fr)

    def _ingest_imu(self, fr):
        """Host-side IMU ledger (pure numpy, no device work). Entries are
        (frame_id, rows): keyframe creation may run FRAMES LATE in
        pipelined mode, and the KF's preintegration gap must stop at the
        KF frame, not at whatever arrived since.

        Idempotent per frame: the pre-init pipelined path ingests before
        delegating to the base tracker, whose synchronous fallback calls
        VioTracker.track — which ingests too. Double-appending a frame's
        rows doubles the preintegration gap's samples and silently
        corrupts the VI init (observed: recovered scale 1.8)."""
        if getattr(self, "_ingested_fid", None) == fr.frame_id:
            return
        self._ingested_fid = fr.frame_id
        if self.first_frame_time is None:
            self.first_frame_time = fr.timestamp
        if fr.imu is not None and len(fr.imu):
            self.imu_since_kf.append(
                (fr.frame_id, np.asarray(fr.imu, np.float32)))
        self.imu_since_frame = fr.imu

    # ------------------------------------------------------------------
    # pipelined VI tracking (deferred gate readback; VERDICT r3 #5)
    # ------------------------------------------------------------------
    def track_pipelined(self, fr: frame_mod.Frame):
        """Throughput-mode VI tracking: enqueue the fused VI step (IMU
        preintegration + prediction + sparse align + direct search +
        NavState refinement as ONE device program) without waiting for
        its gates; resolve gate bundles `pipeline_depth` frames late in
        one batched readback — same deferred-gate design as the mono
        path (Tracker.track_pipelined), with VI chain semantics: a
        vision-weak frame still commits on its IMU prediction (the
        reference's bTrackOK=false branch), so the optimistic chain only
        breaks on non-finite state."""
        from ygz_tpu.pipeline import fused_track
        self._ingest_imu(fr)
        last = self.last_frame
        rows = fr.imu
        if (not self.vins_inited or self.state != OK or last is None
                or last.mp_idx is None or last.T_cw is None or fr.extracted
                or self.last_ns is None or self.prior_H is None
                or (rows is not None and len(rows) > FRAME_IMU_PAD)):
            # pre-init / fallback / oversized IMU gap: synchronous path
            # (imu ledger already ingested — call the base tracker).
            # NOTE a pipelined pure-vision pre-init was tried (route
            # through Tracker.track_pipelined until TryInitVIO): the
            # throughput is real but the optimistic-pose KF chain it
            # produces degrades the [s, g_w, b_a] least squares to the
            # point of solving wrong scales (observed 5.6x off with a
            # plausible-looking |g|), so the bootstrap keeps the
            # synchronous cascade's refined poses.
            self.flush_pipeline()
            return Tracker.track(self, fr)
        if not self.direct_cache:
            self._rebuild_direct_cache()
        imu_p, imu_m = _pad_imu(rows, FRAME_IMU_PAD)
        with timing.stage("track.fused_vi_step"):
            out = fused_track.fused_vi_step(
                self.ms, last.pyramid, last.uv, last.mp_idx,
                last.feat_mask, last.T_cw, self.last_ns, self.prior_H,
                imu_p, imu_m, self.bg, self.ba, self.gw, self.Tbc,
                fr.pyramid, self._cand_j, self._cand_valid, self.ref_kf,
                self.cfg)
            timing.sync(out.bundle)
        # optimistic application (device values, no sync)
        fr.T_cw = out.T_cw
        fr.uv, fr.level = out.fr_uv, out.fr_level
        fr.feat_mask, fr.mp_idx = out.fr_feat_mask, out.fr_mp_idx
        fr.desc = None
        fr.T_c_ref = out.T_c_ref
        fr.vio_ns = out.ns
        self.last_ns = out.ns
        self.prior_H = out.prior_H
        self.velocity = None
        pre_counters = (self.ms.mp_visible, self.ms.mp_found)
        self.ms = dataclasses.replace(
            self.ms, mp_visible=out.mp_visible, mp_found=out.mp_found)
        self._pending.append((fr, out, pre_counters))
        # async host copy + slack-keeping drain: see the mono
        # track_pipelined for the rationale (tunnel round-trip hiding)
        from ygz_tpu.utils.prefetch import host_prefetch
        host_prefetch(out.bundle)
        self.last_frame = fr
        if len(self._pending) > self.pipeline_depth:
            keep = max(1, self.pipeline_depth // 2)
            self._drain_pipeline(len(self._pending) - keep, next_fr=fr)
        return fr.T_cw

    def _resolve_one(self, pfr, b, pout, ppre, next_fr, tail):
        """VI resolution semantics for fused_vi_step entries; mono/vision
        entries (pre-init frames never enqueue, but stay safe) defer to
        the base resolver."""
        from ygz_tpu.pipeline import fused_track as ft
        if not isinstance(pout, ft.FusedViStepOut):
            return super()._resolve_one(pfr, b, pout, ppre, next_fr, tail)
        if not bool(b[ft.B_FINITE]):
            # non-finite state: drop pfr and the chain built on it, then
            # re-track the current frame synchronously from the last
            # good frame (IMU rows of the dropped span concatenate into
            # one prediction gap — each frame's block covers exactly
            # (predecessor, frame])
            self._rollback_counters(
                [(pfr, pout, ppre)] + list(tail) + self._pending)
            dropped = [(pfr, pout)] + [(t[0], t[1]) for t in tail] \
                + [(p[0], p[1]) for p in self._pending]
            self._pending = []
            for tfr, _ in dropped:
                if next_fr is not None and tfr is next_fr:
                    continue
                self.trajectory.append(dict(frame_id=tfr.frame_id,
                                            timestamp=tfr.timestamp,
                                            lost=True))
            good = getattr(self, "_last_good", None)
            self.prior_H = None
            self.last_ns = good.vio_ns if good is not None else None
            if next_fr is not None:
                gap = [np.asarray(tfr.imu, np.float32)
                       for tfr, _ in dropped
                       if tfr.imu is not None and len(tfr.imu)]
                self.imu_since_frame = (np.concatenate(gap)
                                        if gap else None)
                next_fr.T_cw = None
                next_fr.uv = next_fr.level = next_fr.desc = None
                next_fr.feat_mask = next_fr.mp_idx = None
                next_fr.T_c_ref = None
                next_fr.vio_ns = None
                self.last_frame = good if good is not None else pfr
                self._track_frame(next_fr)
                if next_fr.T_cw is not None and self.state == OK:
                    self._record_frame(next_fr)
                    self._last_good = next_fr
                self.last_frame = next_fr
            else:
                self.state = LOST
            return False
        # committed (vision-weak frames commit too, on the prediction)
        vis_ok = bool(b[ft.B_OK])
        self.last_inliers = int(b[ft.B_N_IN])
        self._ref_obs_cache = int(b[ft.B_REF_OBS])
        self._ref_obs3_cache = int(b[ft.B_REF_OBS3])
        self._record_frame(pfr)
        self._last_good = pfr
        if (not vis_ok) or b[ft.B_N_HIT] < self.cfg.cache_features:
            self._rebuild_direct_cache()
        if vis_ok and self._need_new_keyframe(pfr):
            # the window BA inside KF creation rewrites last_ns/kf poses
            # for the KF CHAIN; the in-flight frame chain (frames newer
            # than pfr already enqueued against their own states) must
            # keep its optimistic state — it re-anchors at the next KF
            save_ns, save_H = self.last_ns, self.prior_H
            self._create_new_keyframe(pfr)
            if save_ns is not None:
                self.last_ns, self.prior_H = save_ns, save_H
            for tfr, _, _ in tail:
                tfr.T_c_ref = None
        return True

    # ------------------------------------------------------------------
    def _preintegrate_rows(self, rows):
        # power-of-two capacity bucketing above the base pad: merged gaps
        # (after a KF cull re-stitches two preintegration intervals) can
        # exceed IMU_PAD without triggering a recompile per length
        cap = IMU_PAD
        if rows is not None and len(rows) > cap:
            cap = 1 << int(np.ceil(np.log2(len(rows))))
        imu, m = _pad_imu(rows, cap)
        return pre_mod.preintegrate(imu, m, self.bg, self.ba,
                                    self.cfg.gyro_noise, self.cfg.acc_noise)

    # ------------------------------------------------------------------
    def on_keyframe_killed(self, k: int, anchor=None, T_dead_anchor=None):
        """Chain repair when mapping culls KF k: merge its IMU gap into
        its temporal successor and re-preintegrate, so the per-gap
        preintegration chain the VI init/window BA depends on stays
        contiguous (the reference merges IMU data into the next KF and
        recomputes its preintegration on SetBadFlag,
        /root/reference/src/KeyFrame.cc SetBadFlag + ComputePreInt).
        anchor/T_dead_anchor ride through to the base tracker's
        trajectory re-anchoring (mapping.resolve_pending passes them)."""
        super().on_keyframe_killed(k, anchor=anchor,
                                   T_dead_anchor=T_dead_anchor)
        if k in self.kf_order:
            i = self.kf_order.index(k)
            if i + 1 < len(self.kf_order):
                succ = self.kf_order[i + 1]
                parts = [r for r in (self.kf_imu_rows.get(k),
                                     self.kf_imu_rows.get(succ))
                         if r is not None and len(r)]
                self.kf_imu_rows[succ] = (np.concatenate(parts)
                                          if parts else None)
                pa, pb = self.kf_pre.get(k), self.kf_pre.get(succ)
                if pa is not None and pb is not None:
                    # exact O(1) composition — no re-integration, no
                    # bigger padded buffer (no fresh device program)
                    self.kf_pre[succ] = pre_mod.compose(pa, pb)
                elif pb is None:
                    self.kf_pre[succ] = pa
            self.kf_order.remove(k)
        self.kf_ns.pop(k, None)
        self.kf_pre.pop(k, None)
        self.kf_imu_rows.pop(k, None)

    # hook: called by Tracker when a KF slot is filled
    def _create_new_keyframe(self, fr):
        # the KF's IMU gap ends AT the KF frame: blocks that arrived for
        # later frames (pipelined mode resolves KF decisions frames late)
        # stay queued for the next gap
        take = [r for fid, r in self.imu_since_kf if fid <= fr.frame_id]
        keep = [(fid, r) for fid, r in self.imu_since_kf
                if fid > fr.frame_id]
        rows = np.concatenate(take) if take else None
        super()._create_new_keyframe(fr)
        slot = self.ref_kf
        self.kf_pre[slot] = self._preintegrate_rows(rows)
        self.kf_imu_rows[slot] = rows
        self.kf_order.append(slot)
        self.imu_since_kf = keep
        # NavState seeded from the frame's own VI state when the fused
        # step produced one; else from the visual pose + latest velocity
        if fr.vio_ns is not None:
            ns = fr.vio_ns
            self.kf_ns[slot] = ns_mod.tcw_to_navstate(
                fr.T_cw, self.Tbc, V=ns.V, bg=ns.bg, ba=ns.ba)
        else:
            V = (self.last_ns.V
                 if (self.vins_inited and self.last_ns is not None)
                 else jnp.zeros(3))
            self.kf_ns[slot] = ns_mod.tcw_to_navstate(
                fr.T_cw, self.Tbc, V=V, bg=self.bg, ba=self.ba)
        if self.vins_inited:
            self._vi_window_ba()
        elif (fr.timestamp - self.first_frame_time >= self.cfg.vins_init_time
              and len(self.kf_order) >= 6):
            self._try_init_vio()

    # ------------------------------------------------------------------
    VI_INIT_STRIDE_S = 1.0   # min temporal spacing of init-solve nodes:
    # the [s, g] double-difference signal grows ~dt^2 against constant
    # per-node vision noise (see _init_chain_nodes), and 1.0 s nodes
    # measurably de-attenuate the scale solve vs 0.5 s (9% vs 14% low
    # on the e2e fixture) while still leaving >= 7 nodes in an 8 s window

    def _init_chain_nodes(self):
        """Subsample the KF chain for the [s, gw, ba] solve, composing the
        skipped preintegrations exactly (O(1) per merge).

        The [s, g] triples regress on position double-differences
        lam = (a2-a1)*dt23 - (a3-a2)*dt12: signal grows ~dt^2 while the
        vision position noise per KF is constant, so at the dense
        pre-init keyframe cadence (~3/s) the regressor is noise-dominated
        and the least squares attenuates s toward zero
        (errors-in-variables). The reference solves over its natural
        policy-spaced KFs (/root/reference/src/LocalMapping.cc:237-319),
        typically >= 0.5 s apart — subsampling recovers that geometry
        without giving up the dense pre-init cadence tracking wants.

        Returns the node slots (always including the first and spanning
        to near the last KF) and leaves the composed per-gap
        preintegrations in self._init_chain_pres; None if the chain is
        unusable."""
        order = self.kf_order
        if len(order) < 3 or any(self.kf_pre.get(k) is None
                                 for k in order[1:]):
            return None
        nodes = [order[0]]
        pres = []
        acc = None
        for k in order[1:]:
            p = self.kf_pre[k]
            acc = p if acc is None else pre_mod.compose(acc, p)
            if float(acc.dt) >= self.VI_INIT_STRIDE_S:
                nodes.append(k)
                pres.append(acc)
                acc = None
        if len(nodes) < 3:
            # gaps never reach the stride (short window / high fps):
            # fall back to the raw chain
            nodes = list(order)
            pres = [self.kf_pre[k] for k in order[1:]]
        self._init_chain_pres = pres
        return nodes

    # ------------------------------------------------------------------
    def _try_init_vio(self):
        """Reference TryInitVIO (/root/reference/src/LocalMapping.cc:189-723),
        run synchronously once enough baseline exists."""
        # vision-only global BA FIRST (reference :212 — the [s, g, ba]
        # least squares amplifies KF position noise, so the solve must
        # see drift-minimized poses)
        self.ms = self._run_global_ba(iters=10)
        self._rebuild_direct_cache()
        order = self._init_chain_nodes()
        if order is None:
            return
        n = len(order)
        p_c, q_wb = [], []
        for k in order:
            T_cw = {"q": self.ms.kf_q[k], "t": self.ms.kf_t[k]}
            T_wc = lie.se3_inverse(T_cw)
            p_c.append(T_wc["t"])
            T_wb = lie.se3_compose(T_wc, lie.se3_inverse(self.Tbc))
            q_wb.append(T_wb["q"])
        pres = self._init_chain_pres
        p_c = jnp.stack(p_c)
        q_wb = jnp.stack(q_wb)
        pre = jax.tree.map(lambda *x: jnp.stack(x), *pres)
        pbc = self.Tbc["t"]
        # ba prior: over a short init window the accel bias is weakly
        # observable and otherwise soaks up vision pose noise (phantom
        # |ba| ~ 0.5 m/s^2 from ~2 deg of rotation error, attenuating
        # the scale ~20%); the post-init window BA re-estimates bias
        # continuously with real observability, so shrinking it here
        # costs nothing (see vi_init.refine_with_gravity_norm)
        res = vi_init.try_init_vio(p_c, q_wb, pre, jnp.ones(n, bool), pbc,
                                   self.cfg.gravity, ba_prior_weight=1.0)
        if not bool(res.ok):
            return
        s = float(res.scale)
        if s <= 1e-3:
            return

        # rescale the entire map to metric units (reference rescales KF
        # translations and map points, src/LocalMapping.cc:516-530) and
        # the stored per-frame trajectory
        self.ms = dataclasses.replace(
            self.ms, kf_t=self.ms.kf_t * s, mp_pos=self.ms.mp_pos * s)
        for rec in self.trajectory:
            if not rec.get("lost"):
                rec["T_c_ref"]["t"] = rec["T_c_ref"]["t"] * s
        # pipelined mode: the init fires at RESOLVE time, while newer
        # frames are already in flight with optimistic poses (and the
        # next dispatch chains from last_frame.T_cw) — all still at the
        # pre-rescale vision scale. Scale them too, or the first
        # post-init fused step runs a wrong-scale pose against the
        # metric map and the chain diverges.
        flights = {id(p[0]): p[0] for p in self._pending}
        if self.last_frame is not None:
            flights.setdefault(id(self.last_frame), self.last_frame)
        for fl in flights.values():
            if fl.T_cw is not None:
                fl.T_cw = dict(fl.T_cw, t=fl.T_cw["t"] * s)
            fl.T_c_ref = None  # recompute against the rescaled ref KF
        self.bg = res.bg
        self.ba = res.ba
        self.gw = res.gw
        # set NavStates for the FULL chain (solve nodes were subsampled):
        # velocities from scaled position differences
        order = self.kf_order
        for i, k in enumerate(order):
            T_cw = {"q": self.ms.kf_q[k], "t": self.ms.kf_t[k]}
            self.kf_ns[k] = ns_mod.tcw_to_navstate(
                T_cw, self.Tbc, bg=self.bg, ba=self.ba)
        for i in range(len(order) - 1):
            a, b = order[i], order[i + 1]
            dt = max(float(self.ms.kf_timestamp[b]
                           - self.ms.kf_timestamp[a]), 1e-3)
            V = (self.kf_ns[b].P - self.kf_ns[a].P) / dt \
                - 0.5 * self.gw * dt
            self.kf_ns[a] = self.kf_ns[a]._replace(V=V)
        self.kf_ns[order[-1]] = self.kf_ns[order[-1]]._replace(
            V=self.kf_ns[order[-2]].V)
        self.last_ns = self.kf_ns[order[-1]]
        # finite-difference velocities above are only the SEED: the
        # reference follows init acceptance with a full NavState global
        # BA and spanning-tree correction (src/LocalMapping.cc:617-713);
        # the optimizer's velocities/poses/points replace the seeds
        self._vi_global_ba(iters=10)
        self.vins_inited = True
        self.velocity = None  # switch to IMU prediction
        print(f"[vio] initialized: scale={s:.4f} "
              f"|g|={float(jnp.linalg.norm(self.gw)):.3f} "
              f"bg={np.asarray(self.bg)} ba={np.asarray(self.ba)}")

    # ------------------------------------------------------------------
    MAX_FIXED_RING = 10
    WINDOW_MP_CAP = 2048

    def _kf_navstate(self, k: int) -> ns_mod.NavState:
        if k in self.kf_ns:
            return self.kf_ns[k]
        T_cw = {"q": self.ms.kf_q[k], "t": self.ms.kf_t[k]}
        return ns_mod.tcw_to_navstate(T_cw, self.Tbc, bg=self.bg, ba=self.ba)

    def _vi_window_ba(self):
        """Sliding-window NavState + map-point refinement after each KF
        (reference LocalBundleAdjustmentNavState, window size
        LocalMapping.LocalWindowSize=10, /root/reference/src/Optimizer.cc:
        863-1279): the last W keyframes' NavStates are free, map points
        they observe are free (Schur-eliminated 3x3 blocks), and KFs
        outside the window that observe those points join as FIXED
        vertices contributing projection edges only (:939-1005)."""
        W = self.cfg.local_window_size
        self._navstate_ba(self.kf_order[-W:],
                          total=W + self.MAX_FIXED_RING,
                          use_ring=True, iters=5)

    def _vi_global_ba(self, iters: int = 10):
        """Full-chain NavState global BA, run once when VI init is
        accepted (reference GlobalBundleAdjustmentNavState +
        spanning-tree correction, /root/reference/src/LocalMapping.cc:
        617-713 and src/Optimizer.cc:62-276): every KF's NavState is a
        free vertex (first fixed), all preintegration edges and all
        projection edges join, and the optimized velocities/biases
        replace the finite-difference seeds. The reference then
        propagates the correction through the spanning tree to KFs
        created during the BA; here the BA runs synchronously at KF
        creation, so the chain IS the whole alive-KF set and no
        propagation step exists."""
        order = list(self.kf_order)
        # bucket the KF capacity to limit distinct program shapes (one
        # global-BA compile per bucket, not per chain length)
        total = max(8, 1 << int(np.ceil(np.log2(len(order)))))
        self._navstate_ba(order, total=total, use_ring=False, iters=iters)
        # the marginal prior refers to pre-BA states; drop it
        self.prior_H = None

    def _navstate_ba(self, order, total: int, use_ring: bool,
                     iters: int):
        """Shared NavState BA core over `order` (temporal KF slots):
        builds the padded ViWindowProblem, runs vi_ba.local_ba_navstate,
        and writes back poses, NavStates, and map points."""
        if len(order) < 3 or len(order) > total:
            return
        n = len(order)
        pres = [self.kf_pre[k] for k in order[1:]]
        if any(p is None for p in pres):
            return

        # local point table: points observed by the window
        member = np.zeros((self.cfg.max_map_points,), bool)
        for k in order:
            ids = np.asarray(self.ms.kf_mp_idx[k])
            member[ids[ids >= 0]] = True
        member &= np.asarray(self.ms.mp_mask)
        local_ids = np.where(member)[0][:self.WINDOW_MP_CAP]
        g2l = np.full((self.cfg.max_map_points,), -1, np.int64)
        g2l[local_ids] = np.arange(len(local_ids))

        # fixed observer ring: KFs outside the window seeing local points
        # (window BA only — the global BA's chain already covers every
        # alive KF)
        fixed = []
        if use_ring:
            obs_kfs = np.asarray(mapstate.observers_of(
                self.ms, jnp.asarray(member)))
            fixed = [int(k) for k in np.where(obs_kfs)[0]
                     if k not in order][:self.MAX_FIXED_RING]
        sel = list(order) + fixed
        n_sel = len(sel)
        # ONE BA program per capacity: pad the KF axis to `total` with
        # masked repeats of the last selected KF. A per-(n, ring) program
        # shape meant ~2(W+R) big JIT loads spread through the run — both
        # a compile-cost problem and exposure to the late-process XLA:CPU
        # JIT segfault (tests/conftest.py lore); static capacity is also
        # simply the right XLA shape discipline.
        sel = sel + [sel[-1]] * (total - n_sel)

        ns = jax.tree.map(lambda *x: jnp.stack(x),
                          *[self._kf_navstate(k) for k in sel])
        # preintegration segments only span the free temporal chain;
        # pad the tail (fixed ring + capacity pad) with masked copies
        pres = pres + [pres[-1]] * (total - n)
        pre = jax.tree.map(lambda *x: jnp.stack(x), *pres)
        pre_mask = jnp.asarray(
            np.arange(total - 1) < (n - 1))

        obs_kf, obs_pid, obs_uv, obs_s2, obs_m = [], [], [], [], []
        for i, k in enumerate(sel):
            mp = np.asarray(self.ms.kf_mp_idx[k])
            lid = g2l[np.where(mp >= 0, mp, 0)]
            valid = np.asarray(self.ms.kf_feat_mask[k]) & (mp >= 0) \
                & (lid >= 0)
            if i >= n_sel:
                valid = np.zeros_like(valid)
            obs_kf.append(np.full((mp.shape[0],), i, np.int32))
            obs_pid.append(np.where(valid, lid, 0).astype(np.int32))
            obs_uv.append(self.ms.kf_uv[k])
            lvl = jnp.clip(self.ms.kf_level[k], 0, self.cfg.n_levels - 1)
            obs_s2.append(jnp.asarray(self.cfg.inv_level_sigma2)[lvl])
            obs_m.append(valid)

        pid = jnp.asarray(np.concatenate(obs_pid))
        pos = self.ms.mp_pos[jnp.asarray(local_ids)]
        pt_pad = self.WINDOW_MP_CAP  # stable shape across calls
        if len(local_ids) < pt_pad:
            pos = jnp.concatenate(
                [pos, jnp.zeros((pt_pad - len(local_ids), 3))])
        pt_mask = jnp.asarray(np.arange(pt_pad) < len(local_ids))

        prob = vi_ba.ViWindowProblem(
            ns=ns, pre=pre,
            pre_mask=pre_mask,
            kf_mask=jnp.asarray(np.arange(total) < n_sel),
            kf_fixed=jnp.asarray(
                np.array([False] * n + [True] * (total - n))
            ).at[0].set(True),
            obs_kf=jnp.asarray(np.concatenate(obs_kf)),
            obs_pt=jnp.zeros((pid.shape[0], 3)),  # unused with points
            obs_uv=jnp.concatenate(obs_uv),
            obs_inv_sigma2=jnp.concatenate(obs_s2),
            obs_mask=jnp.asarray(np.concatenate(obs_m)),
            bg_hat=self.bg, ba_hat=self.ba)
        pts = vi_ba.ViWindowPoints(pos=pos, mask=pt_mask, obs_pt_id=pid)
        cam = self.cfg.camera
        out_ns, out_pos = vi_ba.local_ba_navstate(
            prob, self.gw, self.Tbc, cam.fx, cam.fy, cam.cx, cam.cy,
            iters=iters, points=pts,
            bias_walk=(self.cfg.gyro_bias_walk, self.cfg.acc_bias_walk))
        # plain-GN divergence guard: local_ba_navstate has no per-step
        # accept/reject, and the free-chain post-init polish CAN diverge
        # from bad velocity seeds (observed: map scale x6, chi2 up). A
        # polish that did not reduce the joint chi2 is discarded.
        c0 = vi_ba.window_cost(prob, self.gw, self.Tbc, cam.fx, cam.fy,
                               cam.cx, cam.cy, pos_tab=pts.pos,
                               obs_pt_id=pid)
        c1 = vi_ba.window_cost(prob, self.gw, self.Tbc, cam.fx, cam.fy,
                               cam.cx, cam.cy, ns=out_ns, pos_tab=out_pos,
                               obs_pt_id=pid)
        if not bool(jnp.isfinite(c1)) or float(c1) > float(c0):
            from ygz_tpu.utils.log import logger
            logger.warning("navstate BA rejected: chi2 %.3g -> %.3g "
                           "(n=%d, ring=%s)", float(c0), float(c1),
                           len(order), use_ring)
            return
        for i, k in enumerate(order):
            ns_k = jax.tree.map(lambda a: a[i], out_ns)
            self.kf_ns[k] = ns_k
            T_cw = ns_mod.navstate_to_tcw(ns_k, self.Tbc)
            self.ms = dataclasses.replace(
                self.ms,
                kf_q=self.ms.kf_q.at[k].set(T_cw["q"]),
                kf_t=self.ms.kf_t.at[k].set(T_cw["t"]))
        # fixed-shape writeback: pads scatter out-of-bounds and drop
        idx_pad = np.full((pt_pad,), self.cfg.max_map_points, np.int64)
        idx_pad[:len(local_ids)] = local_ids
        self.ms = dataclasses.replace(
            self.ms, mp_pos=self.ms.mp_pos.at[jnp.asarray(idx_pad)].set(
                out_pos, mode="drop"))
        self.last_ns = self.kf_ns[order[-1]]

    # ------------------------------------------------------------------
    # cascade overrides
    # ------------------------------------------------------------------
    def _track_frame(self, fr):
        if not self.vins_inited:
            return super()._track_frame(fr)

        # IMU prediction from the last frame's NavState (reference
        # PredictNavStateByIMU, src/Tracking.cc:1994-2060)
        pre_f = self._preintegrate_rows(self.imu_since_frame)
        ns_pred = ns_mod.predict(self.last_ns, pre_f, self.gw) \
            if self.last_ns is not None else None
        if ns_pred is not None:
            self.velocity = None
            T_pred = ns_mod.navstate_to_tcw(ns_pred, self.Tbc)
            # sparse alignment initialized from the IMU prediction
            ok = False
            if (self.last_frame is not None
                    and self.last_frame.mp_idx is not None
                    and self.last_frame.T_cw is not None
                    and int(jnp.sum((self.last_frame.mp_idx >= 0)
                                    & self.last_frame.feat_mask)) >= 30):
                self.velocity = lie.se3_compose(
                    T_pred, lie.se3_inverse(self.last_frame.T_cw))
                ok = self._track_sparse_align(fr)
            if not ok:
                fr.T_cw = T_pred
                ok = True
            # local map refinement (direct then features)
            if fr.desc is None:
                ok2 = self._track_local_map_direct(fr)
                if not ok2:
                    fr2 = frame_mod.extract_features(fr, self.cfg)
                    self._copy_frame_fields(fr, fr2)
                    ok2 = self._track_local_map_features(fr)
            else:
                ok2 = self._track_local_map_features(fr)

            # NavState refinement with the IMU edge + prior (reference
            # PoseOptimization VI overloads) — vision-weak mode keeps the
            # IMU prediction when the visual track fails
            if ok2:
                self._refine_navstate(fr, pre_f, ns_pred)
            else:
                fr.T_cw = ns_mod.navstate_to_tcw(ns_pred, self.Tbc)
                self.last_ns = ns_pred
                fr.vio_ns = ns_pred
                fr.mp_idx = jnp.full((self.cfg.n_features,), -1, jnp.int32)
                if fr.feat_mask is None:
                    fr.feat_mask = jnp.zeros((self.cfg.n_features,), bool)
                    fr.uv = jnp.zeros((self.cfg.n_features, 2))
                    fr.level = jnp.zeros((self.cfg.n_features,), jnp.int32)

            self.state = OK
            if self._need_new_keyframe(fr):
                self._create_new_keyframe(fr)
            return
        return super()._track_frame(fr)

    def _refine_navstate(self, fr, pre_f, ns_pred):
        cfg = self.cfg
        tracked = (fr.mp_idx >= 0) & fr.feat_mask
        ids = jnp.where(tracked, fr.mp_idx, 0)
        pts = self.ms.mp_pos[ids]
        lvl = jnp.clip(fr.level, 0, cfg.n_levels - 1)
        inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[lvl]
        ns0 = ns_mod.tcw_to_navstate(fr.T_cw, self.Tbc,
                                     V=ns_pred.V, bg=self.bg, ba=self.ba)
        cam = cfg.camera
        # Frame-Frame joint optimization (reference PoseOptimization
        # Frame/Frame overload, /root/reference/src/Optimizer.cc:278-618):
        # the previous frame's state is a FREE vertex anchored by ITS
        # marginal prior (prior_H at the previous estimate); the returned
        # H is the current frame's true marginal information (joint
        # Hessian with the previous state Schur-eliminated) — the
        # reference's computeMarginals + inverse, and next frame's prior.
        ns, inlier, n_in, H = vi_ba.pose_optimization_vi(
            ns0, self.last_ns, pre_f, self.gw, self.Tbc,
            pts, fr.uv, inv_s2, tracked & self.ms.mp_mask[ids],
            cam.fx, cam.fy, cam.cx, cam.cy,
            prior_H=self.prior_H,
            prior_ns=None if self.prior_H is None else self.last_ns,
            bias_hat=(self.bg, self.ba),
            bias_walk=(cfg.gyro_bias_walk, cfg.acc_bias_walk))
        fr.T_cw = ns_mod.navstate_to_tcw(ns, self.Tbc)
        fr.mp_idx = jnp.where(inlier | ~tracked, fr.mp_idx, -1)
        self.last_ns = ns
        fr.vio_ns = ns
        self.prior_H = H
        self.last_inliers = int(n_in)
