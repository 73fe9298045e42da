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
from ygz_tpu.pipeline.tracking import Tracker, OK
from ygz_tpu.utils.config import SlamConfig

IMU_PAD = 256  # per-frame IMU block capacity


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
        self.kf_order: List[int] = []   # KF slots in temporal order
        self.imu_since_kf: List[np.ndarray] = []
        self.imu_since_frame: Optional[np.ndarray] = None
        self.last_ns: Optional[ns_mod.NavState] = None
        self.prior_H = None
        self.first_frame_time: Optional[float] = None

    # ------------------------------------------------------------------
    def track(self, fr: frame_mod.Frame):
        if self.first_frame_time is None:
            self.first_frame_time = fr.timestamp
        if fr.imu is not None and len(fr.imu):
            self.imu_since_kf.append(np.asarray(fr.imu, np.float32))
        self.imu_since_frame = fr.imu
        return super().track(fr)

    # ------------------------------------------------------------------
    def _preintegrate_rows(self, rows):
        imu, m = _pad_imu(rows)
        return pre_mod.preintegrate(imu, m, self.bg, self.ba,
                                    self.cfg.gyro_noise, self.cfg.acc_noise)

    # hook: called by Tracker when a KF slot is filled
    def _create_new_keyframe(self, fr):
        rows = (np.concatenate(self.imu_since_kf)
                if self.imu_since_kf else None)
        super()._create_new_keyframe(fr)
        slot = self.ref_kf
        self.kf_pre[slot] = self._preintegrate_rows(rows)
        self.kf_order.append(slot)
        self.imu_since_kf = []
        # NavState seeded from the visual pose
        V = (self.last_ns.V if (self.vins_inited and self.last_ns is not None)
             else jnp.zeros(3))
        self.kf_ns[slot] = ns_mod.tcw_to_navstate(
            fr.T_cw, self.Tbc, V=V, bg=self.bg, ba=self.ba)
        if self.vins_inited:
            self._vi_window_ba()
        elif (fr.timestamp - self.first_frame_time >= self.cfg.vins_init_time
              and len(self.kf_order) >= 6):
            self._try_init_vio()

    # ------------------------------------------------------------------
    def _try_init_vio(self):
        """Reference TryInitVIO (/root/reference/src/LocalMapping.cc:189-723),
        run synchronously once enough baseline exists."""
        order = self.kf_order
        n = len(order)
        p_c, q_wb, pres = [], [], []
        for i, k in enumerate(order):
            T_cw = {"q": self.ms.kf_q[k], "t": self.ms.kf_t[k]}
            T_wc = lie.se3_inverse(T_cw)
            p_c.append(T_wc["t"])
            T_wb = lie.se3_compose(T_wc, lie.se3_inverse(self.Tbc))
            q_wb.append(T_wb["q"])
            if i > 0:
                pres.append(self.kf_pre[k])
        if any(p is None for p in pres):
            return
        p_c = jnp.stack(p_c)
        q_wb = jnp.stack(q_wb)
        pre = jax.tree.map(lambda *x: jnp.stack(x), *pres)
        pbc = self.Tbc["t"]
        res = vi_init.try_init_vio(p_c, q_wb, pre, jnp.ones(n, bool), pbc,
                                   self.cfg.gravity)
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
        self.bg = res.bg
        self.ba = res.ba
        self.gw = res.gw
        # set NavStates: velocities from scaled position differences
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
        self.vins_inited = True
        self.velocity = None  # switch to IMU prediction
        print(f"[vio] initialized: scale={s:.4f} "
              f"|g|={float(jnp.linalg.norm(self.gw)):.3f} "
              f"bg={np.asarray(self.bg)} ba={np.asarray(self.ba)}")

    # ------------------------------------------------------------------
    def _vi_window_ba(self):
        """Sliding-window NavState refinement after each KF (reference
        LocalBundleAdjustmentNavState with window size
        LocalMapping.LocalWindowSize=10)."""
        W = self.cfg.local_window_size
        order = self.kf_order[-W:]
        if len(order) < 3:
            return
        n = len(order)
        ns = jax.tree.map(lambda *x: jnp.stack(x),
                          *[self.kf_ns[k] for k in order])
        pres = [self.kf_pre[k] for k in order[1:]]
        if any(p is None for p in pres):
            return
        pre = jax.tree.map(lambda *x: jnp.stack(x), *pres)

        # observations of the window KFs (fixed points)
        obs_kf, obs_pt, obs_uv, obs_s2, obs_m = [], [], [], [], []
        for i, k in enumerate(order):
            mp = self.ms.kf_mp_idx[k]
            valid = self.ms.kf_feat_mask[k] & (mp >= 0)
            ids = jnp.where(valid, mp, 0)
            obs_kf.append(jnp.full((ids.shape[0],), i, jnp.int32))
            obs_pt.append(self.ms.mp_pos[ids])
            obs_uv.append(self.ms.kf_uv[k])
            lvl = jnp.clip(self.ms.kf_level[k], 0, self.cfg.n_levels - 1)
            obs_s2.append(jnp.asarray(self.cfg.inv_level_sigma2)[lvl])
            obs_m.append(valid & self.ms.mp_mask[ids])

        prob = vi_ba.ViWindowProblem(
            ns=ns, pre=pre,
            pre_mask=jnp.ones(n - 1, bool),
            kf_mask=jnp.ones(n, bool),
            kf_fixed=jnp.zeros(n, bool).at[0].set(True),
            obs_kf=jnp.concatenate(obs_kf),
            obs_pt=jnp.concatenate(obs_pt),
            obs_uv=jnp.concatenate(obs_uv),
            obs_inv_sigma2=jnp.concatenate(obs_s2),
            obs_mask=jnp.concatenate(obs_m),
            bg_hat=self.bg, ba_hat=self.ba)
        cam = self.cfg.camera
        out = vi_ba.local_ba_navstate(prob, self.gw, self.Tbc,
                                      cam.fx, cam.fy, cam.cx, cam.cy,
                                      iters=5)
        for i, k in enumerate(order):
            ns_k = jax.tree.map(lambda a: a[i], out)
            self.kf_ns[k] = ns_k
            T_cw = ns_mod.navstate_to_tcw(ns_k, self.Tbc)
            self.ms = dataclasses.replace(
                self.ms,
                kf_q=self.ms.kf_q.at[k].set(T_cw["q"]),
                kf_t=self.ms.kf_t.at[k].set(T_cw["t"]))
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
        # the prior anchors the current navstate to its IMU PREDICTION
        # from the previous frame's marginalized estimate (reference
        # EdgeNavStatePrior built from the last frame's estimate +
        # mMargCovInv, /root/reference/src/Optimizer.cc:560-618) — NOT to
        # the current linearization point, which would zero the residual
        # and turn the prior into pure damping
        ns, inlier, n_in, H = vi_ba.pose_optimization_vi(
            ns0, self.last_ns, pre_f, self.gw, self.Tbc,
            pts, fr.uv, inv_s2, tracked & self.ms.mp_mask[ids],
            cam.fx, cam.fy, cam.cx, cam.cy,
            prior_H=self.prior_H,
            prior_ns=None if self.prior_H is None else ns_pred,
            bias_hat=(self.bg, self.ba))
        fr.T_cw = ns_mod.navstate_to_tcw(ns, self.Tbc)
        fr.mp_idx = jnp.where(inlier | ~tracked, fr.mp_idx, -1)
        self.last_ns = ns
        # keep the vision+IMU information as the next frame's prior; the
        # discount approximates marginalizing out the map points the
        # reference does exactly (its Hessian is vision-only x2 inflated)
        self.prior_H = H * 0.5
        self.last_inliers = int(n_in)
