"""System facade: the public API mirroring the reference's System class
(/root/reference/include/System.h:66-149) — construct with a settings
config + vocabulary, feed frames via TrackMonocular / TrackStereo /
TrackRGBD / TrackMonoVI, export trajectories in TUM and KITTI formats,
switch localization mode, reset, shutdown.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ygz_tpu.core import lie
from ygz_tpu.matching import vocabulary as vocab_mod
from ygz_tpu.pipeline import frame as frame_mod
from ygz_tpu.pipeline.mapping import LocalMapping
from ygz_tpu.pipeline.tracking import Tracker, LOST
from ygz_tpu.utils import timing
from ygz_tpu.utils.config import SlamConfig

MONOCULAR = 0
STEREO = 1
RGBD = 2


class System:
    def __init__(self, cfg: SlamConfig,
                 vocab: Optional[vocab_mod.Vocabulary] = None,
                 sensor: int = MONOCULAR,
                 use_loop_closing: bool = True,
                 pipelined: bool = False,
                 pipeline_depth: int = 1):
        """pipelined=True defers tracking-gate readbacks so consecutive
        frames overlap on device (throughput mode for offline dataset
        runs and benchmarking; see Tracker.track_pipelined).
        pipeline_depth=D keeps D frames in flight and batches their gate
        readbacks into one device round trip — gate decisions (keyframe
        insertion, failure detection) land D..2D frames late, the
        TPU-native analogue of the reference's tracking/mapping thread
        lag."""
        self.cfg = cfg
        self.sensor = sensor
        self.pipelined = pipelined
        self.pipeline_depth = max(1, int(pipeline_depth))
        if vocab is None:
            # a random-descriptor vocabulary still produces valid word ids;
            # retrieval quality improves once a trained one is supplied
            # (ygz_tpu.apps.train_vocab tool)
            rng = np.random.RandomState(0)
            seed_desc = rng.randint(0, 2 ** 32, (4096, 8)).astype(np.uint32)
            vocab = vocab_mod.train_vocabulary(seed_desc, k=cfg.vocab_k,
                                               L=cfg.vocab_L)
        self.vocab = vocab
        self.mapper = LocalMapping(cfg)
        if cfg.use_imu:
            from ygz_tpu.pipeline.vio import VioTracker
            self.tracker = VioTracker(cfg, vocab, mapper=self.mapper)
        else:
            self.tracker = Tracker(cfg, vocab, mapper=self.mapper)
        self.tracker.pipeline_depth = self.pipeline_depth
        self.localization_only = False
        self.loop_closer = None
        if use_loop_closing and not cfg.use_imu:
            # IMU mode disables loop correction entirely, as the reference
            # does (/root/reference/src/LoopClosing.cc:70-78)
            from ygz_tpu.pipeline.loopclosing import LoopClosing
            self.loop_closer = LoopClosing(cfg)
            self.mapper.loop_closer = self.loop_closer

    def _notify_loop_closer(self):
        """Drain the tracker's explicit new-KF signal and notify the loop
        closer exactly once per created slot (works identically for sync
        and pipelined/deferred KFs — the reference's LocalMapping queue
        hand-off to LoopClosing, /root/reference/src/LocalMapping.cc:832)."""
        slots = self.tracker.new_kf_slots
        if not slots:
            return
        self.tracker.new_kf_slots = []
        if self.loop_closer is None:
            return
        # liveness is checked inside _detect_loop's single fused readback;
        # a separate np.asarray(kf_mask) here cost one blocking tunnel
        # round trip per KF
        for slot in slots:
            self.loop_closer.on_new_keyframe(self.tracker, slot)

    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, timestamp: float):
        """img: [H, W] grayscale (uint8 or float). Returns T_cw or None."""
        with timing.stage("track.make_frame"):
            fr = frame_mod.make_frame(img, self._next_id(), timestamp,
                                      self.cfg)
        if self.pipelined and not self.cfg.use_imu:
            with timing.stage("track.pipeline_call"):
                T = self.tracker.track_pipelined(fr)
            with timing.stage("track.post_frame"):
                self._notify_loop_closer()
                self._maybe_auto_reset()
            return T
        T = self.tracker.track(fr)
        self._notify_loop_closer()
        self._maybe_auto_reset()
        return T

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   timestamp: float):
        fr = frame_mod.make_frame(img, self._next_id(), timestamp, self.cfg)
        if self.cfg.camera.has_distortion:
            # depth must live in the same (undistorted) pixel grid as the
            # gray image (reference remaps imDepth alongside imGray,
            # /root/reference/src/Frame.cc:773-805); nearest-neighbor so
            # occlusion boundaries don't blend
            depth = frame_mod.undistort_depth(depth, self.cfg.camera)
        # depth rides along for LAZY extraction: the frame tracks direct
        # (photometric) like mono — the reference's hybrid tracker does
        # the same for all sensors (/root/reference/src/Tracking.cc:
        # 371-523) — and pays detection + depth association only at
        # keyframe creation or on a feature fallback
        fr.depth_img = jnp.asarray(np.asarray(depth), jnp.float32)
        if self.pipelined:
            T = self.tracker.track_pipelined(fr)
        else:
            T = self.tracker.track(fr)
        self._notify_loop_closer()
        self._maybe_auto_reset()
        return T

    def track_stereo(self, img_l: np.ndarray, img_r: np.ndarray,
                     timestamp: float):
        fr = frame_mod.make_frame(img_l, self._next_id(), timestamp, self.cfg)
        right = frame_mod.make_frame(img_r, -1, timestamp, self.cfg)
        fr.right_pyr = right.pyramid
        if self.pipelined:
            T = self.tracker.track_pipelined(fr)
        else:
            T = self.tracker.track(fr)
        self._notify_loop_closer()
        self._maybe_auto_reset()
        return T

    def track_mono_vi(self, img: np.ndarray, imu: np.ndarray,
                      timestamp: float):
        """Monocular + IMU (reference TrackMonoVI,
        /root/reference/src/System.cc:47). imu: [n, 7] rows of
        (t, wx, wy, wz, ax, ay, az) since the previous frame."""
        fr = frame_mod.make_frame(img, self._next_id(), timestamp, self.cfg,
                                  imu=imu)
        if self.pipelined:
            # post-init frames stream through the fused VI step with
            # deferred gates (VioTracker.track_pipelined); pre-init and
            # fallback frames run the synchronous cascade
            T = self.tracker.track_pipelined(fr)
        else:
            T = self.tracker.track(fr)
        # loop correction is disabled under IMU (no loop_closer), but the
        # auto-reset on early track loss still applies
        self.tracker.new_kf_slots = []
        self._maybe_auto_reset()
        return T

    _id_counter = 0

    def _next_id(self) -> int:
        self._id_counter += 1
        return self._id_counter

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Track only: map maintenance suspended AND no keyframe insertion
        (the reference's mbOnlyTracking never reaches NeedNewKeyFrame,
        /root/reference/src/Tracking.cc:1318-1325)."""
        self.localization_only = True
        self.tracker.mapper = None
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.mapper = self.mapper
        self.tracker.localization_only = False

    def reset(self):
        """Full reset mirroring the reference's System/Tracking::Reset
        (/root/reference/src/Tracking.cc:1896-1944): new map, new mapper,
        new loop closer, sensor-appropriate tracker."""
        cfg = self.cfg
        self.mapper = LocalMapping(cfg)
        if cfg.use_imu:
            from ygz_tpu.pipeline.vio import VioTracker
            self.tracker = VioTracker(cfg, self.vocab, mapper=self.mapper)
        else:
            self.tracker = Tracker(cfg, self.vocab, mapper=self.mapper)
        self.tracker.pipeline_depth = self.pipeline_depth
        if self.loop_closer is not None:
            from ygz_tpu.pipeline.loopclosing import LoopClosing
            self.loop_closer = LoopClosing(cfg)
            self.mapper.loop_closer = self.loop_closer
        if self.localization_only:
            self.tracker.mapper = None
            self.tracker.localization_only = True

    def _maybe_auto_reset(self):
        """Reference auto-reset: track lost soon after initialization with
        <= 5 KFs in the map -> start over (/root/reference/src/Tracking.cc:
        619-627)."""
        if (self.tracker.state == LOST and 0 < self.tracker.n_kf <= 5
                and not self.localization_only):
            self.reset()

    def shutdown(self):
        """No threads to join — but the loop closer's deferred detection
        (one KF in flight, mirroring the reference's async loop thread)
        must resolve so a loop on the final keyframe is not dropped."""
        self._notify_loop_closer()
        if self.loop_closer is not None:
            self.loop_closer.flush(self.tracker)

    def map_changed(self) -> bool:
        return True

    # ------------------------------------------------------------------
    # trajectory export (reference src/System.cc:374-519)
    # ------------------------------------------------------------------
    def _frame_poses(self):
        """Re-anchor per-frame relative poses through the (possibly
        loop-corrected) keyframe poses, as the reference does at save time
        (/root/reference/src/System.cc:398-417)."""
        if hasattr(self.tracker, "flush_pipeline"):
            self.tracker.flush_pipeline()
        ms = self.tracker.ms
        out = []
        for rec in self.tracker.trajectory:
            if rec.get("lost"):
                continue
            k = rec["ref_kf"]
            T_ref = {"q": ms.kf_q[k], "t": ms.kf_t[k]}
            T_c_ref = {kk: jnp.asarray(v) for kk, v in rec["T_c_ref"].items()}
            T_cw = lie.se3_compose(T_c_ref, T_ref)
            out.append((rec["timestamp"], T_cw))
        return out

    def save_trajectory_tum(self, path: str):
        """TUM format: t tx ty tz qx qy qz qw of camera-in-world."""
        with open(path, "w") as f:
            for ts, T_cw in self._frame_poses():
                T_wc = lie.se3_inverse(T_cw)
                t = np.asarray(T_wc["t"])
                q = np.asarray(T_wc["q"])  # (w, x, y, z)
                f.write(f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                        f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")

    def save_keyframe_trajectory_tum(self, path: str):
        ms = self.tracker.ms
        mask = np.asarray(ms.kf_mask)
        ts = np.asarray(ms.kf_timestamp)
        order = np.argsort(ts)
        with open(path, "w") as f:
            for k in order:
                if not mask[k]:
                    continue
                T_wc = lie.se3_inverse({"q": ms.kf_q[k], "t": ms.kf_t[k]})
                t = np.asarray(T_wc["t"])
                q = np.asarray(T_wc["q"])
                f.write(f"{ts[k]:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                        f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")

    def save_trajectory_kitti(self, path: str):
        """KITTI format: one 3x4 row-major T_wc per line."""
        with open(path, "w") as f:
            for ts, T_cw in self._frame_poses():
                M = np.asarray(lie.se3_matrix(lie.se3_inverse(T_cw)))[:3]
                f.write(" ".join(f"{x:.7e}" for x in M.reshape(-1)) + "\n")

    def get_trajectory(self):
        """[(timestamp, T_wc 4x4 numpy)] for in-process evaluation."""
        return [(ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T))))
                for ts, T in self._frame_poses()]
