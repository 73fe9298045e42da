"""End-to-end monocular SLAM on a synthetic textured-plane world: the
system must initialize, stay in OK state, build keyframes + map points,
and produce a trajectory whose Sim3-aligned ATE is small."""

import dataclasses
import numpy as np
import pytest

from ygz_tpu.core import lie
from ygz_tpu.eval import ate
from ygz_tpu.pipeline import tracking
from ygz_tpu.pipeline.system import System
from ygz_tpu.utils.config import SlamConfig

import synthetic


def small_config():
    return SlamConfig(
        camera=synthetic.CAM,
        fps=10.0,
        n_features=300,
        n_levels=3,
        scale_factor=1.5,
        ini_th_fast=8.0,
        min_th_fast=4.0,
        cache_features=60,
        init_min_matches=60,
        max_keyframes=32,
        max_map_points=2048,
        vocab_k=4,
        vocab_L=3,
        detect_cell=8,
        detect_per_cell=2,
    )


@pytest.fixture(scope="module")
def slam_run():
    cfg = small_config()
    tex = synthetic.make_texture(0)
    traj_gt = synthetic.orbit_trajectory(40)
    sys = System(cfg, use_loop_closing=False)
    est = []
    states = []
    for ts, T_cw in traj_gt:
        img = synthetic.render(tex, T_cw)
        sys.track_monocular(img, ts)
        states.append(sys.tracker.state)
    return cfg, sys, traj_gt, states


class TestEndToEndMono:
    def test_initializes(self, slam_run):
        cfg, sys, traj_gt, states = slam_run
        assert tracking.OK in states, f"never initialized: {set(states)}"
        first_ok = states.index(tracking.OK)
        assert first_ok < 20, f"late init at frame {first_ok}"

    def test_stays_tracking(self, slam_run):
        cfg, sys, traj_gt, states = slam_run
        first_ok = states.index(tracking.OK)
        after = states[first_ok:]
        frac_ok = sum(1 for s in after if s == tracking.OK) / len(after)
        assert frac_ok > 0.9, f"tracking dropped: {frac_ok:.2f}"

    def test_builds_map(self, slam_run):
        cfg, sys, traj_gt, states = slam_run
        assert sys.tracker.n_kf >= 3
        n_mp = int(np.asarray(sys.tracker.ms.mp_mask).sum())
        # density, not accuracy (accuracy is test_trajectory_accuracy):
        # the exact count rides knife-edge triangulation/cull decisions
        # and legitimately moves a few points under solver changes
        # (LM early exit, occupancy-masked detection) — bound it loosely
        assert n_mp > 80, n_mp

    def test_trajectory_accuracy(self, slam_run):
        cfg, sys, traj_gt, states = slam_run
        est = sys.get_trajectory()
        gt = [(ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T))))
              for ts, T in traj_gt]
        res = ate.ate_rmse(est, gt, with_scale=True, max_dt=0.05)
        assert res["n_pairs"] >= 20
        # bound: ~10% of the 1.6-unit span. The tiny test images (128x96,
        # fx=120) give ~0.4 px corner noise and ~3% frame-to-frame
        # baseline/depth conditioning, which bounds achievable ATE here;
        # full-resolution sequences are proportionally tighter.
        assert res["rmse"] < 0.20, res
