"""Long-sequence e2e: 1000 frames, two laps of the landmark circuit,
RGB-D, loop closing ON, with deliberately small initial capacities so
the run crosses keyframe AND map-point growth boundaries inside the full
System (reference KITTI-scale runs, /root/reference/Examples/Stereo/
stereo_kitti.cc, seq 00 ~4500 frames with unbounded heap maps; the
TPU-native design grows padded pytrees by power-of-two rebuilds and must
survive that moment — every jitted program retraces at the new shapes —
without dropping tracking).

Asserted here:
  * tracking holds across both laps and across every growth boundary
  * capacity growth actually happened (the point of the fixture)
  * recompiles stay bounded: the fused tracking step retraces O(log N)
    times (once per capacity bucket), not per-frame
  * loop closing fires on the revisit and the final ATE stays metric
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ygz_tpu.core import lie
from ygz_tpu.eval import ate
from ygz_tpu.pipeline import fused_track, tracking
from ygz_tpu.pipeline.system import System, RGBD

import synthetic
from test_e2e_loop import loop_config, train_world_vocab

N_FRAMES = 1000
LAPS = 2.0


@pytest.fixture(scope="module")
def long_run():
    import dataclasses
    cfg = dataclasses.replace(
        loop_config(),
        # small initial capacities: the run MUST outgrow them
        max_keyframes=24, max_map_points=1536)
    vocab = train_world_vocab(cfg)
    tex = synthetic.make_landmark_texture(0)
    traj_gt = synthetic.multi_lap_trajectory(
        N_FRAMES, laps=LAPS, width=6.0, height=4.0)
    sys = System(cfg, vocab=vocab, sensor=RGBD, use_loop_closing=True)

    compiles_before = fused_track.fused_direct_step._cache_size()
    states, kf_caps, mp_caps = [], [], []
    for ts, T_cw in traj_gt:
        img, depth = synthetic.render_with_depth(tex, T_cw, seed=0,
                                                 fg_landmarks=True)
        sys.track_rgbd(img, depth, ts)
        states.append(sys.tracker.state)
        kf_caps.append(cfg.max_keyframes)
        mp_caps.append(cfg.max_map_points)
    compiles_after = fused_track.fused_direct_step._cache_size()
    return (cfg, sys, traj_gt, states, kf_caps, mp_caps,
            compiles_after - compiles_before)


class TestLongSequence:
    def test_tracks_throughout(self, long_run):
        cfg, sys, traj_gt, states, kf_caps, mp_caps, d_compiles = long_run
        assert tracking.OK in states
        first_ok = states.index(tracking.OK)
        after = states[first_ok:]
        frac_ok = sum(1 for s in after if s == tracking.OK) / len(after)
        assert frac_ok > 0.85, f"tracking dropped: {frac_ok:.2f}"
        assert sys.tracker.state == tracking.OK

    def test_growth_crossed(self, long_run):
        cfg, sys, traj_gt, states, kf_caps, mp_caps, d_compiles = long_run
        assert cfg.max_keyframes > 24, "KF capacity never grew"
        assert cfg.max_map_points > 1536, "MP capacity never grew"

    def test_no_loss_at_growth_boundary(self, long_run):
        """The retrace-everything moment must not drop tracking."""
        cfg, sys, traj_gt, states, kf_caps, mp_caps, d_compiles = long_run
        boundaries = [i for i in range(1, len(kf_caps))
                      if kf_caps[i] != kf_caps[i - 1]
                      or mp_caps[i] != mp_caps[i - 1]]
        assert boundaries, "no growth boundary recorded"
        for b in boundaries:
            window = states[b:b + 5]
            assert tracking.OK in window, \
                f"tracking lost at growth boundary (frame {b})"

    def test_recompiles_bounded(self, long_run):
        """O(log N) retraces: one per capacity bucket, not per frame."""
        cfg, sys, traj_gt, states, kf_caps, mp_caps, d_compiles = long_run
        n_buckets = len({(k, m) for k, m in zip(kf_caps, mp_caps)})
        assert d_compiles <= n_buckets + 1, \
            f"{d_compiles} fused-step compiles for {n_buckets} buckets"

    def test_loop_closed_and_metric(self, long_run):
        cfg, sys, traj_gt, states, kf_caps, mp_caps, d_compiles = long_run
        assert sys.loop_closer.n_loops >= 1
        est = sys.get_trajectory()
        gt = [(ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T))))
              for ts, T in traj_gt]
        res = ate.ate_rmse(est, gt, with_scale=True, max_dt=0.05)
        assert res["n_pairs"] >= 600
        assert abs(res["scale"] - 1.0) < 0.1, res
        res6 = ate.ate_rmse(est, gt, with_scale=False, max_dt=0.05)
        assert res6["rmse"] < 0.5, res6
