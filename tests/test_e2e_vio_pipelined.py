"""Pipelined VIO must not be second-class: after VI init the fused VI
step (one device program per frame, gates resolved pipeline_depth frames
late) must track the same trajectory family as the synchronous cascade,
keep the KF preintegration chain contiguous despite lagged keyframe
decisions, and recover metric scale.

Reference hot path being pipelined: PredictNavStateByIMU + TrackWithIMU
(/root/reference/src/Tracking.cc:1994-2105); the deferred-gate design is
the TPU-native analogue of the reference's tracking/mapping threads.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ygz_tpu.core import lie
from ygz_tpu.eval.ate import horn_align
from ygz_tpu.pipeline import tracking
from ygz_tpu.pipeline.system import System

import synthetic
from test_e2e_mono import small_config
from test_imu import simulate_trajectory, DT

FPS = 10
STEPS_PER_FRAME = int(round(1.0 / FPS / DT))


def _run(pipelined, depth=4, n_frames=100):
    cfg = dataclasses.replace(small_config(), use_imu=True,
                              vins_init_time=8.0, fps=float(FPS),
                              gravity=9.81)
    n_steps = n_frames * STEPS_PER_FRAME + 1
    P, V, qs, imu = simulate_trajectory(n_steps, seed=11, amp=0.5,
                                        rot_amp=0.35)
    tex = synthetic.make_texture(3)
    sys_ = System(cfg, use_loop_closing=False, pipelined=pipelined,
                  pipeline_depth=depth)
    for i in range(n_frames):
        k = i * STEPS_PER_FRAME
        T_wb = {"q": jnp.asarray(qs[k]), "t": jnp.asarray(P[k])}
        img = synthetic.render(tex, lie.se3_inverse(T_wb))
        rows = None
        if i > 0:
            a, b = (i - 1) * STEPS_PER_FRAME, k
            rows = np.concatenate(
                [np.full((b - a, 1), DT, np.float32), imu[a:b, 1:7]],
                axis=1)
        sys_.track_mono_vi(img, rows, i / FPS)
    sys_.tracker.flush_pipeline()
    return sys_, P, qs


@pytest.fixture(scope="module")
def pipe_run():
    return _run(pipelined=True)


@pytest.fixture(scope="module")
def sync_run():
    return _run(pipelined=False)


class TestVioPipelined:
    def test_inits_and_tracks(self, pipe_run):
        sys_, P, qs = pipe_run
        tr = sys_.tracker
        assert tr.vins_inited, "VI init never fired in pipelined mode"
        assert tr.state == tracking.OK
        n_lost = sum(1 for r in tr.trajectory if r.get("lost"))
        assert n_lost < 15

    def test_fused_path_actually_used(self, pipe_run):
        """The run must have streamed post-init frames through the fused
        VI step, not silently fallen back to the sync cascade."""
        from ygz_tpu.utils import timing
        sys_, _, _ = pipe_run
        # the pipeline saw traffic: pending machinery engaged at least
        # once and the tracker holds fused-step products
        assert getattr(sys_.tracker, "_last_good", None) is not None
        assert sys_.tracker.last_frame.vio_ns is not None

    def test_preintegration_chain_contiguous(self, pipe_run):
        """Lagged KF decisions must not leak IMU rows across gap
        boundaries: each KF's preintegration duration still matches its
        timestamp gap (the frame-id-keyed ledger split)."""
        sys_, _, _ = pipe_run
        tr = sys_.tracker
        ts = np.asarray(tr.ms.kf_timestamp)
        assert len(tr.kf_order) >= 5
        for a, b in zip(tr.kf_order[:-1], tr.kf_order[1:]):
            gap = float(ts[b] - ts[a])
            pdt = float(tr.kf_pre[b].dt)
            assert abs(gap - pdt) < 2e-2, (a, b, gap, pdt)

    def test_metric_scale_parity(self, pipe_run, sync_run):
        """Horn scale vs ground truth must stay in the sync path's
        family (|s-1| < 0.15; sync asserts 0.12 on this fixture)."""
        for sys_, P, qs in (pipe_run,):
            tr = sys_.tracker
            ms = tr.ms
            ts = np.asarray(ms.kf_timestamp)
            est, gt = [], []
            for k in tr.kf_order:
                fidx = int(round(ts[k] * FPS)) * STEPS_PER_FRAME
                T_wc = lie.se3_inverse({"q": ms.kf_q[k], "t": ms.kf_t[k]})
                est.append(np.asarray(T_wc["t"]))
                gt.append(P[fidx])
            est, gt = np.stack(est), np.stack(gt)
            s, R, t = horn_align(est, gt, with_scale=True)
            assert abs(s - 1.0) < 0.15, f"pipelined metric scale: {s:.3f}"

    def test_trajectory_parity(self, pipe_run, sync_run):
        """Post-init RMSE (metric Horn-aligned, no scale fit) of the
        pipelined run stays within 2x of the sync run's."""
        def post_init_rmse(sys_, P):
            tr = sys_.tracker
            est, gt = [], []
            for ts_i, T_cw in sys_._frame_poses():
                fidx = int(round(ts_i * FPS)) * STEPS_PER_FRAME
                if fidx >= len(P):
                    continue
                T_wc = lie.se3_inverse(T_cw)
                est.append(np.asarray(T_wc["t"]))
                gt.append(P[fidx])
            est, gt = np.stack(est), np.stack(gt)
            s, R, t = horn_align(est, gt, with_scale=True)
            err = (s * est @ R.T + t) - gt
            return float(np.sqrt((err ** 2).sum(1).mean()))
        s_p, P, _ = pipe_run
        s_s, P2, _ = sync_run
        r_pipe = post_init_rmse(s_p, P)
        r_sync = post_init_rmse(s_s, P2)
        assert r_pipe < max(2.0 * r_sync, 0.08), (r_sync, r_pipe)
