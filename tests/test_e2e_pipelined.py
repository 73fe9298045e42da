"""Pipelined (deferred-gate) tracking must not be second-class: same
keyframe decisions and trajectory quality as the synchronous path, plus
correct drop-and-recover semantics when a frame fails mid-stream.

The pipelined mode is the throughput path behind the system benchmark
(the TPU-native analogue of the reference's tracking/mapping thread
decoupling, /root/reference/src/Tracking.cc + LocalMapping.cc run as
threads); its gate decisions land one frame late, which must not change
WHAT is decided — only when."""

import numpy as np
import pytest

from ygz_tpu.core import lie
from ygz_tpu.eval import ate
from ygz_tpu.pipeline import tracking
from ygz_tpu.pipeline.system import System

import synthetic
from test_e2e_mono import small_config


def _run(pipelined, corrupt=(), n_frames=50, depth=1, fps=None):
    cfg = small_config()
    if fps is not None:
        cfg.fps = fps
    tex = synthetic.make_texture(0)
    traj_gt = synthetic.orbit_trajectory(n_frames)
    sys_ = System(cfg, use_loop_closing=False, pipelined=pipelined,
                  pipeline_depth=depth)
    rng = np.random.RandomState(0)
    states = []
    for i, (ts, T_cw) in enumerate(traj_gt):
        img = synthetic.render(tex, T_cw)
        if i in corrupt:
            img = (rng.rand(*np.asarray(img).shape) * 255.0).astype(
                np.float32)
        sys_.track_monocular(np.asarray(img), ts)
        states.append(sys_.tracker.state)
    sys_.tracker.flush_pipeline()
    return cfg, sys_, traj_gt, states


@pytest.fixture(scope="module")
def sync_run():
    return _run(pipelined=False)


@pytest.fixture(scope="module")
def pipe_run():
    return _run(pipelined=True)


class TestPipelinedParity:
    def test_same_keyframes(self, sync_run, pipe_run):
        """Deferred gates decide one frame late and must decide the same
        KIND of thing: same bootstrap, same keyframe cadence, near-equal
        counts. Exact fid equality is NOT structural: the frame in flight
        during a KF insertion runs against the pre-KF candidate cache, so
        knife-edge discrete decisions (keyframe-cull redundancy, decay
        triggers) can flip and feed back into the map — precisely as the
        reference's asynchronous mapping thread makes its C++ runs
        timing-dependent (/root/reference/src/System.cc:170-171). Bounded
        divergence is the contract; trajectory quality parity is asserted
        separately in test_ate_parity."""
        _, s_sync, _, _ = sync_run
        _, s_pipe, _, _ = pipe_run
        def kf_fids(s):
            ms = s.tracker.ms
            alive = np.asarray(ms.kf_mask)
            return sorted(np.asarray(ms.kf_frame_id)[alive].tolist())
        f_sync, f_pipe = kf_fids(s_sync), kf_fids(s_pipe)
        assert abs(s_sync.tracker.n_kf - s_pipe.tracker.n_kf) <= 1, \
            (f_sync, f_pipe)
        # identical bootstrap (init KF pair is decided pre-pipeline)
        assert f_sync[:2] == f_pipe[:2]
        # comparable cadence: mean KF spacing within 50%
        sp = lambda f: np.mean(np.diff(f)) if len(f) > 1 else 0.0
        assert abs(sp(f_sync) - sp(f_pipe)) <= 0.5 * max(sp(f_sync), 1.0), \
            (f_sync, f_pipe)

    def test_same_trajectory_coverage(self, sync_run, pipe_run):
        _, s_sync, _, _ = sync_run
        _, s_pipe, _, _ = pipe_run
        n_sync = sum(1 for r in s_sync.tracker.trajectory
                     if not r.get("lost"))
        n_pipe = sum(1 for r in s_pipe.tracker.trajectory
                     if not r.get("lost"))
        assert n_pipe >= n_sync - 1   # flush records the tail frame

    def test_ate_parity(self, sync_run, pipe_run):
        gt_of = lambda traj: [
            (ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T))))
            for ts, T in traj]
        _, s_sync, traj_gt, _ = sync_run
        _, s_pipe, _, _ = pipe_run
        r_sync = ate.ate_rmse(s_sync.get_trajectory(), gt_of(traj_gt),
                              with_scale=True, max_dt=0.05)
        r_pipe = ate.ate_rmse(s_pipe.get_trajectory(), gt_of(traj_gt),
                              with_scale=True, max_dt=0.05)
        assert r_pipe["rmse"] < max(2.0 * r_sync["rmse"], 0.08), \
            (r_sync, r_pipe)


class TestPipelinedFailureRecovery:
    def test_corrupt_frames_drop_and_recover(self):
        """Garbage frames mid-stream: the deferred gate must detect the
        failure at resolve time, drop those frames from the trajectory
        (lost=True), re-track synchronously, and return to OK — the
        reference's track-failure path (Tracking.cc mState=LOST +
        Relocalization) folded into the pipeline's resolve step."""
        # corrupt AFTER the map has >5 keyframes: with <=5 the reference
        # auto-resets instead of relocalizing (Tracking.cc:619-627, our
        # System._maybe_auto_reset) and the wiped trajectory would make
        # the lost-record assertion vacuous. fps=5 doubles the long-gap
        # KF cadence so the 5-KF bar is crossed well before frame 38
        # (the reference-faithful 0.9*nRefMatches(minObs=3) weak trigger
        # fires far less often than the old all-bound-features one).
        corrupt = {38, 39}
        cfg, s, traj_gt, states = _run(pipelined=True, corrupt=corrupt,
                                       n_frames=55, fps=5.0)
        tr = s.tracker
        assert tr.state == tracking.OK, "never recovered after corruption"
        lost_ids = {r["frame_id"] for r in tr.trajectory if r.get("lost")}
        assert lost_ids & corrupt, "corrupt frames not detected as lost"
        # frames after recovery keep tracking accuracy: assert on the
        # post-corruption segment (the full-trajectory ATE is dominated
        # by the world's own drift over 55 frames — a clean run measures
        # ~0.22 — not by the recovery)
        gt = [(ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T))))
              for ts, T in traj_gt]
        post = [e for e in s.get_trajectory()
                if e[0] > traj_gt[max(corrupt)][0] + 1e-6]
        assert len(post) >= 10, "recovery produced too few tracked frames"
        res = ate.ate_rmse(post, gt, with_scale=True, max_dt=0.05)
        assert res["rmse"] < 0.15, res


class TestDeepPipeline:
    """Depth-4 batched readbacks: gate decisions land 4-8 frames late —
    by design NOT bit-identical to the sync run (same as the reference's
    mapping-thread lag). Asserted instead: tracking holds, keyframe
    density stays comparable, trajectory quality stays in family."""

    def test_depth4_tracks_and_stays_accurate(self, sync_run):
        _, s_sync, traj_gt, _ = sync_run
        cfg, s_deep, _, _ = _run(pipelined=True, depth=4)
        assert s_deep.tracker.state == tracking.OK
        n_sync, n_deep = s_sync.tracker.n_kf, s_deep.tracker.n_kf
        assert abs(n_deep - n_sync) <= max(2, n_sync // 2), \
            (n_sync, n_deep)
        gt = [(ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T))))
              for ts, T in traj_gt]
        r_sync = ate.ate_rmse(s_sync.get_trajectory(), gt,
                              with_scale=True, max_dt=0.05)
        r_deep = ate.ate_rmse(s_deep.get_trajectory(), gt,
                              with_scale=True, max_dt=0.05)
        assert r_deep["rmse"] < max(2.5 * r_sync["rmse"], 0.1), \
            (r_sync, r_deep)

    def test_depth4_corrupt_recovery(self):
        corrupt = {38, 39}
        cfg, s, traj_gt, states = _run(pipelined=True, corrupt=corrupt,
                                       n_frames=55, depth=4, fps=5.0)
        tr = s.tracker
        assert tr.state == tracking.OK, "never recovered after corruption"
        lost_ids = {r["frame_id"] for r in tr.trajectory if r.get("lost")}
        assert lost_ids & corrupt, "corrupt frames not detected as lost"

    def test_dropped_chain_rolls_back_counters(self):
        """Optimistic mp_visible/mp_found increments of DROPPED pipelined
        frames must be reverted (the culling heuristic feeds on the
        found/visible ratio): a corrupt-frame pipelined run's counters
        must match a sync run seeing the same good frames. The sync path
        never applies a failed frame's counters, so it is the oracle."""
        corrupt = {38, 39}
        _, s_sync, _, _ = _run(pipelined=False, corrupt=corrupt,
                               n_frames=55, fps=5.0)
        _, s_pipe, _, _ = _run(pipelined=True, corrupt=corrupt,
                               n_frames=55, depth=4, fps=5.0)
        v_s = np.asarray(s_sync.tracker.ms.mp_visible)
        v_p = np.asarray(s_pipe.tracker.ms.mp_visible)
        m_s = np.asarray(s_sync.tracker.ms.mp_mask)
        m_p = np.asarray(s_pipe.tracker.ms.mp_mask)
        # maps are not slot-aligned across modes (drop/recover timing
        # differs); assert on the aggregate increments, which without
        # rollback are inflated by ~n_cache x n_dropped (hundreds)
        tot_sync = int(v_s[m_s].sum())
        tot_pipe = int(v_p[m_p].sum())
        assert tot_pipe <= tot_sync * 1.35 + 50, (tot_pipe, tot_sync)
        f_s = np.asarray(s_sync.tracker.ms.mp_found)
        f_p = np.asarray(s_pipe.tracker.ms.mp_found)
        assert int(f_p[m_p].sum()) <= int(f_s[m_s].sum()) * 1.35 + 50
