"""End-to-end MONOCULAR loop closure — the scale-correcting 7-DoF path.

The reference's flagship global-consistency feature is monocular loop
closure with a Sim3 whose scale is FREE (bFixScale=false,
/root/reference/src/LoopClosing.cc:231; ComputeSim3 :218-368; 7-DoF
OptimizeEssentialGraph, /root/reference/src/Optimizer.cc:2157-2407) —
monocular odometry drifts in scale, and s != 1 is the entire point of
using Sim3 rather than SE3. This test drives a mono camera around a
drift-budgeted landmark circuit sized so tracking survives to the
revisit (a larger 6x4 circuit accumulates enough drift to lose tracking
before the detector can fire — measured; 5x3.5 keeps ~98% of frames
tracked), lets the detector + Sim3 solver close the loop, and asserts

  * the loop closed with a genuinely non-unit corrective scale,
  * the corrective scale agrees with the independently measured
    pre-correction scale drift (est/gt inter-KF distance ratio), and
  * the Sim3-aligned KF ATE improves over the pre-correction snapshot
    (recorded by LoopClosing.last_precorrection, so no second loop-less
    run of the sequence is needed).

The vocabulary is trained on OTHER texture seeds than the test world
(same discipline as the RGB-D loop e2e)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ygz_tpu.core import lie
from ygz_tpu.pipeline import tracking
from ygz_tpu.pipeline.system import System

import synthetic
from test_e2e_loop import loop_config, train_world_vocab


def mono_loop_config():
    cfg = loop_config()
    # mono: no stereo baseline, no depth — Sim3 scale must stay free
    cfg.camera = synthetic.CAM
    # denser KF cadence: the consistency check needs >= 4 consecutive
    # detecting KF events over the revisit segment (reference
    # mnCovisibilityConsistencyTh=3, counters starting at 0), BEFORE
    # direct tracking re-finds the old points and covisibility excludes
    # the loop candidates. The r4 reference-faithful weak trigger
    # (inliers < 0.9 * nRefMatches) goes quiet on this noise-free
    # synthetic world — on real data drift keeps it firing — so the
    # fixture leans on the reference's OTHER trigger leg: the c1a
    # max-gap (mMaxFrames = fps, Tracking.cc:1389), lowered via fps.
    cfg.fps = 5.0
    return cfg


@pytest.fixture(scope="module")
def mono_loop_run():
    cfg = mono_loop_config()
    vocab = train_world_vocab(cfg)
    tex = synthetic.make_landmark_texture(0)
    traj_gt = synthetic.circuit_trajectory(
        260, width=5.0, height=3.5, overlap=0.75)
    slam = System(cfg, vocab=vocab, use_loop_closing=True)
    states = []
    for ts, T_cw in traj_gt:
        img = synthetic.render(tex, T_cw, seed=0, fg_landmarks=True)
        slam.track_monocular(img, ts)
        states.append(slam.tracker.state)
    return cfg, slam, traj_gt, states


def _kf_est_gt(kf_q, kf_t, kf_mask, kf_ts, traj_gt):
    """Time-ordered (est, gt) KF camera centers."""
    gt_pos = {round(float(ts), 4): np.asarray(lie.se3_inverse(T)["t"])
              for ts, T in traj_gt}
    alive = np.where(kf_mask)[0]
    order = alive[np.argsort(kf_ts[alive])]
    est, gt, used = [], [], []
    for k in order:
        key = round(float(kf_ts[k]), 4)
        if key not in gt_pos:
            continue
        T_wc = lie.se3_inverse({"q": kf_q[k], "t": kf_t[k]})
        est.append(np.asarray(T_wc["t"]))
        gt.append(gt_pos[key])
        used.append(k)
    return np.stack(est), np.stack(gt), used


def _sim3_ate(est, gt):
    from ygz_tpu.eval.ate import horn_align
    s, R, t = horn_align(est, gt, with_scale=True)
    resid = (s * (R @ est.T)).T + t - gt
    return float(np.sqrt((resid ** 2).sum(-1).mean())), s


class TestEndToEndLoopMono:
    def test_tracks_circuit(self, mono_loop_run):
        cfg, slam, traj_gt, states = mono_loop_run
        first_ok = states.index(tracking.OK)
        after = states[first_ok:]
        frac = sum(1 for s in after if s == tracking.OK) / len(after)
        assert frac > 0.85, f"tracking dropped: {frac:.2f}"

    def test_mono_loop_closed_with_scale(self, mono_loop_run):
        """A loop fired, and its corrective Sim3 carried a genuinely
        non-unit scale (the 7-DoF path the mode exists for)."""
        cfg, slam, traj_gt, states = mono_loop_run
        lc = slam.loop_closer
        assert lc.n_loops >= 1, "no loop accepted on a ground-truth loop"
        s = lc.last_sim3_scale
        assert abs(np.log(s)) > 0.03, \
            f"corrective Sim3 scale {s:.4f} is ~1: scale path not exercised"

    def test_sim3_scale_matches_measured_drift(self, mono_loop_run):
        """The recovered corrective scale must agree with the
        independently measured drift: the ratio of (est/gt inter-KF
        distance) around the loop KF vs around the current KF in the
        PRE-correction snapshot."""
        cfg, slam, traj_gt, states = mono_loop_run
        lc = slam.loop_closer
        if lc.n_loops == 0:
            pytest.skip("no loop accepted")
        pre = lc.last_precorrection
        est, gt, used = _kf_est_gt(pre["kf_q"], pre["kf_t"],
                                   pre["kf_mask"], pre["kf_timestamp"],
                                   traj_gt)
        cur, loop = lc.last_loop_pair

        def local_scale(slot):
            i = used.index(slot)
            lo, hi = max(0, i - 3), min(len(used) - 1, i + 3)
            de = np.linalg.norm(np.diff(est[lo:hi + 1], axis=0), axis=1)
            dg = np.linalg.norm(np.diff(gt[lo:hi + 1], axis=0), axis=1)
            return float(de.sum() / max(dg.sum(), 1e-9))

        # the Sim3 solves X_cur ~ s R X_loop + t over 3D-3D pairs, with
        # each side's points expressed at ITS neighborhood's drifted map
        # scale — so s ~ scale(cur region) / scale(loop region), each
        # measured independently against ground truth
        drift = local_scale(cur) / local_scale(loop)
        s = lc.last_sim3_scale
        # x1.1 agreement band: tightened from x1.2 once the Sim3 estimate
        # stopped being the raw RANSAC Horn (r4: SearchBySim3 +
        # OptimizeSim3 refinement, reference LoopClosing.cc:291-320)
        assert abs(np.log(s) - np.log(drift)) < np.log(1.1), \
            f"sim3 scale {s:.3f} vs measured drift {drift:.3f}"

    def test_accuracy_improves_over_precorrection(self, mono_loop_run):
        """Sim3-aligned KF ATE after the correction + essential graph +
        GBA beats the pre-correction map."""
        cfg, slam, traj_gt, states = mono_loop_run
        lc = slam.loop_closer
        if lc.n_loops == 0:
            pytest.skip("no loop accepted")
        pre = lc.last_precorrection
        est0, gt0, _ = _kf_est_gt(pre["kf_q"], pre["kf_t"],
                                  pre["kf_mask"], pre["kf_timestamp"],
                                  traj_gt)
        ate0, _ = _sim3_ate(est0, gt0)
        ms = slam.tracker.ms
        est1, gt1, _ = _kf_est_gt(
            np.asarray(ms.kf_q), np.asarray(ms.kf_t),
            np.asarray(ms.kf_mask), np.asarray(ms.kf_timestamp), traj_gt)
        ate1, s1 = _sim3_ate(est1, gt1)
        assert ate1 < ate0, (ate1, ate0)
        # absolute quality: a closed 5x3.5 circuit should be accurate to
        # a few % of its span after global correction
        span = np.linalg.norm(gt1 - gt1.mean(0), axis=1).max()
        assert ate1 < 0.06 * span, (ate1, span)

    def test_cross_loop_fusion(self, mono_loop_run):
        """SearchAndFuse created observations linking the loop's sides."""
        cfg, slam, traj_gt, states = mono_loop_run
        if slam.loop_closer.n_loops == 0:
            pytest.skip("no loop accepted")
        ms = slam.tracker.ms
        kf_mask = np.asarray(ms.kf_mask)
        fid = np.asarray(ms.kf_frame_id)
        alive = np.where(kf_mask)[0]
        order = alive[np.argsort(fid[alive])]
        early = set(order[:len(order) // 3].tolist())
        late = set(order[-len(order) // 4:].tolist())
        mp_idx = np.asarray(ms.kf_mp_idx)
        early_pts = set()
        for k in early:
            early_pts.update(mp_idx[k][mp_idx[k] >= 0].tolist())
        n_shared = 0
        for k in late:
            n_shared += len(early_pts & set(
                mp_idx[k][mp_idx[k] >= 0].tolist()))
        assert n_shared >= 10, \
            f"loop sides not fused: {n_shared} shared observations"
