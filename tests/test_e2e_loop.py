"""End-to-end loop closure: an RGB-D rectangular circuit over a
landmark-rich plane world, re-tracing its first leg. The system must
detect the loop (BoW + consistency + fixed-scale Sim3), correct it, and
fuse the two sides (reference LoopClosing end-to-end,
/root/reference/src/LoopClosing.cc:369-556).

RGB-D rather than mono by design: on this circuit monocular scale drift
(~2x around the 24-unit loop) eventually drops tracking near the
revisit, and the relocalization that recovers it re-enters the OLD map —
creating exactly the covisibility that makes DetectLoop (correctly)
refuse the candidates as already-connected. A metric sensor keeps
tracking unbroken so the loop stays open until the detector fires —
the same reason the reference demos loop closure on KITTI stereo/TUM
RGB-D circuits.

The world uses `make_landmark_texture`: distinct random stamps per
region, so BoW place recognition has real signal (the plain noise
texture is perceptually aliased — every region scores alike — which is
a property of that world, not of the detector). The vocabulary is
trained on OTHER texture seeds, never the test world."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ygz_tpu.core import lie
from ygz_tpu.eval import ate
from ygz_tpu.matching import vocabulary
from ygz_tpu.pipeline import frame as frame_mod
from ygz_tpu.pipeline import tracking
from ygz_tpu.pipeline.system import System, RGBD
from ygz_tpu.utils.config import SlamConfig

import synthetic


def loop_config():
    cam = synthetic.CAM._replace(bf=0.3 * synthetic.CAM.fx, th_depth=35.0)
    return SlamConfig(
        camera=cam,
        fps=10.0,
        n_features=400,
        n_levels=3,
        scale_factor=1.5,
        ini_th_fast=8.0,
        min_th_fast=4.0,
        cache_features=60,
        init_min_matches=50,
        max_keyframes=64,
        max_map_points=4096,
        vocab_k=8,
        vocab_L=3,
        detect_cell=8,
        detect_per_cell=3,
    )


def train_world_vocab(cfg):
    """Train a vocabulary on landmark worlds with DIFFERENT seeds from
    the test world (the reference ships ORBvoc trained on unrelated
    imagery; same discipline here). Cached on disk keyed by the vocab
    shape — training renders 18 frames and is the loop fixtures'
    dominant fixed cost."""
    import os
    from ygz_tpu.matching.vocabulary import Vocabulary
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(__file__), ".fixture_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"vocab_k{cfg.vocab_k}_L{cfg.vocab_L}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return Vocabulary(k=int(z["k"]), L=int(z["L"]),
                          node_desc=jnp.asarray(z["node_desc"]),
                          word_idf=jnp.asarray(z["word_idf"]))
    vocab = _train_world_vocab_uncached(cfg)
    np.savez(path, k=vocab.k, L=vocab.L,
             node_desc=np.asarray(vocab.node_desc),
             word_idf=np.asarray(vocab.word_idf))
    return vocab


def _train_world_vocab_uncached(cfg):
    descs = []
    for seed in (5, 6, 7):
        tex = synthetic.make_landmark_texture(seed)
        for k, (ts, T_cw) in enumerate(
                synthetic.orbit_trajectory(6, dt=0.2)):
            img = synthetic.render(tex, T_cw, seed=seed, fg_landmarks=True)
            fr = frame_mod.make_frame(img, k, ts, cfg)
            fr = frame_mod.extract_features(fr, cfg)
            d = np.asarray(fr.desc)[np.asarray(fr.feat_mask)]
            descs.append(d)
    descs = np.concatenate(descs)
    return vocabulary.train_vocabulary(descs, k=cfg.vocab_k, L=cfg.vocab_L,
                                       seed=0)


@pytest.fixture(scope="module")
def loop_run():
    cfg = loop_config()
    vocab = train_world_vocab(cfg)
    tex = synthetic.make_landmark_texture(0)
    traj_gt = synthetic.circuit_trajectory(
        300, width=6.0, height=4.0, overlap=0.75)
    sys = System(cfg, vocab=vocab, sensor=RGBD, use_loop_closing=True)
    states = []
    for ts, T_cw in traj_gt:
        img, depth = synthetic.render_with_depth(tex, T_cw, seed=0,
                                                 fg_landmarks=True)
        sys.track_rgbd(img, depth, ts)
        states.append(sys.tracker.state)
    return cfg, sys, traj_gt, states


class TestEndToEndLoop:
    def test_tracks_circuit(self, loop_run):
        cfg, sys, traj_gt, states = loop_run
        assert tracking.OK in states
        first_ok = states.index(tracking.OK)
        after = states[first_ok:]
        frac_ok = sum(1 for s in after if s == tracking.OK) / len(after)
        assert frac_ok > 0.85, f"tracking dropped: {frac_ok:.2f}"

    def test_loop_closed(self, loop_run):
        cfg, sys, traj_gt, states = loop_run
        assert sys.loop_closer.n_loops >= 1, \
            "no loop accepted over a ground-truth loop trajectory"

    def test_cross_loop_covisibility(self, loop_run):
        """SearchAndFuse must create observations linking the loop's two
        sides: some map point observed both by an early KF and a late
        one."""
        cfg, sys, traj_gt, states = loop_run
        if sys.loop_closer.n_loops == 0:
            pytest.skip("no loop accepted")
        ms = sys.tracker.ms
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

    def test_trajectory_accuracy(self, loop_run):
        cfg, sys, traj_gt, states = loop_run
        est = sys.get_trajectory()
        gt = [(ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T))))
              for ts, T in traj_gt]
        res = ate.ate_rmse(est, gt, with_scale=True, max_dt=0.05)
        assert res["n_pairs"] >= 180
        # metric sensor: scale must hold near 1 and the closed loop must
        # keep the ATE small relative to the 6x4-unit circuit
        assert abs(res["scale"] - 1.0) < 0.1, res
        res6 = ate.ate_rmse(est, gt, with_scale=False, max_dt=0.05)
        assert res6["rmse"] < 0.35, res6
