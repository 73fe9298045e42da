"""Auxiliary subsystem tests: map checkpoint/restore, offline viewer,
config parsing, trajectory export formats."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.pipeline.system import System, RGBD
from ygz_tpu.utils import checkpoint, viewer
from ygz_tpu.utils.config import load_config

import synthetic
from test_e2e_stereo_rgbd import stereo_config


@pytest.fixture(scope="module")
def small_map(tmp_path_factory):
    cfg = stereo_config()
    tex = synthetic.make_texture(7)
    traj = synthetic.orbit_trajectory(8)
    sys_ = System(cfg, sensor=RGBD, use_loop_closing=False)
    frames = []
    for ts, T_cw in traj:
        img, depth = synthetic.render_with_depth(tex, T_cw, seed=7)
        sys_.track_rgbd(img, depth, ts)
        frames.append(sys_.tracker.last_frame)
    return cfg, sys_, frames


class TestCheckpoint:
    def test_save_load_roundtrip(self, small_map, tmp_path):
        cfg, sys_, frames = small_map
        p = str(tmp_path / "map.npz")
        checkpoint.save_map(p, sys_.tracker)
        assert os.path.getsize(p) > 1000

        sys2 = System(cfg, sensor=RGBD, use_loop_closing=False)
        checkpoint.load_map(p, sys2.tracker)
        assert sys2.tracker.n_kf == sys_.tracker.n_kf
        np.testing.assert_array_equal(np.asarray(sys2.tracker.ms.mp_mask),
                                      np.asarray(sys_.tracker.ms.mp_mask))
        np.testing.assert_allclose(np.asarray(sys2.tracker.ms.kf_t),
                                   np.asarray(sys_.tracker.ms.kf_t))

    def test_relocalize_in_loaded_map(self, small_map, tmp_path):
        """Localization-only mode against a restored map: a frame from the
        mapped area must relocalize."""
        cfg, sys_, frames = small_map
        p = str(tmp_path / "map2.npz")
        checkpoint.save_map(p, sys_.tracker)
        sys2 = System(cfg, sensor=RGBD, use_loop_closing=False)
        checkpoint.load_map(p, sys2.tracker)
        sys2.activate_localization_mode()
        tex = synthetic.make_texture(7)
        traj = synthetic.orbit_trajectory(8)
        ts, T_cw = traj[3]
        img, depth = synthetic.render_with_depth(tex, T_cw, seed=7)
        T = sys2.track_rgbd(img, depth, 100.0)
        from ygz_tpu.pipeline import tracking
        assert sys2.tracker.state == tracking.OK
        from ygz_tpu.core import lie
        err = lie.se3_log(lie.se3_compose(T, lie.se3_inverse(T_cw)))
        # ~30 pose-opt inliers at 128x96 put the floor near 0.05-0.08;
        # the semantic bar is "relocalized in the right place"
        assert float(jnp.linalg.norm(err)) < 0.12


class TestViewer:
    def test_draw_map(self, small_map, tmp_path):
        cfg, sys_, frames = small_map
        p = str(tmp_path / "map.png")
        viewer.draw_map(sys_.tracker, p)
        assert os.path.getsize(p) > 5000

    def test_draw_frame(self, small_map, tmp_path):
        cfg, sys_, frames = small_map
        p = str(tmp_path / "frame.png")
        viewer.draw_frame(frames[-1], p)
        assert os.path.getsize(p) > 5000


class TestConfig:
    def test_parse_reference_yaml(self, tmp_path):
        y = tmp_path / "test.yaml"
        y.write_text("""%YAML:1.0
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.k1: -0.28340811
Camera.k2: 0.07395907
Camera.p1: 0.00019359
Camera.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.bf: 47.90639384423901
Camera.RGB: 1
ThDepth: 35
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
Tracking.CacheFeatures: 150
LocalMapping.LocalWindowSize: 10
bUseIMU: 1
test.VINSInitTime: 15.0
Camera.Tbc: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
          0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
          -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
          0.0, 0.0, 0.0, 1.0]
""")
        cfg = load_config(str(y))
        assert abs(cfg.camera.fx - 458.654) < 1e-6
        assert cfg.n_features == 1000
        assert cfg.use_imu
        assert cfg.Tbc is not None and cfg.Tbc.shape == (4, 4)
        assert abs(cfg.Tbc[1, 0] - 0.999557249008) < 1e-9
        assert cfg.camera.has_distortion


class TestLiveViewer:
    def test_serves_dashboard_and_renders(self, small_map):
        """Live viewer: server comes up, dashboard + stats respond, and a
        map render appears after an update."""
        import json
        import time
        import urllib.request

        from ygz_tpu.utils.live_viewer import LiveViewer

        cfg, sys_, frames = small_map
        v = LiveViewer(port=0, period=0.1)   # port 0: OS-assigned
        port = v._httpd.server_address[1]
        v.start()
        try:
            v.update(sys_.tracker, frames[-1])
            html = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5).read()
            assert b"ygz_tpu" in html
            deadline = time.time() + 30
            stats = {}
            while time.time() < deadline:
                stats = json.loads(urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats.json", timeout=5).read())
                if stats.get("n_kf"):
                    break
                time.sleep(0.2)
            assert stats.get("n_kf", 0) >= 1, stats
            deadline = time.time() + 30
            png = b""
            while time.time() < deadline:
                try:
                    png = urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/map.png", timeout=5).read()
                    break
                except Exception:
                    time.sleep(0.2)
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            v.stop()

    def test_interactive_controls(self, small_map):
        """/control: follow toggles immediately; localization + reset
        queue and apply on the tracking thread's next update() — the
        reference Viewer's menuFollowCamera / menuLocalizationMode /
        menuReset controls (/root/reference/src/Viewer.cc:49-206)."""
        import json
        import urllib.request

        from ygz_tpu.utils.live_viewer import LiveViewer

        cfg, sys_, frames = small_map
        v = LiveViewer(port=0, period=10.0, system=sys_)
        port = v._httpd.server_address[1]
        v.start()
        try:
            def ctl(cmd):
                return json.loads(urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/control?cmd={cmd}",
                    timeout=5).read())

            s = ctl("follow")
            assert s["follow"] is True
            s = ctl("localization")
            assert s["localization"] is True      # pending state shown
            assert not sys_.localization_only     # not yet applied
            v.update(sys_.tracker, frames[-1])    # tracking-thread tick
            assert sys_.localization_only
            assert sys_.tracker.localization_only
            n_kf_before = sys_.tracker.n_kf
            assert n_kf_before >= 1
            ctl("reset")
            v.update(sys_.tracker, frames[-1])
            assert sys_.tracker.n_kf == 0         # map wiped by reset
        finally:
            v.stop()


class TestShippedConfigs:
    def test_all_dataset_yamls_parse(self):
        """Every YAML in configs/ must parse into a coherent SlamConfig
        (mirrors the reference's Examples/*/*.yaml contract)."""
        import glob
        import os
        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
        assert len(paths) >= 10, paths
        for p in paths:
            cfg = load_config(p)
            assert cfg.camera.fx > 0 and cfg.camera.fy > 0, p
            assert cfg.camera.width > 0 and cfg.camera.height > 0, p
            assert cfg.n_features >= 500, p
            assert cfg.fps > 0, p
            if "stereo" in p or "rgbd" in p:
                assert cfg.camera.bf > 0 or cfg.depth_map_factor > 0, p
            if "_vi" in p:
                assert cfg.use_imu and cfg.Tbc is not None, p


class TestCapacityGrowth:
    def test_keyframe_capacity_growth(self):
        """Outgrowing max_keyframes triggers a power-of-two MapState
        rebuild instead of silently refusing keyframes."""
        import dataclasses as dc
        import jax.numpy as jnp
        from ygz_tpu.pipeline import mapstate
        from ygz_tpu.pipeline.tracking import Tracker
        from ygz_tpu.matching import vocabulary

        cfg = stereo_config()
        cfg = dc.replace(cfg, max_keyframes=4, max_map_points=512)
        vocab = vocabulary.train_vocabulary(
            np.random.RandomState(0).randint(
                0, 2**32, (256, 8)).astype(np.uint32),
            k=cfg.vocab_k, L=cfg.vocab_L)
        tr = Tracker(cfg, vocab)
        for i in range(6):
            slot = tr.alloc_kf_slot()
            tr.n_kf += 1
            assert slot == i
        assert cfg.max_keyframes == 8
        assert tr.ms.kf_q.shape[0] == 8
        # mp growth
        taken = tr.alloc_mp_slots(600)
        assert len(taken) == 600
        assert cfg.max_map_points == 1024
        assert tr.ms.mp_pos.shape[0] == 1024
