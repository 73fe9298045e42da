"""End-to-end stereo and RGB-D SLAM on the synthetic 3D world: both
sensors give metric depth, so the trajectory must be accurate WITHOUT
scale alignment (unlike mono) and initialization must be immediate."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from ygz_tpu.core import lie
from ygz_tpu.eval import ate
from ygz_tpu.pipeline import tracking
from ygz_tpu.pipeline.system import System, RGBD, STEREO

import synthetic
from test_e2e_mono import small_config

BASELINE = 0.3


def stereo_config():
    cfg = small_config()
    cam = cfg.camera._replace(bf=BASELINE * cfg.camera.fx, th_depth=35.0)
    return dataclasses.replace(cfg, camera=cam)


@pytest.fixture(scope="module")
def rgbd_run():
    cfg = stereo_config()
    tex = synthetic.make_texture(5)
    traj_gt = synthetic.orbit_trajectory(30)
    sys_ = System(cfg, sensor=RGBD, use_loop_closing=False)
    gt = []
    for ts, T_cw in traj_gt:
        img, depth = synthetic.render_with_depth(tex, T_cw, seed=5)
        sys_.track_rgbd(img, depth, ts)
        gt.append((ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T_cw)))))
    return cfg, sys_, gt


@pytest.fixture(scope="module")
def stereo_run():
    cfg = stereo_config()
    tex = synthetic.make_texture(6)
    traj_gt = synthetic.orbit_trajectory(30)
    sys_ = System(cfg, sensor=STEREO, use_loop_closing=False)
    gt = []
    for ts, T_cw in traj_gt:
        left, right = synthetic.render_stereo(tex, T_cw, BASELINE, seed=6)
        sys_.track_stereo(left, right, ts)
        gt.append((ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T_cw)))))
    return cfg, sys_, gt


class TestRGBD:
    def test_immediate_initialization(self, rgbd_run):
        cfg, sys_, gt = rgbd_run
        # depth sensors initialize on the first frame, no baseline needed
        first_ok = next(i for i, r in enumerate(sys_.tracker.trajectory)
                        if not r.get("lost"))
        assert first_ok == 0

    def test_metric_trajectory(self, rgbd_run):
        cfg, sys_, gt = rgbd_run
        est = sys_.get_trajectory()
        res = ate.ate_rmse(est, gt, with_scale=False, max_dt=0.05)
        assert res["n_pairs"] >= 25
        # metric (SE3-aligned, no scale): depth is direct so cm-accuracy
        assert res["rmse"] < 0.06, res
        res7 = ate.ate_rmse(est, gt, with_scale=True, max_dt=0.05)
        assert abs(res7["scale"] - 1.0) < 0.05, res7

    def test_stays_ok(self, rgbd_run):
        cfg, sys_, gt = rgbd_run
        assert sys_.tracker.state == tracking.OK


class TestStereo:
    def test_tracks_and_metric(self, stereo_run):
        cfg, sys_, gt = stereo_run
        assert sys_.tracker.state == tracking.OK
        est = sys_.get_trajectory()
        res = ate.ate_rmse(est, gt, with_scale=False, max_dt=0.05)
        assert res["n_pairs"] >= 25
        # stereo depth is SAD-matched (noisier than RGB-D) but still metric
        assert res["rmse"] < 0.12, res
        res7 = ate.ate_rmse(est, gt, with_scale=True, max_dt=0.05)
        assert abs(res7["scale"] - 1.0) < 0.1, res7


class TestDistortion:
    """The frame pipeline must undistort real lenses (reference remaps the
    whole image via cached grids, /root/reference/src/Frame.cc:773-805).
    Renders through a distorting camera at EuRoC magnitude (k1=-0.28) and
    checks the metric e2e bound still holds — which it cannot without the
    undistortion remap (geometry would be systematically bent)."""

    def test_rgbd_with_euroc_magnitude_distortion(self):
        cfg = stereo_config()
        cam = cfg.camera._replace(k1=-0.28, k2=0.07)
        cfg = dataclasses.replace(cfg, camera=cam)
        tex = synthetic.make_texture(7)
        traj_gt = synthetic.orbit_trajectory(20)
        sys_ = System(cfg, sensor=RGBD, use_loop_closing=False)
        gt = []
        for ts, T_cw in traj_gt:
            img, depth = synthetic.render_with_depth(tex, T_cw, cam=cam,
                                                     seed=7)
            sys_.track_rgbd(img, depth, ts)
            gt.append((ts, np.asarray(lie.se3_matrix(lie.se3_inverse(T_cw)))))
        assert sys_.tracker.state == tracking.OK
        est = sys_.get_trajectory()
        res = ate.ate_rmse(est, gt, with_scale=False, max_dt=0.05)
        assert res["n_pairs"] >= 16
        assert res["rmse"] < 0.08, res
        res7 = ate.ate_rmse(est, gt, with_scale=True, max_dt=0.05)
        assert abs(res7["scale"] - 1.0) < 0.06, res7

    def test_undistort_map_roundtrip(self):
        """undistort(distort(x)) == x on the normalized grid."""
        from ygz_tpu.core import camera as camera_mod
        cam = synthetic.CAM._replace(k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4)
        rng = np.random.RandomState(0)
        xn = jnp.asarray(rng.uniform(-0.5, 0.5, (256, 2)).astype(np.float32))
        xd = camera_mod.distort_normalized(cam, xn)
        back = camera_mod.undistort_normalized(cam, xd)
        assert float(jnp.max(jnp.abs(back - xn))) < 1e-4
