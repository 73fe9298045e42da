"""App-layer smoke tests: write a small synthetic dataset to disk in TUM
format and drive it through the real CLI entry points (config YAML →
loaders → System → trajectory files → ATE CLI)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from ygz_tpu.core import lie

import synthetic
from test_e2e_stereo_rgbd import stereo_config


@pytest.fixture(scope="module")
def tum_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum_seq")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    tex = synthetic.make_texture(9)
    traj = synthetic.orbit_trajectory(12)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for ts, T_cw in traj:
        img, depth = synthetic.render_with_depth(tex, T_cw, seed=9)
        rp = f"rgb/{ts:.6f}.png"
        dp = f"depth/{ts:.6f}.png"
        Image.fromarray(img.astype(np.uint8), "L").save(str(root / rp))
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(str(root / dp))
        rgb_lines.append(f"{ts:.6f} {rp}")
        depth_lines.append(f"{ts:.6f} {dp}")
        T_wc = lie.se3_inverse(T_cw)
        t = np.asarray(T_wc["t"])
        q = np.asarray(T_wc["q"])
        gt_lines.append(f"{ts:.6f} {t[0]} {t[1]} {t[2]} "
                        f"{q[1]} {q[2]} {q[3]} {q[0]}")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

    cam = synthetic.CAM
    yaml = root / "settings.yaml"
    yaml.write_text(f"""%YAML:1.0
Camera.fx: {cam.fx}
Camera.fy: {cam.fy}
Camera.cx: {cam.cx}
Camera.cy: {cam.cy}
Camera.width: {cam.width}
Camera.height: {cam.height}
Camera.fps: 10.0
Camera.bf: {0.3 * cam.fx}
ThDepth: 35
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 300
ORBextractor.scaleFactor: 1.5
ORBextractor.nLevels: 3
ORBextractor.iniThFAST: 8
ORBextractor.minThFAST: 4
Tracking.CacheFeatures: 60
""")
    return root


class TestRgbdTumCli:
    def test_full_cli_run_and_ate(self, tum_dataset, tmp_path, capsys):
        from ygz_tpu.apps import rgbd_tum, evaluate_ate
        out = str(tmp_path / "kf.txt")
        frames_out = str(tmp_path / "frames.txt")
        rgbd_tum.main([
            "none", str(tum_dataset / "settings.yaml"), str(tum_dataset),
            "--out", out, "--frames-out", frames_out, "--no-loop",
            "--max-kf", "32", "--max-mp", "2048",
            "--detect-cell", "8", "--detect-per-cell", "2"])
        assert os.path.exists(out) and os.path.getsize(out) > 50
        assert os.path.exists(frames_out)

        evaluate_ate.main([str(tum_dataset / "groundtruth.txt"),
                           frames_out, "--max-dt", "0.05"])
        text = capsys.readouterr().out
        rmse = float([l for l in text.splitlines()
                      if "rmse" in l][0].split()[1])
        assert rmse < 0.08, text

    def test_config_overrides(self, tum_dataset):
        from ygz_tpu.utils.config import load_config
        cfg = load_config(str(tum_dataset / "settings.yaml"),
                          max_keyframes=32, max_map_points=2048,
                          detect_cell=8, detect_per_cell=2)
        assert cfg.depth_map_factor == 5000.0
        assert cfg.camera.bf > 0
