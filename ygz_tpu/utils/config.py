"""Run configuration: camera calibration, ORB parameters, tracking knobs,
capacities — one object, parsed from the reference's YAML format.

Covers the three YAML consumers of the reference in one place: Tracking's
camera/ORB keys (/root/reference/src/Tracking.cc:83-213), ConfigParam's
VIO keys (/root/reference/src/IMU/configparam.cpp:18-86), and the Viewer
keys. The parser understands OpenCV FileStorage YAML ("%YAML:1.0",
"Key.Sub: value", opencv-matrix blocks) without needing OpenCV.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import numpy as np

from ygz_tpu.core.camera import Camera


@dataclasses.dataclass(eq=False)  # identity hash: usable as a jit static arg
class SlamConfig:
    camera: Camera
    fps: float = 30.0
    rgb_order: bool = False            # Camera.RGB
    # ORB
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    # tracking
    cache_features: int = 150          # Tracking.CacheFeatures direct-cache th
    init_min_matches: int = 100        # monocular-init match gate
    reloc_min_inliers: Optional[int] = None  # relocalization accept bar;
                                       # None -> 5% of n_features floored
                                       # at 20 (the reference's nGood >= 50
                                       # assumes 1000 features,
                                       # src/Tracking.cc:1880)
    th_depth: float = 35.0
    depth_map_factor: float = 1.0      # RGBD depth scaling (TUM: 5000)
    use_dist_k6: bool = False
    # IMU (ConfigParam)
    use_imu: bool = False
    Tbc: Optional[np.ndarray] = None   # body<-camera 4x4
    local_window_size: int = 10
    imu_multiply_g: float = 1.0
    vins_init_time: float = 15.0
    delay_to_imu: float = 0.0
    # gyro/acc noise densities (the reference hard-codes EuRoC-ish values
    # with x10/x100 inflation, /root/reference/src/IMU/imudata.cpp:19-29)
    gyro_noise: float = 1.7e-4 * 10.0
    acc_noise: float = 2.0e-3 * 10.0
    gyro_bias_walk: float = 1.9393e-5 * 100.0
    acc_bias_walk: float = 3.0e-3 * 100.0
    gravity: float = 9.810
    # multi-chip: route local BA through the mesh-sharded exact Schur
    # engine (parallel/sharding.sharded_local_ba). None = auto (on when
    # >1 accelerator device is visible); tests/dryruns force True on a
    # virtual CPU mesh.
    sharded_ba: Optional[bool] = None
    # capacities (TPU static shapes)
    max_keyframes: int = 256
    max_map_points: int = 16384
    vocab_k: int = 10
    vocab_L: int = 4
    # detection grid
    detect_cell: int = 32
    detect_per_cell: int = 4
    # minimum frame gap between keyframe insertions. The reference gates
    # inserts on LocalMapping being idle (bLocalMappingIdle,
    # /root/reference/src/Tracking.cc:1418-1439) — with its ~50-100 ms
    # mapping step at dataset frame rates that amounts to a few-frame
    # spacing; None resolves to max(2, fps/5) (0.2 s).
    kf_min_gap: Optional[int] = None

    @property
    def kf_min_gap_frames(self) -> int:
        if self.kf_min_gap is not None:
            return self.kf_min_gap
        return max(2, int(self.fps) // 5)

    @property
    def reloc_accept(self) -> int:
        """Relocalization inlier accept bar, scaled to the feature budget
        (the reference's 50 is 5% of its 1000 features)."""
        if self.reloc_min_inliers is not None:
            return self.reloc_min_inliers
        return max(20, self.n_features // 20)

    @property
    def n_words(self) -> int:
        return self.vocab_k ** self.vocab_L

    @property
    def scale_factors(self) -> np.ndarray:
        return np.array([self.scale_factor ** i for i in range(self.n_levels)],
                        dtype=np.float32)

    @property
    def level_sigma2(self) -> np.ndarray:
        return self.scale_factors ** 2

    @property
    def inv_level_sigma2(self) -> np.ndarray:
        return 1.0 / self.level_sigma2


def _parse_opencv_yaml(path: str) -> dict:
    """Minimal OpenCV FileStorage YAML reader: flat `Key: value` pairs and
    `opencv-matrix` blocks (rows/cols/dt/data)."""
    out: dict = {}
    with open(path) as f:
        text = f.read()
    # matrix blocks
    mat_re = re.compile(
        r"^(\S+):\s*!!opencv-matrix\s*\n\s*rows:\s*(\d+)\s*\n\s*cols:\s*(\d+)"
        r"\s*\n\s*dt:\s*\w+\s*\n\s*data:\s*\[([^\]]*)\]",
        re.MULTILINE)
    for m in mat_re.finditer(text):
        key, rows, cols, data = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
        vals = np.array([float(x) for x in data.replace("\n", " ").split(",")])
        out[key] = vals.reshape(rows, cols)
    # scalars
    for line in text.splitlines():
        line = line.split("#")[0].strip()
        mm = re.match(r"^([\w.]+):\s*([-\w.+eE]+)\s*$", line)
        if mm:
            key, val = mm.group(1), mm.group(2)
            try:
                out[key] = float(val) if ("." in val or "e" in val or "E" in val) \
                    else int(val)
            except ValueError:
                out[key] = val
    return out


def load_config(path: str, **overrides) -> SlamConfig:
    """Load a reference-format YAML settings file into a SlamConfig."""
    y = _parse_opencv_yaml(path)

    def g(key, default):
        return y.get(key, default)

    cam = Camera(
        fx=float(g("Camera.fx", 500.0)), fy=float(g("Camera.fy", 500.0)),
        cx=float(g("Camera.cx", 320.0)), cy=float(g("Camera.cy", 240.0)),
        k1=float(g("Camera.k1", 0.0)), k2=float(g("Camera.k2", 0.0)),
        p1=float(g("Camera.p1", 0.0)), p2=float(g("Camera.p2", 0.0)),
        k3=float(g("Camera.k3", 0.0)), k4=float(g("Camera.k4", 0.0)),
        k5=float(g("Camera.k5", 0.0)), k6=float(g("Camera.k6", 0.0)),
        width=int(g("Camera.width", 752)), height=int(g("Camera.height", 480)),
        bf=float(g("Camera.bf", 0.0)), th_depth=float(g("ThDepth", 35.0)))

    dmf = float(g("DepthMapFactor", 1.0))
    cfg = SlamConfig(
        camera=cam,
        fps=float(g("Camera.fps", 30.0)),
        rgb_order=bool(g("Camera.RGB", 1)),
        n_features=int(g("ORBextractor.nFeatures", 1000)),
        scale_factor=float(g("ORBextractor.scaleFactor", 1.2)),
        n_levels=int(g("ORBextractor.nLevels", 8)),
        ini_th_fast=float(g("ORBextractor.iniThFAST", 20.0)),
        min_th_fast=float(g("ORBextractor.minThFAST", 7.0)),
        cache_features=int(g("Tracking.CacheFeatures", 150)),
        th_depth=float(g("ThDepth", 35.0)),
        depth_map_factor=1.0 if dmf == 0 else dmf,
        use_dist_k6=bool(g("Camera.bUseDistK6", 0)),
        use_imu=bool(g("bUseIMU", 0)),
        Tbc=y.get("Camera.Tbc"),
        local_window_size=int(g("LocalMapping.LocalWindowSize", 10)),
        imu_multiply_g=float(g("IMU.multiplyG", 1.0)),
        vins_init_time=float(g("test.VINSInitTime", 15.0)),
        delay_to_imu=float(g("Camera.delaytoimu", 0.0)),
    )
    return dataclasses.replace(cfg, **overrides)
