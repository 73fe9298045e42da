"""Dataset loaders for the three benchmark families the reference's
example binaries consume (/root/reference/Examples/*):

  * TUM RGB-D:  rgb.txt / depth.txt index files + timestamp association
                (rgbd_tum.cc + associations/)
  * KITTI:      image_0/ image_1/ sequences + times.txt (mono/stereo_kitti)
  * EuRoC MAV:  mav0/cam0/data with nanosecond filenames + data.csv, and
                imu0/data.csv parsed exactly like the reference's LoadImus
                (t, wx, wy, wz, ax, ay, az with t * 1e-9 —
                /root/reference/Examples/Monocular/mono_euroc_vins.cc:198-235)

Each loader yields (timestamp_seconds, grayscale float32 HxW [, extras]).
Image decode is PIL (no OpenCV dependency in the framework path).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _read_gray(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    if img.mode not in ("L", "I;16", "I"):
        img = img.convert("L")
    a = np.asarray(img)
    return a.astype(np.float32)


def _read_depth_tum(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path)).astype(np.float32)


# ---------------------------------------------------------------------------
# TUM RGB-D
# ---------------------------------------------------------------------------

def _parse_tum_index(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, rel = line.split()[:2]
            out.append((float(ts), rel))
    return out


def associate_tum(rgb_list, depth_list, max_dt: float = 0.02):
    """Greedy timestamp association (scripts/associate.py semantics)."""
    pairs = []
    used = set()
    d_ts = np.array([t for t, _ in depth_list])
    for i, (t, _) in enumerate(rgb_list):
        j = int(np.argmin(np.abs(d_ts - t)))
        if abs(d_ts[j] - t) <= max_dt and j not in used:
            pairs.append((i, j))
            used.add(j)
    return pairs


def load_tum_rgbd(root: str, associations: Optional[str] = None
                  ) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
    """Yield (t, gray, depth_raw). `associations` optionally points at a
    pre-associated file (t_rgb rgb t_d depth per line, as the reference's
    associations/ files)."""
    if associations and os.path.exists(associations):
        with open(associations) as f:
            for line in f:
                p = line.split()
                if len(p) < 4:
                    continue
                yield (float(p[0]), _read_gray(os.path.join(root, p[1])),
                       _read_depth_tum(os.path.join(root, p[3])))
        return
    rgb = _parse_tum_index(os.path.join(root, "rgb.txt"))
    depth = _parse_tum_index(os.path.join(root, "depth.txt"))
    for i, j in associate_tum(rgb, depth):
        yield (rgb[i][0], _read_gray(os.path.join(root, rgb[i][1])),
               _read_depth_tum(os.path.join(root, depth[j][1])))


def load_tum_mono(root: str) -> Iterator[Tuple[float, np.ndarray]]:
    for t, rel in _parse_tum_index(os.path.join(root, "rgb.txt")):
        yield t, _read_gray(os.path.join(root, rel))


# ---------------------------------------------------------------------------
# KITTI odometry
# ---------------------------------------------------------------------------

def _kitti_times(root: str) -> List[float]:
    with open(os.path.join(root, "times.txt")) as f:
        return [float(x) for x in f if x.strip()]


def load_kitti_mono(root: str) -> Iterator[Tuple[float, np.ndarray]]:
    times = _kitti_times(root)
    for i, t in enumerate(times):
        yield t, _read_gray(os.path.join(root, "image_0", f"{i:06d}.png"))


def load_kitti_stereo(root: str
                      ) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
    times = _kitti_times(root)
    for i, t in enumerate(times):
        yield (t,
               _read_gray(os.path.join(root, "image_0", f"{i:06d}.png")),
               _read_gray(os.path.join(root, "image_1", f"{i:06d}.png")))


# ---------------------------------------------------------------------------
# EuRoC MAV
# ---------------------------------------------------------------------------

def _euroc_cam_index(cam_dir: str) -> List[Tuple[float, str]]:
    csv = os.path.join(cam_dir, "data.csv")
    out = []
    if os.path.exists(csv):
        with open(csv) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                ts_ns, name = line.strip().split(",")[:2]
                out.append((int(ts_ns) * 1e-9,
                            os.path.join(cam_dir, "data", name)))
    else:
        data = os.path.join(cam_dir, "data")
        for name in sorted(os.listdir(data)):
            out.append((int(os.path.splitext(name)[0]) * 1e-9,
                        os.path.join(data, name)))
    return out


def load_euroc_imu(path: str) -> np.ndarray:
    """IMU CSV -> [n, 7] rows (t_seconds, wx, wy, wz, ax, ay, az), matching
    the reference's LoadImus parsing (t * 1e-9, gyro then accel —
    /root/reference/Examples/Monocular/mono_euroc_vins.cc:198-235)."""
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            v = [float(x) for x in line.strip().split(",")]
            rows.append([v[0] * 1e-9, v[1], v[2], v[3], v[4], v[5], v[6]])
    return np.asarray(rows, np.float32)


def load_euroc_mono(root: str) -> Iterator[Tuple[float, np.ndarray]]:
    """root: the mav0 directory (or a sequence dir containing mav0)."""
    if os.path.isdir(os.path.join(root, "mav0")):
        root = os.path.join(root, "mav0")
    for t, path in _euroc_cam_index(os.path.join(root, "cam0")):
        yield t, _read_gray(path)


def load_euroc_stereo(root: str
                      ) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
    if os.path.isdir(os.path.join(root, "mav0")):
        root = os.path.join(root, "mav0")
    left = _euroc_cam_index(os.path.join(root, "cam0"))
    right = {round(t, 6): p for t, p in
             _euroc_cam_index(os.path.join(root, "cam1"))}
    for t, lp in left:
        rp = right.get(round(t, 6))
        if rp is not None:
            yield t, _read_gray(lp), _read_gray(rp)


def load_euroc_mono_vi(root: str):
    """Yield (t, gray, imu_block) where imu_block holds the measurements
    since the previous frame as [(dt, w, a)] rows ready for
    preintegration (dt precomputed per sample)."""
    if os.path.isdir(os.path.join(root, "mav0")):
        root = os.path.join(root, "mav0")
    cams = _euroc_cam_index(os.path.join(root, "cam0"))
    imu = load_euroc_imu(os.path.join(root, "imu0", "data.csv"))
    j = 0
    t_prev = None
    for t, path in cams:
        block = []
        while j < len(imu) and imu[j, 0] <= t:
            if t_prev is not None and imu[j, 0] > t_prev:
                block.append(imu[j])
            j += 1
        rows = None
        if block:
            b = np.stack(block)
            dts = np.diff(np.concatenate([[t_prev], b[:, 0]]))
            rows = np.concatenate([dts[:, None], b[:, 1:7]],
                                  axis=1).astype(np.float32)
        yield t, _read_gray(path), rows
        t_prev = t
