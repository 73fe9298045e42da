"""Stereo rectification maps from the reference's LEFT./RIGHT. YAML blocks
(K, D, R, P as in Examples/Stereo/EuRoC.yaml:36-81) — the functional
equivalent of cv::initUndistortRectifyMap: for each rectified output
pixel, compute the source pixel in the raw distorted image.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _undistort_rectify_map(K, D, R, P, width: int, height: int):
    """Map from rectified pixel -> raw image pixel. K,D,R,P numpy arrays
    (3x3, 1x5-ish, 3x3, 3x4 or 3x3)."""
    fx_p, fy_p = P[0, 0], P[1, 1]
    cx_p, cy_p = P[0, 2], P[1, 2]
    us, vs = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    x = (us - cx_p) / fx_p
    y = (vs - cy_p) / fy_p
    ones = np.ones_like(x)
    rays = np.stack([x, y, ones], -1) @ np.linalg.inv(R).T
    xn = rays[..., 0] / rays[..., 2]
    yn = rays[..., 1] / rays[..., 2]

    k1, k2, p1, p2 = (list(D.reshape(-1)) + [0, 0, 0, 0])[:4]
    k3 = D.reshape(-1)[4] if D.size > 4 else 0.0
    r2 = xn * xn + yn * yn
    radial = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn

    src_u = K[0, 0] * xd + K[0, 2]
    src_v = K[1, 1] * yd + K[1, 2]
    return jnp.asarray(np.stack([src_u, src_v], -1).astype(np.float32))


def stereo_rectify_maps(yaml_dict: dict, width: int, height: int):
    """Build (left_map, right_map) [H, W, 2] from parsed LEFT./RIGHT.
    K, D, R, P entries."""
    out = []
    for side in ("LEFT", "RIGHT"):
        K = np.asarray(yaml_dict[f"{side}.K"], np.float64)
        D = np.asarray(yaml_dict[f"{side}.D"], np.float64)
        R = np.asarray(yaml_dict[f"{side}.R"], np.float64)
        P = np.asarray(yaml_dict[f"{side}.P"], np.float64)
        out.append(_undistort_rectify_map(K, D, R, P, width, height))
    return tuple(out)
