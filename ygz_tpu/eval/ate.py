"""Absolute trajectory error evaluation.

Functional port of the reference's evaluation protocol (/root/reference/
scripts/{associate,evaluate_ate,evaluate_ate_scale_euroc}.py): associate
estimated and ground-truth poses by timestamp, align with Horn's method
(SE3, or Sim3 with scale for monocular), report translational RMSE.
Numpy implementation — evaluation is offline tooling, not a hot path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def associate(t_est: np.ndarray, t_gt: np.ndarray,
              max_dt: float = 0.02) -> List[Tuple[int, int]]:
    """Greedy nearest-timestamp matching (scripts/associate.py semantics)."""
    pairs = []
    j = 0
    used = set()
    for i, t in enumerate(t_est):
        k = int(np.argmin(np.abs(t_gt - t)))
        if abs(t_gt[k] - t) <= max_dt and k not in used:
            pairs.append((i, k))
            used.add(k)
    return pairs


def horn_align(x_est: np.ndarray, x_gt: np.ndarray, with_scale: bool = False):
    """Align est -> gt: returns (s, R, t) with x_gt ~ s R x_est + t."""
    mu_e = x_est.mean(0)
    mu_g = x_gt.mean(0)
    Ye = x_est - mu_e
    Yg = x_gt - mu_g
    H = Ye.T @ Yg
    U, S, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ D @ U.T
    if with_scale:
        s = float(np.trace(np.diag(S) @ D) / max((Ye ** 2).sum(), 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(traj_est: List[Tuple[float, np.ndarray]],
             traj_gt: List[Tuple[float, np.ndarray]],
             with_scale: bool = False,
             max_dt: float = 0.02) -> Dict:
    """traj_*: [(timestamp, T_wc 4x4)] lists. Returns dict with rmse,
    mean, median, scale, n_pairs."""
    t_est = np.array([t for t, _ in traj_est])
    t_gt = np.array([t for t, _ in traj_gt])
    pairs = associate(t_est, t_gt, max_dt)
    if len(pairs) < 3:
        return dict(rmse=np.inf, n_pairs=len(pairs), scale=1.0,
                    mean=np.inf, median=np.inf)
    xe = np.stack([traj_est[i][1][:3, 3] for i, _ in pairs])
    xg = np.stack([traj_gt[k][1][:3, 3] for _, k in pairs])
    s, R, t = horn_align(xe, xg, with_scale)
    xa = (s * (R @ xe.T)).T + t
    err = np.linalg.norm(xa - xg, axis=1)
    return dict(rmse=float(np.sqrt((err ** 2).mean())),
                mean=float(err.mean()), median=float(np.median(err)),
                scale=s, n_pairs=len(pairs))


def load_tum_trajectory(path: str) -> List[Tuple[float, np.ndarray]]:
    """Read TUM-format trajectory: t tx ty tz qx qy qz qw (camera->world)."""
    out = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            v = [float(x) for x in line.replace(",", " ").split()]
            t, tx, ty, tz, qx, qy, qz, qw = v[:8]
            T = np.eye(4)
            T[:3, :3] = _quat_to_mat(qw, qx, qy, qz)
            T[:3, 3] = [tx, ty, tz]
            out.append((t, T))
    return out


def _quat_to_mat(w, x, y, z):
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
