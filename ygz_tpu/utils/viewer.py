"""Offline visualization: map + trajectory renders and tracked-feature
overlays, written as image files.

Replaces the reference's Pangolin GUI thread (Viewer/MapDrawer/FrameDrawer,
/root/reference/src/{Viewer,MapDrawer,FrameDrawer}.cc) with a headless
matplotlib renderer — TPU pods have no display; artifacts are saved per
call or at shutdown. Covers the same content: map points, keyframe
frusta, covisibility graph, current trajectory, and the per-frame
tracked-point overlay.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def draw_map(tracker, path: str, show_covisibility: bool = True,
             follow: bool = False):
    """Top-down + 3D view of map points, keyframe frusta, covisibility.

    follow=True centers the top-down view on the current camera position
    with a fixed window — the reference Viewer's "Follow Camera" mode
    (/root/reference/src/Viewer.cc:87-106 s_cam.Follow(Twc))."""
    from ygz_tpu.core import lie
    import jax.numpy as jnp

    plt = _mpl()
    ms = tracker.ms
    mp_mask = np.asarray(ms.mp_mask)
    pts = np.asarray(ms.mp_pos)[mp_mask]
    kf_mask = np.asarray(ms.kf_mask)
    centers = []
    for k in np.where(kf_mask)[0]:
        T_wc = lie.se3_inverse({"q": ms.kf_q[k], "t": ms.kf_t[k]})
        centers.append(np.asarray(T_wc["t"]))
    centers = np.stack(centers) if centers else np.zeros((0, 3))

    cam_ctr = None
    lf = getattr(tracker, "last_frame", None)
    if lf is not None and getattr(lf, "T_cw", None) is not None:
        cam_ctr = np.asarray(lie.se3_inverse(lf.T_cw)["t"])
    elif len(centers):
        cam_ctr = centers[-1]

    fig = plt.figure(figsize=(12, 5))
    ax = fig.add_subplot(1, 2, 1)
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1, c="k", alpha=0.4,
                   label="map points")
    if len(centers):
        ax.plot(centers[:, 0], centers[:, 2], "b.-", ms=6, label="keyframes")
    if show_covisibility and len(centers) > 1:
        from ygz_tpu.pipeline import mapstate
        W = np.asarray(mapstate.covisibility_matrix(ms))
        ks = np.where(kf_mask)[0]
        for i, a in enumerate(ks):
            for j, b in enumerate(ks):
                if j <= i or W[a, b] < 15:
                    continue
                ax.plot([centers[i][0], centers[j][0]],
                        [centers[i][2], centers[j][2]],
                        "g-", lw=0.4, alpha=0.5)
    if cam_ctr is not None:
        ax.plot([cam_ctr[0]], [cam_ctr[2]], "r^", ms=8, label="camera")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_title(f"map: {mp_mask.sum()} points, {kf_mask.sum()} keyframes")
    ax.legend(loc="best", fontsize=8)
    if follow and cam_ctr is not None:
        # fixed window around the camera (span from the KF cloud, so the
        # zoom level is stable while the center tracks the camera)
        span = 4.0
        if len(centers) > 1:
            ext = centers.max(0) - centers.min(0)
            span = max(float(max(ext[0], ext[2])) * 0.5, 1.0)
        ax.set_xlim(cam_ctr[0] - span, cam_ctr[0] + span)
        ax.set_ylim(cam_ctr[2] - span, cam_ctr[2] + span)
        ax.set_aspect("equal", adjustable="box")
    else:
        ax.set_aspect("equal", adjustable="datalim")

    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    if len(pts):
        ax3.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, c="k", alpha=0.3)
    if len(centers):
        ax3.plot(centers[:, 0], centers[:, 1], centers[:, 2], "b.-")
    ax3.set_title("3D")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def draw_frame(frame, path: str, tracker=None):
    """Current image with tracked features overlaid (FrameDrawer
    equivalent): green = bound to a map point, red = unmatched feature."""
    plt = _mpl()
    img = np.asarray(frame.pyramid[0])
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(img, cmap="gray")
    if frame.uv is not None and frame.feat_mask is not None:
        uv = np.asarray(frame.uv)
        m = np.asarray(frame.feat_mask)
        bound = np.zeros_like(m)
        if frame.mp_idx is not None:
            bound = np.asarray(frame.mp_idx) >= 0
        ax.plot(uv[m & ~bound, 0], uv[m & ~bound, 1], "r.", ms=3)
        ax.plot(uv[m & bound, 0], uv[m & bound, 1], "g.", ms=4)
        n_tracked = int((m & bound).sum())
        ax.set_title(f"frame {frame.frame_id}: {n_tracked} tracked")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
