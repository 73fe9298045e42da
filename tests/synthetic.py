"""Shared synthetic scene renderer for end-to-end tests: a camera moving
in front of a large textured plane (flat world — exercises the H-model
initializer, tracking, BA, and keyframing without needing a rasterizer)."""

import numpy as np
import jax.numpy as jnp

from ygz_tpu.core import lie
from ygz_tpu.core.camera import Camera
from ygz_tpu.ops.interp import bilinear_sample

CAM = Camera(fx=120.0, fy=120.0, cx=64.0, cy=48.0, width=128, height=96)
PLANE_Z = 3.0
TEX_SCALE = 60.0  # texels per world unit


def make_texture(seed=0, size=(640, 900)):
    """High-contrast mosaic texture: thresholded multi-scale noise gives
    sharp, well-localized corners (sub-pixel repeatable under viewpoint
    change), lightly smoothed for stable interpolation."""
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    tex = np.zeros(size, np.float32)
    for sigma, amp in ((2.0, 1.0), (5.0, 1.0), (10.0, 0.7)):
        n = gaussian_filter(rng.rand(*size).astype(np.float32) - 0.5, sigma)
        tex += amp * np.sign(n) * (np.abs(n) > np.percentile(np.abs(n), 30))
    tex = gaussian_filter(tex, 0.8)
    tex = tex - tex.min()
    return (tex / max(tex.max(), 1e-6) * 255.0).astype(np.float32)


def render(tex, T_cw, cam: Camera = CAM, plane_z: float = PLANE_Z):
    H, W = cam.height, cam.width
    us, vs = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    xn = (us - cam.cx) / cam.fx
    yn = (vs - cam.cy) / cam.fy
    rays = jnp.asarray(np.stack([xn, yn, np.ones_like(xn)], -1).reshape(-1, 3))
    T_wc = lie.se3_inverse(T_cw)
    origin = T_wc["t"]
    dirs = lie.quat_rotate(T_wc["q"], rays)
    tt = (plane_z - origin[2]) / dirs[:, 2]
    pw = origin[None, :] + tt[:, None] * dirs
    texel = jnp.stack([pw[:, 0] * TEX_SCALE + tex.shape[1] / 2,
                       pw[:, 1] * TEX_SCALE + tex.shape[0] / 2], -1)
    img = bilinear_sample(jnp.asarray(tex), texel).reshape(H, W)
    return np.asarray(img)


def orbit_trajectory(n_frames: int, dt: float = 0.1):
    """Slow lateral sweep with gentle rotation, always facing the plane.
    Returns [(timestamp, T_cw dict)]."""
    out = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        x = 0.8 * np.sin(2 * np.pi * s * 0.5)
        y = 0.25 * np.sin(2 * np.pi * s)
        z = 0.15 * np.sin(2 * np.pi * s * 0.7)
        yaw = 0.08 * np.sin(2 * np.pi * s)
        pitch = 0.05 * np.sin(2 * np.pi * s * 1.3)
        xi = jnp.asarray(
            np.array([x, y, z, pitch, yaw, 0.0], np.float32))
        T_wc = lie.se3_exp(xi)       # camera pose in world
        T_cw = lie.se3_inverse(T_wc)
        out.append((i * dt, T_cw))
    return out
