"""Pinhole camera model with radial-tangential distortion.

TPU-native equivalent of the reference's camera handling: static
calibration globals (/root/reference/src/Frame.cc:27-33), whole-image
undistortion via remap instead of per-keypoint undistortion
(/root/reference/src/Frame.cc:773-805), and the k4-k6 rational model
gate `Camera.bUseDistK6` (/root/reference/src/Tracking.cc:95-128).

A camera is a small NamedTuple of scalars so it traces as compile-time
constants inside jitted pipelines (one compilation per calibration).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    # distortion (plumb-bob + optional rational k4..k6)
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    k6: float = 0.0
    width: int = 752
    height: int = 480
    # stereo: bf = baseline * fx (pixels·m); th_depth gates close/far points
    bf: float = 0.0
    th_depth: float = 35.0

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in
                   (self.k1, self.k2, self.p1, self.p2, self.k3,
                    self.k4, self.k5, self.k6))

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx],
             [0.0, self.fy, self.cy],
             [0.0, 0.0, 1.0]], dtype=jnp.float32)

    def scaled(self, s: float) -> "Camera":
        """Camera for a pyramid level downscaled by factor s (<1)."""
        return self._replace(fx=self.fx * s, fy=self.fy * s,
                             cx=self.cx * s, cy=self.cy * s,
                             width=int(self.width * s),
                             height=int(self.height * s),
                             bf=self.bf * s)


def project(cam: Camera, pc):
    """Camera-frame 3D points -> pixel coords (no distortion: pipelines run
    on pre-undistorted images, as the reference does). pc: [..., 3]."""
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pc[..., 0] / zs + cam.cx
    v = cam.fy * pc[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Camera, pc):
    """Returns (u, v, u_right) as in the reference's stereo frames."""
    uv = project(cam, pc)
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    ur = uv[..., 0] - cam.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def unproject(cam: Camera, uv, depth):
    """Pixels + depth -> camera-frame 3D (reference Frame::UnprojectStereo,
    /root/reference/src/Frame.cc:703-715)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def distort_normalized(cam: Camera, xn):
    """Apply plumb-bob (+rational) distortion to normalized coords [...,2]."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + cam.k1 * r2 + cam.k2 * r4 + cam.k3 * r6
    den = 1.0 + cam.k4 * r2 + cam.k5 * r4 + cam.k6 * r6
    radial = num / den
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd, iters: int = 8):
    """Invert distort_normalized by fixed-point iteration (the standard
    compensate-distortion scheme): x <- (xd - tangential(x)) / radial(x).
    Converges in a few iterations for plumb-bob magnitudes (EuRoC
    k1 ~ -0.28, TUM1 k1 ~ 0.26)."""
    x = xd
    for _ in range(iters):
        u, v = x[..., 0], x[..., 1]
        r2 = u * u + v * v
        r4 = r2 * r2
        r6 = r4 * r2
        num = 1.0 + cam.k1 * r2 + cam.k2 * r4 + cam.k3 * r6
        den = 1.0 + cam.k4 * r2 + cam.k5 * r4 + cam.k6 * r6
        radial = num / den
        tx = 2.0 * cam.p1 * u * v + cam.p2 * (r2 + 2.0 * u * u)
        ty = cam.p1 * (r2 + 2.0 * v * v) + 2.0 * cam.p2 * u * v
        x = jnp.stack([(xd[..., 0] - tx) / radial,
                       (xd[..., 1] - ty) / radial], axis=-1)
    return x


def undistort_map(cam: Camera):
    """Build the remap grid that undistorts a full image.

    Matches cv::initUndistortRectifyMap semantics with newK == K: for each
    undistorted output pixel, find the source pixel in the distorted image.
    Computed once per calibration on host; the remap itself is a batched
    bilinear gather on device (ops.interp.bilinear_sample).
    """
    us = jnp.arange(cam.width, dtype=jnp.float32)
    vs = jnp.arange(cam.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, vs)  # [H, W]
    xn = jnp.stack([(uu - cam.cx) / cam.fx, (vv - cam.cy) / cam.fy], axis=-1)
    xd = distort_normalized(cam, xn)
    src_u = cam.fx * xd[..., 0] + cam.cx
    src_v = cam.fy * xd[..., 1] + cam.cy
    return jnp.stack([src_u, src_v], axis=-1)  # [H, W, 2]


def in_image(cam: Camera, uv, border: float = 0.0):
    return ((uv[..., 0] >= border) & (uv[..., 0] < cam.width - border)
            & (uv[..., 1] >= border) & (uv[..., 1] < cam.height - border))
