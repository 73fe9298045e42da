"""Per-frame container and the lazy feature-extraction pipeline.

Mirrors the reference's Frame design choice that enables direct tracking
(/root/reference/src/Frame.cc:148,717-771): constructing a frame builds
ONLY the image pyramid; ORB detection + description run on demand
(initialization, relocalization, keyframe creation) — most frames are
tracked photometrically and never pay for extraction.

The device-side extraction step (pyramid -> keypoints -> orientation ->
descriptors) is one jitted program with static capacity n_features.
Stereo matching follows the reference's rectified SAD + parabola scheme
(/root/reference/src/Frame.cc:509-683) but batched: every left feature
scans its disparity range in one gather.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.core import lie
from ygz_tpu.ops import fast, orb, pyramid
from ygz_tpu.utils.config import SlamConfig


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    pyramid: Tuple[jnp.ndarray, ...]
    # pose (world->cam); None until tracked
    T_cw: Optional[dict] = None
    # features (None until extracted)
    uv: Optional[jnp.ndarray] = None          # [N, 2] level-0 coords
    level: Optional[jnp.ndarray] = None       # [N]
    angle: Optional[jnp.ndarray] = None       # [N]
    desc: Optional[jnp.ndarray] = None        # [N, 8] uint32
    feat_mask: Optional[jnp.ndarray] = None   # [N]
    ur: Optional[jnp.ndarray] = None          # [N] stereo right-u (-1 mono)
    depth: Optional[jnp.ndarray] = None       # [N] (-1 unknown)
    mp_idx: Optional[jnp.ndarray] = None      # [N] tracked map point ids
    # IMU measurements since previous frame (vio path)
    imu: Optional[np.ndarray] = None          # [n, 7] (t, wx wy wz, ax ay az)
    # raw metric inputs, kept for LAZY extraction: stereo/RGB-D frames
    # track direct (photometric) like mono and only pay detection +
    # depth association when they become keyframes or hit a fallback
    depth_img: Optional[jnp.ndarray] = None   # [H, W] metric depth
    right_pyr: Optional[Tuple[jnp.ndarray, ...]] = None  # right-cam pyramid
    # pose relative to the reference KF, precomputed on device by the
    # fused tracking step (avoids per-frame eager recompute + sync)
    T_c_ref: Optional[dict] = None
    # blurred-level atlas built during extraction (reused by the direct->
    # feature merge at KF creation so it never re-blurs the pyramid)
    blur_atlas: Optional[jnp.ndarray] = None
    # NavState produced by the VI tracking step (vio path): keyframe
    # creation seeds the KF NavState from the frame's own state instead
    # of whatever the tracker's latest in-flight estimate is
    vio_ns: Optional[object] = None

    @property
    def extracted(self) -> bool:
        return self.uv is not None

    def pose_or_identity(self):
        return self.T_cw if self.T_cw is not None else lie.se3_identity()


def make_frame(img: np.ndarray, frame_id: int, timestamp: float,
               cfg: SlamConfig, imu: Optional[np.ndarray] = None) -> Frame:
    """Build a frame: undistort (if the calibration has distortion) +
    grayscale float32 + pyramid only (lazy features).

    The reference undistorts the whole image via a cached cv::remap grid
    before building the pyramid (/root/reference/src/Frame.cc:773-805) —
    required for the photometric direct path, which samples raw pixels and
    so can't work with per-keypoint undistortion. Same here: one cached
    remap grid per calibration, applied as a batched bilinear gather.

    The image is uploaded in its NATIVE dtype and cast to float32 on
    device: dataset frames are uint8, and a host-side float32 cast
    quadruples the per-frame host->device transfer (1.4 MB vs 360 KB at
    752x480 — a real bandwidth tax on a tunneled device)."""
    g = jnp.asarray(img)
    if cfg.camera.has_distortion:
        g = undistort_image(g, cfg.camera)
    pyr = _build_pyramid_jit(g, cfg.n_levels, cfg.scale_factor)
    return Frame(frame_id=frame_id, timestamp=timestamp, pyramid=pyr, imu=imu)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _build_pyramid_jit(img, n_levels, scale_factor):
    return pyramid.build_pyramid(img.astype(jnp.float32), n_levels,
                                 scale_factor)


# --- whole-image undistortion (cached remap grid per calibration) ---------

_UNDIST_GRIDS: dict = {}


def _undist_grid(cam):
    grid = _UNDIST_GRIDS.get(cam)
    if grid is None:
        from ygz_tpu.core import camera as camera_mod
        grid = jax.device_put(camera_mod.undistort_map(cam))
        _UNDIST_GRIDS[cam] = grid
    return grid


def undistort_image(img, cam):
    """Bilinear remap through the cached undistortion grid; out-of-source
    pixels become 0 (matches cv::remap's default border)."""
    return _remap_bilinear_jit(img, _undist_grid(cam))


def undistort_depth(depth, cam):
    """Nearest-neighbor remap for depth images: bilinear would blend
    depths across occlusion boundaries and invent phantom geometry.
    Out-of-source or invalid source pixels become 0 (= no depth)."""
    return _remap_nearest_jit(jnp.asarray(depth, jnp.float32),
                              _undist_grid(cam))


@jax.jit
def _remap_bilinear_jit(img, grid):
    from ygz_tpu.ops.interp import bilinear_sample
    img = img.astype(jnp.float32)
    H, W = img.shape
    val = bilinear_sample(img, grid)
    inb = (grid[..., 0] >= 0) & (grid[..., 0] <= W - 1) & \
          (grid[..., 1] >= 0) & (grid[..., 1] <= H - 1)
    return jnp.where(inb, val, 0.0)


@jax.jit
def _remap_nearest_jit(img, grid):
    H, W = img.shape
    ui = jnp.round(grid[..., 0]).astype(jnp.int32)
    vi = jnp.round(grid[..., 1]).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    val = img[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
    return jnp.where(inb, val, 0.0)


def _extract_core(pyr, selector, cfg: SlamConfig, occupied=None):
    scales = cfg.scale_factors
    kps = fast.detect_pyramid(
        pyr, scales, cfg.ini_th_fast, cfg.min_th_fast,
        cfg.n_features, cell=cfg.detect_cell, per_cell=cfg.detect_per_cell,
        occupied=occupied)
    blurred = tuple(pyramid.gaussian_blur(p) for p in pyr)
    blur_atlas, xoffs = pyramid.atlas_from_pyramid(blurred)
    angles, descs = orb.describe_keypoints_atlas(
        blur_atlas, xoffs, kps.uv, kps.level, kps.mask, scales,
        selector=selector)
    return kps.uv, kps.level, angles, descs, kps.mask, blur_atlas


@functools.partial(jax.jit, static_argnames=("cfg",))
def _extract_jit(pyr, selector, cfg: SlamConfig):
    return _extract_core(pyr, selector, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _extract_occupied_jit(pyr, selector, cfg: SlamConfig, occ_uv, occ_level,
                          occ_mask):
    """Extraction with DSO-style occupancy masking: grid cells already
    holding direct-tracked points (at their own pyramid level) are
    excluded from detection, so the feature budget complements the
    existing tracks (/root/reference/src/ORBextractor.cc:1275-1386)."""
    return _extract_core(pyr, selector, cfg,
                         occupied=(occ_uv, occ_level, occ_mask))


def extract_features(frame: Frame, cfg: SlamConfig,
                     depth_img: Optional[np.ndarray] = None,
                     right_pyr: Optional[Tuple] = None,
                     occupied: Optional[Tuple] = None) -> Frame:
    """Run detection + description; fill stereo/RGBD fields if available.

    `occupied` = (uv [C,2], level [C], mask [C]): direct-tracked points
    whose grid cells are excluded from detection — the reference's
    occupancy-masked ExtractORB mode at keyframe creation
    (/root/reference/src/ORBextractor.cc:1275-1386). Without it, detection
    covers the full grid and direct points re-associate post-hoc (the
    3-px NN fallback in tracking._reassociate).
    """
    if frame.extracted:
        return frame
    if depth_img is None:
        depth_img = frame.depth_img
    if right_pyr is None:
        right_pyr = frame.right_pyr
    if occupied is not None:
        uv, level, angle, desc, mask, blur_atlas = _extract_occupied_jit(
            frame.pyramid, orb._pattern_selector(), cfg, *occupied)
    else:
        uv, level, angle, desc, mask, blur_atlas = _extract_jit(
            frame.pyramid, orb._pattern_selector(), cfg)
    N = int(uv.shape[0])
    ur = jnp.full((N,), -1.0, jnp.float32)
    depth = jnp.full((N,), -1.0, jnp.float32)
    if depth_img is not None:
        d = jnp.asarray(depth_img, jnp.float32) / cfg.depth_map_factor
        ui = jnp.clip(uv[:, 0].astype(jnp.int32), 0, d.shape[1] - 1)
        vi = jnp.clip(uv[:, 1].astype(jnp.int32), 0, d.shape[0] - 1)
        depth = d[vi, ui]
        valid_d = depth > 0
        ur = jnp.where(valid_d, uv[:, 0] - cfg.camera.bf / jnp.maximum(depth, 1e-6),
                       -1.0)
        depth = jnp.where(valid_d, depth, -1.0)
    elif right_pyr is not None:
        ur, depth = stereo_match(frame.pyramid, right_pyr, uv, level, mask, cfg)
    return dataclasses.replace(
        frame, uv=uv, level=level, angle=angle, desc=desc, feat_mask=mask,
        ur=ur, depth=depth, blur_atlas=blur_atlas,
        mp_idx=jnp.full((N,), -1, jnp.int32))


def associate_depth(frame: Frame, cfg: SlamConfig) -> Frame:
    """(Re)compute the per-feature ur/depth columns from the frame's raw
    metric inputs at its CURRENT uv table — needed after the direct->
    feature merge at keyframe creation, where direct-tracked positions
    overwrite tail feature slots and would otherwise keep the evicted
    corners' stereo rows."""
    if frame.uv is None:
        return frame
    N = int(frame.uv.shape[0])
    if frame.depth_img is not None:
        d = jnp.asarray(frame.depth_img, jnp.float32) / cfg.depth_map_factor
        ui = jnp.clip(frame.uv[:, 0].astype(jnp.int32), 0, d.shape[1] - 1)
        vi = jnp.clip(frame.uv[:, 1].astype(jnp.int32), 0, d.shape[0] - 1)
        depth = d[vi, ui]
        valid_d = depth > 0
        ur = jnp.where(valid_d,
                       frame.uv[:, 0] - cfg.camera.bf / jnp.maximum(depth, 1e-6),
                       -1.0)
        depth = jnp.where(valid_d, depth, -1.0)
    elif frame.right_pyr is not None:
        ur, depth = stereo_match(frame.pyramid, frame.right_pyr,
                                 frame.uv, frame.level, frame.feat_mask, cfg)
    else:
        return frame
    return dataclasses.replace(frame, ur=ur, depth=depth)


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_match(pyr_l, pyr_r, uv, level, mask, cfg: SlamConfig,
                 max_disp_frac: float = 0.5, w: int = 5):
    """Rectified stereo correspondence: SAD over a sliding window along the
    same row + parabola subpixel (reference ComputeStereoMatches,
    /root/reference/src/Frame.cc:509-683), batched over all features.

    Uses a fixed disparity search range [0, max_disp) at level 0.
    Returns (ur [N], depth [N]) with -1 where invalid.
    """
    img_l, img_r = pyr_l[0], pyr_r[0]
    H, W = img_l.shape
    max_disp = int(W * max_disp_frac)
    N = uv.shape[0]

    from ygz_tpu.ops.interp import bilinear_sample

    # left patch [N, w, w]
    offs = jnp.arange(-(w // 2), w // 2 + 1, dtype=jnp.float32)
    du = jnp.broadcast_to(offs[None, :], (w, w)).reshape(-1)
    dv = jnp.broadcast_to(offs[:, None], (w, w)).reshape(-1)
    patch_l = bilinear_sample(
        img_l, uv[:, None, :] + jnp.stack([du, dv], -1)[None])  # [N, w*w]

    # candidate disparities at integer steps
    disp = jnp.arange(0, max_disp, dtype=jnp.float32)          # [D]
    cand_uv = (uv[:, None, None, :]
               + jnp.stack([du, dv], -1)[None, None, :, :]
               - jnp.stack([disp, jnp.zeros_like(disp)], -1)[None, :, None, :])
    patch_r = bilinear_sample(img_r, cand_uv)                   # [N, D, w*w]
    sad = jnp.sum(jnp.abs(patch_r - patch_l[:, None, :]), axis=-1)  # [N, D]

    in_bounds = (uv[:, 0:1] - disp[None, :]) >= w
    sad = jnp.where(in_bounds, sad, jnp.inf)
    best = jnp.argmin(sad, axis=1)                              # [N]
    d0 = jnp.clip(best, 1, max_disp - 2)
    s_m = jnp.take_along_axis(sad, (d0 - 1)[:, None], 1)[:, 0]
    s_0 = jnp.take_along_axis(sad, d0[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sad, (d0 + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(s_m + s_p - 2 * s_0, 1e-6)
    delta = jnp.clip(0.5 * (s_m - s_p) / denom, -1.0, 1.0)
    disp_sub = d0.astype(jnp.float32) + delta

    ok = mask & jnp.isfinite(s_0) & (disp_sub > 0.1)
    depth = jnp.where(ok, cfg.camera.bf / jnp.maximum(disp_sub, 0.1), -1.0)
    ok = ok & (depth > 0) & (depth < cfg.camera.bf * 100)
    ur = jnp.where(ok, uv[:, 0] - disp_sub, -1.0)
    return ur, jnp.where(ok, depth, -1.0)
