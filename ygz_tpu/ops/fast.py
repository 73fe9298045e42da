"""FAST-10 corner detection, Shi-Tomasi scoring, 3x3 non-max suppression,
and grid-uniform keypoint selection — fully batched, branchless XLA.

Replaces three reference components at once:
  * Thirdparty/fast (SVO's SSE2 FAST-10 + score + nonmax_3x3): the 16-pixel
    ring test becomes 16 shifted image copies and the "10 contiguous" arc
    test a log-depth AND-roll reduction — every pixel tested in parallel on
    the VPU instead of serial SSE lanes.
  * ORBextractor's per-cell FAST + quadtree DistributeOctTree
    (/root/reference/src/ORBextractor.cc:533-804): the quadtree's goal is
    spatially uniform keypoints; the TPU-shaped equivalent is top-k per
    fixed grid cell, which has identical uniformity semantics with static
    shapes.
  * ShiTomasiScore (/root/reference/src/ORBextractor.cc:1152-1187): min
    eigenvalue of the 2x2 gradient second-moment matrix over a 4-radius
    window, computed densely with box-filter convolutions.

All outputs are fixed-capacity (N keypoints + validity mask) so downstream
stages compile once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 — the 16 ring offsets (dv, du), clockwise
# from 12 o'clock. Same circle as any FAST implementation (it is the
# definition of the detector, not an implementation detail).
RING_OFFSETS = np.array(
    [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
     (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)],
    dtype=np.int32,
)

ARC_LENGTH = 10  # FAST-10


def _shifted(img, dv: int, du: int):
    """img shifted so output[y,x] = img[y+dv, x+du], zero-padded."""
    H, W = img.shape
    padded = jnp.pad(img, 3)
    return jax.lax.dynamic_slice(padded, (3 + dv, 3 + du), (H, W))


def _ring_diff(img):
    """[16, H, W] ring-minus-center differences shared by the corner test
    at any threshold (the 16 shifted copies dominate the mask cost)."""
    ring = jnp.stack([_shifted(img, int(dv), int(du))
                      for dv, du in RING_OFFSETS])
    return ring - img[None]


def _has_arc(flags):  # flags: [16, H, W] bool
    """>= 10 consecutive set flags on the circular ring:
    r2 = b & rot(b,1); r4 = r2 & rot(r2,2); r8 = r4 & rot(r4,4);
    r10 = r8 & rot(r2,8); corner = any(r10)."""
    r2 = flags & jnp.roll(flags, -1, axis=0)
    r4 = r2 & jnp.roll(r2, -2, axis=0)
    r8 = r4 & jnp.roll(r4, -4, axis=0)
    r10 = r8 & jnp.roll(r2, -8, axis=0)
    return jnp.any(r10, axis=0)


def _corner_from_diff(diff, threshold: float, H: int, W: int):
    corner = _has_arc(diff > threshold) | _has_arc(diff < -threshold)
    # kill the 3px frame where the ring would wrap
    vy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    vx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (vy >= 3) & (vy < H - 3) & (vx >= 3) & (vx < W - 3)
    return corner & inside


def fast_corner_mask(img, threshold: float):
    """Boolean corner map [H, W] for FAST-10 at the given threshold."""
    H, W = img.shape
    return _corner_from_diff(_ring_diff(img), threshold, H, W)


def fast_score(img, threshold: float):
    """SVO-style corner score: sum over the ring of |diff| beyond threshold,
    max of the bright and dark sums (Thirdparty/fast fast_10_score
    semantics up to the constant offset)."""
    ring = jnp.stack([_shifted(img, int(dv), int(du)) for dv, du in RING_OFFSETS])
    diff = ring - img[None]
    bright = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    dark = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    return jnp.maximum(bright, dark)


def _box_filter(x, radius: int):
    """Separable box sum via reduce_window — VPU-native on TPU (a C=1
    NCHW conv lowers poorly there: ~6 ms for the three Shi-Tomasi maps
    vs <1 ms this way)."""
    k = 2 * radius + 1
    y = jnp.pad(x, radius)
    y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (k, 1), (1, 1), "VALID")
    return jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, k), (1, 1),
                                 "VALID")


def shi_tomasi_score(img, radius: int = 4):
    """Dense min-eigenvalue corner response, normalized by window area like
    the reference (/root/reference/src/ORBextractor.cc:1152-1187)."""
    dx = 0.5 * (_shifted(img, 0, 1) - _shifted(img, 0, -1))
    dy = 0.5 * (_shifted(img, 1, 0) - _shifted(img, -1, 0))
    dxx = _box_filter(dx * dx, radius)
    dyy = _box_filter(dy * dy, radius)
    dxy = _box_filter(dx * dy, radius)
    area = float((2 * radius + 1) ** 2) * 2.0
    dxx, dyy, dxy = dxx / area, dyy / area, dxy / area
    tr = dxx + dyy
    det_term = jnp.sqrt(jnp.maximum((dxx - dyy) ** 2 + 4.0 * dxy * dxy, 0.0))
    return 0.5 * (tr - det_term)


def nonmax_3x3(score):
    """Keep pixels that are the strict max of their 3x3 neighborhood
    (Thirdparty/fast nonmax_3x3.cpp equivalent, dense max-pool compare)."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return score >= m


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one pyramid level (or merged levels).

    uv:    [N, 2] float32 (u=x, v=y) in level-0 coordinates
    score: [N]    float32 response
    level: [N]    int32 pyramid level
    angle: [N]    float32 orientation (radians); 0 until computed
    mask:  [N]    bool validity
    """
    uv: jnp.ndarray
    score: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self):
        return self.uv.shape[0]


def select_grid_topk(score, valid, cell: int, per_cell: int, border: int = 16,
                     blocked=None):
    """Uniform keypoint selection: top `per_cell` responses per cell x cell
    block. Returns (uv [M,2] int32, score [M], mask [M]) with
    M = n_cells * per_cell — static. The TPU-shaped DistributeOctTree.

    `blocked` ([ncy*ncx] bool, optional) suppresses whole cells — the
    occupancy mask of the reference's DSO-style detection, which skips
    grid cells already holding direct-tracked points
    (/root/reference/src/ORBextractor.cc:1275-1386) so the detection
    budget complements existing tracks instead of duplicating them."""
    H, W = score.shape
    vy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    vx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (vy >= border) & (vy < H - border) & (vx >= border) & (vx < W - border)
    s = jnp.where(valid & in_border, score, -jnp.inf)

    ncy, ncx = H // cell, W // cell
    sc = s[: ncy * cell, : ncx * cell]
    sc = sc.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(ncy * ncx, cell * cell)
    if blocked is not None:
        sc = jnp.where(blocked[:, None], -jnp.inf, sc)
    top_s, top_i = jax.lax.top_k(sc, per_cell)  # [ncells, per_cell]

    cell_ids = jnp.arange(ncy * ncx, dtype=jnp.int32)
    cy = (cell_ids // ncx)[:, None]
    cx = (cell_ids % ncx)[:, None]
    py = top_i // cell
    px = top_i % cell
    u = (cx * cell + px).astype(jnp.float32)
    v = (cy * cell + py).astype(jnp.float32)

    uv = jnp.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
    sflat = top_s.reshape(-1)
    mask = jnp.isfinite(sflat) & (sflat > 0)
    return uv, jnp.where(mask, sflat, 0.0), mask


def subpixel_refine(score, uv, mask):
    """Quadratic subpixel refinement of integer corner positions on the
    response map: 1D parabola fits along u and v (a precision upgrade over
    the reference's integer FAST corners — cuts triangulation noise at
    small parallax for free)."""
    H, W = score.shape
    ui = jnp.clip(uv[:, 0].astype(jnp.int32), 1, W - 2)
    vi = jnp.clip(uv[:, 1].astype(jnp.int32), 1, H - 2)
    flat = score.reshape(-1)
    base = vi * W + ui
    s0 = flat[base]
    sl = flat[base - 1]
    sr = flat[base + 1]
    su = flat[base - W]
    sd = flat[base + W]

    def para(m, p):
        den = m - 2.0 * s0 + p
        d = 0.5 * (m - p) / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
        return jnp.clip(jnp.where(jnp.abs(den) < 1e-9, 0.0, d), -0.5, 0.5)

    du = para(sl, sr)
    dv = para(su, sd)
    out = uv + jnp.stack([du, dv], axis=-1)
    return jnp.where(mask[:, None], out, uv)


def detect_level(img, threshold: float, cell: int, per_cell: int,
                 border: int = 16, low_threshold: float | None = None,
                 blocked=None):
    """Full single-level detection: FAST mask -> Shi-Tomasi score -> nonmax ->
    grid top-k. If the high threshold yields nothing in a cell, the low
    threshold map fills in (mirrors iniThFAST/minThFAST retry,
    /root/reference/src/ORBextractor.cc:725-804) — done in one pass by
    scoring low-threshold corners with a large negative offset so high-
    threshold corners always win the top-k. (The reference's
    EDGE_THRESHOLD is 19; 16 keeps the coarse levels of small frames
    usable, and descriptor windows that overrun a level's atlas tile
    read zero-gutter pixels — equivalent to the reference's clamped
    border sampling.)"""
    diff = _ring_diff(img)
    H, W = img.shape
    corners_hi = _corner_from_diff(diff, threshold, H, W)
    if low_threshold is not None and low_threshold < threshold:
        corners_lo = _corner_from_diff(diff, low_threshold, H, W)
    else:
        corners_lo = corners_hi
    score = shi_tomasi_score(img)
    keep = nonmax_3x3(jnp.where(corners_lo, score, -jnp.inf))
    # bias: high-threshold corners get +1e4 so they dominate cell ranking
    biased = jnp.where(corners_hi, score + 1e4, score)
    uv, s, mask = select_grid_topk(biased, corners_lo & keep, cell, per_cell,
                                   border, blocked=blocked)
    s = jnp.where(s > 1e4 * 0.5, s - 1e4, s)  # undo bias for reported score
    uv = subpixel_refine(score, uv, mask)
    return uv, s, mask


def occupied_cell_mask(occ_uv, occ_level, occ_mask, level: int,
                       H: int, W: int, cell: int, scale: float):
    """Per-level grid occupancy: True for cells containing an existing
    point tracked at this pyramid level (occ_uv in level-0 coords).
    Blocking only the point's own level keeps coarse levels detectable —
    a level-0 cell footprint scales with the level, so same-level
    blocking has the reference's scale semantics."""
    ncy, ncx = H // cell, W // cell
    u = (occ_uv[:, 0] / scale).astype(jnp.int32) // cell
    v = (occ_uv[:, 1] / scale).astype(jnp.int32) // cell
    hit = occ_mask & (occ_level == level) & (u >= 0) & (u < ncx) \
        & (v >= 0) & (v < ncy)
    cid = jnp.where(hit, v * ncx + u, ncy * ncx)
    return jnp.zeros((ncy * ncx + 1,), bool).at[cid].set(
        True, mode="drop")[: ncy * ncx]


def detect_pyramid(pyr: Tuple[jnp.ndarray, ...], scales: np.ndarray,
                   threshold: float, low_threshold: float,
                   n_features: int, cell: int = 32,
                   per_cell: int = 4, border: int = 16,
                   occupied=None) -> Keypoints:
    """Detect on every pyramid level, map to level-0 coords, keep the global
    top `n_features` by score. Static output capacity = n_features.

    `occupied` = (uv [C,2] level-0 coords, level [C], mask [C]) suppresses
    detection in grid cells already holding those points (the reference's
    DSO occupancy mode, /root/reference/src/ORBextractor.cc:1275-1386)."""
    all_uv, all_s, all_lvl, all_m = [], [], [], []
    for lvl, img in enumerate(pyr):
        blocked = None
        if occupied is not None:
            o_uv, o_lvl, o_m = occupied
            blocked = occupied_cell_mask(o_uv, o_lvl, o_m, lvl,
                                         img.shape[0], img.shape[1], cell,
                                         float(scales[lvl]))
        uv, s, m = detect_level(img, threshold, cell, per_cell, border,
                                low_threshold, blocked=blocked)
        all_uv.append(uv * float(scales[lvl]))
        all_s.append(s)
        all_lvl.append(jnp.full(s.shape, lvl, dtype=jnp.int32))
        all_m.append(m)
    uv = jnp.concatenate(all_uv)
    s = jnp.concatenate(all_s)
    lvl = jnp.concatenate(all_lvl)
    m = jnp.concatenate(all_m)

    if uv.shape[0] < n_features:  # small images: pad with invalid slots
        pad = n_features - uv.shape[0]
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), uv.dtype)])
        s = jnp.concatenate([s, jnp.zeros((pad,), s.dtype)])
        lvl = jnp.concatenate([lvl, jnp.zeros((pad,), lvl.dtype)])
        m = jnp.concatenate([m, jnp.zeros((pad,), bool)])

    ranked = jnp.where(m, s, -jnp.inf)
    top_s, idx = jax.lax.top_k(ranked, n_features)
    keep_mask = jnp.isfinite(top_s)
    return Keypoints(
        uv=uv[idx], score=jnp.where(keep_mask, s[idx], 0.0),
        level=lvl[idx], angle=jnp.zeros(n_features, jnp.float32),
        mask=m[idx] & keep_mask)
