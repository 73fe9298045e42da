"""Oriented rBRIEF descriptors: intensity-centroid orientation + 256-bit
binary descriptors, batched over all keypoints in one call.

Replaces the reference's IC_Angle + computeOrbDescriptor
(/root/reference/src/ORBextractor.cc:77-149). Two deliberate departures:

  * The 256 sampling pairs are NOT the learned OpenCV `bit_pattern_31_`
    table (:152-411) — that is trained data we do not copy. We generate a
    deterministic BRIEF-style pattern (seeded Gaussian pairs, sigma = patch/5,
    clipped to the 31x31 window, deduplicated) which has the same
    descriptor statistics. Vocabularies are trained in-framework
    (matching.vocabulary.train_vocabulary), so descriptor/vocab consistency
    is preserved end-to-end. `set_pattern()` accepts an external pattern
    for users who need bit-compatibility with OpenCV ORB.
  * Orientation and descriptor sampling are flat gathers over the blurred
    level image for ALL keypoints at once (N x 961 and N x 512 index
    gathers) instead of per-keypoint C++ loops.

Descriptors are packed as [N, 8] uint32 (256 bits); Hamming distance is
XLA population_count over these lanes (ops.hamming).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # orientation patch radius, as in ORB
PATCH = 31       # descriptor window


@functools.lru_cache(maxsize=1)
def _ic_angle_weights():
    """Circular-mask coordinate grids for the intensity centroid.

    Matches the reference's per-row u_max circle bounds
    (/root/reference/src/ORBextractor.cc:435-453) by masking the square
    patch to the radius-15 disc (same pixel set).
    """
    r = HALF_PATCH
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    # reference builds umax from round(sqrt(r^2 - v^2)) with symmetry fixes;
    # the resulting set is |x| <= round(sqrt(r^2 - y^2))
    umax = np.round(np.sqrt(r * r - np.minimum(ys * ys, r * r))).astype(np.int32)
    mask = (np.abs(xs) <= umax).astype(np.float32)
    return (xs * mask).astype(np.float32), (ys * mask).astype(np.float32), mask


@functools.lru_cache(maxsize=4)
def _brief_pattern(seed: int = 42):
    """Deterministic 256-pair sampling pattern, BRIEF-II style:
    p, q ~ N(0, (PATCH/5)^2), clipped to the window. Returns [256, 4]
    int32 (px, py, qx, qy)."""
    rng = np.random.RandomState(seed)
    sigma = PATCH / 5.0
    pts = np.clip(np.round(rng.randn(256, 4) * sigma), -(PATCH // 2) + 2,
                  PATCH // 2 - 2).astype(np.int32)
    # avoid degenerate pairs (p == q)
    same = np.all(pts[:, :2] == pts[:, 2:], axis=1)
    pts[same, 2] += 1
    return pts


_PATTERN_OVERRIDE = None


def set_pattern(pattern: np.ndarray):
    """Install an external [256, 4] int32 pattern (e.g. OpenCV's) globally."""
    global _PATTERN_OVERRIDE
    _PATTERN_OVERRIDE = np.asarray(pattern, dtype=np.int32)
    invalidate_selector_cache()


def get_pattern() -> np.ndarray:
    return _PATTERN_OVERRIDE if _PATTERN_OVERRIDE is not None else _brief_pattern()


def _gather(img, v_idx, u_idx):
    H, W = img.shape
    v = jnp.clip(v_idx, 0, H - 1)
    u = jnp.clip(u_idx, 0, W - 1)
    return img.reshape(-1)[v * W + u]


def compute_orientations(img, uv, mask):
    """Intensity-centroid angle for keypoints uv [N,2] on level image `img`.

    angle = atan2(m01, m10) with moments over the radius-15 disc
    (IC_Angle, /root/reference/src/ORBextractor.cc:77-101)."""
    xs_w, ys_w, disc = _ic_angle_weights()
    xs_w = jnp.asarray(xs_w).reshape(-1)
    ys_w = jnp.asarray(ys_w).reshape(-1)
    disc = jnp.asarray(disc).reshape(-1)

    r = HALF_PATCH
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
    ui = jnp.round(uv[:, 0]).astype(jnp.int32)
    vi = jnp.round(uv[:, 1]).astype(jnp.int32)
    # [N, 31, 31] index grids -> flat gather
    N = uv.shape[0]
    side = 2 * r + 1
    vg = jnp.broadcast_to(vi[:, None, None] + offs[None, :, None],
                          (N, side, side)).reshape(N, -1)
    ug = jnp.broadcast_to(ui[:, None, None] + offs[None, None, :],
                          (N, side, side)).reshape(N, -1)
    patch = _gather(img, vg, ug) * disc[None]  # [N, 961]
    m10 = jnp.sum(patch * xs_w[None], axis=1)
    m01 = jnp.sum(patch * ys_w[None], axis=1)
    ang = jnp.arctan2(m01, m10)
    return jnp.where(mask, ang, 0.0)


def compute_descriptors(img_blurred, uv, angle, mask):
    """Steered BRIEF: rotate the pattern by each keypoint's angle, compare
    intensity pairs, pack 256 bits into [N, 8] uint32.

    Mirrors computeOrbDescriptor's rotation-then-compare
    (/root/reference/src/ORBextractor.cc:105-149) with our own pattern.
    """
    pat = jnp.asarray(get_pattern(), dtype=jnp.float32)  # [256, 4]
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]

    def rot(x, y):
        # [N, 256] rotated integer offsets (round like the reference's
        # cvRound inside GET_VALUE)
        rx = jnp.round(x[None, :] * ca[:, None] - y[None, :] * sa[:, None])
        ry = jnp.round(x[None, :] * sa[:, None] + y[None, :] * ca[:, None])
        return rx.astype(jnp.int32), ry.astype(jnp.int32)

    pxr, pyr = rot(pat[:, 0], pat[:, 1])
    qxr, qyr = rot(pat[:, 2], pat[:, 3])

    ui = jnp.round(uv[:, 0]).astype(jnp.int32)[:, None]
    vi = jnp.round(uv[:, 1]).astype(jnp.int32)[:, None]
    ip = _gather(img_blurred, vi + pyr, ui + pxr)  # [N, 256]
    iq = _gather(img_blurred, vi + qyr, ui + qxr)
    bits = (ip < iq).astype(jnp.uint32)  # [N, 256]

    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    desc = jnp.sum(words, axis=2).astype(jnp.uint32)  # [N, 8]
    return jnp.where(mask[:, None], desc, 0)


# ---------------------------------------------------------------------------
# atlas fast path: one block-gather pass + one MXU matmul for all keypoints
# ---------------------------------------------------------------------------
# The per-level flat-gather describe pass costs ~44 ms for 1000 keypoints on
# v5e (element gathers are the slowest primitive on TPU, and every level
# re-gathers all N). This path:
#   * samples each keypoint ONCE from a packed atlas of the blurred levels
#     (ops.pyramid.atlas_from_pyramid) via 2D block gathers — an order of
#     magnitude faster than element gathers (see ops/interp.py);
#   * quantizes the steering angle to ANGLE_BINS rotations (the original
#     ORB paper's 2pi/30 discretization; the reference rotates per-point)
#     and evaluates ALL rotated patterns as one [N, P] x [P, BINS*256]
#     matmul on the MXU with a +1/-1 selection matrix, then picks each
#     keypoint's bin — 11 GFLOPs of dense work beating 512k random gathers.

ANGLE_BINS = 30
DESC_BLOCK = 38        # block side covering rotated offsets in [-19, 18]
_DESC_HALF = 19


@functools.lru_cache(maxsize=4)
def _pattern_selector_np(seed: int = -1):
    """[DESC_BLOCK^2, ANGLE_BINS*256] float32: column b*256+k holds +1 at
    the rotated q-offset of pair k under bin-b rotation and -1 at the
    rotated p-offset (so patch @ Sel = I_q - I_p; bit = result > 0)."""
    pat = (get_pattern() if seed < 0 else _brief_pattern(seed)).astype(
        np.float64)
    sel = np.zeros((DESC_BLOCK * DESC_BLOCK, ANGLE_BINS * 256), np.float32)
    for b in range(ANGLE_BINS):
        th = 2.0 * np.pi * b / ANGLE_BINS
        ca, sa = np.cos(th), np.sin(th)

        def flat(x, y):
            rx = np.round(x * ca - y * sa).astype(np.int64) + _DESC_HALF
            ry = np.round(x * sa + y * ca).astype(np.int64) + _DESC_HALF
            return ry * DESC_BLOCK + rx

        ip = flat(pat[:, 0], pat[:, 1])
        iq = flat(pat[:, 2], pat[:, 3])
        cols = b * 256 + np.arange(256)
        np.add.at(sel, (iq, cols), 1.0)
        np.add.at(sel, (ip, cols), -1.0)
    return sel


_SELECTOR_DEV = None


def _pattern_selector():
    global _SELECTOR_DEV
    if _SELECTOR_DEV is None:
        _SELECTOR_DEV = jax.device_put(_pattern_selector_np())
    return _SELECTOR_DEV


def invalidate_selector_cache():
    """Call after set_pattern() so the atlas path picks up the new table."""
    global _SELECTOR_DEV
    _SELECTOR_DEV = None
    _pattern_selector_np.cache_clear()


def describe_keypoints_atlas(blur_atlas, xoffs, uv0, level, mask, scales,
                             selector=None):
    """Orientation + descriptors for all keypoints in ONE pass over the
    packed blurred-level atlas. uv0 [N,2] level-0 coords; level [N];
    xoffs: static per-level atlas x-offsets. Returns (angles, descs).

    Semantics match compute_orientations/compute_descriptors up to the
    ANGLE_BINS steering quantization (see module comment)."""
    from ygz_tpu.ops.interp import gather_blocks
    scales_j = jnp.asarray(scales)[level]
    xoff = jnp.asarray(xoffs, jnp.float32)[level]
    uv = uv0 / scales_j[:, None]
    ui = jnp.round(uv[:, 0] + xoff).astype(jnp.int32)
    vi = jnp.round(uv[:, 1]).astype(jnp.int32)

    # orientation: intensity-centroid moments over the 31x31 disc
    r = HALF_PATCH
    blocks_o = gather_blocks(blur_atlas, vi - r, ui - r,
                             2 * r + 1, 2 * r + 1)       # [N, 31, 31]
    xs_w, ys_w, _ = _ic_angle_weights()
    flat_o = blocks_o.reshape(blocks_o.shape[0], -1)
    m10 = flat_o @ jnp.asarray(xs_w).reshape(-1)
    m01 = flat_o @ jnp.asarray(ys_w).reshape(-1)
    ang = jnp.where(mask, jnp.arctan2(m01, m10), 0.0)

    # descriptors: 38x38 block per keypoint, all rotations as one matmul
    if selector is None:
        selector = _pattern_selector()
    blocks_d = gather_blocks(blur_atlas, vi - _DESC_HALF, ui - _DESC_HALF,
                             DESC_BLOCK, DESC_BLOCK)
    flat_d = blocks_d.reshape(blocks_d.shape[0], -1)     # [N, 1444]
    # bf16 operands, f32 accumulate: the +/-1 pair-selection matmul only
    # feeds a SIGN test; bf16's ~3 decimal digits on 0-255 intensities
    # moves near-zero differences by <0.5 gray level — at most an
    # occasional flipped bit out of 256, invisible to Hamming matching,
    # while the MXU runs several times faster than in f32
    diffs = jnp.dot(flat_d.astype(jnp.bfloat16),
                    selector.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)  # [N, BINS*256]
    two_pi = 2.0 * jnp.pi
    bin_f = jnp.mod(ang, two_pi) / (two_pi / ANGLE_BINS)
    b = jnp.mod(jnp.round(bin_f).astype(jnp.int32), ANGLE_BINS)
    d_sel = jnp.take_along_axis(
        diffs.reshape(-1, ANGLE_BINS, 256), b[:, None, None], axis=1)[:, 0]
    bits = (d_sel > 0).astype(jnp.uint32)                # [N, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    desc = jnp.sum(words, axis=2).astype(jnp.uint32)
    return ang, jnp.where(mask[:, None], desc, 0)


def describe_keypoints(pyr_blurred, keypoints, scales):
    """Full describe pass: orientation + descriptor per keypoint, sampling
    the blurred image of the keypoint's own level (coordinates are stored
    at level 0, divided back by the level scale here).

    pyr_blurred: tuple of per-level blurred images.
    Returns (angles [N], descriptors [N, 8] uint32).

    Levels are static (python loop over the tuple) with per-level masks —
    each level's gather only touches its own image, XLA fuses the masked
    accumulation.
    """
    N = keypoints.uv.shape[0]
    angles = jnp.zeros((N,), jnp.float32)
    descs = jnp.zeros((N, 8), jnp.uint32)
    for lvl, img in enumerate(pyr_blurred):
        sel = keypoints.mask & (keypoints.level == lvl)
        uv_l = keypoints.uv / float(scales[lvl])
        ang_l = compute_orientations(img, uv_l, sel)
        d_l = compute_descriptors(img, uv_l, ang_l, sel)
        angles = jnp.where(sel, ang_l, angles)
        descs = jnp.where(sel[:, None], d_l, descs)
    return angles, descs
