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
