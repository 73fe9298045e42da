"""Sparse direct alignment: frame-to-frame pose tracking and per-point
2D patch refinement — the two hot loops of the hybrid tracker, fully
batched over features.

Replaces:
  * SparseImgAlign (/root/reference/src/SparseImageAlign.cc): SVO-style
    coarse-to-fine photometric pose alignment on 4x4 patches. The
    reference precomputes reference-patch Jacobians per level to save CPU
    (inverse compositional); here each GN iteration samples intensity AND
    gradient of the current image in one fused gather pass
    (forward-compositional), which costs the same on TPU — gathers
    dominate either way — and converges at least as well. All N patches
    x 16 pixels contribute to one 6x6 normal system via einsum.
  * Align2D (/root/reference/src/Align.cc:8-104): 8x8 KLT with
    mean-intensity-difference term. The reference aligns ONE patch per
    call inside a serial loop over cached map points
    (/root/reference/src/Tracking.cc:2174-2215); here every candidate
    aligns simultaneously — the single biggest TPU win in the tracker.

Conventions: poses map reference-camera coords to current-camera coords
(T_cur_ref); updates are left-multiplicative se3 retractions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ygz_tpu.core import lie
from ygz_tpu.core.robust import huber_weight, mean_abs_scale
from ygz_tpu.core.smallsolve import solve3x3, solve6x6
from ygz_tpu.ops.interp import (bilinear_sample, gather_anchored_blocks,
                                sample_blocks_shifted, sample_patch_grid)

SPARSE_HALF_PATCH = 2   # 4x4 patches (reference SparseImageAlign.h:15-17)
ALIGN_HALF_PATCH = 4    # 8x8 patches (reference Align.cc)


def _patch_offsets(half: int):
    """[(2*half)^2, 2] (du, dv) integer offsets centered on the keypoint."""
    r = jnp.arange(-half, half, dtype=jnp.float32)
    du = jnp.broadcast_to(r[None, :], (2 * half, 2 * half)).reshape(-1)
    dv = jnp.broadcast_to(r[:, None], (2 * half, 2 * half)).reshape(-1)
    return jnp.stack([du, dv], axis=-1)


def _proj_jacobian(pc, fx, fy):
    """d(u,v)/d xi for a camera point pc under left-mult se3 update:
    [2,6] = d(uv)/d(pc) @ [I | -hat(pc)]."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zi = 1.0 / jnp.maximum(jnp.abs(z), 1e-6) * jnp.sign(jnp.where(z == 0, 1.0, z))
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    # rows of d(uv)/d(pc)
    duv_dpc = jnp.stack([
        jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1),
        jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1),
    ], axis=-2)  # [..., 2, 3]
    dpc_dxi = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3)),
        -lie.hat(pc),
    ], axis=-1)  # [..., 3, 6]
    return duv_dpc @ dpc_dxi  # [..., 2, 6]


class SparseAlignProblem(NamedTuple):
    """Static-capacity inputs for one pyramid level of sparse alignment.

    ref_patches: [N, P] reference intensities (P = 16)
    points_ref:  [N, 3] 3D points in the REFERENCE camera frame
    mask:        [N]    validity
    """
    ref_patches: jnp.ndarray
    points_ref: jnp.ndarray
    mask: jnp.ndarray


def extract_ref_patches(img_ref, uv_ref, half: int = SPARSE_HALF_PATCH):
    """Sample [N, P] reference patches at (possibly sub-pixel) uv —
    one block gather per point (see interp.sample_patch_grid)."""
    val, _ = sample_patch_grid(img_ref, uv_ref, half)
    return val


def sparse_align_level(T_cur_ref, img_cur, prob: SparseAlignProblem,
                       fx: float, fy: float, cx: float, cy: float,
                       num_iters: int = 10, half: int = SPARSE_HALF_PATCH,
                       margin: int = 8):
    """Gauss-Newton photometric pose refinement on one pyramid level.

    Mirrors the per-level loop of SparseImgAlign::run
    (/root/reference/src/SparseImageAlign.cc:38-49) with 10 iterations,
    Huber-weighted intensity residuals, 6x6 solve; returns the refined
    pose and the fraction-tracked diagnostics. `margin` is the px of
    pose-update slack after the initial projection (window half-width of
    the gather-once resampler).
    """

    def project(T):
        pc = lie.se3_apply(T, prob.points_ref)
        u = fx * pc[..., 0] / jnp.maximum(pc[..., 2], 1e-3) + cx
        v = fy * pc[..., 1] / jnp.maximum(pc[..., 2], 1e-3) + cy
        return pc, jnp.stack([u, v], axis=-1)

    # gather ONCE at the initial projection; GN iterations resample
    # shifted windows from the in-register blocks (see interp docstring —
    # per-iteration gathers cost ~0.6 ms fixed on TPU)
    pc0, uv0 = project(T_cur_ref)
    blocks, corner, blk_valid = gather_anchored_blocks(
        img_cur, uv0, half, margin)
    center = corner + (half + margin)  # block-center pixel coords

    def gn_iter(carry):
        T, _, it, _ = carry
        pc, uv = project(T)
        behind = pc[..., 2] < 1e-3
        val, gu, gv, in_range = sample_blocks_shifted(
            blocks, uv - center, half, margin, with_grad=True)
        r = val - prob.ref_patches                             # [N, P]
        valid_pt = prob.mask & ~behind & blk_valid & in_range
        valid = valid_pt[:, None] & jnp.ones_like(r, dtype=bool)

        sigma = mean_abs_scale(r, valid)
        w = huber_weight(r / sigma, 1.345) / (sigma * sigma)
        w = jnp.where(valid, w, 0.0)

        Jc = _proj_jacobian(pc, fx, fy)                  # [N, 2, 6]
        g = jnp.stack([gu, gv], axis=-1)                 # [N, P, 2]
        J = jnp.einsum("npk,nkd->npd", g, Jc)            # [N, P, 6]
        H = jnp.einsum("npd,npe,np->de", J, J, w)
        b = -jnp.einsum("npd,np,np->d", J, r, w)
        dx = solve6x6(H + 1e-6 * jnp.eye(6), b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        T_new = lie.se3_retract(T, dx)
        n_good = jnp.sum(valid_pt.astype(jnp.int32))
        return T_new, n_good, it + 1, jnp.linalg.norm(dx)

    # early-stopping GN: the reference's NLLSSolver also exits on a small
    # update (eps stop, NLSSolver_impl.hpp:78-85); typical convergence is
    # 3-4 iterations, and on TPU each skipped iteration saves real
    # dispatch-bound time
    def cont(carry):
        _, _, it, step = carry
        return (it < num_iters) & (step > 1e-5)

    T, n_good, _, _ = jax.lax.while_loop(
        cont, gn_iter, (T_cur_ref, jnp.int32(0), jnp.int32(0),
                        jnp.float32(1e9)))
    return T, n_good


def fisher_information(T_cur_ref, img_cur, prob: SparseAlignProblem,
                       fx: float, fy: float, cx: float, cy: float,
                       half: int = SPARSE_HALF_PATCH,
                       sigma_i_sq: float = 5e-4 * 255.0 * 255.0):
    """Fisher information of the photometric pose estimate at T_cur_ref:
    the unweighted GN Hessian over the image noise variance (reference
    SparseImgAlign::getFisherInformation,
    /root/reference/src/SparseImageAlign.cc:51-55). A tracking-quality
    diagnostic — small eigenvalues flag poorly-constrained motion
    directions (e.g. pure-forward motion on a fronto-parallel plane)."""
    pc = lie.se3_apply(T_cur_ref, prob.points_ref)
    z = jnp.maximum(pc[..., 2], 1e-3)
    u = fx * pc[..., 0] / z + cx
    v = fy * pc[..., 1] / z + cy
    uv = jnp.stack([u, v], axis=-1)
    val, gu, gv, in_img = sample_patch_grid(img_cur, uv, half,
                                            with_grad=True)
    valid = prob.mask & in_img & (pc[..., 2] > 1e-3)
    Jc = _proj_jacobian(pc, fx, fy)                       # [N, 2, 6]
    g = jnp.stack([gu, gv], axis=-1)                      # [N, P, 2]
    J = jnp.einsum("npk,nkd->npd", g, Jc)                 # [N, P, 6]
    w = valid[:, None].astype(jnp.float32) * jnp.ones(val.shape)
    H = jnp.einsum("npd,npe,np->de", J, J, w)
    return H / sigma_i_sq


def sparse_image_align(T_init, pyr_ref, pyr_cur, uv_ref0, points_ref, mask,
                       cam, scales, max_level: int, min_level: int = 0,
                       num_iters: int = 10, use_pallas=None):
    """Coarse-to-fine sparse alignment over pyramid levels max->min
    (reference SparseImageAlign.cc:20-49; default levels 2..0 per
    /root/reference/src/Tracking.cc:207 SparseImgAlign(nLevels-1, 1)).

    uv_ref0: [N, 2] feature pixels at level 0 in the reference frame.
    points_ref: [N, 3] their 3D positions in the reference camera frame.
    use_pallas: None = auto (fused kernel on TPU), False = XLA path,
    "interpret" = fused kernel in interpreter mode (tests).
    Returns (T_cur_ref, n_tracked).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    T = T_init
    n_good = jnp.int32(0)
    for lvl in range(max_level, min_level - 1, -1):
        # the coarsest level absorbs the motion-prior error (wide window,
        # full iterations); finer levels start at the coarser optimum, so
        # their residual shift is small — a narrower resample window and
        # fewer GN iterations buy back real device time (the per-level
        # kernel cost scales with window taps x iterations). The
        # reference runs 10 iterations with unbounded per-iteration
        # sampling at every level (SparseImageAlign.cc:38-49); the
        # narrow-window equivalence holds because each level re-anchors
        # its gather at the incoming pose's projection.
        coarsest = lvl == max_level
        margin = 8 if coarsest else 6
        iters_l = num_iters if coarsest else min(num_iters, 6)
        s = 1.0 / float(scales[lvl])
        uv_l = uv_ref0 * s
        ref_patches = extract_ref_patches(pyr_ref[lvl], uv_l)
        if use_pallas:
            from ygz_tpu.core import lie as _lie
            from ygz_tpu.ops import pallas_align
            pc = _lie.se3_apply(T, points_ref)
            u = cam.fx * s * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-3) \
                + cam.cx * s
            v = cam.fy * s * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-3) \
                + cam.cy * s
            blocks, corner, bv = gather_anchored_blocks(
                pyr_cur[lvl], jnp.stack([u, v], -1), SPARSE_HALF_PATCH,
                margin)
            center = corner + (SPARSE_HALF_PATCH + margin)
            T, n_good = pallas_align.sparse_align_level_fused(
                T, blocks, ref_patches, points_ref, center, mask & bv,
                cam.fx * s, cam.fy * s, cam.cx * s, cam.cy * s,
                num_iters=iters_l, half=SPARSE_HALF_PATCH, margin=margin,
                interpret=(use_pallas == "interpret"))
        else:
            prob = SparseAlignProblem(
                ref_patches=ref_patches, points_ref=points_ref, mask=mask)
            T, n_good = sparse_align_level(
                T, pyr_cur[lvl], prob,
                cam.fx * s, cam.fy * s, cam.cx * s, cam.cy * s,
                num_iters=iters_l, margin=margin)
    return T, n_good


# ---------------------------------------------------------------------------
# batched 2D KLT (Align2D)
# ---------------------------------------------------------------------------

def align2d(img_cur, ref_patches, uv_init, mask,
            num_iters: int = 10, half: int = ALIGN_HALF_PATCH,
            conv_eps: float = 0.03, with_score: bool = False):
    """Refine M keypoint positions by KLT with a mean-brightness term.

    img_cur:     [H, W] current level image
    ref_patches: [M, P] reference patches (P = (2*half)^2), e.g. from
                 warp_affine_patches
    uv_init:     [M, 2] starting positions on this level
    Returns (uv_refined [M,2], converged [M] bool); with_score=True
    appends a zero-mean NCC [M] between the reference patch and the
    image at the converged position. KLT "convergence" (small last
    step) is necessary but not sufficient for a true match: on a
    content-free or corrupted image the normal equations go
    near-singular, steps shrink, and every lane reports converged with
    garbage underneath — the NCC is the photometric proof the gate
    needs (the reference gets the equivalent protection from its
    descriptor-distance checks on the feature path).

    Parameters per point: (du, dv, dm) with residual
    r = I_cur(x + d) - I_ref - dm, J = [gu, gv, -1]; same estimator the
    reference solves with a precomputed 3x3 Hessian
    (/root/reference/src/Align.cc:8-104), but all M points at once.
    """
    M = uv_init.shape[0]
    margin = 5  # search slack around the initial position (px, this level)

    blocks, corner, blk_valid = gather_anchored_blocks(
        img_cur, uv_init, half, margin)
    center = corner + (half + margin)

    def gn_iter(carry):
        uv, dm, last_step, it = carry
        val, gu, gv, in_range = sample_blocks_shifted(
            blocks, uv - center, half, margin, with_grad=True)
        r = val - ref_patches - dm[:, None]             # [M, P]
        w = (in_range & blk_valid & mask)[:, None].astype(jnp.float32) \
            * jnp.ones_like(r)
        J = jnp.stack([gu, gv, -jnp.ones_like(gu)], axis=-1)  # [M, P, 3]
        H = jnp.einsum("mpd,mpe,mp->mde", J, J, w)
        b = -jnp.einsum("mpd,mp,mp->md", J, r, w)
        dx = solve3x3(H + 1e-4 * jnp.eye(3), b)
        ok = jnp.all(jnp.isfinite(dx), axis=-1)
        dx = jnp.where(ok[:, None], dx, 0.0)
        uv = uv + dx[:, :2]
        # keep the estimate inside the gathered window
        uv = jnp.clip(uv, center - margin, center + margin)
        dm = dm + dx[:, 2]
        step = jnp.linalg.norm(dx[:, :2], axis=-1)
        return uv, dm, step, it + 1

    def cont(carry):
        _, _, step, it = carry
        # stop when every lane converged or diverged-out-of-window
        return (it < num_iters) & (jnp.max(step) > conv_eps)

    uv, dm, last_step, _ = jax.lax.while_loop(
        cont, gn_iter,
        (uv_init, jnp.zeros((M,), jnp.float32),
         jnp.full((M,), 1e9, jnp.float32), jnp.int32(0)))
    converged = mask & blk_valid & (last_step < conv_eps)
    if not with_score:
        return uv, converged
    val, _, _, in_range = sample_blocks_shifted(
        blocks, uv - center, half, margin, with_grad=True)
    a = val - jnp.mean(val, axis=-1, keepdims=True)
    bzm = ref_patches - jnp.mean(ref_patches, axis=-1, keepdims=True)
    ncc = jnp.sum(a * bzm, axis=-1) / jnp.sqrt(
        jnp.sum(a * a, axis=-1) * jnp.sum(bzm * bzm, axis=-1) + 1e-6)
    converged = converged & in_range
    return uv, converged, ncc


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factors",
                                             "max_move"))
def refine_matches_klt(pyr_ref, uv_ref, lvl_ref, pyr_cur, uv_cur, mask,
                       n_levels: int, scale_factors: tuple,
                       max_move: float = 4.0):
    """KLT-refine matched feature positions in the current frame against
    reference-frame patches, per pyramid level.

    Detector corners carry ~0.5-1 px view-dependent localization bias —
    refining the current-side position photometrically against the
    reference appearance cuts the PAIR's relative error to ~0.1-0.2 px,
    which multiplies through triangulation accuracy (depth error scales
    linearly with match noise). No affine warp: callers use this for
    small-viewpoint-change pairs (initialization, consecutive KFs).

    uv_ref/uv_cur: [N, 2] level-0 positions; lvl_ref: [N] detection level.
    Returns (uv_cur_refined [N, 2], refined_ok [N]).
    """
    uv_out = uv_cur
    ok_out = jnp.zeros(mask.shape, bool)
    for lvl in range(n_levels):
        sel = mask & (lvl_ref == lvl)
        s = 1.0 / float(scale_factors[lvl])
        patches = extract_ref_patches(pyr_ref[lvl], uv_ref * s,
                                      half=ALIGN_HALF_PATCH)
        uv_new, conv = align2d(pyr_cur[lvl], patches, uv_cur * s, sel)
        uv0 = uv_new / s
        moved = jnp.linalg.norm(uv0 - uv_cur, axis=-1)
        good = sel & conv & (moved < max_move / s)
        uv_out = jnp.where(good[:, None], uv0, uv_out)
        ok_out = ok_out | good
    return uv_out, ok_out


def warp_affine_patches(img_ref, uv_ref, A_cur_ref, search_level_scale,
                        half: int = ALIGN_HALF_PATCH, border: int = 1):
    """Build reference patches for align2d by warping the reference image
    through per-point affine matrices (reference GetWarpAffineMatrix +
    WarpAffine, /root/reference/src/ORBmatcher.cc:1525-1571).

    A_cur_ref: [M, 2, 2] affine from ref-level-0 pixel offsets to current
    frame level-0 offsets. The patch is sampled in the ref image at
    A^{-1} applied to current-search-level offsets.
    """
    offs = _patch_offsets(half)  # [P, 2] offsets in the SEARCH level
    Ainv = jnp.linalg.inv(A_cur_ref)            # [M, 2, 2]
    # current-level offset -> level0 current offset -> ref level0 offset
    offs0 = offs[None, :, :] * search_level_scale[:, None, None]
    ref_offs = jnp.einsum("mij,mpj->mpi", Ainv, offs0)
    pix = uv_ref[:, None, :] + ref_offs
    return bilinear_sample(img_ref, pix)


def affine_warp_matrix(uv_ref, depth_ref, T_cur_ref, cam_ref, cam_cur,
                       d_pix: float = 5.0):
    """Per-point 2x2 affine approximation of the ref->cur image warp,
    computed by projecting the point and two pixel-offset probes
    (reference GetWarpAffineMatrix, /root/reference/src/ORBmatcher.cc:1525-1547).

    uv_ref [M,2], depth_ref [M] -> A [M,2,2]
    """
    def backproject(uv, z):
        x = (uv[..., 0] - cam_ref.cx) / cam_ref.fx
        y = (uv[..., 1] - cam_ref.cy) / cam_ref.fy
        return jnp.stack([x * z, y * z, z], axis=-1)

    def project(pc):
        z = jnp.maximum(pc[..., 2], 1e-6)
        return jnp.stack([cam_cur.fx * pc[..., 0] / z + cam_cur.cx,
                          cam_cur.fy * pc[..., 1] / z + cam_cur.cy], axis=-1)

    p0 = backproject(uv_ref, depth_ref)
    pu = backproject(uv_ref + jnp.array([d_pix, 0.0]), depth_ref)
    pv = backproject(uv_ref + jnp.array([0.0, d_pix]), depth_ref)
    q0 = project(lie.se3_apply(T_cur_ref, p0))
    qu = project(lie.se3_apply(T_cur_ref, pu))
    qv = project(lie.se3_apply(T_cur_ref, pv))
    col_u = (qu - q0) / d_pix
    col_v = (qv - q0) / d_pix
    return jnp.stack([col_u, col_v], axis=-1)  # [M, 2, 2]


def best_search_level(A, n_levels: int, scale_factor: float):
    """Pick the pyramid level whose scale best matches the warp's
    determinant (reference GetBestSearchLevel,
    /root/reference/include/ORBmatcher.h:185-197)."""
    det = jnp.abs(jnp.linalg.det(A))
    level = jnp.zeros(det.shape, jnp.int32)
    d = det
    for _ in range(n_levels - 1):
        step = d > 3.0
        level = level + step.astype(jnp.int32)
        d = jnp.where(step, d / (scale_factor * scale_factor), d)
    return jnp.clip(level, 0, n_levels - 1)
