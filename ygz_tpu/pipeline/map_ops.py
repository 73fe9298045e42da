"""Device-side MapState mutation and query kernels used by tracking and
mapping: keyframe insertion, batched map-point insertion, observation
binding, direct-cache projection/alignment, and map-point attribute
refresh (distinctive descriptor, normal, scale range).

These are the pure-array counterparts of the reference's KeyFrame /
MapPoint member functions (AddObservation, ComputeDistinctiveDescriptors,
UpdateNormalAndDepth — /root/reference/include/MapPoint.h:66-87) — each
one is a batched scatter/gather instead of a locked pointer walk.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ygz_tpu.core import lie
from ygz_tpu.ops import align
from ygz_tpu.ops.hamming import hamming_matrix
from ygz_tpu.ops.interp import bilinear_sample
from ygz_tpu.pipeline.mapstate import MapState, MP_PATCH_SIDE, predict_scale_level


def insert_keyframe(ms: MapState, slot, T_cw, timestamp, frame_id,
                    uv, ur, level, angle, desc, feat_mask, mp_idx, bow_vec
                    ) -> MapState:
    """Write one KF into its slot (pure scatter)."""
    import dataclasses
    return dataclasses.replace(
        ms,
        kf_q=ms.kf_q.at[slot].set(T_cw["q"]),
        kf_t=ms.kf_t.at[slot].set(T_cw["t"]),
        kf_mask=ms.kf_mask.at[slot].set(True),
        kf_timestamp=ms.kf_timestamp.at[slot].set(timestamp),
        kf_frame_id=ms.kf_frame_id.at[slot].set(frame_id),
        kf_uv=ms.kf_uv.at[slot].set(uv),
        kf_ur=ms.kf_ur.at[slot].set(ur),
        kf_level=ms.kf_level.at[slot].set(level),
        kf_angle=ms.kf_angle.at[slot].set(angle),
        kf_desc=ms.kf_desc.at[slot].set(desc),
        kf_feat_mask=ms.kf_feat_mask.at[slot].set(feat_mask),
        kf_mp_idx=ms.kf_mp_idx.at[slot].set(mp_idx),
        kf_bow=ms.kf_bow.at[slot].set(bow_vec),
    )


def extract_patches(img_level, uv_level, side: int = MP_PATCH_SIDE):
    """Sample [B, side*side] canonical patches around uv (level coords),
    block-gathered. Patch index j along u corresponds to image offset
    j - side/2, i.e. the center uv sits at patch coordinate side/2."""
    from ygz_tpu.ops.interp import sample_patch_grid
    val, _ = sample_patch_grid(img_level, uv_level, side // 2)
    return val


def add_map_points(ms: MapState, slots, pos, desc, normal, min_d, max_d,
                   ref_kf, level, patch, first_kf, valid) -> MapState:
    """Batched map-point insertion into free slots [B]. Invalid lanes write
    to a scratch slot (index 0 with mask False preserved via where)."""
    import dataclasses
    # route invalid lanes to their own slot but leave mask False
    def put(arr, val):
        cur = arr[slots]
        val = jnp.where(valid.reshape(valid.shape + (1,) * (val.ndim - 1)),
                        val, cur)
        return arr.at[slots].set(val)

    return dataclasses.replace(
        ms,
        mp_pos=put(ms.mp_pos, pos),
        mp_mask=ms.mp_mask.at[slots].set(
            jnp.where(valid, True, ms.mp_mask[slots])),
        mp_desc=put(ms.mp_desc, desc),
        mp_normal=put(ms.mp_normal, normal),
        mp_min_dist=put(ms.mp_min_dist, min_d),
        mp_max_dist=put(ms.mp_max_dist, max_d),
        mp_ref_kf=put(ms.mp_ref_kf, ref_kf),
        mp_level=put(ms.mp_level, level),
        mp_patch=put(ms.mp_patch, patch),
        mp_first_kf=put(ms.mp_first_kf, first_kf),
        mp_obs_count=put(ms.mp_obs_count, jnp.zeros_like(slots)),
        mp_found=put(ms.mp_found, jnp.ones_like(slots)),
        mp_visible=put(ms.mp_visible, jnp.ones_like(slots)),
    )


@jax.jit
def bind_observations(ms: MapState) -> MapState:
    """Recompute mp_obs_count after a KF's mp_idx row changed: counts are
    derived entirely from kf_mp_idx so they can't drift (the reference
    maintains nObs imperatively and has to keep it consistent by hand)."""
    import dataclasses
    M = ms.mp_pos.shape[0]
    valid = ms.kf_feat_mask & (ms.kf_mp_idx >= 0) & ms.kf_mask[:, None]
    idx = jnp.where(valid, ms.kf_mp_idx, M)
    counts = jnp.zeros((M + 1,), jnp.int32).at[idx.reshape(-1)].add(1)[:M]
    return dataclasses.replace(ms, mp_obs_count=counts)


def refresh_map_points(ms: MapState, mp_sel, scale_factor: float,
                       n_levels: int) -> MapState:
    """Batched MapPoint::ComputeDistinctiveDescriptors +
    UpdateNormalAndDepth for the boolean selection mp_sel [M].

    Distinctive descriptor: among all KF observations of the point, pick
    the one minimizing the median Hamming distance to the others
    (reference /root/reference/src/MapPoint.cc). Normal: mean unit vector
    from observing KF centers. Scale range from the ref-KF distance and
    detection level.
    """
    import dataclasses
    K, N = ms.kf_mp_idx.shape
    M = ms.mp_pos.shape[0]
    MAX_OBS = 16  # consider up to 16 observations per point

    # gather observation table: for each mp, which (kf, feat)?
    # build [M, MAX_OBS] indices by a stable scatter over all features
    valid = ms.kf_feat_mask & (ms.kf_mp_idx >= 0) & ms.kf_mask[:, None]
    flat_mp = jnp.where(valid, ms.kf_mp_idx, M).reshape(-1)      # [K*N]
    order = jnp.argsort(flat_mp)                                  # group by mp
    sorted_mp = flat_mp[order]
    # position within group
    first = jnp.concatenate([jnp.array([True]), sorted_mp[1:] != sorted_mp[:-1]])
    seg_start = jnp.where(first, jnp.arange(K * N), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(K * N) - seg_start                          # [K*N]
    keep = (sorted_mp < M) & (rank < MAX_OBS)
    obs_tab = jnp.full((M, MAX_OBS), -1, jnp.int32)
    obs_tab = obs_tab.at[jnp.where(keep, sorted_mp, M - 1),
                         jnp.where(keep, rank, MAX_OBS - 1)].set(
        jnp.where(keep, order, -1).astype(jnp.int32))             # flat kf*N+f

    obs_kf = obs_tab // N
    obs_ft = obs_tab % N
    obs_ok = obs_tab >= 0

    # distinctive descriptor: per mp, [MAX_OBS, 8] descriptors
    descs = ms.kf_desc[jnp.clip(obs_kf, 0, K - 1),
                       jnp.clip(obs_ft, 0, N - 1)]                # [M, O, 8]

    def distinctive(d, ok):
        dist = hamming_matrix(d, d).astype(jnp.float32)           # [O, O]
        big = 1e6
        dist = jnp.where(ok[None, :], dist, big)
        ds = jnp.sort(dist, axis=1)
        n_ok = jnp.sum(ok.astype(jnp.int32))
        med_i = jnp.clip(n_ok // 2, 0, MAX_OBS - 1)
        med = ds[:, med_i]
        med = jnp.where(ok, med, big)
        return d[jnp.argmin(med)]

    new_desc = jax.vmap(distinctive)(descs, obs_ok)

    # normal + distances
    kf_centers = -lie.quat_rotate(lie.quat_conj(ms.kf_q), ms.kf_t)  # [K,3]
    ctrs = kf_centers[jnp.clip(obs_kf, 0, K - 1)]                 # [M, O, 3]
    vecs = ms.mp_pos[:, None, :] - ctrs
    vn = vecs / jnp.maximum(jnp.linalg.norm(vecs, axis=-1, keepdims=True), 1e-9)
    nrm = jnp.sum(jnp.where(obs_ok[..., None], vn, 0.0), axis=1)
    n_obs = jnp.maximum(jnp.sum(obs_ok, axis=1), 1)
    nrm = nrm / n_obs[:, None]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)

    ref_ctr = kf_centers[jnp.clip(ms.mp_ref_kf, 0, K - 1)]
    dist_ref = jnp.linalg.norm(ms.mp_pos - ref_ctr, axis=-1)
    lvl_scale = scale_factor ** ms.mp_level.astype(jnp.float32)
    max_d = dist_ref * lvl_scale
    min_d = max_d / (scale_factor ** (n_levels - 1))

    has_obs = jnp.any(obs_ok, axis=1)
    sel = mp_sel & ms.mp_mask & has_obs
    s1 = sel[:, None]
    return dataclasses.replace(
        ms,
        mp_desc=jnp.where(s1, new_desc, ms.mp_desc),
        mp_normal=jnp.where(s1, nrm, ms.mp_normal),
        mp_min_dist=jnp.where(sel, min_d, ms.mp_min_dist),
        mp_max_dist=jnp.where(sel, max_d, ms.mp_max_dist),
    )


# ---------------------------------------------------------------------------
# direct local-map search (FindDirectProjection, batched)
# ---------------------------------------------------------------------------

def warp_stored_patches(mp_patch, A_cur_ref, mp_level_scale,
                        search_level_scale,
                        half: int = align.ALIGN_HALF_PATCH):
    """Warp each point's canonical stored patch into the current frame's
    search level: offsets at the search level -> level-0 -> (A^-1) ->
    ref level-0 -> stored-patch pixel coords. Replaces the reference's
    WarpAffine which resamples the ref KF image
    (/root/reference/src/ORBmatcher.cc:1549-1571) — the stored patch
    removes any dependence on old images."""
    offs = align._patch_offsets(half)                    # [P, 2] search-level
    Ainv = jnp.linalg.inv(A_cur_ref)                     # [M, 2, 2]
    offs0 = offs[None] * search_level_scale[:, None, None]
    ref0 = jnp.einsum("mij,mpj->mpi", Ainv, offs0)       # ref level-0 offsets
    patch_coords = ref0 / mp_level_scale[:, None, None] \
        + MP_PATCH_SIDE / 2.0
    patches2d = mp_patch.reshape(-1, MP_PATCH_SIDE, MP_PATCH_SIDE)
    return jax.vmap(bilinear_sample)(patches2d, patch_coords)  # [M, P]


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factor",
                                             "cam"))
def search_local_points_direct(ms: MapState, cand_idx, T_cw, pyr_cur,
                               cam, n_levels: int, scale_factor: float):
    """The direct local-map matcher: for candidate map points cand_idx [C],
    project into the current frame, pick the best pyramid level, warp the
    stored patch, and run batched align2d on every level at once.

    Mirrors Tracking::SearchLocalPointsDirect + FindDirectProjection
    (/root/reference/src/Tracking.cc:2174-2215, src/ORBmatcher.cc:
    1573-1602), except the reference loops points serially and we align
    all C points in n_levels masked batched calls.

    Returns (uv_matched [C,2] level-0, level [C], success [C]).
    """
    C = cand_idx.shape[0]
    pos = ms.mp_pos[cand_idx]
    valid = ms.mp_mask[cand_idx]

    pc = lie.se3_apply(T_cw, pos)
    z = pc[..., 2]
    u = cam.fx * pc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy
    H0, W0 = pyr_cur[0].shape
    b = 8.0
    in_img = (z > 0.05) & (u >= b) & (u < W0 - b) & (v >= b) & (v < H0 - b)

    # scale / viewing-angle frustum gates (Frame::isInFrustum,
    # /root/reference/src/Frame.cc:363-422)
    kf_ctr = -lie.quat_rotate(lie.quat_conj(ms.kf_q), ms.kf_t)
    dist = jnp.linalg.norm(pos - _cam_center(T_cw)[None], axis=-1)
    scale_ok = (dist >= 0.8 * ms.mp_min_dist[cand_idx]) & \
               (dist <= 1.2 * ms.mp_max_dist[cand_idx])
    view = (pos - _cam_center(T_cw)[None])
    view = view / jnp.maximum(
        jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    cos_view = jnp.sum(view * ms.mp_normal[cand_idx], axis=-1)
    valid = valid & in_img & scale_ok & (cos_view > 0.5)

    # affine warp from the point's reference KF to the current frame
    ref_kf = ms.mp_ref_kf[cand_idx]
    T_ref = {"q": ms.kf_q[ref_kf], "t": ms.kf_t[ref_kf]}
    T_cur_ref = lie.se3_compose(T_cw, lie.se3_inverse(T_ref))
    pc_ref = lie.se3_apply(T_ref, pos)
    uv_ref = jnp.stack(
        [cam.fx * pc_ref[..., 0] / jnp.maximum(pc_ref[..., 2], 1e-6) + cam.cx,
         cam.fy * pc_ref[..., 1] / jnp.maximum(pc_ref[..., 2], 1e-6) + cam.cy],
        axis=-1)
    A = align.affine_warp_matrix(uv_ref, jnp.maximum(pc_ref[..., 2], 1e-3),
                                 T_cur_ref, cam, cam)
    search_level = align.best_search_level(A, n_levels, scale_factor)

    mp_lvl_scale = scale_factor ** ms.mp_level[cand_idx].astype(jnp.float32)
    srch_scale = scale_factor ** search_level.astype(jnp.float32)
    ref_patches = warp_stored_patches(ms.mp_patch[cand_idx], A,
                                      mp_lvl_scale, srch_scale)

    # ONE align2d pass over the level ATLAS instead of n_levels masked
    # passes: each candidate samples its own level's tile (a point at
    # level l reads atlas pixels at (u_l + xoff[l], v_l)). Cuts the
    # fused-step cost ~3x at n_levels=4 — align2d is latency-bound in
    # its GN loop, so fewer calls beat smaller calls.
    from ygz_tpu.ops.pyramid import atlas_from_pyramid
    atlas, xoffs = atlas_from_pyramid(pyr_cur)
    lvl_scale = jnp.asarray([scale_factor ** l for l in range(n_levels)],
                            jnp.float32)[search_level]
    xoff = jnp.asarray(xoffs, jnp.float32)[search_level]
    uv0_in = jnp.stack([u, v], axis=-1)
    uv_lvl = uv0_in / lvl_scale[:, None]
    # stay inside the point's own level tile (the atlas has zero gutters,
    # not an out-of-range guard)
    m = align.ALIGN_HALF_PATCH + 6.0
    sizes = [(pyr_cur[l].shape[0], pyr_cur[l].shape[1])
             for l in range(n_levels)]
    h_l = jnp.asarray([s[0] for s in sizes], jnp.float32)[search_level]
    w_l = jnp.asarray([s[1] for s in sizes], jnp.float32)[search_level]
    inb = (uv_lvl[:, 0] >= m) & (uv_lvl[:, 0] < w_l - m) & \
          (uv_lvl[:, 1] >= m) & (uv_lvl[:, 1] < h_l - m)
    sel = valid & inb
    uv_at = uv_lvl.at[:, 0].add(xoff)
    if jax.default_backend() == "tpu":
        # fused KLT: one Pallas dispatch for the whole batched loop
        # (the XLA while-loop version runs ~20 op-groups x 10 iters
        # inside the fused tracking program)
        from ygz_tpu.ops import pallas_align
        uv_ref_out, conv, ncc = pallas_align.align2d_fused(
            atlas, ref_patches, uv_at, sel)
    else:
        uv_ref_out, conv, ncc = align.align2d(
            atlas, ref_patches, uv_at, sel, with_score=True)
    uv0 = (uv_ref_out - jnp.stack([xoff, jnp.zeros_like(xoff)], -1)) \
        * lvl_scale[:, None]
    moved = jnp.linalg.norm(uv0 - uv0_in, axis=-1)
    # the NCC gate is what makes "converged" mean "matched": on a
    # corrupted/blank frame KLT steps vanish (singular H) and every
    # lane would pass the step test with garbage underneath
    success = sel & conv & (moved < 10.0 * lvl_scale) & (ncc > 0.4)
    uv_out = jnp.where(success[:, None], uv0, uv0_in)
    return uv_out, search_level, success, valid


def _cam_center(T_cw):
    return -lie.quat_rotate(lie.quat_conj(T_cw["q"]), T_cw["t"])


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factor",
                                             "cam"))
def refine_bound_observations(ms: MapState, slot, pyr, cam,
                              n_levels: int, scale_factor: float,
                              max_move: float = 3.0):
    """Photometric refinement of a keyframe's bound observations: align
    each feature position against its map point's canonical patch (warped
    into this view) with batched KLT.

    Detector corners carry ~0.5-1 px view-dependent localization bias —
    the dominant noise source feeding triangulation and BA (measured on
    the synthetic world: sigma ~0.85 px, exactly accounting for the
    observed map depth spread). KLT against ONE shared appearance
    template per point makes all of a point's observations consistent to
    ~0.1-0.2 px. The reference gets this for free on direct-tracked
    features (it describes at the aligned positions,
    /root/reference/src/ORBextractor.cc:1031-1127); here the same
    treatment applies to every bound feature of every new KF.

    Returns the refined kf_uv row [N, 2].
    """
    mp = ms.kf_mp_idx[slot]
    bound = (mp >= 0) & ms.kf_feat_mask[slot]
    ids = jnp.where(bound, mp, 0)
    uv_det = ms.kf_uv[slot]
    T = {"q": ms.kf_q[slot], "t": ms.kf_t[slot]}

    pos = ms.mp_pos[ids]
    ref_kf = ms.mp_ref_kf[ids]
    T_ref = {"q": ms.kf_q[ref_kf], "t": ms.kf_t[ref_kf]}
    T_cur_ref = lie.se3_compose(T, lie.se3_inverse(T_ref))
    pc_ref = lie.se3_apply(T_ref, pos)
    uv_ref = jnp.stack(
        [cam.fx * pc_ref[..., 0] / jnp.maximum(pc_ref[..., 2], 1e-6) + cam.cx,
         cam.fy * pc_ref[..., 1] / jnp.maximum(pc_ref[..., 2], 1e-6) + cam.cy],
        axis=-1)
    A = align.affine_warp_matrix(uv_ref, jnp.maximum(pc_ref[..., 2], 1e-3),
                                 T_cur_ref, cam, cam)
    search_level = align.best_search_level(A, n_levels, scale_factor)
    mp_lvl_scale = scale_factor ** ms.mp_level[ids].astype(jnp.float32)
    srch_scale = scale_factor ** search_level.astype(jnp.float32)
    patches = warp_stored_patches(ms.mp_patch[ids], A, mp_lvl_scale,
                                  srch_scale)

    # single align2d pass over the level atlas (see
    # search_local_points_direct for the layout)
    from ygz_tpu.ops.pyramid import atlas_from_pyramid
    atlas, xoffs = atlas_from_pyramid(pyr)
    lvl_scale = jnp.asarray([scale_factor ** l for l in range(n_levels)],
                            jnp.float32)[search_level]
    xoff = jnp.asarray(xoffs, jnp.float32)[search_level]
    uv_lvl = uv_det / lvl_scale[:, None]
    m = align.ALIGN_HALF_PATCH + 6.0
    h_l = jnp.asarray([pyr[l].shape[0] for l in range(n_levels)],
                      jnp.float32)[search_level]
    w_l = jnp.asarray([pyr[l].shape[1] for l in range(n_levels)],
                      jnp.float32)[search_level]
    inb = (uv_lvl[:, 0] >= m) & (uv_lvl[:, 0] < w_l - m) & \
          (uv_lvl[:, 1] >= m) & (uv_lvl[:, 1] < h_l - m)
    sel = bound & inb
    if jax.default_backend() == "tpu":
        from ygz_tpu.ops import pallas_align
        uv_new, conv, _ = pallas_align.align2d_fused(
            atlas, patches, uv_lvl.at[:, 0].add(xoff), sel)
    else:
        uv_new, conv = align.align2d(atlas, patches,
                                     uv_lvl.at[:, 0].add(xoff), sel)
    uv0 = (uv_new - jnp.stack([xoff, jnp.zeros_like(xoff)], -1)) \
        * lvl_scale[:, None]
    moved = jnp.linalg.norm(uv0 - uv_det, axis=-1)
    ok = sel & conv & (moved < max_move * lvl_scale)
    uv_out = jnp.where(ok[:, None], uv0, uv_det)
    return uv_out, jnp.sum(ok.astype(jnp.int32))
