"""The per-keyframe mapping step as a handful of fused device programs.

Round-3 profiling on the tunneled TPU showed the map-maintenance step
costing ~28 s per keyframe — not in device FLOPs but in host dispatch:
every eager (non-jitted) op costs 20-46 ms of tunnel round trip and every
`float()`/`int()` readback ~60 ms, and the round-3 mapping step performed
hundreds of both (per-neighbor loops in triangulation, per-target loops in
fusion, per-candidate readbacks in culling). A jitted program dispatch, by
contrast, costs 0.44 ms and does not block.

So this module re-states LocalMapping::Run's sequence
(/root/reference/src/LocalMapping.cc:777-854) as four jitted programs with
ZERO blocking host syncs:

  P1 cull_and_triangulate — MapPointCulling (:930-964) with the "recent
     points" list as a DEVICE ring buffer, then CreateNewMapPoints
     (:978-1227) over all covisible neighbor pairs in one program with
     first-good-pair-wins semantics and DEVICE-side slot allocation
     (free slots ranked by cumsum of ~mp_mask).
  P2 fuse_step — SearchInNeighbors (:1228-1328), both directions, with
     the bind/replace decisions (reference Fuse + MapPoint::Replace)
     computed on device: binds as masked scatters, merges as a resolved
     remap table ordered by (obs_count, id) so no cycles are possible.
  P3 local_ba_step — window selection (covisibility top-k), fixed-ring
     selection, gather/solve/scatter/outlier-unbind in one program
     (reference LocalBundleAdjustment, src/Optimizer.cc:1844-2155).
  P4 cull_kf_and_refresh — KeyFrameCulling (:1419-1500) with the victim
     chosen on device (max-covisibility among >90 %-redundant candidates)
     plus MapPoint attribute refresh; returns the victim id and its
     re-anchoring transform in a small stats bundle the host reads back
     LATER (batched into the pipelined tracker's drain readback).

Decisions the host still makes: which programs to run (n_kf thresholds),
keyframe-slot bookkeeping (updated when the stats bundle resolves), and
capacity growth (hysteresis on the alive count so a few frames of readback
lag cannot overflow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ygz_tpu.backend import ba
from ygz_tpu.core import lie
from ygz_tpu.matching import search
from ygz_tpu.pipeline import map_ops, mapstate
from ygz_tpu.pipeline.mapstate import MP_PATCH_SIDE
from ygz_tpu.utils.config import SlamConfig

RECENT_CAP = 4096      # device ring of recently created points
WINDOW_FREE = 16       # local-BA free window (covisible top-15 + new KF)
WINDOW_KF_CAP = 32     # free window + fixed observer ring
LOCAL_MP_CAP = 4096    # reverse-fuse candidate capacity (and the sharded
                       # multi-chip BA path's point capacity)
BA_MP_CAP = 2048       # single-chip local-BA point capacity: the W-scatter,
                       # Hpp and Schur-reduction costs scale with it, and a
                       # 15-KF covisible window holds well under 2k distinct
                       # points in practice (points beyond the cap keep
                       # their positions that round; they are re-eligible
                       # next KF because _compact is deterministic over the
                       # changing member set)

# stats bundle layout (float32[16]) — read back at the pipeline drain
S_VICTIM = 0       # culled KF slot (-1 none)
S_ANCHOR = 1       # re-anchor KF for the victim's trajectory records
S_ALIVE_MP = 2     # map points alive after the step
S_ALIVE_KF = 3     # keyframes alive after the step
S_N_KILLED = 4     # map points culled
S_N_CREATED = 5    # map points triangulated
S_N_FUSED = 6      # fuse binds + merges
S_TDA = 8          # [8:15) = T_dead_anchor (q wxyz, t xyz)


def make_ring():
    return (jnp.full((RECENT_CAP,), -1, jnp.int32),
            jnp.zeros((RECENT_CAP,), jnp.int32),
            jnp.int32(0))


def _nth_free(free):
    """free [M] bool -> (nth [M] int32: index of the r-th free slot,
    n_free). nth[r] for r >= n_free stays M (out of range)."""
    M = free.shape[0]
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    nth = jnp.full((M,), M, jnp.int32).at[
        jnp.where(free, rank, M)].set(jnp.arange(M, dtype=jnp.int32),
                                      mode="drop")
    return nth, jnp.sum(free.astype(jnp.int32))


def _compact(ids_mask, cap: int):
    """Boolean selection [M] -> (idx [cap] int32 of selected indices in
    ascending order, valid [cap])."""
    M = ids_mask.shape[0]
    rank = jnp.cumsum(ids_mask.astype(jnp.int32)) - 1
    out = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(ids_mask & (rank < cap), rank, cap)].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop")
    n = jnp.minimum(jnp.sum(ids_mask.astype(jnp.int32)), cap)
    return out, jnp.arange(cap) < n


def _patches_at_levels(pyr, uv0, lvl, scale_factors):
    C = uv0.shape[0]
    out = jnp.zeros((C, MP_PATCH_SIDE ** 2))
    for l, s in enumerate(scale_factors):
        p = map_ops.extract_patches(pyr[l], uv0 / float(s))
        out = jnp.where((lvl == l)[:, None], p, out)
    return out


def _cam_center_rows(q, t):
    return -lie.quat_rotate(lie.quat_conj(q), t)


def _top_covisible(ms, slot, n: int, min_shared: int = 15):
    """[n] best covisible KF slots of `slot` (-1 where below threshold),
    descending shared-point count (reference GetBestCovisibilityKeyFrames
    with the >=15 connection rule, /root/reference/src/KeyFrame.cc)."""
    counts = mapstate.covisibility_counts(ms, slot)
    vals, idx = jax.lax.top_k(counts, n)
    return jnp.where(vals >= min_shared, idx.astype(jnp.int32), -1), counts


def _sanitize_ring(ms, ring_ids):
    rid = jnp.maximum(ring_ids, 0)
    live = (ring_ids >= 0) & ms.mp_mask[rid]
    return jnp.where(live, ring_ids, -1)


def ring_append(ring_ids, ring_born, head, slots, valid, born):
    """Append `slots[valid]` to the ring at positions head..head+n (mod
    capacity, overwriting the oldest entries)."""
    R = ring_ids.shape[0]
    grank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    pos = (head + grank) % R
    tgt = jnp.where(valid, pos, R)
    ring_ids = ring_ids.at[tgt].set(slots, mode="drop")
    ring_born = ring_born.at[tgt].set(born, mode="drop")
    head = (head + jnp.sum(valid.astype(jnp.int32))) % R
    return ring_ids, ring_born, head


@jax.jit
def ring_append_jit(ring_ids, ring_born, head, slots, valid, born):
    return ring_append(ring_ids, ring_born, head, slots, valid, born)


# ---------------------------------------------------------------------------
# P1: map-point culling + triangulation of new points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "do_tri"))
def cull_and_triangulate(ms, ring_ids, ring_born, head, kf_count, slot,
                         pyr, depth_exact, cfg: SlamConfig,
                         do_tri: bool = True):
    """Returns (ms, ring_ids, ring_born, head, n_killed, n_created)."""
    import dataclasses
    M = ms.mp_pos.shape[0]
    K, N = ms.kf_mp_idx.shape

    # ---- MapPointCulling on the device ring -------------------------------
    ring_ids = _sanitize_ring(ms, ring_ids)
    rid = jnp.maximum(ring_ids, 0)
    live = ring_ids >= 0
    age = kf_count - ring_born
    ratio = ms.mp_found[rid].astype(jnp.float32) / \
        jnp.maximum(ms.mp_visible[rid], 1).astype(jnp.float32)
    # found-ratio < 0.25, or too few KF observations after 2 keyframes
    # (reference MapPointCulling, /root/reference/src/LocalMapping.cc:
    # 930-964; cnFoundRatio 0.25f, nObs <= cnThObs after 2 KFs)
    kill = live & ((ratio < 0.25) | ((age >= 2) & (ms.mp_obs_count[rid] <= 2)))
    graduate = live & ~kill & (age >= 3)
    n_killed = jnp.sum(kill.astype(jnp.int32))

    dead = jnp.zeros((M + 1,), bool).at[
        jnp.where(kill, ring_ids, M)].set(True, mode="drop")[:M]
    mp_mask = ms.mp_mask & ~dead
    idx = ms.kf_mp_idx
    is_dead = dead[jnp.where(idx >= 0, idx, 0)] & (idx >= 0)
    ms = dataclasses.replace(ms, mp_mask=mp_mask,
                             kf_mp_idx=jnp.where(is_dead, -1, idx))
    ring_ids = jnp.where(kill | graduate, -1, ring_ids)

    if not do_tri:
        return ms, ring_ids, ring_born, head, n_killed, jnp.int32(0)

    # ---- CreateNewMapPoints ------------------------------------------------
    cam = cfg.camera
    n_neighbors = 20 if cam.bf == 0 else 10
    neighbors, _ = _top_covisible(ms, slot, n_neighbors)
    # bootstrap: no covisible neighbor yet -> temporally nearest alive KF
    fid = ms.kf_frame_id
    others = ms.kf_mask & (jnp.arange(K) != slot)
    d = jnp.where(others, jnp.abs(fid - fid[slot]), 1 << 30)
    nearest = jnp.argmin(d).astype(jnp.int32)
    has_near = jnp.any(others)
    fallback = jnp.full((n_neighbors,), -1, jnp.int32).at[0].set(
        jnp.where(has_near, nearest, -1))
    neighbors = jnp.where(neighbors[0] >= 0, neighbors, fallback)

    K_mat = jnp.asarray(cam.K)
    lvl_sigma2 = jnp.asarray(cfg.level_sigma2)
    T1 = {"q": ms.kf_q[slot], "t": ms.kf_t[slot]}
    c1 = _cam_center_rows(T1["q"], T1["t"])

    # median scene depth of the new KF's bound points (baseline gate)
    bound = ms.kf_mp_idx[slot]
    bids = jnp.where(bound >= 0, bound, 0)
    depths = lie.se3_apply(T1, ms.mp_pos[bids])[:, 2]
    dvalid = (bound >= 0) & ms.kf_feat_mask[slot] & ms.mp_mask[bids]
    ds = jnp.sort(jnp.where(dvalid, depths, jnp.inf))
    nv = jnp.sum(dvalid.astype(jnp.int32))
    med_depth = jnp.where(nv > 0, ds[jnp.maximum((nv - 1) // 2, 0)], 1.0)

    free1 = ms.kf_feat_mask[slot] & (ms.kf_mp_idx[slot] < 0)
    # depth-SENSOR features (RGB-D) keep their metric depth; re-triangulating
    # them from a short KF baseline warped the RGB-D map scale 0.5x (r2 note)
    free1 = free1 & ~(depth_exact & (ms.kf_ur[slot] >= 0))

    from ygz_tpu.pipeline.mapping import _fundamental, _triangulate_checked

    def pair_fn(k2):
        k2c = jnp.maximum(k2, 0)
        ok_pair = (k2 >= 0) & ms.kf_mask[k2c]
        T2 = {"q": ms.kf_q[k2c], "t": ms.kf_t[k2c]}
        c2 = _cam_center_rows(T2["q"], T2["t"])
        baseline = jnp.linalg.norm(c1 - c2)
        # mono: skip tiny baseline/depth ratios; stereo: baseline must
        # exceed the stereo baseline itself (reference LocalMapping.cc:
        # 1010-1033)
        if cam.bf == 0:
            bl_ok = baseline >= 0.01 * med_depth
        else:
            bl_ok = baseline >= cam.bf / cam.fx
        free2 = ms.kf_feat_mask[k2c] & (ms.kf_mp_idx[k2c] < 0)
        F12 = _fundamental(T1, T2, K_mat)
        res = search.search_for_triangulation(
            ms.kf_desc[slot], ms.kf_uv[slot], ms.kf_angle[slot], free1,
            ms.kf_desc[k2c], ms.kf_uv[k2c], ms.kf_angle[k2c], free2,
            F12, ms.kf_level[k2c], lvl_sigma2)
        pos, good, _ = _triangulate_checked(
            T1, T2, K_mat, ms.kf_uv[slot], ms.kf_uv[k2c][res.idx],
            res.mask, ms.kf_level[slot], ms.kf_level[k2c][res.idx],
            lvl_sigma2, cfg.scale_factor)
        good = good & ok_pair & bl_ok
        return pos, good, res.idx

    # vmap over all neighbor pairs at once: the per-pair programs are
    # small ([N, N] Hamming + top-k), and sequencing them (lax.map) left
    # the device underutilized — batched, the whole triangulation search
    # is one [P, N, N] pass (~80 MB transient at P=20, N=1000; measured
    # 100 ms -> ~35 ms on v5e)
    X, good, idx2 = jax.vmap(pair_fn)(neighbors)

    # first-good-pair-wins == the reference's sequential consumption of
    # free features (neighbors are in descending covisibility order)
    lane = jnp.arange(N)
    first = jnp.argmax(good.astype(jnp.int32), axis=0)
    any_good = jnp.any(good, axis=0)
    Xn = X[first, lane]
    f2 = idx2[first, lane]
    k2_of = neighbors[first]

    # device slot allocation
    nth, n_free = _nth_free(~ms.mp_mask)
    grank = jnp.cumsum(any_good.astype(jnp.int32)) - 1
    slots = nth[jnp.clip(grank, 0, M - 1)]
    valid = any_good & (grank < n_free) & (slots < M)
    slots = jnp.where(valid, slots, 0)
    n_created = jnp.sum(valid.astype(jnp.int32))

    lvl1 = ms.kf_level[slot]
    patches = _patches_at_levels(pyr, ms.kf_uv[slot], lvl1,
                                 cfg.scale_factors)
    normal = Xn - c1[None]
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    ms = map_ops.add_map_points(
        ms, slots, Xn, ms.kf_desc[slot], normal,
        jnp.zeros((N,)), jnp.full((N,), 1e9),
        jnp.full((N,), slot, jnp.int32), lvl1, patches,
        jnp.full((N,), slot, jnp.int32), valid)
    # bind in the new KF and in each feature's winning neighbor
    rows2 = jnp.where(valid, k2_of, K)
    ms = dataclasses.replace(
        ms,
        kf_mp_idx=ms.kf_mp_idx
        .at[slot, jnp.where(valid, lane, N)].set(slots, mode="drop")
        .at[rows2, jnp.where(valid, f2, N)].set(slots, mode="drop"))
    ring_ids, ring_born, head = ring_append(
        ring_ids, ring_born, head, slots, valid, kf_count)
    ms = map_ops.bind_observations(ms)
    return ms, ring_ids, ring_born, head, n_killed, n_created


# ---------------------------------------------------------------------------
# P2: neighborhood fusion (SearchInNeighbors)
# ---------------------------------------------------------------------------

def _merge_remap(M, obs, merge_mask, mp_a, mp_b):
    """Resolve merges into a remap table [M]: for each masked pair
    (a, b), the point with fewer observations is absorbed by the other
    (ties broken by lower id so the relation is a strict order — no
    cycles). Chains are resolved by iterated composition."""
    a, b = mp_a, mp_b
    a_wins = (obs[a] > obs[b]) | ((obs[a] == obs[b]) & (a < b))
    winner = jnp.where(a_wins, a, b)
    loser = jnp.where(a_wins, b, a)
    remap = jnp.arange(M, dtype=jnp.int32)
    remap = remap.at[jnp.where(merge_mask, loser, M)].set(
        winner.astype(jnp.int32), mode="drop")
    for _ in range(4):  # resolves chains up to length 16
        remap = remap[remap]
    return remap


def _apply_remap(ms, remap):
    """Re-point every observation through remap; absorbed points die; a KF
    left observing the same point through two features keeps only the
    first (reference MapPoint::Replace erases the duplicate observation —
    a double binding would double-weight the point in BA)."""
    import dataclasses
    K, N = ms.kf_mp_idx.shape
    M = ms.mp_pos.shape[0]
    idx = ms.kf_mp_idx
    idx = jnp.where(idx >= 0, remap[jnp.clip(idx, 0, M - 1)], -1)
    alive = remap == jnp.arange(M)
    mp_mask = ms.mp_mask & alive
    # per-(KF, point) dedupe: keep the lowest feature index
    valid = idx >= 0
    seg = jnp.where(valid,
                    jnp.arange(K, dtype=jnp.int32)[:, None] * (M + 1) + idx,
                    K * (M + 1)).reshape(-1)
    feat = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (K, N))
    first = jax.ops.segment_min(feat.reshape(-1), seg,
                                num_segments=K * (M + 1) + 1)
    keep = ~valid | (feat == first[seg].reshape(K, N))
    return dataclasses.replace(ms, kf_mp_idx=jnp.where(keep, idx, -1),
                               mp_mask=mp_mask)


def _fuse_matches(ms, cand, cand_valid, tgt, cfg):
    """Fuse candidates `cand` [C] into keyframe `tgt`: returns
    (bind [C], merge [C], feat_idx [C], cur_mp [C])."""
    cam = cfg.camera
    tc = jnp.maximum(tgt, 0)
    ok_t = (tgt >= 0) & ms.kf_mask[tc]
    T2 = {"q": ms.kf_q[tc], "t": ms.kf_t[tc]}
    pc = lie.se3_apply(T2, ms.mp_pos[cand])
    z = pc[:, 2]
    uv = jnp.stack(
        [cam.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx,
         cam.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy], axis=-1)
    visible = cand_valid & ok_t & (z > 0.05) & \
        (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    ctr = _cam_center_rows(T2["q"], T2["t"])
    dist = jnp.linalg.norm(ms.mp_pos[cand] - ctr[None], axis=-1)
    pred = mapstate.predict_scale_level(dist, ms.mp_max_dist[cand],
                                        cfg.scale_factor, cfg.n_levels)
    radius = 3.0 * jnp.asarray(cfg.scale_factors)[pred]
    res = search.fuse_candidates(
        ms.mp_desc[cand], uv, radius, pred, visible,
        ms.kf_desc[tc], ms.kf_uv[tc], ms.kf_level[tc],
        ms.kf_feat_mask[tc])
    match = res.mask & ok_t
    cur = ms.kf_mp_idx[tc, res.idx]
    # candidate already observed by tgt via another feature?
    M = ms.mp_pos.shape[0]
    row = ms.kf_mp_idx[tc]
    row_valid = ms.kf_feat_mask[tc] & (row >= 0)
    bound_set = jnp.zeros((M + 1,), bool).at[
        jnp.where(row_valid, row, M)].set(True, mode="drop")[:M]
    already = bound_set[cand]
    bind = match & (cur < 0) & ~already
    merge = match & (cur >= 0) & (cur != cand)
    return bind, merge, res.idx, cur


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_step(ms, slot, ring_ids, cfg: SlamConfig):
    """Returns (ms, ring_ids, n_fused)."""
    K, N = ms.kf_mp_idx.shape
    M = ms.mp_pos.shape[0]
    F = 10
    neigh, _ = _top_covisible(ms, slot, F)
    targets = jnp.concatenate([neigh, slot[None].astype(jnp.int32)])

    # ---- forward: the new KF's points into each neighbor (and itself) ----
    cand_f = ms.kf_mp_idx[slot]
    cfv = (cand_f >= 0) & ms.kf_feat_mask[slot] & \
        ms.mp_mask[jnp.maximum(cand_f, 0)]
    cand_fc = jnp.where(cfv, cand_f, 0)

    def fwd(t):
        return _fuse_matches(ms, cand_fc, cfv, t, cfg)

    bind, merge, fidx, cur = jax.lax.map(fwd, targets)      # [T, C]
    T = targets.shape[0]
    rows = jnp.where(bind, jnp.broadcast_to(targets[:, None], bind.shape), K)
    cols = jnp.where(bind, fidx, N)
    vals = jnp.broadcast_to(cand_fc[None], bind.shape)
    import dataclasses
    ms = dataclasses.replace(
        ms, kf_mp_idx=ms.kf_mp_idx.at[rows, cols].set(vals, mode="drop"))
    obs = ms.mp_obs_count
    remap = _merge_remap(M, obs, merge.reshape(-1),
                         jnp.broadcast_to(cand_fc[None], merge.shape
                                          ).reshape(-1),
                         jnp.where(merge, cur, 0).reshape(-1))
    ms = _apply_remap(ms, remap)
    ms = map_ops.bind_observations(ms)
    n_f = jnp.sum(bind.astype(jnp.int32)) + jnp.sum(merge.astype(jnp.int32))

    # ---- reverse: the union of the neighbors' points into the new KF ----
    nrows = ms.kf_mp_idx[jnp.maximum(neigh, 0)]              # [F, N]
    nvalid = (neigh >= 0)[:, None] & (nrows >= 0) & \
        ms.kf_feat_mask[jnp.maximum(neigh, 0)] & \
        ms.mp_mask[jnp.maximum(nrows, 0)]
    member = jnp.zeros((M + 1,), bool).at[
        jnp.where(nvalid, nrows, M)].set(True, mode="drop")[:M]
    cand_r, crv = _compact(member, LOCAL_MP_CAP)
    bind_r, merge_r, fidx_r, cur_r = _fuse_matches(ms, cand_r, crv, slot, cfg)
    ms = dataclasses.replace(
        ms, kf_mp_idx=ms.kf_mp_idx.at[
            jnp.where(bind_r, slot, K), jnp.where(bind_r, fidx_r, N)].set(
            cand_r, mode="drop"))
    remap = _merge_remap(M, ms.mp_obs_count, merge_r, cand_r,
                         jnp.where(merge_r, cur_r, 0))
    ms = _apply_remap(ms, remap)
    ms = map_ops.bind_observations(ms)
    n_f = n_f + jnp.sum(bind_r.astype(jnp.int32)) \
        + jnp.sum(merge_r.astype(jnp.int32))
    return ms, _sanitize_ring(ms, ring_ids), n_f


# ---------------------------------------------------------------------------
# P3: windowed local bundle adjustment
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def local_ba_step(ms, slot, cfg: SlamConfig):
    """Window selection + gather + Schur solve + scatter + outlier unbind,
    one program (reference LocalBundleAdjustment,
    /root/reference/src/Optimizer.cc:1844-2155)."""
    import dataclasses
    from ygz_tpu.pipeline.mapping import _gather_local_problem
    K, N = ms.kf_mp_idx.shape
    M = ms.mp_pos.shape[0]

    win, _ = _top_covisible(ms, slot, WINDOW_FREE - 1)
    win = jnp.concatenate([win, slot[None].astype(jnp.int32)])
    wvalid = win >= 0
    n_win = jnp.sum(wvalid.astype(jnp.int32))

    rows = ms.kf_mp_idx[jnp.maximum(win, 0)]
    rvalid = wvalid[:, None] & (rows >= 0) & \
        ms.kf_feat_mask[jnp.maximum(win, 0)] & \
        ms.mp_mask[jnp.maximum(rows, 0)]
    member = jnp.zeros((M + 1,), bool).at[
        jnp.where(rvalid, rows, M)].set(True, mode="drop")[:M]
    lp, mp_mask_l = _compact(member, BA_MP_CAP)
    n_pts = jnp.sum(mp_mask_l.astype(jnp.int32))

    obs_kf = mapstate.observers_of(ms, member)
    in_win = jnp.zeros((K,), bool).at[
        jnp.where(wvalid, win, K)].set(True, mode="drop")
    FIX = WINDOW_KF_CAP - WINDOW_FREE
    fixed_sel, fvalid = _compact(obs_kf & ~in_win, FIX)
    fixed_sel = jnp.where(fvalid, fixed_sel, -1)

    sel = jnp.concatenate([win, fixed_sel])
    sel_valid = sel >= 0
    kf_fixed = jnp.concatenate([jnp.zeros((WINDOW_FREE,), bool),
                                jnp.ones((FIX,), bool)]) | ~sel_valid
    # gauge: with no fixed observer, fix the oldest window KF
    has_fixed = jnp.any(fvalid)
    fidw = jnp.where(wvalid, ms.kf_frame_id[jnp.maximum(win, 0)], 1 << 30)
    oldest = jnp.argmin(fidw)
    kf_fixed = kf_fixed.at[oldest].set(kf_fixed[oldest] | ~has_fixed)

    prob, obs_src = _gather_local_problem(
        ms, jnp.maximum(sel, 0), sel_valid, kf_fixed, lp, mp_mask_l,
        jnp.asarray(cfg.inv_level_sigma2))
    prob2, inlier = ba.local_bundle_adjustment(prob, cfg.camera,
                                               kf_major=True)

    ok = (n_win >= 2) & (n_pts >= 20)
    finq = jnp.all(jnp.isfinite(prob2.kf_q), axis=-1) & \
        jnp.all(jnp.isfinite(prob2.kf_t), axis=-1)
    wq = (ok & sel_valid & finq)[:, None]
    finp = jnp.all(jnp.isfinite(prob2.mp), axis=-1)
    wp = (ok & mp_mask_l & finp)[:, None]

    selc = jnp.maximum(sel, 0)
    kf_q = ms.kf_q.at[selc].set(
        jnp.where(wq, prob2.kf_q, ms.kf_q[selc]))
    kf_t = ms.kf_t.at[selc].set(
        jnp.where(wq, prob2.kf_t, ms.kf_t[selc]))
    mp_pos = ms.mp_pos.at[lp].set(
        jnp.where(wp, prob2.mp, ms.mp_pos[lp]))
    ms = dataclasses.replace(ms, kf_q=kf_q, kf_t=kf_t, mp_pos=mp_pos)

    drop = prob.obs.mask & ~inlier & ok
    rows_u = jnp.where(drop, obs_src[0], K)
    ms = dataclasses.replace(
        ms, kf_mp_idx=ms.kf_mp_idx.at[rows_u, obs_src[1]].set(
            -1, mode="drop"))
    return map_ops.bind_observations(ms)


# ---------------------------------------------------------------------------
# P4: keyframe culling + map-point refresh + stats bundle
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "use_imu", "do_cull"))
def cull_kf_and_refresh(ms, ring_ids, slot, ref_kf, protect, cur_ts,
                        n_killed, n_created, n_fused, cfg: SlamConfig,
                        use_imu: bool, do_cull: bool = True):
    """Returns (ms, stats[16]). `protect` [PR] holds KF slots exempt from
    culling (VIO: the 10 most recent KFs + the temporal predecessor,
    /root/reference/src/LocalMapping.cc:1440-1452); mono passes -1s."""
    import dataclasses
    K, N = ms.kf_mp_idx.shape
    M = ms.mp_pos.shape[0]

    victim = jnp.int32(-1)
    anchor = jnp.int32(-1)
    tda_q = jnp.array([1.0, 0, 0, 0])
    tda_t = jnp.zeros((3,))
    if do_cull:
        counts = mapstate.covisibility_counts(ms, slot)
        vals, idx = jax.lax.top_k(counts, 10)
        cand = jnp.zeros((K,), bool).at[idx].set(vals >= 15)
        ar = jnp.arange(K)
        cand = cand & (ar != slot) & (ar != ref_kf) & (ar > 1) & ms.kf_mask
        if use_imu:
            prot = jnp.zeros((K + 1,), bool).at[
                jnp.where(protect >= 0, protect, K)].set(
                True, mode="drop")[:K]
            cand = cand & ~prot & (ms.kf_timestamp < cur_ts - 0.15)
        valid = (ms.kf_mp_idx >= 0) & ms.kf_feat_mask
        obs = ms.mp_obs_count[jnp.clip(ms.kf_mp_idx, 0, M - 1)]
        red_cnt = jnp.sum((valid & (obs >= 4)).astype(jnp.int32), axis=1)
        n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
        redundant = (n_valid >= 20) & \
            (red_cnt.astype(jnp.float32) > 0.9 * n_valid.astype(jnp.float32))
        pick = cand & redundant
        have = jnp.any(pick)
        # the reference walks covisible KFs in descending order and culls
        # the first redundant one; max-covisibility among picks == same
        victim = jnp.where(
            have, jnp.argmax(jnp.where(pick, counts, -1)).astype(jnp.int32),
            -1)
        vc = jnp.maximum(victim, 0)
        # temporally nearest alive KF as the trajectory re-anchor
        fid = ms.kf_frame_id
        others = ms.kf_mask & (jnp.arange(K) != vc)
        danchor = jnp.where(others, jnp.abs(fid - fid[vc]), 1 << 30)
        anchor = jnp.where(have, jnp.argmin(danchor).astype(jnp.int32), -1)
        T_dead = {"q": ms.kf_q[vc], "t": ms.kf_t[vc]}
        T_anc = {"q": ms.kf_q[jnp.maximum(anchor, 0)],
                 "t": ms.kf_t[jnp.maximum(anchor, 0)]}
        T_d_a = lie.se3_compose(T_dead, lie.se3_inverse(T_anc))
        tda_q = jnp.where(have, T_d_a["q"], tda_q)
        tda_t = jnp.where(have, T_d_a["t"], tda_t)

        from ygz_tpu.pipeline.mapping import _kill_keyframe
        ms = jax.lax.cond(have, lambda m: _kill_keyframe(m, vc),
                          lambda m: m, ms)
        ms = map_ops.bind_observations(ms)

    ms = map_ops.refresh_map_points(
        ms, jnp.ones((M,), bool), cfg.scale_factor, cfg.n_levels)
    ring_ids = _sanitize_ring(ms, ring_ids)

    stats = jnp.zeros((16,), jnp.float32)
    stats = stats.at[S_VICTIM].set(victim.astype(jnp.float32))
    stats = stats.at[S_ANCHOR].set(anchor.astype(jnp.float32))
    stats = stats.at[S_ALIVE_MP].set(
        jnp.sum(ms.mp_mask.astype(jnp.float32)))
    stats = stats.at[S_ALIVE_KF].set(
        jnp.sum(ms.kf_mask.astype(jnp.float32)))
    stats = stats.at[S_N_KILLED].set(jnp.asarray(n_killed, jnp.float32))
    stats = stats.at[S_N_CREATED].set(jnp.asarray(n_created, jnp.float32))
    stats = stats.at[S_N_FUSED].set(jnp.asarray(n_fused, jnp.float32))
    stats = stats.at[S_TDA].set(tda_q[0]).at[S_TDA + 1].set(tda_q[1]) \
        .at[S_TDA + 2].set(tda_q[2]).at[S_TDA + 3].set(tda_q[3]) \
        .at[S_TDA + 4].set(tda_t[0]).at[S_TDA + 5].set(tda_t[1]) \
        .at[S_TDA + 6].set(tda_t[2])
    return ms, ring_ids, stats
