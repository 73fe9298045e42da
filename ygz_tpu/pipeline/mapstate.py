"""MapState: the whole SLAM map as one pytree of fixed-capacity arrays.

This dissolves the reference's pointer graph (KeyFrame/MapPoint objects,
per-object mutexes, observation std::maps — /root/reference/include/
{KeyFrame,MapPoint,Map}.h) into flat padded tensors + masks:

  * keyframes:   poses, feature tables, BoW vectors, per-feature map-point
                 links (kf_mp_idx replaces both MapPoint::mObservations and
                 KeyFrame::mvpMapPoints — one array, two directions).
  * map points:  position, distinctive descriptor, viewing normal, scale
                 range, found/visible counters, and a CANONICAL REFERENCE
                 PATCH. Storing the patch at creation time (instead of
                 keeping every KF's image pyramid alive like the
                 reference's KeyFrame::mvImagePyramid,
                 /root/reference/include/KeyFrame.h:324) is the key memory
                 redesign: direct local-map tracking warps these stored
                 patches, so old images are never needed again and the
                 device map stays ~50 MB at EuRoC scale.

All mutation helpers are pure (return a new MapState) and shape-stable, so
the tracking/mapping steps compile once. Slot allocation (which indices
are free) is host-side bookkeeping in the pipeline layer; masks are the
on-device source of truth.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

# canonical patch stored per map point: PATCH_SIDE^2 pixels sampled at the
# point's detection level, used as the warp source for align2d
MP_PATCH_SIDE = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapState:
    # --- keyframes ---
    kf_q: jnp.ndarray          # [K, 4] world->cam rotation
    kf_t: jnp.ndarray          # [K, 3]
    kf_mask: jnp.ndarray       # [K] slot in use
    kf_timestamp: jnp.ndarray  # [K]
    kf_frame_id: jnp.ndarray   # [K] source frame id
    # per-KF feature tables
    kf_uv: jnp.ndarray         # [K, N, 2]
    kf_ur: jnp.ndarray         # [K, N] right-image u (-1 mono)
    kf_level: jnp.ndarray      # [K, N]
    kf_angle: jnp.ndarray      # [K, N]
    kf_desc: jnp.ndarray       # [K, N, 8] uint32
    kf_feat_mask: jnp.ndarray  # [K, N]
    kf_mp_idx: jnp.ndarray     # [K, N] map point per feature (-1 none)
    kf_bow: jnp.ndarray        # [K, W] dense BoW vector
    # --- map points ---
    mp_pos: jnp.ndarray        # [M, 3] world
    mp_mask: jnp.ndarray       # [M]
    mp_desc: jnp.ndarray       # [M, 8] distinctive descriptor
    mp_normal: jnp.ndarray     # [M, 3] mean viewing direction
    mp_min_dist: jnp.ndarray   # [M] scale-invariance range
    mp_max_dist: jnp.ndarray   # [M]
    mp_ref_kf: jnp.ndarray     # [M] reference KF slot
    mp_level: jnp.ndarray      # [M] detection level (for patch scale)
    mp_patch: jnp.ndarray      # [M, MP_PATCH_SIDE^2] canonical ref patch
    mp_found: jnp.ndarray      # [M] int32 found counter
    mp_visible: jnp.ndarray    # [M] int32 visible counter
    mp_first_kf: jnp.ndarray   # [M] creating KF slot (for culling rules)
    mp_obs_count: jnp.ndarray  # [M] int32 number of KF observations


def make_empty(max_kf: int, max_mp: int, n_feat: int, n_words: int,
               dtype=jnp.float32) -> MapState:
    K, M, N, W = max_kf, max_mp, n_feat, n_words
    f = lambda *s: jnp.zeros(s, dtype)
    i = lambda *s: jnp.zeros(s, jnp.int32)
    return MapState(
        kf_q=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (K, 1)),
        kf_t=f(K, 3), kf_mask=jnp.zeros((K,), bool),
        kf_timestamp=f(K), kf_frame_id=i(K),
        kf_uv=f(K, N, 2), kf_ur=jnp.full((K, N), -1.0, dtype),
        kf_level=i(K, N), kf_angle=f(K, N),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_feat_mask=jnp.zeros((K, N), bool),
        kf_mp_idx=jnp.full((K, N), -1, jnp.int32),
        kf_bow=f(K, W),
        mp_pos=f(M, 3), mp_mask=jnp.zeros((M,), bool),
        mp_desc=jnp.zeros((M, 8), jnp.uint32),
        mp_normal=f(M, 3),
        mp_min_dist=f(M), mp_max_dist=jnp.full((M,), 1e9, dtype),
        mp_ref_kf=i(M), mp_level=i(M),
        mp_patch=f(M, MP_PATCH_SIDE * MP_PATCH_SIDE),
        mp_found=jnp.ones((M,), jnp.int32),
        mp_visible=jnp.ones((M,), jnp.int32),
        mp_first_kf=i(M), mp_obs_count=i(M),
    )


def capacities(ms: MapState) -> Tuple[int, int, int]:
    return ms.kf_q.shape[0], ms.mp_pos.shape[0], ms.kf_uv.shape[1]


def grow(ms: MapState, kf_factor: int = 1, mp_factor: int = 1) -> MapState:
    """Return a MapState with capacities multiplied by the given factors
    (power-of-two bucketing — long sequences outgrow the initial static
    shapes; jitted programs retrace once per bucket, so the number of
    recompiles over a run is O(log N)). Existing contents are preserved;
    new slots carry the same empty defaults as make_empty."""
    K, M, N = capacities(ms)
    W = ms.kf_bow.shape[1]
    fresh = make_empty(K * kf_factor, M * mp_factor, N, W,
                       dtype=ms.kf_t.dtype)

    def merge(name):
        old = getattr(ms, name)
        new = getattr(fresh, name)
        if old.shape == new.shape:
            return old
        idx = tuple(slice(0, s) for s in old.shape)
        return new.at[idx].set(old)

    return MapState(**{f.name: merge(f.name)
                       for f in dataclasses.fields(MapState)})


# ---------------------------------------------------------------------------
# covisibility (computed on demand from kf_mp_idx — replaces the
# reference's cached mConnectedKeyFrameWeights, KeyFrame::UpdateConnections)
# ---------------------------------------------------------------------------

def covisibility_counts(ms: MapState, kf_slot) -> jnp.ndarray:
    """[K] number of map points KF `kf_slot` shares with every other KF."""
    M = ms.mp_pos.shape[0]
    mp_ids = ms.kf_mp_idx[kf_slot]                         # [N]
    valid = (mp_ids >= 0) & ms.kf_feat_mask[kf_slot]
    member = jnp.zeros((M + 1,), bool).at[jnp.where(valid, mp_ids, M)].set(True)
    member = member.at[M].set(False)
    other = jnp.where(ms.kf_mp_idx >= 0, ms.kf_mp_idx, M)  # [K, N]
    shared = member[other] & ms.kf_feat_mask & (ms.kf_mp_idx >= 0)
    counts = jnp.sum(shared.astype(jnp.int32), axis=1)
    counts = counts.at[kf_slot].set(0)
    return jnp.where(ms.kf_mask, counts, 0)


def covisibility_matrix(ms: MapState) -> jnp.ndarray:
    """[K, K] full covisibility weights (for essential-graph construction).
    One segment-sum pass over all observations: W = B B^T with B the
    KF x MP incidence matrix, computed without materializing B densely."""
    K, M, N = capacities(ms)
    # incidence as scatter: [K, M] dense bool is K*M bits; for K=256,
    # M=2^15 that is 8M entries = 8 MB as int8 — acceptable and simple.
    valid = ms.kf_feat_mask & (ms.kf_mp_idx >= 0)
    mp = jnp.where(valid, ms.kf_mp_idx, M)
    B = jnp.zeros((K, M + 1), jnp.float32)
    kf_ids = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    B = B.at[kf_ids, mp].set(1.0)
    B = B[:, :M]
    Wm = B @ B.T
    Wm = Wm * (1.0 - jnp.eye(K))
    return Wm * ms.kf_mask[:, None] * ms.kf_mask[None, :]


def observers_of(ms: MapState, mp_member: jnp.ndarray) -> jnp.ndarray:
    """[K] bool: KFs observing any map point in the boolean set mp_member
    [M] (used to find the fixed-KF ring for local BA)."""
    M = ms.mp_pos.shape[0]
    member = jnp.concatenate([mp_member, jnp.zeros((1,), bool)])
    idx = jnp.where(ms.kf_mp_idx >= 0, ms.kf_mp_idx, M)
    hit = member[idx] & ms.kf_feat_mask
    return jnp.any(hit, axis=1) & ms.kf_mask


def predict_scale_level(dist, max_dist, scale_factor: float, n_levels: int):
    """Predicted pyramid level from viewing distance (reference
    MapPoint::PredictScale, /root/reference/include/MapPoint.h:85-87)."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-6), 1e-6)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor))
    return jnp.clip(lvl.astype(jnp.int32), 0, n_levels - 1)
