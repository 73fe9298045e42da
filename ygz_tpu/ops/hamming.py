"""Hamming distance over packed 256-bit ORB descriptors.

Replaces the reference's SSE2 popcount DescriptorDistance
(/root/reference/src/ORBmatcher.cc:1507-1523). Descriptors are [_, 8]
uint32; `jax.lax.population_count` vectorizes over VPU lanes, and the
all-pairs form is one [N, M] broadcast — the matcher's entire inner loop
becomes a single fused XLA op instead of a per-pair C++ call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DIST = 256


def hamming(a, b):
    """Pairwise distance of aligned descriptor arrays [..., 8] -> [...]."""
    x = jax.lax.population_count(jnp.bitwise_xor(a, b))
    return jnp.sum(x, axis=-1).astype(jnp.int32)


def hamming_matrix(a, b):
    """All-pairs distances: a [N, 8], b [M, 8] -> [N, M] int32."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def masked_argmin(dist, mask, fill=MAX_DIST):
    """Argmin along the last axis honoring a validity mask.

    Returns (best_idx, best_dist); invalid lanes read `fill`.
    """
    d = jnp.where(mask, dist, fill)
    idx = jnp.argmin(d, axis=-1)
    best = jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
    return idx.astype(jnp.int32), best


def best_two(dist, mask, fill=MAX_DIST):
    """Best and second-best distances along the last axis (for the
    ratio test dist1 < nn_ratio * dist2 used throughout ORBmatcher)."""
    d = jnp.where(mask, dist, fill)
    neg_top2, idx2 = jax.lax.top_k(-d, 2)
    d1, d2 = -neg_top2[..., 0], -neg_top2[..., 1]
    return idx2[..., 0].astype(jnp.int32), d1, d2
