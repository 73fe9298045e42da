"""Relocalization: BoW candidate retrieval + hypothesis-batched linear-PnP
RANSAC + pose refinement.

Replaces the reference Relocalization path (/root/reference/src/Tracking.cc:
1742-1894) and its EPnP solver (/root/reference/src/PnPsolver.cc, 963 LoC).
Where the reference iterates EPnP RANSAC 5 hypotheses at a time per
candidate KF, here B=128 six-point DLT pose hypotheses solve as one
batched SVD, all hypotheses score against all matches in one broadcast,
and the winner is polished by the standard pose optimizer. DLT-PnP is
less minimal than EPnP (6 pts vs 4) but on TPU the extra samples are
free and the estimator is simpler and batch-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import ba
from ygz_tpu.core import lie
from ygz_tpu.matching import search, vocabulary
from ygz_tpu.pipeline import frame as frame_mod


@functools.partial(jax.jit, static_argnames=("n_hyp", "n_sample"))
def pnp_ransac(pts_w, uv, mask, K, n_hyp: int = 192, seed: int = 0,
               inlier_px: float = 5.0, n_sample: int = 12):
    """Batched DLT-PnP RANSAC. pts_w [N,3], uv [N,2] -> (R [3,3], t [3],
    inliers [N], n_inliers). Needs >= 6 valid correspondences.

    Samples are deliberately LARGER than minimal (12 vs 6): DLT-PnP is
    degenerate for coplanar points, and SLAM maps are often
    plane-dominant; an oversampled hypothesis stays well-conditioned
    whenever >= 2 off-plane points land in it, at a small robustness cost
    that the post-ratio-test inlier rate easily affords (EPnP's control
    points solve this differently; same recall, messier batching)."""
    N = pts_w.shape[0]
    key = jax.random.PRNGKey(seed)
    logits = jnp.where(mask, 0.0, -1e9)
    samp = jax.random.categorical(key, logits[None, None, :], axis=-1,
                                  shape=(n_hyp, n_sample))

    # normalized image coords
    Kinv = jnp.linalg.inv(K)
    uvh = jnp.concatenate([uv, jnp.ones((N, 1))], axis=1) @ Kinv.T
    xn = uvh[:, :2]

    X = pts_w[samp]          # [B, n_sample, 3]
    x = xn[samp]             # [B, n_sample, 2]

    # DLT rows: for P = [R|t] (3x4, normalized coords):
    # x*(p3 . Xh) - (p1 . Xh) = 0 ; y*(p3 . Xh) - (p2 . Xh) = 0
    Xh = jnp.concatenate([X, jnp.ones(X.shape[:2] + (1,))], axis=-1)  # [B,6,4]
    z = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, z, -x[..., 0:1] * Xh], axis=-1)         # [B,6,12]
    r2 = jnp.concatenate([z, Xh, -x[..., 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)                              # [B,12,12]
    _, _, vt = jnp.linalg.svd(A)
    P = vt[:, -1, :].reshape(-1, 3, 4)

    # the homogeneous solution is P = alpha [R|t] with arbitrary-sign
    # alpha; normalize to alpha > 0 first (det(M3) = alpha^3 det(R)),
    # otherwise orthogonalizing -alpha R produces a non-rotation
    M3 = P[:, :, :3]
    sgn = jnp.sign(jnp.linalg.det(M3))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    P = P * sgn[:, None, None]
    M3 = P[:, :, :3]
    u, s, vt2 = jnp.linalg.svd(M3)
    det = jnp.linalg.det(u @ vt2)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = u @ (D[..., None] * vt2)
    scale = jnp.maximum(jnp.mean(s, axis=-1), 1e-12)
    t = P[:, :, 3] / scale[:, None]

    def score(Rb, tb):
        pc = jnp.einsum("bij,nj->bni", Rb, pts_w) + tb[:, None, :]
        zc = pc[..., 2]
        good_z = zc > 1e-3
        up = K[0, 0] * pc[..., 0] / jnp.maximum(zc, 1e-3) + K[0, 2]
        vp = K[1, 1] * pc[..., 1] / jnp.maximum(zc, 1e-3) + K[1, 2]
        err = (up - uv[None, :, 0]) ** 2 + (vp - uv[None, :, 1]) ** 2
        inl = good_z & (err < inlier_px ** 2) & mask[None, :]
        return inl

    inl = score(R, t)
    n = jnp.sum(inl, axis=1)
    best = jnp.argmax(n)
    return R[best], t[best], inl[best], n[best]


def relocalize(tracker, fr: frame_mod.Frame) -> bool:
    """BoW-rank candidate KFs, match descriptors, PnP-RANSAC, refine.
    (reference: DetectRelocalizationCandidates + PnPsolver loop +
    PoseOptimization + guided re-search)."""
    cfg = tracker.cfg
    fr2 = frame_mod.extract_features(fr, cfg)
    tracker._copy_frame_fields(fr, fr2)
    if int(jnp.sum(fr.feat_mask)) < 50:
        return False

    word_ids = vocabulary.transform(tracker.vocab, fr.desc, fr.feat_mask)
    qvec = vocabulary.bow_vector(tracker.vocab, word_ids, fr.feat_mask)
    scores = vocabulary.score_against_database(
        qvec, tracker.ms.kf_bow, tracker.ms.kf_mask)
    order = np.argsort(-np.asarray(scores))[:5]

    for k in order:
        k = int(k)
        if float(scores[k]) <= 0:
            break
        kf_mp = tracker.ms.kf_mp_idx[k]
        kf_valid = tracker.ms.kf_feat_mask[k] & (kf_mp >= 0)
        res = search.search_by_descriptor(
            tracker.ms.kf_desc[k], tracker.ms.kf_angle[k], kf_valid,
            fr.desc, fr.angle, fr.feat_mask, ratio=0.75)
        if int(jnp.sum(res.mask)) < 15:
            continue
        mp_ids = jnp.where(kf_valid, kf_mp, 0)
        pts = tracker.ms.mp_pos[mp_ids]
        uv = fr.uv[res.idx]
        R, t, inl, n = pnp_ransac(pts, uv, res.mask, cfg.camera.K,
                                  seed=fr.frame_id)
        if int(n) < 10:
            continue
        T0 = {"q": lie.matrix_to_quat(R), "t": t}
        lvl = fr.level[res.idx]
        inv_s2 = jnp.asarray(cfg.inv_level_sigma2)[
            jnp.clip(lvl, 0, cfg.n_levels - 1)]
        T, inlier, n_in = ba.pose_optimization(
            T0, pts, uv, jnp.full(uv.shape[:1], -1.0), inv_s2,
            res.mask & inl, cfg.camera.fx, cfg.camera.fy, cfg.camera.cx,
            cfg.camera.cy, cfg.camera.bf)
        if int(n_in) < 20:
            continue
        fr.T_cw = T
        fr.mp_idx = jnp.full((cfg.n_features,), -1, jnp.int32).at[
            jnp.where(inlier, res.idx, cfg.n_features)].set(
            mp_ids.astype(jnp.int32), mode="drop")
        tracker.ref_kf = k
        tracker.last_inliers = int(n_in)
        tracker.velocity = None
        return True
    return False
