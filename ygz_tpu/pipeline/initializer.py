"""Monocular two-view bootstrap: parallel Homography/Fundamental RANSAC,
model selection, pose recovery, and triangulation — hypothesis-batched.

Replaces the reference's Initializer (/root/reference/src/Initializer.cc,
990 LoC): where the reference runs 200 sequential RANSAC iterations in
two std::threads (one for H, one for F), here every hypothesis is a lane
of a batched SVD: sample [B, 8] correspondence subsets, solve all B
models at once, score all B x N transfer errors in one broadcast, argmax.
Model choice by the same score ratio RH = SH/(SH+SF) > 0.4; pose recovery
by E decomposition (F path) or Faugeras decomposition (H path) with
batched cheirality counting over candidates x points.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ygz_tpu.core import lie

SIGMA = 1.0
CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991


def _normalize_points(uv, mask):
    """Hartley normalization: zero-mean, unit mean abs deviation.

    Returns (normalized uv, 3x3 transform T with x_norm = T x)."""
    w = mask.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    md = jnp.maximum(jnp.sum(d, axis=0) / n, 1e-6)
    s = 1.0 / md
    uvn = (uv - mean) * s
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return uvn, T


def _solve_f_batch(p1, p2, w=None):
    """Batched normalized 8-point: p1,p2 [B, n, 2] -> F [B, 3, 3] with
    rank-2 projection. Optional per-row weights w [B, n] (0 = exclude)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones],
                  axis=-1)  # [B, n, 9]
    if w is not None:
        A = A * w[..., None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[..., -1, :].reshape(-1, 3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., None] * vt2)


def _solve_h_batch(p1, p2, w=None):
    """Batched DLT homography: [B, n>=4, 2] x2 -> H [B, 3, 3].
    Optional per-row weights w [B, n] (0 = exclude)."""
    B, n, _ = p1.shape
    x, y = p1[..., 0], p1[..., 1]
    u, v = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # [B, 2n, 9]
    if w is not None:
        A = A * jnp.concatenate([w, w], axis=1)[..., None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[..., -1, :].reshape(-1, 3, 3)


def _homog(uv):
    return jnp.concatenate([uv, jnp.ones(uv.shape[:-1] + (1,), uv.dtype)], -1)


def _score_f(F, uv1, uv2, mask):
    """Symmetric epipolar-distance score (reference CheckFundamental):
    per-point contribution max(0, SCORE_TH - chi2) in both directions,
    inlier iff both chi2 < CHI2_F."""
    x1 = _homog(uv1)  # [N, 3]
    x2 = _homog(uv2)
    l2 = jnp.einsum("bij,nj->bni", F, x1)                  # lines in img2
    l1 = jnp.einsum("bji,nj->bni", F, x2)                  # lines in img1
    d2 = (jnp.einsum("ni,bni->bn", x2, l2) ** 2
          / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12))
    d1 = (jnp.einsum("ni,bni->bn", x1, l1) ** 2
          / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12))
    c1, c2 = d1 / SIGMA ** 2, d2 / SIGMA ** 2
    inl = (c1 < CHI2_F) & (c2 < CHI2_F) & mask[None, :]
    sc = (jnp.maximum(SCORE_TH - c1, 0.0) + jnp.maximum(SCORE_TH - c2, 0.0))
    return jnp.sum(jnp.where(inl, sc, 0.0), axis=1), inl


def _score_h(H, uv1, uv2, mask):
    """Symmetric transfer-error score (reference CheckHomography)."""
    Hinv = jnp.linalg.inv(H)
    x1 = _homog(uv1)
    x2 = _homog(uv2)
    p12 = jnp.einsum("bij,nj->bni", H, x1)
    p21 = jnp.einsum("bij,nj->bni", Hinv, x2)
    p12 = p12[..., :2] / jnp.where(jnp.abs(p12[..., 2:]) < 1e-12, 1e-12, p12[..., 2:])
    p21 = p21[..., :2] / jnp.where(jnp.abs(p21[..., 2:]) < 1e-12, 1e-12, p21[..., 2:])
    c2 = jnp.sum((uv2[None] - p12) ** 2, -1) / SIGMA ** 2
    c1 = jnp.sum((uv1[None] - p21) ** 2, -1) / SIGMA ** 2
    inl = (c1 < CHI2_H) & (c2 < CHI2_H) & mask[None, :]
    sc = (jnp.maximum(SCORE_TH - c1, 0.0) + jnp.maximum(SCORE_TH - c2, 0.0))
    return jnp.sum(jnp.where(inl, sc, 0.0), axis=1), inl


def triangulate(P1, P2, uv1, uv2):
    """Batched linear two-view triangulation (inhomogeneous DLT).

    P1, P2: [3, 4] projection matrices; uv: [N, 2]. Returns [N, 3].

    Solves the 4x3 system A[:, :3] X = -A[:, 3] by 3x3 normal equations
    with a closed-form adjugate inverse instead of the homogeneous 4x4
    SVD: the SVD was the single most expensive op in the whole mapping
    step on TPU (121 of 130 ms — TPU SVD is an iterative one-sided
    Jacobi), the closed form is ~60x cheaper. The inhomogeneous form
    fixes w=1, which is ill-posed only for points at infinity — those
    produce huge/non-finite X here and are rejected by the callers'
    depth/parallax/chi2 gates (same gates the reference applies,
    /root/reference/src/LocalMapping.cc:1068-1200)."""
    A = jnp.stack([
        uv1[:, 0, None] * P1[2] - P1[0],
        uv1[:, 1, None] * P1[2] - P1[1],
        uv2[:, 0, None] * P2[2] - P2[0],
        uv2[:, 1, None] * P2[2] - P2[1],
    ], axis=1)  # [N, 4, 4]
    M = A[:, :, :3]
    b = -A[:, :, 3]
    AtA = jnp.einsum("nij,nik->njk", M, M)
    Atb = jnp.einsum("nij,ni->nj", M, b)
    # closed-form 3x3 inverse via adjugate (no LU, no iteration)
    a = AtA
    c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
    c01 = a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2]
    c02 = a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]
    c10 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
    c11 = a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0]
    c12 = a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]
    c20 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
    c21 = a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1]
    c22 = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    det = a[:, 0, 0] * c00 + a[:, 0, 1] * c10 + a[:, 0, 2] * c20
    adj = jnp.stack([jnp.stack([c00, c01, c02], -1),
                     jnp.stack([c10, c11, c12], -1),
                     jnp.stack([c20, c21, c22], -1)], -2)  # [N, 3, 3]
    inv_det = jnp.where(jnp.abs(det) < 1e-18, 0.0, 1.0 / det)
    X = jnp.einsum("nij,nj->ni", adj, Atb) * inv_det[:, None]
    # degenerate systems -> non-finite sentinel (rejected by gates)
    return jnp.where((jnp.abs(det) < 1e-18)[:, None], jnp.inf, X)


def _check_rt(R, t, uv1, uv2, mask, K, th2=4.0):
    """Cheirality + reprojection + parallax check for one (R, t) candidate
    (reference CheckRT). Returns (n_good, good_mask, parallax_ok, X)."""
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate(P1, P2, uv1, uv2)
    finite = jnp.all(jnp.isfinite(X), axis=1)

    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]

    # parallax between the two rays
    O2 = -R.T @ t
    r1 = X
    r2 = X - O2
    cosp = (jnp.sum(r1 * r2, 1)
            / jnp.maximum(jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1),
                          1e-12))

    def reproj_err(P, Xh, uv):
        p = Xh @ P[:, :3].T + P[:, 3]
        return jnp.sum((p[:, :2] / jnp.maximum(p[:, 2:], 1e-12) - uv) ** 2, 1)

    e1 = reproj_err(P1, X, uv1)
    e2 = reproj_err(P2, X, uv2)
    good = (mask & finite & (z1 > 0) & (z2 > 0) & (cosp < 0.99998)
            & (e1 < th2) & (e2 < th2))
    # median parallax of good points > ~1 degree
    cosp_good = jnp.where(good, cosp, 1.0)
    return jnp.sum(good.astype(jnp.int32)), good, cosp_good, X


def _recover_from_e(E, uv1n, uv2n, mask, K):
    """Four-way (R,t) disambiguation from an essential matrix."""
    u, s, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    return cands


def _recover_from_h(H, K):
    """Faugeras SVD decomposition of a calibrated homography: 8 candidate
    (R, t) pairs (reference ReconstructH)."""
    A = jnp.linalg.inv(K) @ H @ K
    u, s, vt = jnp.linalg.svd(A)
    d1, d2, d3 = s[0], s[1], s[2]
    sgn = jnp.linalg.det(u) * jnp.linalg.det(vt)

    cands = []
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    # d' = d2 case (n'=(x1, 0, x3))
    st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
            Rp = Rp.at[0, 0].set(ct).at[2, 2].set(ct)
            Rp = Rp.at[0, 2].set(-e1 * e3 * st).at[2, 0].set(e1 * e3 * st)
            tp = jnp.array([e1 * x1, 0.0, -e3 * x3]) * (d1 - d3)
            R = sgn * u @ Rp @ vt
            t = u @ tp
            t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
            cands.append((R, t))
    # d' = -d2 case
    sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) \
        / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            Rp = jnp.diag(jnp.array([cp, -1.0, cp]))
            Rp = Rp.at[0, 2].set(e1 * e3 * sp).at[2, 0].set(e1 * e3 * sp)
            tp = jnp.array([e1 * x1, 0.0, e3 * x3]) * (d1 + d3)
            R = sgn * u @ Rp @ vt
            t = u @ tp
            t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
            cands.append((R, t))
    return cands


class InitResult(NamedTuple):
    success: jnp.ndarray     # bool
    R: jnp.ndarray           # [3,3] cam1->cam2 rotation
    t: jnp.ndarray           # [3] unit-norm translation
    points: jnp.ndarray      # [N, 3] triangulated in cam1 frame
    good: jnp.ndarray        # [N] triangulation validity
    used_h: jnp.ndarray      # bool, which model won


@functools.partial(jax.jit, static_argnames=(
    "n_hypotheses", "min_good", "min_parallax_deg", "h_min_sv_ratio"))
def initialize_two_view(uv1, uv2, mask, K,
                        n_hypotheses: int = 256, seed: int = 0,
                        min_good: int = 50, min_parallax_deg: float = 1.0,
                        h_min_sv_ratio: float = 1.08) -> InitResult:
    """Full two-view bootstrap (reference Initializer::Initialize).

    uv1/uv2: [N, 2] matched pixels (N static capacity), mask validity.
    Jitted end-to-end (a per-attempt eager run costs minutes of dispatch
    on a tunneled device): hypothesis sampling uses the traced seed;
    candidate disambiguation is a static 12-way (4 E + 8 H) masked argmax.
    """
    N = uv1.shape[0]
    key = jax.random.PRNGKey(seed)
    # sample with replacement among valid indices: rejection via masked
    # categorical (uniform over valid)
    logits = jnp.where(mask, 0.0, -1e9)
    samp = jax.random.categorical(
        key, logits[None, None, :], axis=-1,
        shape=(n_hypotheses, 8))                            # [B, 8]

    uv1n_all, T1 = _normalize_points(uv1, mask)
    uv2n_all, T2 = _normalize_points(uv2, mask)

    p1 = uv1n_all[samp]                                     # [B, 8, 2]
    p2 = uv2n_all[samp]
    Fn = _solve_f_batch(p1, p2)
    F = jnp.einsum("ij,bjk,kl->bil", T2.T, Fn, T1)
    Hn = _solve_h_batch(p1[:, :4], p2[:, :4])
    H = jnp.einsum("ij,bjk,kl->bil", jnp.linalg.inv(T2), Hn, T1)

    sf, inl_f = _score_f(F, uv1, uv2, mask)
    sh, inl_h = _score_h(H, uv1, uv2, mask)
    bf_i = jnp.argmax(sf)
    bh_i = jnp.argmax(sh)

    # refit the winning models on ALL their inliers (masked least-squares
    # 8-point / DLT: zero out outlier rows) — a cheap extra SVD that cuts
    # the minimal-sample noise by ~sqrt(N/8)
    def _refit_f(inl):
        w = inl.astype(uv1.dtype)[None]
        Fn = _solve_f_batch(uv1n_all[None], uv2n_all[None], w)[0]
        return T2.T @ Fn @ T1

    def _refit_h(inl):
        w = inl.astype(uv1.dtype)[None]
        Hn = _solve_h_batch(uv1n_all[None], uv2n_all[None], w)[0]
        return jnp.linalg.inv(T2) @ Hn @ T1

    F_refit = _refit_f(inl_f[bf_i])[None]
    H_refit = _refit_h(inl_h[bh_i])[None]
    sf2, inl_f2 = _score_f(F_refit, uv1, uv2, mask)
    sh2, inl_h2 = _score_h(H_refit, uv1, uv2, mask)
    f_improved = sf2[0] >= sf[bf_i]
    h_improved = sh2[0] >= sh[bh_i]
    F = jnp.where(f_improved, F_refit, F[bf_i][None])
    H = jnp.where(h_improved, H_refit, H[bh_i][None])
    inl_f = jnp.where(f_improved, inl_f2, inl_f[bf_i][None])
    inl_h = jnp.where(h_improved, inl_h2, inl_h[bh_i][None])
    sf = jnp.where(f_improved, sf2, sf[bf_i][None])
    sh = jnp.where(h_improved, sh2, sh[bh_i][None])
    bf_i = bh_i = 0

    SF, SH = sf[bf_i], sh[bh_i]
    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = RH > 0.40                                       # reference ratio

    Fbest = F[bf_i]
    Hbest = H[bh_i]
    inlier = jnp.where(use_h, inl_h[bh_i], inl_f[bf_i])

    E = K.T @ Fbest @ K
    cands = _recover_from_e(E, uv1, uv2, inlier, K) + _recover_from_h(Hbest, K)

    results = []
    for R, t in cands:
        n_good, good, cosp, X = _check_rt(R, t, uv1, uv2, inlier, K)
        # parallax at the 50th-good-point quantile (reference takes the
        # min(50, n)-th best parallax)
        cos_sorted = jnp.sort(cosp)
        q = jnp.clip(jnp.minimum(50, n_good) - 1, 0, N - 1)
        par_cos = cos_sorted[q]
        results.append((n_good, good, par_cos, R, t, X))

    n_goods = jnp.stack([r[0] for r in results])
    # H candidates only valid when use_h, E candidates when not
    cand_valid = jnp.concatenate([
        jnp.where(use_h, 0, 1) * jnp.ones(4, jnp.int32),
        jnp.where(use_h, 1, 0) * jnp.ones(8, jnp.int32)])
    n_goods = n_goods * cand_valid
    best_c = jnp.argmax(n_goods)
    n_best = n_goods[best_c]
    # winner must clearly dominate runner-up (reference: second best < 0.7/0.75 best)
    second = jnp.sort(n_goods)[-2]
    min_parallax_cos = jnp.cos(jnp.deg2rad(min_parallax_deg))
    par_ok = jnp.stack([r[2] for r in results])[best_c] < min_parallax_cos

    # homography degeneracy gate: when the calibrated H is close to a pure
    # conjugate rotation (singular values d1 ~= d3), the Faugeras
    # decomposition is noise-dominated and produces spurious-parallax
    # solutions (observed: x3.6 translation error at d1/d3 ~ 1.1);
    # d1/d3 - 1 ~ |t|/d, so requiring d1/d3 > 1.08 demands a baseline of
    # ~8% of the plane distance. The tracker layers a median-disparity
    # gate on top (tracking._try_initialize), so marginal-baseline pairs
    # never reach this solver during live initialization.
    sv = jnp.linalg.svd(jnp.linalg.inv(K) @ Hbest @ K, compute_uv=False)
    h_conditioned = (sv[0] / jnp.maximum(sv[2], 1e-9)) > h_min_sv_ratio
    model_ok = jnp.where(use_h, h_conditioned, True)

    n_inlier = jnp.sum(inlier.astype(jnp.int32))
    success = ((n_best >= min_good)
               & (n_best >= (0.9 * n_inlier).astype(jnp.int32))
               & (second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
               & par_ok & model_ok)

    R = jnp.stack([r[3] for r in results])[best_c]
    t = jnp.stack([r[4] for r in results])[best_c]
    X = jnp.stack([r[5] for r in results])[best_c]
    good = jnp.stack([r[1] for r in results])[best_c]
    return InitResult(success=success, R=R, t=t, points=X, good=good,
                      used_h=use_h)
