"""Sim3 / SE3 alignment between 3D point sets: closed-form Horn solution,
hypothesis-batched RANSAC.

Replaces the reference's Sim3Solver (/root/reference/src/Sim3Solver.cc,
392 LoC of sequential RANSAC): all minimal 3-point hypotheses solve as a
batched Horn (quaternion-free SVD variant), and every hypothesis scores
against every correspondence in one broadcast.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ygz_tpu.core import lie


def horn_sim3(X1, X2, w=None, fix_scale: bool = False):
    """Closed-form alignment: find S = (s, R, t) minimizing
    sum w_i |X1_i - (s R X2_i + t)|^2  (Horn 1987, SVD form).

    X1, X2: [..., N, 3]; w optional [..., N] weights.
    Returns a sim3 dict mapping frame-2 points into frame 1.
    """
    if w is None:
        w = jnp.ones(X1.shape[:-1], X1.dtype)
    wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    c1 = jnp.sum(X1 * wn[..., None], axis=-2, keepdims=True)
    c2 = jnp.sum(X2 * wn[..., None], axis=-2, keepdims=True)
    Y1 = X1 - c1
    Y2 = X2 - c2
    # cross covariance
    H = jnp.einsum("...ni,...nj,...n->...ij", Y2, Y1, wn)
    U, S, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("...ji,...j,...jk->...ik",
                   Vt, D, jnp.swapaxes(U, -1, -2))
    # R maps frame2 -> frame1: R = V D U^T
    if fix_scale:
        s = jnp.ones(det.shape, X1.dtype)
    else:
        num = jnp.sum(S * D, axis=-1)
        den = jnp.sum(jnp.sum(Y2 * Y2, axis=-1) * wn, axis=-1)
        s = num / jnp.maximum(den, 1e-12)
    t = c1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i",
                                                  R, c2[..., 0, :])
    return {"q": lie.matrix_to_quat(R), "t": t, "s": s}


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def optimize_sim3(S12, X1, X2, uv1, uv2, inv_s2_1, inv_s2_2, mask,
                  fx, fy, cx, cy, fix_scale: bool = False,
                  th2: float = 10.0):
    """Iterative refinement of a relative Sim3 against bidirectional
    reprojection (reference Optimizer::OptimizeSim3,
    /root/reference/src/Optimizer.cc:2409-2594): the only free variable
    is S12; the 3D points are fixed in their own camera frames. Edge i
    measures project(S12 * X2_i) vs uv1_i and project(S12^-1 * X1_i) vs
    uv2_i, Huber(delta = sqrt(th2)) on the whitened residual. Two
    phases, as the reference runs them: 5 GN iterations with every
    masked edge, drop edges with chi2 > th2 in EITHER direction, then
    10 more iterations on the survivors; inliers recount at the end.

    X1, X2: [N, 3] matched points in cam1 / cam2 coordinates.
    uv1, uv2: [N, 2] pixel observations in KF1 / KF2.
    inv_s2_1/2: [N] per-observation inverse level variance.
    Returns (S12_refined, inlier_mask [N], n_inliers).
    """
    dtype = X1.dtype
    # tangent mask: [omega(3), upsilon(3), sigma(1)]; metric sensors pin
    # the scale (reference bFixScale / VertexSim3Expmap::_fix_scale)
    free = jnp.ones((7,), dtype)
    if fix_scale:
        free = free.at[6].set(0.0)

    def residuals(delta, S):
        S_new = lie.sim3_compose(lie.sim3_exp(delta * free), S)
        x1h = lie.sim3_apply(S_new, X2)                  # cam2 -> cam1
        r12 = jnp.stack([fx * x1h[:, 0] / jnp.maximum(x1h[:, 2], 1e-6) + cx,
                         fy * x1h[:, 1] / jnp.maximum(x1h[:, 2], 1e-6) + cy],
                        -1) - uv1
        x2h = lie.sim3_apply(lie.sim3_inverse(S_new), X1)  # cam1 -> cam2
        r21 = jnp.stack([fx * x2h[:, 0] / jnp.maximum(x2h[:, 2], 1e-6) + cx,
                         fy * x2h[:, 1] / jnp.maximum(x2h[:, 2], 1e-6) + cy],
                        -1) - uv2
        return jnp.concatenate([r12, r21], -1)           # [N, 4]

    def chi2(S):
        r = residuals(jnp.zeros((7,), dtype), S)
        c12 = jnp.sum(r[:, :2] ** 2, -1) * inv_s2_1
        c21 = jnp.sum(r[:, 2:] ** 2, -1) * inv_s2_2
        return c12, c21

    def gn_iter(S, active, robust):
        r = residuals(jnp.zeros((7,), dtype), S)
        J = jax.jacfwd(residuals)(jnp.zeros((7,), dtype), S)  # [N, 4, 7]
        w = jnp.concatenate([jnp.repeat(inv_s2_1[:, None], 2, 1),
                             jnp.repeat(inv_s2_2[:, None], 2, 1)], -1)
        if robust:
            # Huber on the per-direction whitened chi2
            c12 = jnp.sum(r[:, :2] ** 2, -1) * inv_s2_1
            c21 = jnp.sum(r[:, 2:] ** 2, -1) * inv_s2_2
            h12 = jnp.minimum(1.0, jnp.sqrt(th2 / jnp.maximum(c12, 1e-12)))
            h21 = jnp.minimum(1.0, jnp.sqrt(th2 / jnp.maximum(c21, 1e-12)))
            w = w * jnp.concatenate([jnp.repeat(h12[:, None], 2, 1),
                                     jnp.repeat(h21[:, None], 2, 1)], -1)
        w = w * active[:, None]
        H = jnp.einsum("nri,nr,nrj->ij", J, w, J)
        b = -jnp.einsum("nri,nr,nr->i", J, w, r)
        H = H + 1e-6 * jnp.eye(7, dtype=dtype)
        if fix_scale:
            H = H.at[6, 6].add(1e12)
        delta = jnp.linalg.solve(H, b) * free
        return lie.sim3_compose(lie.sim3_exp(delta), S)

    S = {"q": S12["q"].astype(dtype), "t": S12["t"].astype(dtype),
         "s": S12["s"].astype(dtype)}
    active = mask.astype(dtype)
    S = jax.lax.fori_loop(0, 5, lambda _, s: gn_iter(s, active, True), S)
    c12, c21 = chi2(S)
    inl = mask & (c12 <= th2) & (c21 <= th2)
    active = inl.astype(dtype)
    S = jax.lax.fori_loop(0, 10, lambda _, s: gn_iter(s, active, True), S)
    c12, c21 = chi2(S)
    inl = inl & (c12 <= th2) & (c21 <= th2)
    return S, inl, jnp.sum(inl.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("fix_scale", "n_hyp"))
def ransac_sim3(X1, X2, mask, fix_scale: bool = False, seed: int = 0,
                n_hyp: int = 128, inlier_th: float = 0.05):
    """RANSAC over minimal 3-point Horn hypotheses.

    X1, X2: [N, 3] corresponding points (e.g. map points in two KFs'
    camera frames). inlier_th: relative 3D error threshold (scaled by
    scene scale). Returns (S12 dict, inlier mask [N], n_inliers).
    """
    N = X1.shape[0]
    key = jax.random.PRNGKey(seed)
    logits = jnp.where(mask, 0.0, -1e9)
    samp = jax.random.categorical(key, logits[None, None, :], axis=-1,
                                  shape=(n_hyp, 3))
    S = horn_sim3(X1[samp], X2[samp], fix_scale=fix_scale)   # batched [B]

    # score: symmetric 3D transfer error relative to scene scale
    scale_ref = jnp.sqrt(jnp.maximum(jnp.mean(
        jnp.where(mask, jnp.sum(X1 * X1, -1), 0.0)), 1e-9))
    X2in1 = (S["s"][:, None, None]
             * jnp.einsum("bij,nj->bni", lie.quat_to_matrix(S["q"]), X2)
             + S["t"][:, None, :])
    err = jnp.linalg.norm(X2in1 - X1[None], axis=-1) / scale_ref
    inl = (err < inlier_th) & mask[None, :]
    n = jnp.sum(inl, axis=-1)
    best = jnp.argmax(n)
    S_best = jax.tree.map(lambda a: a[best], S)
    inl_best = inl[best]
    # refine on all inliers
    S_ref = horn_sim3(X1, X2, w=inl_best.astype(X1.dtype),
                      fix_scale=fix_scale)
    X2in1r = (S_ref["s"] * lie.quat_rotate(S_ref["q"][None], X2)
              + S_ref["t"][None])
    err_r = jnp.linalg.norm(X2in1r - X1, axis=-1) / scale_ref
    inl_r = (err_r < inlier_th) & mask
    better = jnp.sum(inl_r) >= jnp.sum(inl_best)
    S_out = jax.tree.map(
        lambda a, b: jnp.where(better, a, b), S_ref, S_best)
    inl_out = jnp.where(better, inl_r, inl_best)
    return S_out, inl_out, jnp.sum(inl_out.astype(jnp.int32))
