"""7-DoF Sim3 pose-graph optimization (the essential graph).

Replaces g2o's OptimizeEssentialGraph (/root/reference/src/Optimizer.cc:
2157-2407): nodes are per-KF Sim3 poses; edges are relative-pose
measurements from the spanning tree (here: the sequential KF chain — the
synchronous pipeline's spanning tree is the temporal chain), strong
covisibility pairs (weight >= 100), and the loop edge. Where g2o hand-codes
the 7x7 edge Jacobians, we differentiate the residual with jax.jacfwd —
exact, batched over all edges at once — and solve the dense [K*7, K*7]
normal system (a few hundred KFs -> ~2000^2, trivial for the MXU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.core import lie
from ygz_tpu.pipeline import mapstate


def _edge_residual(xi_i, xi_j, S_i, S_j, S_meas_ij):
    """r = log( S_meas_ij^-1 ∘ (exp(xi_i) S_i) ∘ (exp(xi_j) S_j)^-1 ), [7].
    S_meas_ij is the measured cam_j -> cam_i relative Sim3."""
    Si = lie.sim3_compose(lie.sim3_exp(xi_i), S_i)
    Sj = lie.sim3_compose(lie.sim3_exp(xi_j), S_j)
    rel = lie.sim3_compose(Si, lie.sim3_inverse(Sj))
    err = lie.sim3_compose(lie.sim3_inverse(S_meas_ij), rel)
    return lie.sim3_log(err)


def _linearize_edges(S_nodes, edges_i, edges_j, S_meas):
    """Batched residuals + Jacobians for all edges via forward-mode AD.
    Returns r [E,7], Ji [E,7,7], Jj [E,7,7]."""
    zero = jnp.zeros((7,))

    def one(i, j, Sm):
        S_i = jax.tree.map(lambda a: a[i], S_nodes)
        S_j = jax.tree.map(lambda a: a[j], S_nodes)
        r = _edge_residual(zero, zero, S_i, S_j, Sm)
        Ji = jax.jacfwd(lambda x: _edge_residual(x, zero, S_i, S_j, Sm))(zero)
        Jj = jax.jacfwd(lambda x: _edge_residual(zero, x, S_i, S_j, Sm))(zero)
        return r, Ji, Jj

    return jax.vmap(one)(edges_i, edges_j, S_meas)


def optimize_sim3_graph(S_nodes, node_mask, fixed_mask,
                        edges_i, edges_j, S_meas, edge_mask,
                        num_iters: int = 20):
    """Levenberg-Marquardt on the Sim3 graph (g2o uses LM with 20 iters,
    /root/reference/src/Optimizer.cc:2380). S_nodes: dict of [K,...]
    arrays. Returns optimized S_nodes."""
    K = S_nodes["s"].shape[0]
    free = node_mask & ~fixed_mask
    fvec = jnp.repeat(free, 7)

    def build(S):
        r, Ji, Jj = _linearize_edges(S, edges_i, edges_j, S_meas)
        w = edge_mask.astype(r.dtype)
        cost = jnp.sum(jnp.sum(r * r, -1) * w)
        H = jnp.zeros((K * 7, K * 7))
        b = jnp.zeros((K * 7,))

        def blocks(idx_a, Ja, idx_b, Jb):
            blk = jnp.einsum("ead,eaf,e->edf", Ja, Jb, w)  # [E, 7, 7]
            ra = idx_a[:, None, None] * 7 + jnp.arange(7)[None, :, None]
            cb = idx_b[:, None, None] * 7 + jnp.arange(7)[None, None, :]
            return ra, cb, blk

        for (ia, Ja) in ((edges_i, Ji), (edges_j, Jj)):
            bi = -jnp.einsum("ead,ea,e->ed", Ja, r, w)
            b = b.at[(ia[:, None] * 7 + jnp.arange(7)[None, :])].add(bi)
            for (ib, Jb) in ((edges_i, Ji), (edges_j, Jj)):
                ra, cb, blk = blocks(ia, Ja, ib, Jb)
                H = H.at[ra, cb].add(blk)

        H = jnp.where(fvec[:, None] & fvec[None, :], H, 0.0)
        return H, b, cost

    def lm_step(_, carry):
        S, mu, cost = carry
        H, b, _ = build(S)
        diag = jnp.maximum(jnp.diagonal(H), 1e-8)
        Hd = H + jnp.diag(mu * diag) + jnp.diag(jnp.where(fvec, 0.0, 1.0))
        dx = jnp.linalg.solve(Hd, b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(K, 7)
        dx = jnp.where(free[:, None], dx, 0.0)
        S_new = lie.sim3_compose(lie.sim3_exp(dx), S)
        S_new = jax.tree.map(
            lambda a, bn: jnp.where(
                free.reshape((K,) + (1,) * (a.ndim - 1)), bn, a), S, S_new)
        _, _, cost_new = build(S_new)
        accept = cost_new < cost
        S = jax.tree.map(
            lambda a, bn: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), bn, a), S, S_new)
        mu = jnp.clip(jnp.where(accept, mu * 0.5, mu * 4.0), 1e-8, 1e4)
        return S, mu, jnp.where(accept, cost_new, cost)

    _, _, c0 = build(S_nodes)
    S, _, _ = jax.lax.fori_loop(0, num_iters, lm_step,
                                (S_nodes, jnp.float32(1e-4), c0))
    return S


def optimize_essential_graph(ms, loop_a: int, loop_b: int,
                             fixed_kf: int,
                             S_init=None, S_meas_src=None,
                             covis_W=None,
                             covis_min: int = 100,
                             num_iters: int = 12):
    """Essential-graph optimization after a loop closure (reference
    OptimizeEssentialGraph, /root/reference/src/Optimizer.cc:2157-2407 +
    LoopClosing.cc:545-560).

    Edge semantics follow the reference's NonCorrectedSim3/CorrectedSim3
    split:
      * chain + strong-covisibility edge MEASUREMENTS come from
        ``S_meas_src`` — the PRE-correction pose snapshot (odometry as it
        was before the loop group's poses were overwritten). Building them
        from the already-corrected poses would make every residual zero
        and the whole pass a no-op.
      * the loop edge (loop_a, loop_b) measurement comes from ``S_init``
        — node initializations, i.e. the CORRECTED Sim3 of the current KF
        (with scale) against the untouched loop KF: it encodes the loop
        constraint that the optimizer distributes along the trajectory.
      * ``covis_W``: covisibility matrix to build strong edges from;
        pass the PRE-fusion matrix so cross-loop links created by fusion
        don't appear as odometry edges with drifted measurements.

    Afterwards map points are corrected through their reference KF:
    X' = S_new^-1 ∘ S_init ∘ X (S_init is consistent with current point
    positions — the loop group's points were already remapped with the
    corrected Sim3s that S_init carries).
    """
    K = ms.kf_q.shape[0]
    kf_ids = np.where(np.asarray(ms.kf_mask))[0]
    # the spanning chain is TEMPORAL: with slot recycling, slot index
    # order diverges from time order, and a slot-ordered "chain" would
    # link temporally distant KFs with drift-contaminated measurements
    kf_ids = kf_ids[np.argsort(np.asarray(ms.kf_frame_id)[kf_ids])]
    n = len(kf_ids)
    if n < 3:
        return ms

    if S_init is None:
        S_init = lie.sim3_from_se3({"q": ms.kf_q, "t": ms.kf_t})
    if S_meas_src is None:
        S_meas_src = S_init
    if covis_W is None:
        covis_W = np.asarray(mapstate.covisibility_matrix(ms))

    # edge list (host; sizes are data-dependent but this runs rarely)
    ei, ej = [], []
    for a, b in zip(kf_ids[:-1], kf_ids[1:]):
        ei.append(a); ej.append(b)                    # spanning chain
    strong = np.argwhere(covis_W >= covis_min)
    for a, b in strong:
        if a < b and abs(a - b) > 1 and not (
                (a == loop_a and b == loop_b) or (a == loop_b and b == loop_a)):
            ei.append(a); ej.append(b)
    ei = np.array(ei, np.int32)
    ej = np.array(ej, np.int32)

    # odometry measurements from the pre-correction snapshot
    Si = jax.tree.map(lambda a: a[jnp.asarray(ei)], S_meas_src)
    Sj = jax.tree.map(lambda a: a[jnp.asarray(ej)], S_meas_src)
    S_meas = lie.sim3_compose(Si, lie.sim3_inverse(Sj))

    # the loop edge, measured from the corrected poses
    Sa = jax.tree.map(lambda a: a[loop_a], S_init)
    Sb = jax.tree.map(lambda a: a[loop_b], S_init)
    S_loop = lie.sim3_compose(Sa, lie.sim3_inverse(Sb))
    ei = np.concatenate([ei, np.array([loop_a], np.int32)])
    ej = np.concatenate([ej, np.array([loop_b], np.int32)])
    S_meas = jax.tree.map(
        lambda m, l: jnp.concatenate([m, l[None]]), S_meas, S_loop)

    fixed = jnp.zeros((K,), bool).at[fixed_kf].set(True)
    S_opt = optimize_sim3_graph(
        S_init, ms.kf_mask, fixed,
        jnp.asarray(ei), jnp.asarray(ej), S_meas,
        jnp.ones((len(ei),), bool), num_iters=num_iters)

    # correct map points through their reference KF: X' = S_new^-1 S_old X
    ref = jnp.clip(ms.mp_ref_kf, 0, K - 1)
    S_old_r = jax.tree.map(lambda a: a[ref], S_init)
    S_new_r = jax.tree.map(lambda a: a[ref], S_opt)
    Xc = lie.sim3_apply(S_old_r, ms.mp_pos)
    X_new = lie.sim3_apply(lie.sim3_inverse(S_new_r), Xc)
    mp_pos = jnp.where(ms.mp_mask[:, None], X_new, ms.mp_pos)

    # write back SE3-ified node poses [sR t] -> [R t/s]
    T_new = lie.se3_from_sim3(S_opt)
    kf_q = jnp.where(ms.kf_mask[:, None], T_new["q"], ms.kf_q)
    kf_t = jnp.where(ms.kf_mask[:, None], T_new["t"], ms.kf_t)
    return dataclasses.replace(ms, kf_q=kf_q, kf_t=kf_t, mp_pos=mp_pos)
