"""Multi-chip scaling via jax.sharding Mesh + shard_map.

The reference is a single-process shared-memory system (SURVEY.md §2.5 —
no MPI/NCCL anywhere), so multi-chip here is a new capability, designed
around the two workloads that actually scale:

  * `sharded_ba_step` — bundle adjustment with the OBSERVATION table
    sharded across devices ("tensor parallelism" for the normal
    equations): each device linearizes its shard of reprojection
    residuals and segment-sums partial Hessian blocks; one psum over the
    mesh assembles the global system; the small reduced camera solve is
    replicated. Communication is O(K*6^2 + M*3^2) per iteration,
    independent of observation count — ICI-friendly.
  * `batched_track_step` — frame-batch data parallelism: vmapped sparse
    image alignment + pose refinement over a batch of frames sharded on
    the leading axis (offline throughput / multi-session serving).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ygz_tpu.backend import ba
from ygz_tpu.core import lie


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    import numpy as np
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# observation-sharded bundle adjustment
# ---------------------------------------------------------------------------

def _partial_normal_eqs(kf_q, kf_t, mp, obs, fx, fy, cx, cy, bf):
    """Per-shard linearization + local accumulation (runs inside
    shard_map; shapes are per-device)."""
    K = kf_q.shape[0]
    M = mp.shape[0]
    r, Jc, Jp, chi2, valid = ba.reproj_residuals(
        kf_q, kf_t, mp, obs, fx, fy, cx, cy, bf)
    valid = valid & obs.mask
    is_stereo = obs.ur >= 0
    w = ba._irls_weights(r, chi2, obs.inv_sigma2, is_stereo, valid, True)

    Hcc = jax.ops.segment_sum(
        jnp.einsum("oad,oae,o->ode", Jc, Jc, w), obs.kf, num_segments=K)
    bc = jax.ops.segment_sum(
        -jnp.einsum("oad,oa,o->od", Jc, r, w), obs.kf, num_segments=K)
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oad,oae,o->ode", Jp, Jp, w), obs.mp, num_segments=M)
    bp = jax.ops.segment_sum(
        -jnp.einsum("oad,oa,o->od", Jp, r, w), obs.mp, num_segments=M)
    cost = jnp.sum(jnp.where(valid, chi2, 0.0))
    return Hcc, bc, Hpp, bp, cost


def sharded_ba_gauss_seidel_step(mesh: Mesh, prob: ba.BAProblem, cam,
                                 num_iters: int = 3):
    """One jitted multi-device BA driver: observations sharded over the
    mesh axis; per-iteration psum assembles global Hcc/Hpp; poses and
    points update by damped block-Jacobi (Gauss-Seidel-flavored) steps.

    Block-Jacobi instead of the exact Schur complement keeps the
    cross-device traffic to the block-diagonals only — the right
    trade for very large maps spread over chips; single-chip code paths
    keep the exact Schur solve (backend.ba).
    """
    fx, fy, cx, cy, bf = cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
    axis = mesh.axis_names[0]

    obs_spec = ba.Observations(
        kf=P(axis), mp=P(axis), uv=P(axis), ur=P(axis),
        inv_sigma2=P(axis), mask=P(axis))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), obs_spec, P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False)
    def step(kf_q, kf_t, mp, obs, kf_fixed, kf_mask, mp_mask):
        def body(_, carry):
            kf_q, kf_t, mp = carry
            Hcc, bc, Hpp, bp, _ = _partial_normal_eqs(
                kf_q, kf_t, mp, obs, fx, fy, cx, cy, bf)
            Hcc = jax.lax.psum(Hcc, axis)
            bc = jax.lax.psum(bc, axis)
            Hpp = jax.lax.psum(Hpp, axis)
            bp = jax.lax.psum(bp, axis)

            lam = 1e-3
            I6 = jnp.eye(6)
            I3 = jnp.eye(3)
            dcc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
            Hcc_d = Hcc + I6 * (lam * dcc + 1e-4)[..., None, :] * I6
            dpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
            Hpp_d = Hpp + I3 * (lam * dpp + 1e-4)[..., None, :] * I3

            dxc = jnp.linalg.solve(Hcc_d, bc[..., None])[..., 0]
            dxp = jnp.linalg.solve(Hpp_d, bp[..., None])[..., 0]
            free = (kf_mask & ~kf_fixed)[:, None]
            dxc = jnp.where(free & jnp.isfinite(dxc), dxc, 0.0)
            dxp = jnp.where(mp_mask[:, None] & jnp.isfinite(dxp), dxp, 0.0)

            T = lie.se3_retract({"q": kf_q, "t": kf_t}, dxc)
            return (jnp.where(free, T["q"], kf_q),
                    jnp.where(free, T["t"], kf_t),
                    mp + dxp)

        kf_q, kf_t, mp = jax.lax.fori_loop(
            0, num_iters, body, (kf_q, kf_t, mp))
        return kf_q, kf_t, mp

    return step(prob.kf_q, prob.kf_t, prob.mp, prob.obs,
                prob.kf_fixed, prob.kf_mask, prob.mp_mask)


# ---------------------------------------------------------------------------
# exact sharded Schur BA (the pipeline's local-BA engine on a mesh)
# ---------------------------------------------------------------------------
#
# Distribution: POINTS are sharded in contiguous blocks over the mesh, and
# the observation table is binned so that every observation lives on the
# device owning its point. Then the point blocks Hpp, the cross blocks W,
# and the Schur reduction term W Hpp^-1 W^T are all device-local; only the
# reduced camera system ([6K, 6K] + [6K]) and the scalar cost cross the
# ICI per iteration. This is the EXACT Schur solve of backend.ba (not an
# approximation) — the reduced system is psum-assembled and solved
# replicated, point back-substitution stays local.


def bin_observations_by_point(obs: ba.Observations, M: int, D: int,
                              O_per: int):
    """Reorder the observation table into D contiguous bins of O_per so
    bin d only references points in block d (= [d*M/D, (d+1)*M/D)).
    Runs under jit (static shapes). Returns (binned_obs [D*O_per],
    scatter_src [D*O_per] int32 — original obs row feeding each slot,
    -1/masked slots arbitrary)."""
    O = obs.kf.shape[0]
    Mb = M // D
    blk = jnp.where(obs.mask, obs.mp // Mb, D)      # invalid -> bin D
    order = jnp.argsort(blk, stable=True)
    blk_s = blk[order]
    counts = jax.ops.segment_sum(jnp.ones((O,), jnp.int32), blk,
                                 num_segments=D + 1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    within = jnp.arange(O, dtype=jnp.int32) - starts[blk_s]
    ok = (blk_s < D) & (within < O_per)             # overflow obs dropped
    dest = jnp.where(ok, blk_s * O_per + within, D * O_per)

    def scat(x, fill):
        out = jnp.full((D * O_per + 1,) + x.shape[1:], fill, x.dtype)
        return out.at[dest].set(x[order])[:-1]

    binned = ba.Observations(
        kf=scat(obs.kf, 0), mp=scat(obs.mp, 0), uv=scat(obs.uv, 0.0),
        ur=scat(obs.ur, -1.0), inv_sigma2=scat(obs.inv_sigma2, 0.0),
        mask=scat(obs.mask & (blk < D), False))
    # scat applies the `order` permutation to its argument, so identity
    # yields src[slot] = original obs row feeding that slot
    src = scat(jnp.arange(O, dtype=jnp.int32), -1)
    return binned, src


def _schur_ba_sharded_core(axis, fx, fy, cx, cy, bf, stage1, stage2):
    """Body run inside shard_map: per-device shapes, psum collectives."""
    def build_and_step(kf_q, kf_t, mp, obs, kf_fixed, kf_mask, mp_mask,
                       inlier, robust, damping):
        K = kf_q.shape[0]
        Ml = mp.shape[0]
        r, Jc, Jp, chi2, valid = ba.reproj_residuals(
            kf_q, kf_t, mp, obs, fx, fy, cx, cy, bf)
        valid = valid & inlier & kf_mask[obs.kf] & mp_mask[obs.mp]
        cam_free = ~kf_fixed[obs.kf]
        is_stereo = obs.ur >= 0
        w = ba._irls_weights(r, chi2, obs.inv_sigma2, is_stereo, valid,
                             robust)
        wc = w * cam_free

        Hcc = jax.ops.segment_sum(
            jnp.einsum("oad,oae,o->ode", Jc, Jc, wc), obs.kf,
            num_segments=K)
        bc = jax.ops.segment_sum(
            -jnp.einsum("oad,oa,o->od", Jc, r, wc), obs.kf, num_segments=K)
        Hpp = jax.ops.segment_sum(
            jnp.einsum("oad,oae,o->ode", Jp, Jp, w), obs.mp,
            num_segments=Ml)
        bp = jax.ops.segment_sum(
            -jnp.einsum("oad,oa,o->od", Jp, r, w), obs.mp, num_segments=Ml)

        Wblk = jnp.einsum("oad,oae,o->ode", Jc, Jp, wc)
        Wfull = jnp.zeros((K, 6, Ml, 3), Jc.dtype
                          ).at[obs.kf, :, obs.mp, :].add(Wblk)

        dpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
        Hpp_d = Hpp + jnp.eye(3) * (damping * dpp + 1e-6)[..., None, :] \
            * jnp.eye(3)
        ok = mp_mask & (jnp.linalg.det(Hpp_d) > 1e-12)
        from ygz_tpu.core.smallsolve import inv3x3
        Hpp_inv = jnp.where(ok[:, None, None],
                            inv3x3(jnp.where(ok[:, None, None], Hpp_d,
                                             jnp.eye(3))), 0.0)

        Wr = Wfull.reshape(K * 6, Ml, 3)
        WHi = jnp.einsum("amx,mxy->amy", Wr, Hpp_inv)
        S_red = jnp.einsum("amy,bmy->ab", WHi, Wr)
        g_red = jnp.einsum("amy,my->a", WHi, bp)

        Hcc_dense = jnp.zeros((K * 6, K * 6), Jc.dtype)
        idx = jnp.arange(K)
        Hcc_dense = Hcc_dense.at[
            (idx[:, None, None] * 6 + jnp.arange(6)[None, :, None]),
            (idx[:, None, None] * 6 + jnp.arange(6)[None, None, :])
        ].add(Hcc)

        # assemble the global reduced system over the mesh, then damp
        Hcc_dense = jax.lax.psum(Hcc_dense, axis)
        bc = jax.lax.psum(bc, axis)
        S_red = jax.lax.psum(S_red, axis)
        g_red = jax.lax.psum(g_red, axis)

        dcc = jnp.diagonal(Hcc_dense)
        S = Hcc_dense + jnp.diag(damping * dcc) - S_red
        g = bc.reshape(-1) - g_red
        free = kf_mask & ~kf_fixed
        fvec = jnp.repeat(free, 6)
        S = jnp.where(fvec[:, None] & fvec[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(fvec, 0.0, 1.0))
        g = jnp.where(fvec, g, 0.0)

        dxc = jnp.linalg.solve(S, g)                 # replicated solve
        dxc = jnp.where(jnp.isfinite(dxc), dxc, 0.0)
        Wt_dxc = jnp.einsum("a,amy->my", dxc, Wr)    # local back-sub
        dxp = jnp.einsum("mxy,my->mx", Hpp_inv, bp - Wt_dxc)
        dxp = jnp.where(jnp.isfinite(dxp), dxp, 0.0)

        T_new = lie.se3_retract({"q": kf_q, "t": kf_t}, dxc.reshape(K, 6))
        fr = free[:, None]
        return (jnp.where(fr, T_new["q"], kf_q),
                jnp.where(fr, T_new["t"], kf_t),
                jnp.where(mp_mask[:, None], mp + dxp, mp))

    def cost_of(kf_q, kf_t, mp, obs, kf_mask, mp_mask, inlier, robust):
        r, _, _, chi2, valid = ba.reproj_residuals(
            kf_q, kf_t, mp, obs, fx, fy, cx, cy, bf)
        valid = valid & inlier & kf_mask[obs.kf] & mp_mask[obs.mp]
        if robust:
            from ygz_tpu.core.robust import huber_rho
            delta = jnp.where(obs.ur >= 0, ba.HUBER_STEREO, ba.HUBER_MONO)
            c = huber_rho(chi2, delta)
        else:
            c = chi2
        return jax.lax.psum(jnp.sum(jnp.where(valid, c, 0.0)), axis)

    def lm(kf_q, kf_t, mp, obs, kf_fixed, kf_mask, mp_mask, inlier, iters):
        def body(_, carry):
            q, t, p, mu, cost = carry
            q2, t2, p2 = build_and_step(q, t, p, obs, kf_fixed, kf_mask,
                                        mp_mask, inlier, True, mu)
            c2 = cost_of(q2, t2, p2, obs, kf_mask, mp_mask, inlier, True)
            acc = c2 < cost
            q = jnp.where(acc, q2, q)
            t = jnp.where(acc, t2, t)
            p = jnp.where(acc, p2, p)
            mu = jnp.clip(jnp.where(acc, mu * 0.5, mu * 5.0), 1e-8, 1e4)
            return q, t, p, mu, jnp.where(acc, c2, cost)

        c0 = cost_of(kf_q, kf_t, mp, obs, kf_mask, mp_mask, inlier, True)
        q, t, p, _, _ = jax.lax.fori_loop(
            0, iters, body, (kf_q, kf_t, mp, 1e-4, c0))
        return q, t, p

    def classify(kf_q, kf_t, mp, obs, fx_, fy_, cx_, cy_, bf_):
        from ygz_tpu.core.robust import CHI2_2DOF, CHI2_3DOF
        _, _, _, chi2, valid = ba.reproj_residuals(
            kf_q, kf_t, mp, obs, fx_, fy_, cx_, cy_, bf_)
        th = jnp.where(obs.ur >= 0, CHI2_3DOF, CHI2_2DOF)
        return obs.mask & valid & (chi2 <= th)

    def run(kf_q, kf_t, mp, obs, kf_fixed, kf_mask, mp_mask):
        q, t, p = lm(kf_q, kf_t, mp, obs, kf_fixed, kf_mask, mp_mask,
                     obs.mask, stage1)
        inlier = classify(q, t, p, obs, fx, fy, cx, cy, bf)
        q, t, p = lm(q, t, p, obs, kf_fixed, kf_mask, mp_mask, inlier,
                     stage2)
        inlier = classify(q, t, p, obs, fx, fy, cx, cy, bf)
        return q, t, p, inlier

    return run


def sharded_local_ba(mesh: Mesh, prob: ba.BAProblem, cam,
                     stage1_iters: int = 5, stage2_iters: int = 10):
    """Drop-in mesh-parallel `ba.local_bundle_adjustment`: same two-stage
    LM + outlier-classification schedule, exact Schur solve, points and
    observations sharded over the mesh. Returns (problem, inlier) with
    the inlier mask in the ORIGINAL observation order (so the caller's
    outlier-unbind bookkeeping is unchanged). Observations whose point
    bin overflows are left out of the optimization and reported inlier
    (never unbound)."""
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    M = prob.mp.shape[0]
    O = prob.obs.kf.shape[0]
    if M % D or D < 2:
        raise ValueError(f"point capacity {M} not shardable over {D}")
    O_per = -(-2 * O // D // 8) * 8                  # 2x balance slack

    core = _schur_ba_sharded_core(axis, cam.fx, cam.fy, cam.cx, cam.cy,
                                  cam.bf, stage1_iters, stage2_iters)

    obs_spec = ba.Observations(kf=P(axis), mp=P(axis), uv=P(axis),
                               ur=P(axis), inv_sigma2=P(axis), mask=P(axis))

    def local_obs(obs):
        # global point index -> index within the device's block
        return obs._replace(mp=obs.mp % (M // D))

    sharded = shard_map(
        lambda q, t, p, o, kff, kfm, mpm: core(
            q, t, p, local_obs(o), kff, kfm, mpm),
        mesh=mesh,
        in_specs=(P(), P(), P(axis), obs_spec, P(), P(), P(axis)),
        out_specs=(P(), P(), P(axis), P(axis)),
        check_rep=False)

    @jax.jit
    def driver(prob):
        binned, src = bin_observations_by_point(prob.obs, M, D, O_per)
        q, t, p, inl_b = sharded(prob.kf_q, prob.kf_t, prob.mp, binned,
                                 prob.kf_fixed, prob.kf_mask, prob.mp_mask)
        # scatter inliers back to original observation order; invalid obs
        # stay non-inlier (classify semantics) while valid-but-overflowed
        # obs default to inlier=True so they are never unbound
        base = jnp.concatenate([prob.obs.mask, jnp.ones((1,), bool)])
        inlier = base.at[jnp.where(src >= 0, src, O)].set(inl_b)[:O]
        return prob._replace(kf_q=q, kf_t=t, mp=p,
                             obs=prob.obs), inlier

    return driver(prob)


# ---------------------------------------------------------------------------
# frame-batch data parallelism
# ---------------------------------------------------------------------------

def batched_pose_refine(mesh: Mesh, T0_batch, pts_batch, uv_batch,
                        mask_batch, cam):
    """Pose-only optimization for a BATCH of frames, sharded over the mesh
    (offline throughput mode: B frames refine simultaneously, one per-lane
    6x6 solve chain). T0_batch: {'q': [B,4], 't': [B,3]}."""
    axis = mesh.axis_names[0]
    fx, fy, cx, cy, bf = cam.fx, cam.fy, cam.cx, cam.cy, cam.bf

    def one(T0, pts, uv, mask):
        ur = jnp.full(uv.shape[:1], -1.0)
        s2 = jnp.ones(uv.shape[:1])
        T, inl, n = ba.pose_optimization(T0, pts, uv, ur, s2, mask,
                                         fx, fy, cx, cy, bf)
        return T, n

    fn = shard_map(
        jax.vmap(one), mesh=mesh,
        in_specs=({"q": P(axis), "t": P(axis)}, P(axis), P(axis), P(axis)),
        out_specs=({"q": P(axis), "t": P(axis)}, P(axis)),
        check_rep=False)
    return fn(T0_batch, pts_batch, uv_batch, mask_batch)
