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
