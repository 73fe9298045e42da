"""Fused Pallas kernel for sparse direct image alignment (one pyramid
level's whole Gauss-Newton loop in a single TPU dispatch).

The XLA version (ops.align.sparse_align_level) runs ~15 fused op-groups
per GN iteration; at ~5-10 us fixed cost per op-group the three-level
alignment is dispatch-bound (~5 ms). Here the gathered blocks live in
VMEM in transposed [S, S, N] layout (points ride the 128-lane axis) and
the full 10-iteration loop — window resampling via separable tent
weights, Huber-weighted residuals, the 6x6 normal system, Cholesky,
quaternion retraction — runs in-kernel.

Math identical to sparse_align_level: forward-compositional GN on 4x4
patches with patch-center Jacobians (SVO's approximation), sort-free
mean-abs robust scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ygz_tpu.ops.pallas_pose import (_chol6_solve, _quat_mul_scalars,
                                     _quat_rotate_rows, _so3_V_apply,
                                     _so3_exp_scalars)


def _rowsum(x, n: int):
    """Sum a [n, N] slab over its sublane (first) axis via explicit
    row-slice adds. The chip's Mosaic toolchain rejects
    vector.multi_reduction over a dimension whose layout carries a
    non-zero sublane offset — exactly what slab slices like
    blocks_ref[k:k+side] produce. Row slices + adds lower to sublane
    rotates + VPU adds, which carry no such restriction."""
    s = x[0:1, :]
    for i in range(1, n):
        s = s + x[i:i + 1, :]
    return s


def _align_kernel(num_iters: int, half: int, margin: int,
                  fx, fy, cx_, cy_,
                  pose_ref, blocks_ref, refp_ref, pts_ref, center_ref,
                  valid_ref, pose_out, ngood_ref):
    """Patch rows ride the SUBLANE axis: the window resample contracts
    [side, S, N] slabs (one op per tap covers every patch row at once)
    instead of [1, N] rows per (row, column) pair — ~4x fewer vector
    instructions per GN iteration than the row-at-a-time formulation.
    refp_ref is laid out [j, i, N] (column-major patch) so column j's
    reference rows slice contiguously as refp_ref[j]."""
    side = 2 * half
    m2 = 2 * margin + 2
    S = 2 * half + 2 * margin + 1

    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    cu = center_ref[0:1, :]
    cv = center_ref[1:2, :]
    base_valid = valid_ref[0:1, :] > 0.5

    def gn_body(_, c):
        q0, q1, q2, q3, tx, ty, tz, _ = c
        cxv, cyv, czv, _r = _quat_rotate_rows(q0, q1, q2, q3, px, py, pz)
        cxv, cyv, czv = cxv + tx, cyv + ty, czv + tz
        zok = czv > 1e-3
        zs = jnp.maximum(czv, 1e-3)
        zi = 1.0 / zs
        zi2 = zi * zi
        u = fx * cxv * zi + cx_
        v = fy * cyv * zi + cy_

        su = u - cu
        sv = v - cv
        in_rng = (jnp.abs(su) <= margin) & (jnp.abs(sv) <= margin)
        su = jnp.clip(su, -margin, margin)
        sv = jnp.clip(sv, -margin, margin)
        valid = base_valid & zok & in_rng
        vmask = valid.astype(jnp.float32)

        # tent weights per tap (k static): w[k] = tent(k - (s + margin))
        def tent(x):
            return jnp.maximum(0.0, 1.0 - jnp.abs(x))

        def dtent(x):
            return jnp.where((x > -1.0) & (x <= 0.0), -1.0,
                             jnp.where((x > 0.0) & (x <= 1.0), 1.0, 0.0))

        wv = [tent(k - (sv + margin)) for k in range(m2)]
        wu = [tent(k - (su + margin)) for k in range(m2)]
        dwu = [dtent(k - (su + margin)) for k in range(m2)]
        dwv = [dtent(k - (sv + margin)) for k in range(m2)]

        # stage 1 (vertical): V1[i, c] = sum_k B[i+k, c] wv[k] for ALL
        # (i, c) at once — blocks_ref[k:k+side] is the [side, S, N] slab
        # whose row i holds B[i+k]
        V1 = blocks_ref[0:side, :, :] * wv[0][None]
        V2 = blocks_ref[0:side, :, :] * dwv[0][None]
        for k in range(1, m2):
            slab = blocks_ref[k:k + side, :, :]
            V1 = V1 + slab * wv[k][None]
            V2 = V2 + slab * dwv[k][None]

        # stage 2 (horizontal): column j for all patch rows at once
        vals = [None] * side
        gus = [None] * side
        gvs = [None] * side
        sum_abs_slab = jnp.zeros((side,) + u.shape[1:], jnp.float32)
        for j in range(side):
            val = V1[:, j, :] * wu[0]
            gu = V1[:, j, :] * dwu[0]
            gv = V2[:, j, :] * wu[0]
            for l in range(1, m2):
                val = val + V1[:, j + l, :] * wu[l]
                gu = gu + V1[:, j + l, :] * dwu[l]
                gv = gv + V2[:, j + l, :] * wu[l]
            vals[j] = val
            gus[j] = gu
            gvs[j] = gv
            sum_abs_slab = sum_abs_slab + jnp.abs(val - refp_ref[j])

        # robust scale: sigma = 1.2533 * mean|r| over valid pixels
        n_valid = jnp.sum(vmask) * float(side * side)
        sigma = jnp.maximum(
            1.2533 * jnp.sum(_rowsum(sum_abs_slab, side) * vmask)
            / jnp.maximum(n_valid, 1.0), 1e-3)
        inv_s2 = 1.0 / (sigma * sigma)

        A_s = jnp.zeros_like(sum_abs_slab)
        B_s = jnp.zeros_like(sum_abs_slab)
        C_s = jnp.zeros_like(sum_abs_slab)
        Gu_s = jnp.zeros_like(sum_abs_slab)
        Gv_s = jnp.zeros_like(sum_abs_slab)
        for j in range(side):
            r = vals[j] - refp_ref[j]
            a_r = jnp.abs(r) / sigma
            hub = jnp.where(a_r <= 1.345, 1.0,
                            1.345 / jnp.maximum(a_r, 1e-9))
            w = hub * inv_s2
            gu, gv = gus[j], gvs[j]
            A_s = A_s + w * gu * gu
            B_s = B_s + w * gu * gv
            C_s = C_s + w * gv * gv
            Gu_s = Gu_s + w * gu * r
            Gv_s = Gv_s + w * gv * r
        A = _rowsum(A_s, side) * vmask
        Bc = _rowsum(B_s, side) * vmask
        C = _rowsum(C_s, side) * vmask
        Gu = _rowsum(Gu_s, side) * vmask
        Gv = _rowsum(Gv_s, side) * vmask

        # patch-center Jacobians [6 rows of 1,N]
        zero = jnp.zeros_like(u)
        ju = (fx * zi, zero, -fx * cxv * zi2)
        jv = (zero, fy * zi, -fy * cyv * zi2)

        def chain(j3):
            a, b_, c_ = j3
            return (a, b_, c_,
                    c_ * cyv - b_ * czv,
                    a * czv - c_ * cxv,
                    b_ * cxv - a * cyv)

        Ju = chain(ju)
        Jv = chain(jv)

        H = [[None] * 6 for _ in range(6)]
        g = [None] * 6
        for d in range(6):
            g[d] = -jnp.sum(Ju[d] * Gu + Jv[d] * Gv)
            for e in range(d, 6):
                H[d][e] = jnp.sum(Ju[d] * Ju[e] * A
                                  + (Ju[d] * Jv[e] + Jv[d] * Ju[e]) * Bc
                                  + Jv[d] * Jv[e] * C)
        for d in range(6):
            for e in range(d):
                H[d][e] = H[e][d]
            H[d][d] = H[d][d] + 1e-6
        dx = _chol6_solve(H, g)
        fin = jnp.ones((), jnp.float32)
        for d in range(6):
            fin = fin * jnp.isfinite(dx[d]).astype(jnp.float32)
        dx = [jnp.where(fin > 0, dx[d], 0.0) for d in range(6)]

        dq = _so3_exp_scalars(dx[3], dx[4], dx[5])
        vx, vy, vz = _so3_V_apply(dx[3], dx[4], dx[5], dx[0], dx[1], dx[2])
        nq = _quat_mul_scalars(dq, (q0, q1, q2, q3))
        norm = jnp.sqrt(jnp.maximum(
            nq[0] ** 2 + nq[1] ** 2 + nq[2] ** 2 + nq[3] ** 2, 1e-12))
        q0n, q1n, q2n, q3n = [x / norm for x in nq]
        txr, tyr, tzr, _ = _quat_rotate_rows(
            dq[0], dq[1], dq[2], dq[3],
            jnp.full((1, 1), 1.0) * tx, jnp.full((1, 1), 1.0) * ty,
            jnp.full((1, 1), 1.0) * tz)
        return (q0n, q1n, q2n, q3n,
                txr[0, 0] + vx, tyr[0, 0] + vy, tzr[0, 0] + vz,
                jnp.sum(vmask))

    init = (pose_ref[0], pose_ref[1], pose_ref[2], pose_ref[3],
            pose_ref[4], pose_ref[5], pose_ref[6],
            jnp.zeros((), jnp.float32))
    q0, q1, q2, q3, tx, ty, tz, ngood = jax.lax.fori_loop(
        0, num_iters, gn_body, init)

    pose_out[0] = q0
    pose_out[1] = q1
    pose_out[2] = q2
    pose_out[3] = q3
    pose_out[4] = tx
    pose_out[5] = ty
    pose_out[6] = tz
    pose_out[7] = 0.0
    ngood_ref[0] = ngood.astype(jnp.int32)


def _align2d_kernel(num_iters: int, half: int, margin: int,
                    conv_eps: float,
                    blocks_ref, refp_ref, uv0_ref, center_ref, valid_ref,
                    uv_out, conv_out, ncc_out):
    """Batched KLT (align2d) as one dispatch: every candidate's full GN
    loop — window resample, per-lane 3x3 normal equations (du, dv, dm),
    closed-form solve, clipped update — plus the final zero-mean NCC.
    Same slab layout as _align_kernel: patch rows on sublanes, candidates
    on lanes. Math mirrors ops.align.align2d (residual r = I(x+d) -
    I_ref - dm, J = [gu, gv, -1], +1e-4 diagonal damping)."""
    side = 2 * half
    m2 = 2 * margin + 2

    cu = center_ref[0:1, :]
    cv = center_ref[1:2, :]
    lane_valid = valid_ref[0:1, :] > 0.5

    def tent(x):
        return jnp.maximum(0.0, 1.0 - jnp.abs(x))

    def dtent(x):
        return jnp.where((x > -1.0) & (x <= 0.0), -1.0,
                         jnp.where((x > 0.0) & (x <= 1.0), 1.0, 0.0))

    def resample(su, sv, with_grad=True):
        wv = [tent(k - (sv + margin)) for k in range(m2)]
        wu = [tent(k - (su + margin)) for k in range(m2)]
        V1 = blocks_ref[0:side, :, :] * wv[0][None]
        for k in range(1, m2):
            V1 = V1 + blocks_ref[k:k + side, :, :] * wv[k][None]
        if with_grad:
            dwv = [dtent(k - (sv + margin)) for k in range(m2)]
            dwu = [dtent(k - (su + margin)) for k in range(m2)]
            V2 = blocks_ref[0:side, :, :] * dwv[0][None]
            for k in range(1, m2):
                V2 = V2 + blocks_ref[k:k + side, :, :] * dwv[k][None]
        vals, gus, gvs = [], [], []
        for j in range(side):
            val = V1[:, j, :] * wu[0]
            gu = V1[:, j, :] * dwu[0] if with_grad else None
            gv = V2[:, j, :] * wu[0] if with_grad else None
            for l in range(1, m2):
                val = val + V1[:, j + l, :] * wu[l]
                if with_grad:
                    gu = gu + V1[:, j + l, :] * dwu[l]
                    gv = gv + V2[:, j + l, :] * wu[l]
            vals.append(val)
            gus.append(gu)
            gvs.append(gv)
        return vals, gus, gvs

    def gn_body(_, c):
        u, v, dm, _ = c
        su = u - cu
        sv = v - cv
        in_rng = (jnp.abs(su) <= margin) & (jnp.abs(sv) <= margin)
        su = jnp.clip(su, -margin, margin)
        sv = jnp.clip(sv, -margin, margin)
        w = (lane_valid & in_rng).astype(jnp.float32)

        vals, gus, gvs = resample(su, sv)
        # accumulate the normal-equation sums as [side, M] slabs first
        # (elementwise adds), reduce sublanes once at the end via
        # _rowsum — a direct axis-0 jnp.sum over the offset-layout slab
        # slices is rejected by the chip's Mosaic (see _rowsum).
        zs = jnp.zeros_like(gus[0])
        A_s, B_s, C_s = zs, zs, zs             # gu^2, gu gv, gv^2
        Du_s, Dv_s = zs, zs                    # gu, gv
        bu_s, bv_s, br_s = zs, zs, zs          # gu r, gv r, r
        for j in range(side):
            r = vals[j] - refp_ref[j] - dm
            gu, gv = gus[j], gvs[j]
            A_s = A_s + gu * gu
            B_s = B_s + gu * gv
            C_s = C_s + gv * gv
            Du_s = Du_s + gu
            Dv_s = Dv_s + gv
            bu_s = bu_s + gu * r
            bv_s = bv_s + gv * r
            br_s = br_s + r
        A = _rowsum(A_s, side)
        Bq = _rowsum(B_s, side)
        C = _rowsum(C_s, side)
        Du = _rowsum(Du_s, side)
        Dv = _rowsum(Dv_s, side)
        bu = _rowsum(bu_s, side)
        bv = _rowsum(bv_s, side)
        br = _rowsum(br_s, side)
        P = float(side * side)
        # H = w * [[A, B, -Du], [B, C, -Dv], [-Du, -Dv, P]] + 1e-4 I;
        # b = -w * [bu, bv, -br]. The per-lane weight w scales H and b
        # identically, so solve with the unweighted entries and zero the
        # step for invalid lanes (matches the XLA path exactly up to the
        # damping term, which is negligible at these magnitudes).
        h00 = A + 1e-4
        h01 = Bq
        h02 = -Du
        h11 = C + 1e-4
        h12 = -Dv
        h22 = P + 1e-4
        g0 = -bu
        g1 = -bv
        g2 = br
        # closed-form 3x3 solve (adjugate / det)
        c00 = h11 * h22 - h12 * h12
        c01 = h02 * h12 - h01 * h22
        c02 = h01 * h12 - h02 * h11
        det = h00 * c00 + h01 * c01 + h02 * c02
        c11 = h00 * h22 - h02 * h02
        c12 = h01 * h02 - h00 * h12
        c22 = h00 * h11 - h01 * h01
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        du = (c00 * g0 + c01 * g1 + c02 * g2) * inv_det
        dv_ = (c01 * g0 + c11 * g1 + c12 * g2) * inv_det
        ddm = (c02 * g0 + c12 * g1 + c22 * g2) * inv_det
        fin = jnp.isfinite(du) & jnp.isfinite(dv_) & jnp.isfinite(ddm) \
            & (w > 0)
        du = jnp.where(fin, du, 0.0)
        dv_ = jnp.where(fin, dv_, 0.0)
        ddm = jnp.where(fin, ddm, 0.0)
        u2 = jnp.clip(u + du, cu - margin, cu + margin)
        v2 = jnp.clip(v + dv_, cv - margin, cv + margin)
        step = jnp.sqrt(du * du + dv_ * dv_)
        return u2, v2, dm + ddm, step

    u0 = uv0_ref[0:1, :]
    v0 = uv0_ref[1:2, :]
    u, v, dm, last_step = jax.lax.fori_loop(
        0, num_iters, gn_body,
        (u0, v0, jnp.zeros_like(u0), jnp.full_like(u0, 1e9)))

    conv = lane_valid & (last_step < conv_eps)
    # final resample for the zero-mean NCC gate
    su = u - cu
    sv = v - cv
    in_rng = (jnp.abs(su) <= margin) & (jnp.abs(sv) <= margin)
    vals, _, _ = resample(jnp.clip(su, -margin, margin),
                          jnp.clip(sv, -margin, margin))
    P = float(side * side)
    zs = jnp.zeros_like(vals[0])
    sv_s, sr_s = zs, zs
    for j in range(side):
        sv_s = sv_s + vals[j]
        sr_s = sr_s + refp_ref[j]
    mean_v = _rowsum(sv_s, side) / P
    mean_r = _rowsum(sr_s, side) / P
    saa_s, sbb_s, sab_s = zs, zs, zs
    for j in range(side):
        a = vals[j] - mean_v
        b = refp_ref[j] - mean_r
        saa_s = saa_s + a * a
        sbb_s = sbb_s + b * b
        sab_s = sab_s + a * b
    saa = _rowsum(saa_s, side)
    sbb = _rowsum(sbb_s, side)
    sab = _rowsum(sab_s, side)
    ncc = sab / jnp.sqrt(saa * sbb + 1e-6)

    uv_out[0:1, :] = u
    uv_out[1:2, :] = v
    conv_out[0:1, :] = (conv & in_rng).astype(jnp.float32)
    ncc_out[0:1, :] = ncc


@functools.partial(jax.jit, static_argnames=(
    "num_iters", "half", "margin", "conv_eps", "interpret"))
def align2d_fused(img, ref_patches, uv_init, mask,
                  num_iters: int = 10, half: int = 4, margin: int = 5,
                  conv_eps: float = 0.03, interpret: bool = False):
    """Drop-in fused variant of ops.align.align2d(with_score=True): one
    Pallas dispatch for the whole batched KLT + NCC (the XLA while-loop
    version runs ~20 op-groups x 10 iterations inside the fused tracking
    program). Returns (uv [M,2], converged [M] bool, ncc [M])."""
    from ygz_tpu.ops.interp import gather_anchored_blocks
    M = uv_init.shape[0]
    blocks, corner, blk_valid = gather_anchored_blocks(
        img, uv_init, half, margin)
    center = corner + (half + margin)
    side = 2 * half

    blocks_t = blocks.transpose(1, 2, 0).astype(jnp.float32)   # [S, S, M]
    refp_t = ref_patches.reshape(M, side, side).transpose(2, 1, 0) \
        .astype(jnp.float32)                                   # [j, i, M]
    uv0_t = uv_init.T.astype(jnp.float32)                      # [2, M]
    ctr_t = center.T.astype(jnp.float32)
    val = (mask & blk_valid).reshape(1, M).astype(jnp.float32)

    # tile candidates over a lane-chunk grid: the fully-unrolled GN body
    # keeps ~19x19 slab temporaries live per lane, so one instance over
    # the whole batch blows the 16 MB scoped-VMEM budget past ~600
    # lanes (observed 18.9 MB at M=1000). 512-lane chunks keep each
    # instance < 10 MB with zero extra HBM traffic.
    BM = 512
    Mp = -(-M // BM) * BM
    if Mp != M:
        pad = Mp - M
        blocks_t = jnp.pad(blocks_t, ((0, 0), (0, 0), (0, pad)))
        refp_t = jnp.pad(refp_t, ((0, 0), (0, 0), (0, pad)))
        uv0_t = jnp.pad(uv0_t, ((0, 0), (0, pad)))
        ctr_t = jnp.pad(ctr_t, ((0, 0), (0, pad)))
        val = jnp.pad(val, ((0, 0), (0, pad)))
    S = blocks_t.shape[0]

    kern = functools.partial(_align2d_kernel, num_iters, half, margin,
                             float(conv_eps))
    uv, conv, ncc = pl.pallas_call(
        kern,
        grid=(Mp // BM,),
        out_shape=(
            jax.ShapeDtypeStruct((2, Mp), jnp.float32),
            jax.ShapeDtypeStruct((1, Mp), jnp.float32),
            jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((S, S, BM), lambda i: (0, 0, i)),
            pl.BlockSpec((side, side, BM), lambda i: (0, 0, i)),
            pl.BlockSpec((2, BM), lambda i: (0, i)),
            pl.BlockSpec((2, BM), lambda i: (0, i)),
            pl.BlockSpec((1, BM), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((2, BM), lambda i: (0, i)),
            pl.BlockSpec((1, BM), lambda i: (0, i)),
            pl.BlockSpec((1, BM), lambda i: (0, i)),
        ),
        interpret=interpret,
    )(blocks_t, refp_t, uv0_t, ctr_t, val)
    return (uv[:, :M].T, (conv[0, :M] > 0.5) & mask & blk_valid,
            ncc[0, :M])


@functools.partial(jax.jit, static_argnames=(
    "num_iters", "half", "margin", "fx", "fy", "cx", "cy", "interpret"))
def sparse_align_level_fused(T_cur_ref, blocks, ref_patches, points_ref,
                             center, valid,
                             fx: float, fy: float, cx: float, cy: float,
                             num_iters: int = 10, half: int = 2,
                             margin: int = 8, interpret: bool = False):
    """One pyramid level of sparse alignment as a single Pallas dispatch.

    blocks:  [N, S, S] gathered windows (anchored at the initial
             projection, interp.gather_anchored_blocks)
    ref_patches: [N, P] reference intensities
    points_ref:  [N, 3] 3D points in the reference camera frame
    center:  [N, 2] block-center pixel coords
    valid:   [N] bool
    Returns (T_cur_ref', n_good).
    """
    N = blocks.shape[0]
    side = 2 * half
    pose_in = jnp.concatenate([T_cur_ref["q"], T_cur_ref["t"],
                               jnp.zeros((1,))]).astype(jnp.float32)
    blocks_t = blocks.transpose(1, 2, 0).astype(jnp.float32)   # [S, S, N]
    # column-major patch layout [j, i, N]: the kernel's stage-2 slices
    # column j's reference rows contiguously as refp[j] -> [side, N]
    refp_t = ref_patches.reshape(N, side, side).transpose(2, 1, 0) \
        .astype(jnp.float32)
    pts_t = points_ref.T.astype(jnp.float32)                   # [3, N]
    ctr_t = center.T.astype(jnp.float32)                       # [2, N]
    val = valid.reshape(1, N).astype(jnp.float32)

    kern = functools.partial(_align_kernel, num_iters, half, margin,
                             float(fx), float(fy), float(cx), float(cy))
    pose_out, ngood = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((8,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(pose_in, blocks_t, refp_t, pts_t, ctr_t, val)
    return {"q": pose_out[:4], "t": pose_out[4:7]}, ngood[0]
