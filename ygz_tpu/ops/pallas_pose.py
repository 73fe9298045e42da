"""Fused Pallas kernel for pose-only optimization (monocular).

ba.pose_optimization's 4x10 GN schedule compiles to ~40 sequential
XLA op-groups; on TPU each tiny op costs ~5-10 us of fixed overhead, so
the whole optimization is dispatch-bound at ~2.3 ms for 512 points. This
kernel runs the ENTIRE schedule — projection, residuals, Huber weights,
6x6 normal equations, unrolled Cholesky, quaternion retraction, chi2
re-classification — inside one Pallas program: one dispatch, everything
in VMEM/registers.

Layout: observations transposed to [row, O] so O rides the 128-lane
axis; the pose lives as 8 scalars in SMEM. Semantics match
ba.pose_optimization for mono observations (stereo rows use the XLA
path); the same chi2 gates and robust/non-robust round split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ygz_tpu.core.robust import CHI2_2DOF

HUBER = CHI2_2DOF ** 0.5


def _quat_rotate_rows(q0, q1, q2, q3, px, py, pz):
    """Rotate [1,O] vectors by scalar quaternion -> 3 x [1,O]."""
    # R entries (scalars)
    xx, yy, zz = q1 * q1, q2 * q2, q3 * q3
    xy, xz, yz = q1 * q2, q1 * q3, q2 * q3
    wx, wy, wz = q0 * q1, q0 * q2, q0 * q3
    r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)
    r10, r11, r12 = 2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)
    r20, r21, r22 = 2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)
    cx = r00 * px + r01 * py + r02 * pz
    cy = r10 * px + r11 * py + r12 * pz
    cz = r20 * px + r21 * py + r22 * pz
    return cx, cy, cz, (r00, r01, r02, r10, r11, r12, r20, r21, r22)


def _chol6_solve(H, b):
    """Unrolled 6x6 Cholesky solve on scalars. H: python 6x6 list of
    scalars, b: python list of 6 scalars. Returns list of 6 scalars."""
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-10))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, 6):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _so3_exp_scalars(wx, wy, wz):
    """Quaternion of exp([wx,wy,wz]) from scalars."""
    t2 = wx * wx + wy * wy + wz * wz
    t = jnp.sqrt(jnp.maximum(t2, 1e-16))
    half = 0.5 * t
    small = t2 < 1e-8
    k = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(half) / t)
    w = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(half))
    return w, k * wx, k * wy, k * wz


def _quat_mul_scalars(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)


def _so3_V_apply(wx, wy, wz, rx, ry, rz):
    """t = V(phi) rho for the se3 exp, on scalars."""
    t2 = wx * wx + wy * wy + wz * wz
    t = jnp.sqrt(jnp.maximum(t2, 1e-16))
    small = t2 < 1e-8
    a = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(t)) / jnp.maximum(t2, 1e-16))
    b = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (t - jnp.sin(t)) / jnp.maximum(t2 * t, 1e-16))
    # V = I + a K + b K^2, K = hat(w)
    cx = wy * rz - wz * ry
    cy = wz * rx - wx * rz
    cz = wx * ry - wy * rx
    ccx = wy * cz - wz * cy
    ccy = wz * cx - wx * cz
    ccz = wx * cy - wy * cx
    return rx + a * cx + b * ccx, ry + a * cy + b * ccy, rz + a * cz + b * ccz


def _pose_opt_kernel(rounds: int, iters: int, fx, fy, cx_, cy_,
                     pose_ref, pts_ref, uv_ref, s2_ref, mask_ref,
                     pose_out, inlier_out, n_ref):
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    ou = uv_ref[0:1, :]
    ov = uv_ref[1:2, :]
    s2 = s2_ref[0:1, :]
    mask0 = mask_ref[0:1, :] > 0.5

    def classify(q, t):
        q0, q1, q2, q3 = q
        tx, ty, tz = t
        cxv, cyv, czv, _ = _quat_rotate_rows(q0, q1, q2, q3, px, py, pz)
        cxv, cyv, czv = cxv + tx, cyv + ty, czv + tz
        zok = czv > 1e-3
        zs = jnp.maximum(czv, 1e-3)
        u = fx * cxv / zs + cx_
        v = fy * cyv / zs + cy_
        ru = u - ou
        rv = v - ov
        chi2 = (ru * ru + rv * rv) * s2
        return (mask0 & zok & (chi2 <= CHI2_2DOF)).astype(jnp.float32)

    def run(carry):
        q0, q1, q2, q3, tx, ty, tz = carry

        def round_body(rnd, rc):
            q0, q1, q2, q3, tx, ty, tz, inl = rc
            robust = rnd < 2

            def gn_body(_, c):
                q0, q1, q2, q3, tx, ty, tz = c
                cxv, cyv, czv, _ = _quat_rotate_rows(
                    q0, q1, q2, q3, px, py, pz)
                cxv, cyv, czv = cxv + tx, cyv + ty, czv + tz
                zok = czv > 1e-3
                zs = jnp.maximum(czv, 1e-3)
                zi = 1.0 / zs
                zi2 = zi * zi
                u = fx * cxv * zi + cx_
                v = fy * cyv * zi + cy_
                ru = u - ou
                rv = v - ov
                valid = (inl > 0.5) & zok
                chi2 = (ru * ru + rv * rv) * s2
                rnorm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
                hub = jnp.where(rnorm <= HUBER, 1.0, HUBER / rnorm)
                rw = jnp.where(robust, hub, jnp.ones_like(hub))
                w = jnp.where(valid, s2 * rw, 0.0)

                # J rows for u and v wrt xi = [rho, phi] (left-mult):
                # du/dpc = [fx/z, 0, -fx x/z^2]; dv/dpc = [0, fy/z, -fy y/z^2]
                # dpc/drho = I ; dpc/dphi = -hat(pc)
                ju = (fx * zi, jnp.zeros_like(u), -fx * cxv * zi2)
                jv = (jnp.zeros_like(u), fy * zi, -fy * cyv * zi2)

                def chain(j3):
                    # J_xi = (duv/dpc) @ [I | -hat(pc)]; the -hat(pc)
                    # columns are (0,-z,y), (z,0,-x), (-y,x,0)
                    a, b_, c_ = j3
                    return (
                        a, b_, c_,
                        c_ * cyv - b_ * czv,     # phi_x
                        a * czv - c_ * cxv,      # phi_y
                        b_ * cxv - a * cyv)      # phi_z

                Ju = chain(ju)
                Jv = chain(jv)

                H = [[None] * 6 for _ in range(6)]
                g = [None] * 6
                for d in range(6):
                    g[d] = -jnp.sum(w * (Ju[d] * ru + Jv[d] * rv))
                    for e in range(d, 6):
                        H[d][e] = jnp.sum(w * (Ju[d] * Ju[e]
                                               + Jv[d] * Jv[e]))
                for d in range(6):
                    for e in range(d):
                        H[d][e] = H[e][d]
                    H[d][d] = H[d][d] + 1e-5
                dx = _chol6_solve(H, g)
                fin = jnp.ones((), jnp.float32)
                for d in range(6):
                    fin = fin * jnp.isfinite(dx[d]).astype(jnp.float32)
                dx = [jnp.where(fin > 0, dx[d], 0.0) for d in range(6)]

                # retract: T <- exp([rho, phi]) T
                dq = _so3_exp_scalars(dx[3], dx[4], dx[5])
                vx, vy, vz = _so3_V_apply(dx[3], dx[4], dx[5],
                                          dx[0], dx[1], dx[2])
                nq = _quat_mul_scalars(dq, (q0, q1, q2, q3))
                norm = jnp.sqrt(jnp.maximum(
                    nq[0] ** 2 + nq[1] ** 2 + nq[2] ** 2 + nq[3] ** 2,
                    1e-12))
                q0n, q1n, q2n, q3n = [x / norm for x in nq]
                # t' = dq * t + v
                txr, tyr, tzr, _ = _quat_rotate_rows(
                    dq[0], dq[1], dq[2], dq[3],
                    jnp.full((1, 1), 1.0) * tx, jnp.full((1, 1), 1.0) * ty,
                    jnp.full((1, 1), 1.0) * tz)
                return (q0n, q1n, q2n, q3n,
                        txr[0, 0] + vx, tyr[0, 0] + vy, tzr[0, 0] + vz)

            q0, q1, q2, q3, tx, ty, tz = jax.lax.fori_loop(
                0, iters, gn_body, (q0, q1, q2, q3, tx, ty, tz))
            inl = mask0.astype(jnp.float32) * classify(
                (q0, q1, q2, q3), (tx, ty, tz))
            return (q0, q1, q2, q3, tx, ty, tz, inl)

        state = (q0, q1, q2, q3, tx, ty, tz, mask0.astype(jnp.float32))
        state = jax.lax.fori_loop(0, rounds, round_body, state)
        return state

    q0 = pose_ref[0]
    q1 = pose_ref[1]
    q2 = pose_ref[2]
    q3 = pose_ref[3]
    tx = pose_ref[4]
    ty = pose_ref[5]
    tz = pose_ref[6]
    q0, q1, q2, q3, tx, ty, tz, inl = run((q0, q1, q2, q3, tx, ty, tz))

    pose_out[0] = q0
    pose_out[1] = q1
    pose_out[2] = q2
    pose_out[3] = q3
    pose_out[4] = tx
    pose_out[5] = ty
    pose_out[6] = tz
    pose_out[7] = 0.0
    inlier_out[:, :] = inl
    n_ref[0] = jnp.sum(inl).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "fx", "fy", "cx", "cy", "rounds", "iters", "interpret"))
def pose_optimization_fused(T0, pts_w, uv, inv_sigma2, mask,
                            fx: float, fy: float, cx: float, cy: float,
                            rounds: int = 4, iters: int = 10,
                            interpret: bool = False):
    """Drop-in (mono) replacement for ba.pose_optimization: one Pallas
    dispatch. pts_w [O,3], uv [O,2]. Returns (T, inlier [O], n_inliers)."""
    O = pts_w.shape[0]
    pose_in = jnp.concatenate([T0["q"], T0["t"], jnp.zeros((1,))]
                              ).astype(jnp.float32)
    pts_t = pts_w.T.astype(jnp.float32)               # [3, O]
    uv_t = uv.T.astype(jnp.float32)                   # [2, O]
    s2 = inv_sigma2.reshape(1, O).astype(jnp.float32)
    m = mask.reshape(1, O).astype(jnp.float32)

    kern = functools.partial(_pose_opt_kernel, rounds, iters,
                             float(fx), float(fy), float(cx), float(cy))
    pose_out, inl, n = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((8,), jnp.float32),
            jax.ShapeDtypeStruct((1, O), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(pose_in, pts_t, uv_t, s2, m)

    T = {"q": pose_out[:4], "t": pose_out[4:7]}
    return T, inl[0] > 0.5, n[0]
