"""SO(3)/SE(3) Lie groups as pure, vmappable jnp functions.

TPU-native replacement for the reference's Sophus templates
(/root/reference/Thirdparty/sophus/sophus/{so3,se3}.hpp). Rotations are
stored as unit quaternions (w, x, y, z) and poses as a (quat, trans)
pair, so every operation is a handful of fused VPU multiply-adds with no
data-dependent control flow. All functions broadcast over arbitrary
leading batch dimensions — the whole map's poses transform in one call.

Conventions:
  * quaternion layout [w, x, y, z], always kept normalized by `quat_normalize`
  * se3 tangent layout [rho(3), phi(3)] = [translation, rotation], matching
    Sophus' exp ordering used by the reference's SparseImageAlign update
    (/root/reference/src/SparseImageAlign.cc:240-244)
  * float32 throughout (the reference moved poses from double cv::Mat to
    float Sophus for speed — Note.md 2017.3.2); optimizers that need
    double-precision islands cast locally.

Small-angle branches use `jnp.where` on the full expressions with
safe-guarded denominators: branchless, compile-once, NaN-free gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_div(num, den, eps=_EPS):
    """num/den with a sign-preserving floor on |den| (a plain
    jnp.maximum(den, eps) corrupts negative denominators)."""
    mag = jnp.maximum(jnp.abs(den), eps)
    return num / jnp.where(den < 0, -mag, mag)


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(q1, q2):
    """Hamilton product, broadcasting over leading dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate 3-vectors v by unit quaternions q (broadcasting)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix -> quaternion, branchless Shepperd via 4-way select."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best per element.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# so(3)
# ---------------------------------------------------------------------------

def hat(v):
    """3-vector -> skew matrix, broadcasting."""
    z = jnp.zeros_like(v[..., 0])
    r = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return r.reshape(v.shape[:-1] + (3, 3))


def vee(M):
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def so3_exp(phi):
    """Axis-angle -> quaternion. Branchless small-angle safe."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    # sin(t/2)/t: series 0.5 - t^2/48 for small t
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q):
    """Quaternion -> axis-angle (minimal, |phi| <= pi)."""
    q = quat_normalize(q)
    # force w >= 0 so we land in the minimal cover
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-6
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vn, _EPS))
    return k * q[..., 1:]


def so3_left_jacobian(phi):
    """Left Jacobian J_l of SO(3): exp(phi + dphi) ~ exp(J_l dphi) exp(phi).

    Mirrors the right-Jacobian helpers the reference's preintegrator uses
    (/root/reference/src/IMU/IMUPreintegrator.h:91-151); J_r(phi) = J_l(-phi).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = hat(phi)
    KK = K @ K
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + a * K + b * KK


def so3_right_jacobian(phi):
    return so3_left_jacobian(-phi)


def so3_right_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = hat(phi)
    KK = K @ K
    small = theta2 < 1e-8
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / jnp.maximum(theta2, _EPS))
        - (1.0 + jnp.cos(theta)) / jnp.maximum(2.0 * theta * jnp.sin(theta), _EPS),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + 0.5 * K + cot_term * KK


# ---------------------------------------------------------------------------
# SE(3): pose = dict(q=[...,4], t=[...,3]) representing world->cam (or any) map
# ---------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32):
    return {"q": quat_identity(dtype), "t": jnp.zeros(3, dtype=dtype)}


def se3(q, t):
    return {"q": q, "t": t}


def se3_apply(T, p):
    """Apply pose to 3D points: R p + t (broadcasting)."""
    return quat_rotate(T["q"], p) + T["t"]


def se3_compose(T1, T2):
    """T1 * T2 (apply T2 first)."""
    return {
        "q": quat_normalize(quat_mul(T1["q"], T2["q"])),
        "t": quat_rotate(T1["q"], T2["t"]) + T1["t"],
    }


def se3_inverse(T):
    qi = quat_conj(T["q"])
    return {"q": qi, "t": -quat_rotate(qi, T["t"])}


def se3_matrix(T):
    R = quat_to_matrix(T["q"])
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    top = jnp.concatenate([R, T["t"][..., None]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_from_matrix(M):
    return {"q": matrix_to_quat(M[..., :3, :3]), "t": M[..., :3, 3]}


def se3_exp(xi):
    """Tangent [rho, phi] -> SE3, Sophus convention: t = V(phi) rho."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return {"q": q, "t": t}


def se3_log(T):
    phi = so3_log(T["q"])
    Vinv = _so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T["t"])
    return jnp.concatenate([rho, phi], axis=-1)


def _so3_left_jacobian_inv(phi):
    return so3_right_jacobian_inv(-phi)


def se3_retract(T, xi):
    """Left-multiplicative update T <- exp(xi) * T.

    This is the update used throughout the optimizers; matches the
    reference's g2o SE3 expmap vertices and SparseImgAlign's
    `T <- T * exp(-x)` after an inverse-compositional sign flip.
    """
    return se3_compose(se3_exp(xi), T)


# ---------------------------------------------------------------------------
# Sim(3): pose with scale, for loop closure (reference g2o/types/sim3)
# ---------------------------------------------------------------------------

def sim3(q, t, s):
    return {"q": q, "t": t, "s": s}


def sim3_identity(dtype=jnp.float32):
    return {"q": quat_identity(dtype), "t": jnp.zeros(3, dtype=dtype),
            "s": jnp.ones((), dtype=dtype)}


def sim3_apply(S, p):
    return S["s"][..., None] * quat_rotate(S["q"], p) + S["t"]


def sim3_compose(S1, S2):
    return {
        "q": quat_normalize(quat_mul(S1["q"], S2["q"])),
        "t": S1["s"][..., None] * quat_rotate(S1["q"], S2["t"]) + S1["t"],
        "s": S1["s"] * S2["s"],
    }


def sim3_inverse(S):
    qi = quat_conj(S["q"])
    si = 1.0 / S["s"]
    return {"q": qi, "t": -si[..., None] * quat_rotate(qi, S["t"]), "s": si}


def sim3_from_se3(T, s=None):
    s = jnp.ones(T["q"].shape[:-1], dtype=T["q"].dtype) if s is None else s
    return {"q": T["q"], "t": T["t"], "s": s}


def se3_from_sim3(S):
    """Drop scale into translation: [sR t] -> [R t/s]... reference converts
    corrected Sim3 back to SE3 as [R, t/s] (/root/reference/src/LoopClosing.cc:464-473).
    """
    return {"q": S["q"], "t": S["t"] / S["s"][..., None]}


# 7-dof tangent [rho, phi, sigma] for sim3 pose-graph optimization

def _sim3_W(phi, sigma, n_terms: int = 16):
    """Translation mixing matrix of the Sim3 exponential:
    t = W(phi, sigma) rho with W = sum_n A^n / (n+1)!, A = sigma I + hat(phi)
    (solution of x' = A x + rho). Evaluated as a TRUNCATED SERIES, which is
    branch-free and therefore exactly differentiable by AD everywhere —
    closed-form variants switch branches at sigma=0 / theta=0, precisely
    where pose-graph optimization linearizes, and jnp.where branches give
    zero derivatives there. For |phi| <= pi, |sigma| <= 1 the series hits
    float32 precision well before 16 terms."""
    A = hat(phi) + sigma[..., None, None] * jnp.eye(3, dtype=phi.dtype)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), A.shape)
    W = I
    term = I
    for n in range(1, n_terms):
        term = (term @ A) / (n + 1.0)
        W = W + term
    return W


def sim3_exp(xi):
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return {"q": q, "t": t, "s": s}


def sim3_log(S):
    phi = so3_log(S["q"])
    sigma = jnp.log(jnp.maximum(S["s"], _EPS))
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, S["t"][..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
