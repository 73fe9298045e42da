"""Closed-form / unrolled solvers for the tiny dense systems on the
per-frame hot path (3x3 KLT Hessians, 6x6 pose Hessians).

XLA lowers jnp.linalg.solve on TPU through a generic LU path that costs
tens of microseconds PER CALL even for a 3x3 — profiled at ~70% of the
tracker's frame time. These replacements are pure elementwise VPU
arithmetic (Cramer adjugate for 3x3, fully unrolled Cholesky for 6x6),
fuse into the surrounding kernel, and vectorize freely over batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve3x3(A, b, eps: float = 1e-12):
    """Batched 3x3 solve by adjugate/Cramer. A: [..., 3, 3], b: [..., 3]."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]

    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10

    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    x1 = (c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    x2 = (c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def inv3x3(A, eps: float = 1e-12):
    """Batched 3x3 inverse by adjugate."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    rows = jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c10, c11, c12], -1),
        jnp.stack([c20, c21, c22], -1),
    ], -2)
    return rows * inv_det[..., None, None]


def solve_spd_unrolled(A, b, n: int, eps: float = 1e-10):
    """Batched SPD solve by fully unrolled Cholesky (static n, intended
    n <= 15). A: [..., n, n], b: [..., n]. All index loops unroll at trace
    time into elementwise VPU ops."""
    # factor: L lower-triangular, A = L L^T
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def solve6x6(A, b):
    return solve_spd_unrolled(A, b, 6)
