"""Generic batched Gauss-Newton / Levenberg-Marquardt driver.

Functional replacement for the reference's templated NLLSSolver
(/root/reference/include/NLSSolver_impl.hpp:8-263). Instead of a virtual
`computeResiduals` called per iteration from C++, the caller supplies a
pure `system_fn(x) -> (H, b, cost)` building the normal equations in one
fused device pass; the driver runs a fixed number of damped iterations
under `lax.fori_loop` (static trip count keeps XLA happy) with
accept/reject on cost — equivalent behavior to the reference's LM loop
but batchable over thousands of independent problems via the leading
dims of H/b.

Conventions: solving H dx = b with b = -J^T W r, update x <- retract(x, dx).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def solve_spd(H, b, damping=0.0):
    """Solve (H + damping*diag(H)) dx = b for small dense blocks [...,D,D].

    Uses Cholesky; pads the diagonal for rank-deficient systems so the
    solve never NaNs (callers gate on validity separately).
    """
    D = H.shape[-1]
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    lm = damping * diag + 1e-8
    Hd = H + jnp.eye(D, dtype=H.dtype) * lm[..., None, :] * jnp.eye(D, dtype=H.dtype)
    # (the broadcast above adds lm_i only on the diagonal)
    L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
    return jax.scipy.linalg.cho_solve((L, low), b[..., None])[..., 0]


def gauss_newton(
    system_fn: Callable,
    retract_fn: Callable,
    x0,
    num_iters: int = 10,
    eps: float = 1e-10,
) -> Tuple[object, jnp.ndarray]:
    """Plain GN with monotone-cost guard (reference optimizeGaussNewton,
    NLSSolver_impl.hpp:18-93). Returns (x, final_cost)."""

    def body(_, carry):
        x, cost_prev = carry
        H, b, cost = system_fn(x)
        dx = solve_spd(H, b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        x_new = retract_fn(x, dx)
        _, _, cost_new = system_fn(x_new)
        accept = (cost_new <= cost) & jnp.all(jnp.isfinite(dx))
        x = jax.tree.map(
            lambda old, new: jnp.where(_bshape(accept, old), new, old), x, x_new)
        return x, jnp.where(accept, cost_new, cost)

    _, _, c0 = system_fn(x0)
    x, cost = jax.lax.fori_loop(0, num_iters, body, (x0, c0))
    return x, cost


def levenberg_marquardt(
    system_fn: Callable,
    retract_fn: Callable,
    x0,
    num_iters: int = 10,
    mu0: float = 1e-4,
) -> Tuple[object, jnp.ndarray]:
    """LM with multiplicative damping adaptation (reference
    optimizeLevenbergMarquardt, NLSSolver_impl.hpp:95-217): accept -> mu/2,
    reject -> mu*4, fixed trip count."""

    def body(_, carry):
        x, mu, cost = carry
        H, b, _ = system_fn(x)
        dx = solve_spd(H, b, damping=mu)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        x_new = retract_fn(x, dx)
        _, _, cost_new = system_fn(x_new)
        accept = (cost_new < cost) & jnp.all(jnp.isfinite(cost_new))
        x = jax.tree.map(
            lambda old, new: jnp.where(_bshape(accept, old), new, old), x, x_new)
        mu = jnp.where(accept, mu * 0.5, mu * 4.0)
        cost = jnp.where(accept, cost_new, cost)
        return x, jnp.clip(mu, 1e-9, 1e6), cost

    _, _, c0 = system_fn(x0)
    x, _, cost = jax.lax.fori_loop(0, num_iters, body, (x0, mu0, c0))
    return x, cost


def _bshape(pred, like):
    """Broadcast a scalar/batched predicate against an array's shape."""
    extra = like.ndim - pred.ndim
    return pred.reshape(pred.shape + (1,) * extra) if extra > 0 else pred


def pcg(matvec: Callable, b, x0=None, num_iters: int = 20, precond=None):
    """Preconditioned conjugate gradient for the reduced camera system in
    large BA problems (replaces g2o's sparse Cholesky when the KF count is
    big enough that dense Schur is wasteful). matvec operates on flattened
    state vectors; static iteration count."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r) if precond is not None else r
    p = z

    def body(_, carry):
        x, r, z, p = carry
        Ap = matvec(p)
        rz = jnp.vdot(r, z)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-12)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new) if precond is not None else r_new
        beta = jnp.vdot(r_new, z_new) / jnp.maximum(rz, 1e-12)
        p = z_new + beta * p
        return x, r_new, z_new, p

    x, _, _, _ = jax.lax.fori_loop(0, num_iters, body, (x, r, z, p))
    return x
