"""Robust cost weight functions and scale estimators.

Batched replacement for the reference's SVO-vikit robust cost module
(/root/reference/include/RobustCost.h:11-157): Huber / Tukey / t-distribution
weights and MAD / t-distribution scale estimators, plus the chi2-gating
helpers the g2o optimizers use (Huber deltas sqrt(5.991)/sqrt(7.815),
/root/reference/src/Optimizer.cc:1699-1717).

All functions map residual magnitudes [...,] -> IRLS weights [...,].
"""

from __future__ import annotations

import jax.numpy as jnp

# chi-square 95% quantiles used throughout ORB-SLAM-style gating
CHI2_2DOF = 5.991
CHI2_3DOF = 7.815


def huber_weight(r, delta):
    """w(r) = 1 if |r|<=delta else delta/|r|  (vikit HuberWeightFunction)."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


def tukey_weight(r, b: float = 4.6851):
    a2 = (r / b) ** 2
    w = (1.0 - a2) ** 2
    return jnp.where(jnp.abs(r) <= b, w, 0.0)


def tdist_weight(r, nu: float = 5.0):
    return (nu + 1.0) / (nu + r * r)


def mean_abs_scale(r, mask=None):
    """Sort-free robust scale: sigma ~= 1.2533 * mean|r| (exact for a
    Gaussian). Used on per-iteration hot paths where the median's full
    sort would dominate the kernel (TPU sorts are expensive)."""
    a = jnp.abs(r)
    if mask is not None:
        num = jnp.sum(jnp.where(mask, a, 0.0))
        den = jnp.maximum(jnp.sum(mask.astype(a.dtype)), 1.0)
    else:
        num = jnp.sum(a)
        den = a.size
    return jnp.maximum(1.2533 * num / den, 1e-6)


def mad_scale(r, mask=None):
    """Median absolute deviation scale (vikit MADScaleEstimator, 1.4826*MAD).

    With a validity mask, invalid entries are pushed to +inf before the
    median via a masked sort so padding doesn't bias the estimate.
    """
    a = jnp.abs(r)
    if mask is not None:
        a = jnp.where(mask, a, jnp.inf)
        n_valid = jnp.sum(mask)
    else:
        n_valid = a.size
    s = jnp.sort(a.reshape(-1))
    idx = jnp.clip((n_valid - 1) // 2, 0, a.size - 1)
    med = s[idx]
    med = jnp.where(jnp.isfinite(med), med, 1.0)
    return 1.4826 * jnp.maximum(med, 1e-6)


def huber_rho(r2, delta):
    """Huber rho on squared residuals (for total-cost reporting)."""
    d2 = delta * delta
    return jnp.where(r2 <= d2, r2, 2.0 * delta * jnp.sqrt(jnp.maximum(r2, 0.0)) - d2)
