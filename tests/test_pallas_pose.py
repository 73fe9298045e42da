"""Fused Pallas pose-optimization kernel vs the XLA reference
implementation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from ygz_tpu.backend import ba
from ygz_tpu.core import lie
from ygz_tpu.ops import pallas_pose

FX = FY = 200.0
CX, CY = 160.0, 120.0


def make_problem(n=256, noise=0.3, n_out=20, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 8, n)], 1).astype(np.float32)
    T_true = lie.se3_exp(jnp.asarray(
        np.array([0.1, -0.05, 0.2, 0.03, -0.02, 0.05], np.float32)))
    pc = np.asarray(lie.se3_apply(T_true, jnp.asarray(pts)))
    uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                   FY * pc[:, 1] / pc[:, 2] + CY], 1)
    uv += rng.randn(n, 2) * noise
    uv[:n_out] += rng.uniform(20, 50, (n_out, 2))
    T0 = lie.se3_retract(T_true, jnp.asarray(
        np.array([0.04, -0.03, 0.02, 0.01, 0.02, -0.015], np.float32)))
    return (jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
            jnp.ones(n), jnp.ones(n, bool), T0, T_true)


class TestFusedPoseOpt:
    def test_matches_xla_version(self):
        pts, uv, s2, mask, T0, T_true = make_problem()
        Tx, inl_x, nx = ba.pose_optimization(
            T0, pts, uv, jnp.full(pts.shape[:1], -1.0), s2, mask,
            FX, FY, CX, CY, 0.0)
        Tp, inl_p, np_ = pallas_pose.pose_optimization_fused(
            T0, pts, uv, s2, mask, FX, FY, CX, CY, interpret=True)
        # same outlier classification
        agree = (np.asarray(inl_x) == np.asarray(inl_p)).mean()
        assert agree > 0.97, agree
        # same pose (both near truth)
        err = lie.se3_log(lie.se3_compose(lie.se3_inverse(Tp), Tx))
        assert float(jnp.linalg.norm(err)) < 2e-3, np.asarray(err)

    def test_recovers_pose(self):
        pts, uv, s2, mask, T0, T_true = make_problem(noise=0.0, n_out=10,
                                                     seed=3)
        Tp, inl, n = pallas_pose.pose_optimization_fused(
            T0, pts, uv, s2, mask, FX, FY, CX, CY, interpret=True)
        err = lie.se3_log(lie.se3_compose(lie.se3_inverse(Tp), T_true))
        assert float(jnp.linalg.norm(err)) < 1e-3
        assert int(n) >= 240
        assert not np.asarray(inl)[:10].any()
