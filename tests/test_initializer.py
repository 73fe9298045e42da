"""Two-view initializer tests on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.core import lie
from ygz_tpu.pipeline import initializer

K = jnp.array([[200.0, 0.0, 160.0],
               [0.0, 200.0, 120.0],
               [0.0, 0.0, 1.0]])


def project(K, X):
    p = X @ np.asarray(K).T
    return p[:, :2] / p[:, 2:]


def make_two_view(seed=0, n=120, planar=False, noise=0.3,
                  t=(0.3, 0.05, 0.02), rotvec=(0.02, -0.03, 0.01)):
    rng = np.random.RandomState(seed)
    if planar:
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      np.full(n, 5.0)], 1).astype(np.float32)
    else:
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(3, 9, n)], 1).astype(np.float32)
    R = np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.asarray(rotvec, dtype=jnp.float32))))
    tv = np.asarray(t, np.float32)
    X2 = X @ R.T + tv
    uv1 = project(K, X) + rng.randn(n, 2).astype(np.float32) * noise
    uv2 = project(K, X2) + rng.randn(n, 2).astype(np.float32) * noise
    return (jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool),
            R, tv, X)


class TestInitializer:
    def test_general_scene_f_model(self):
        uv1, uv2, mask, R_true, t_true, X = make_two_view(0, noise=0.2)
        res = initializer.initialize_two_view(uv1, uv2, mask, K, seed=1)
        assert bool(res.success)
        # rotation error
        dR = np.asarray(res.R) @ R_true.T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.01, ang
        # translation direction (scale-free)
        tn = np.asarray(res.t) / np.linalg.norm(np.asarray(res.t))
        te = t_true / np.linalg.norm(t_true)
        # ~3 deg: the intrinsic accuracy of the 8-point algorithm at this
        # noise/parallax (verified against f64 all-point least squares);
        # the pipeline's subsequent global BA tightens it
        assert min(np.linalg.norm(tn - te), np.linalg.norm(tn + te)) < 0.08
        # triangulated points match up to scale
        good = np.asarray(res.good)
        assert good.sum() > 80
        s = np.median(np.asarray(res.points)[good][:, 2] / X[good][:, 2])
        err = np.linalg.norm(np.asarray(res.points)[good] - s * X[good], axis=1)
        assert np.median(err) < 0.05 * s * 5

    def test_planar_scene_h_model(self):
        uv1, uv2, mask, R_true, t_true, X = make_two_view(
            2, planar=True, noise=0.2, t=(0.4, 0.0, 0.05))
        res = initializer.initialize_two_view(uv1, uv2, mask, K, seed=3)
        assert bool(res.used_h)
        assert bool(res.success)
        dR = np.asarray(res.R) @ R_true.T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.02, ang

    def test_rejects_pure_rotation(self):
        # no translation -> no parallax -> must not initialize
        uv1, uv2, mask, *_ = make_two_view(4, t=(0.0, 0.0, 0.0),
                                           rotvec=(0.05, 0.03, -0.02),
                                           noise=0.1)
        res = initializer.initialize_two_view(uv1, uv2, mask, K, seed=5)
        assert not bool(res.success)

    def test_triangulate_exact(self):
        X = jnp.asarray(np.array([[0.5, -0.3, 4.0], [1.0, 0.8, 6.0]], np.float32))
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.5, 0, 0], np.float32)
        P1 = np.asarray(K) @ np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
        P2 = np.asarray(K) @ np.concatenate([R, t[:, None]], 1)
        uv1 = project(K, np.asarray(X))
        uv2 = project(K, np.asarray(X) @ R.T + t)
        Xr = initializer.triangulate(jnp.asarray(P1.astype(np.float32)),
                                     jnp.asarray(P2.astype(np.float32)),
                                     jnp.asarray(uv1), jnp.asarray(uv2))
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=1e-3)

    def test_with_outliers(self):
        uv1, uv2, mask, R_true, t_true, X = make_two_view(6, noise=0.2)
        uv2 = np.array(uv2)
        uv2[:15] += np.random.RandomState(7).uniform(30, 80, (15, 2))
        res = initializer.initialize_two_view(jnp.asarray(uv2 * 0 + np.array(uv1)),
                                              jnp.asarray(uv2), mask, K, seed=7)
        # outliers must be excluded from the good set
        good = np.asarray(res.good)
        assert good[:15].sum() <= 2
        assert bool(res.success)
