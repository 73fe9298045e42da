"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ygz_tpu.backend import ba
from ygz_tpu.core import camera as cam_mod
from ygz_tpu.core import lie
from ygz_tpu.parallel import sharding

CAM = cam_mod.Camera(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                     width=320, height=240)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return sharding.make_mesh(8)


def _padded_scene(O_pad=1024):
    from test_ba import make_scene
    kf_q, kf_t, pts, obs = make_scene(n_kf=4, n_mp=60, seed=0, noise_px=0.2)
    O = obs.kf.shape[0]
    pad = ba.Observations(
        kf=jnp.zeros((O_pad,), jnp.int32).at[:O].set(obs.kf),
        mp=jnp.zeros((O_pad,), jnp.int32).at[:O].set(obs.mp),
        uv=jnp.zeros((O_pad, 2)).at[:O].set(obs.uv),
        ur=jnp.full((O_pad,), -1.0).at[:O].set(obs.ur),
        inv_sigma2=jnp.ones((O_pad,)).at[:O].set(obs.inv_sigma2),
        mask=jnp.zeros((O_pad,), bool).at[:O].set(obs.mask))
    return kf_q, kf_t, pts, pad


class TestShardedBA:
    def test_reduces_cost(self, mesh):
        kf_q, kf_t, pts, obs = _padded_scene()
        rng = np.random.RandomState(1)
        dq = jnp.asarray(rng.randn(4, 6).astype(np.float32) * 0.01).at[:2].set(0.0)
        T_pert = lie.se3_retract({"q": kf_q, "t": kf_t}, dq)
        mp_pert = pts + jnp.asarray(rng.randn(*pts.shape).astype(np.float32) * 0.03)
        prob = ba.BAProblem(
            kf_q=T_pert["q"], kf_t=T_pert["t"], mp=mp_pert, obs=obs,
            kf_fixed=jnp.array([True, True, False, False]),
            kf_mask=jnp.ones((4,), bool), mp_mask=jnp.ones((60,), bool))

        def cost(q, t, m):
            return float(ba._ba_cost(
                prob._replace(kf_q=q, kf_t=t, mp=m), obs.mask,
                CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf, False))

        c0 = cost(prob.kf_q, prob.kf_t, prob.mp)
        q, t, m = sharding.sharded_ba_gauss_seidel_step(mesh, prob, CAM,
                                                        num_iters=8)
        c1 = cost(q, t, m)
        assert c1 < 0.5 * c0, (c0, c1)

    def test_matches_single_device_semantics(self, mesh):
        # the psum-assembled normal equations must equal the single-shard
        # ones: run with identical data and compare one update step
        kf_q, kf_t, pts, obs = _padded_scene()
        prob = ba.BAProblem(
            kf_q=kf_q, kf_t=kf_t, mp=pts, obs=obs,
            kf_fixed=jnp.array([True, True, False, False]),
            kf_mask=jnp.ones((4,), bool), mp_mask=jnp.ones((60,), bool))
        q8, t8, m8 = sharding.sharded_ba_gauss_seidel_step(mesh, prob, CAM,
                                                           num_iters=2)
        mesh1 = sharding.make_mesh(1)
        q1, t1, m1 = sharding.sharded_ba_gauss_seidel_step(mesh1, prob, CAM,
                                                           num_iters=2)
        np.testing.assert_allclose(np.asarray(q8), np.asarray(q1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), atol=2e-4)


class TestShardedSchurBA:
    """Exact sharded Schur local BA (the pipeline engine on a mesh)."""

    def _problem(self, n_mp=64, noise=0.03):
        from test_ba import make_scene
        kf_q, kf_t, pts, obs = make_scene(n_kf=4, n_mp=n_mp, seed=3,
                                          noise_px=0.2)
        rng = np.random.RandomState(4)
        dq = jnp.asarray(rng.randn(4, 6).astype(np.float32) * 0.01
                         ).at[:2].set(0.0)
        T_pert = lie.se3_retract({"q": kf_q, "t": kf_t}, dq)
        mp_pert = pts + jnp.asarray(
            rng.randn(*pts.shape).astype(np.float32) * noise)
        O_pad = 1024
        O = obs.kf.shape[0]
        pad = ba.Observations(
            kf=jnp.zeros((O_pad,), jnp.int32).at[:O].set(obs.kf),
            mp=jnp.zeros((O_pad,), jnp.int32).at[:O].set(obs.mp),
            uv=jnp.zeros((O_pad, 2)).at[:O].set(obs.uv),
            ur=jnp.full((O_pad,), -1.0).at[:O].set(obs.ur),
            inv_sigma2=jnp.ones((O_pad,)).at[:O].set(obs.inv_sigma2),
            mask=jnp.zeros((O_pad,), bool).at[:O].set(obs.mask))
        return ba.BAProblem(
            kf_q=T_pert["q"], kf_t=T_pert["t"], mp=mp_pert, obs=pad,
            kf_fixed=jnp.array([True, True, False, False]),
            kf_mask=jnp.ones((4,), bool),
            mp_mask=jnp.ones((n_mp,), bool)), (kf_q, kf_t, pts)

    def test_matches_single_device_schur(self, mesh):
        """Same two-stage schedule, same problem: the sharded engine must
        land on the single-chip Schur engine's solution."""
        prob, (kf_q, kf_t, pts) = self._problem()
        p1, inl1 = ba.local_bundle_adjustment(prob, CAM)
        p8, inl8 = sharding.sharded_local_ba(mesh, prob, CAM)
        np.testing.assert_allclose(np.asarray(p8.kf_t),
                                   np.asarray(p1.kf_t), atol=1e-3)
        np.testing.assert_allclose(np.asarray(p8.mp),
                                   np.asarray(p1.mp), atol=5e-3)
        # and both recover the true scene
        np.testing.assert_allclose(np.asarray(p8.kf_t), np.asarray(kf_t),
                                   atol=5e-3)
        # inlier masks agree in original observation order
        agree = (np.asarray(inl1) == np.asarray(inl8)).mean()
        assert agree > 0.98, agree

    def test_bin_observations_partition(self, mesh):
        """Every binned observation references a point in its device's
        block, and no valid observation is lost at 2x slack."""
        prob, _ = self._problem()
        M, D = prob.mp.shape[0], 8
        O = prob.obs.kf.shape[0]
        O_per = 2 * O // D
        binned, src = sharding.bin_observations_by_point(
            prob.obs, M, D, O_per)
        blk = np.asarray(binned.mp) // (M // D)
        slot_dev = np.arange(D * O_per) // O_per
        m = np.asarray(binned.mask)
        np.testing.assert_array_equal(blk[m], slot_dev[m])
        assert m.sum() == int(np.asarray(prob.obs.mask).sum())


class TestBatchedTracking:
    def test_pose_refine_batch(self, mesh):
        rng = np.random.RandomState(2)
        B, N = 8, 128
        pts = jnp.asarray(np.stack([
            np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(4, 8, N)], 1) for _ in range(B)]).astype(np.float32))
        xi = jnp.asarray(rng.randn(B, 6).astype(np.float32) * 0.05)
        T_true = lie.se3_exp(xi)
        pc = lie.se3_apply(jax.tree.map(lambda a: a[:, None], T_true), pts)
        uv = jnp.stack([CAM.fx * pc[..., 0] / pc[..., 2] + CAM.cx,
                        CAM.fy * pc[..., 1] / pc[..., 2] + CAM.cy], -1)
        mask = jnp.ones((B, N), bool)
        T0 = lie.se3_exp(xi + jnp.asarray(rng.randn(B, 6).astype(np.float32) * 0.02))

        T, n = sharding.batched_pose_refine(mesh, T0, pts, uv, mask, CAM)
        err = lie.se3_log(lie.se3_compose(lie.se3_inverse(T), T_true))
        assert float(jnp.abs(err).max()) < 1e-3


@pytest.mark.slow
class TestShardedPipeline:
    """VERDICT #10: the sharded Schur BA must run INSIDE the pipeline
    (LocalMapping._local_ba routes through sharding.sharded_local_ba when
    cfg.sharded_ba is forced on), and the system trajectory must match
    the single-device run."""

    def _run(self, sharded):
        import dataclasses
        import synthetic
        from ygz_tpu.eval import ate
        from ygz_tpu.pipeline.system import System, RGBD
        from test_e2e_stereo_rgbd import stereo_config
        cfg = dataclasses.replace(stereo_config(), sharded_ba=sharded)
        tex = synthetic.make_texture(4)
        traj = synthetic.orbit_trajectory(20)
        s = System(cfg, sensor=RGBD, use_loop_closing=False)
        for ts, T_cw in traj:
            img, depth = synthetic.render_with_depth(tex, T_cw, seed=4)
            s.track_rgbd(img, depth, ts)
        from ygz_tpu.core import lie as lie_mod
        gt = [(ts, np.asarray(lie_mod.se3_matrix(lie_mod.se3_inverse(T))))
              for ts, T in traj]
        res = ate.ate_rmse(s.get_trajectory(), gt, with_scale=False,
                           max_dt=0.05)
        assert s.mapper._ba_mesh_checked
        assert (s.mapper._ba_mesh is not None) == sharded
        return res["rmse"]

    def test_system_ate_matches_single_device(self):
        r_sharded = self._run(sharded=True)
        r_single = self._run(sharded=False)
        # both must track the world well; the sharded Schur BA is the
        # same math so the difference is iteration-order noise
        assert r_sharded < 0.06, r_sharded
        assert abs(r_sharded - r_single) < 0.03, (r_sharded, r_single)
