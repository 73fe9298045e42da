"""Synthetic-scene tests for the direct alignment kernels: render a textured
plane from two poses, verify the aligners recover the motion."""

import jax
import jax.numpy as jnp
import numpy as np

from ygz_tpu.core import camera as cam_mod
from ygz_tpu.core import lie
from ygz_tpu.ops import align, pyramid
from ygz_tpu.ops.interp import bilinear_sample


CAM = cam_mod.Camera(fx=120.0, fy=120.0, cx=64.0, cy=48.0, width=128, height=96)


def make_texture(seed=0, size=(192, 256)):
    rng = np.random.RandomState(seed)
    tex = rng.rand(*size).astype(np.float32) * 255.0
    from scipy.ndimage import gaussian_filter
    return gaussian_filter(tex, 2.0)  # smooth so gradients are informative


def render_plane(tex, T_cw, depth=2.0):
    """Render a fronto-parallel textured plane at z=depth (world) seen from
    pose T_cw (world->cam). Texture plane: world (x, y, depth) maps to
    texel (x*80+128, y*80+96)."""
    H, W = CAM.height, CAM.width
    us, vs = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    # camera ray for each pixel
    xn = (us - CAM.cx) / CAM.fx
    yn = (vs - CAM.cy) / CAM.fy
    rays = jnp.asarray(np.stack([xn, yn, np.ones_like(xn)], -1).reshape(-1, 3))
    T_wc = lie.se3_inverse(T_cw)
    origin = T_wc["t"]
    dirs = lie.quat_rotate(T_wc["q"], rays)
    # intersect z=depth plane
    tt = (depth - origin[2]) / dirs[:, 2]
    pw = origin[None, :] + tt[:, None] * dirs
    texel = jnp.stack([pw[:, 0] * 80.0 + 128.0, pw[:, 1] * 80.0 + 96.0], -1)
    img = bilinear_sample(jnp.asarray(tex), texel).reshape(H, W)
    return img, pw.reshape(H, W, 3)


class TestSparseAlign:
    def test_recovers_small_motion(self):
        tex = make_texture()
        T_ref = lie.se3_identity()
        xi_true = jnp.array([0.02, -0.015, 0.01, 0.004, -0.006, 0.003])
        T_cur = lie.se3_exp(xi_true)  # cur <- world(=ref)

        img_ref, pw = render_plane(tex, T_ref)
        img_cur, _ = render_plane(tex, T_cur)

        # pick a grid of feature pixels with their true 3D points (ref frame)
        ys, xs = np.mgrid[12:84:8, 12:120:8]
        uv_ref = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32))
        pts_ref = pw[ys.reshape(-1), xs.reshape(-1)]  # == ref cam frame (T_ref = I)
        mask = jnp.ones((uv_ref.shape[0],), bool)

        pyr_ref = pyramid.build_pyramid(img_ref, 3, 2.0)
        pyr_cur = pyramid.build_pyramid(img_cur, 3, 2.0)
        scales = pyramid.scale_factors(3, 2.0)

        T_est, n = align.sparse_image_align(
            lie.se3_identity(), pyr_ref, pyr_cur, uv_ref, pts_ref, mask,
            CAM, scales, max_level=2, min_level=0)

        err = lie.se3_log(lie.se3_compose(lie.se3_inverse(T_est), T_cur))
        assert float(jnp.linalg.norm(err)) < 5e-3, np.asarray(err)

    def test_fisher_information(self):
        """Fisher information (SparseImageAlign.cc:51-55 parity): SPD at
        a well-textured convergence point, and more points => more
        information (trace grows)."""
        tex = make_texture()
        T_ref = lie.se3_identity()
        img_ref, pw = render_plane(tex, T_ref)
        ys, xs = np.mgrid[12:84:8, 12:120:8]
        uv_ref = jnp.asarray(np.stack([xs, ys], -1)
                             .reshape(-1, 2).astype(np.float32))
        pts_ref = pw[ys.reshape(-1), xs.reshape(-1)]
        mask = np.ones((uv_ref.shape[0],), bool)

        prob = align.SparseAlignProblem(
            ref_patches=align.extract_ref_patches(img_ref, uv_ref),
            points_ref=pts_ref, mask=jnp.asarray(mask))
        H = np.asarray(align.fisher_information(
            T_ref, img_ref, prob, CAM.fx, CAM.fy, CAM.cx, CAM.cy))
        assert H.shape == (6, 6)
        np.testing.assert_allclose(H, H.T, rtol=1e-4)
        ev = np.linalg.eigvalsh(H)
        assert ev.min() > 0, ev

        half_mask = mask.copy()
        half_mask[::2] = False
        prob2 = prob._replace(mask=jnp.asarray(half_mask))
        H2 = np.asarray(align.fisher_information(
            T_ref, img_ref, prob2, CAM.fx, CAM.fy, CAM.cx, CAM.cy))
        assert np.trace(H2) < np.trace(H)

    def test_jit_compiles_once(self):
        tex = make_texture(1)
        img_ref, pw = render_plane(tex, lie.se3_identity())
        pyr = pyramid.build_pyramid(img_ref, 3, 2.0)
        scales = pyramid.scale_factors(3, 2.0)
        uv_np = (np.random.RandomState(0).rand(32, 2) * np.array([100, 80])
                 + 10).astype(np.int32)
        uv = jnp.asarray(uv_np.astype(np.float32))
        pts = pw[uv_np[:, 1], uv_np[:, 0]]
        mask = jnp.ones((32,), bool)

        f = jax.jit(lambda T: align.sparse_image_align(
            T, pyr, pyr, uv, pts, mask, CAM, scales, 2, 0)[0])
        T0 = lie.se3_exp(jnp.array([0.01, 0, 0, 0, 0, 0]))
        out = f(T0)
        # aligning a frame to itself should pull the pose toward identity
        assert float(jnp.linalg.norm(lie.se3_log(out))) < 5e-3


class TestAlign2D:
    def test_recovers_translation(self):
        tex = make_texture(2)
        img = jnp.asarray(tex[:96, :128])
        # reference patches at known positions; query shifted by ~1.5px
        rng = np.random.RandomState(3)
        uv_true = jnp.asarray(rng.rand(64, 2).astype(np.float32)
                              * np.array([100, 70]) + 12)
        offs = align._patch_offsets(align.ALIGN_HALF_PATCH)
        ref_patches = bilinear_sample(img, uv_true[:, None, :] + offs[None])
        uv_init = uv_true + jnp.asarray(
            rng.uniform(-1.5, 1.5, (64, 2)).astype(np.float32))
        mask = jnp.ones((64,), bool)

        uv_ref, conv = align.align2d(img, ref_patches, uv_init, mask)
        err = np.linalg.norm(np.asarray(uv_ref - uv_true), axis=1)
        assert np.asarray(conv).mean() > 0.9
        assert err[np.asarray(conv)].max() < 0.05

    def test_mean_diff_robustness(self):
        # brightness offset between frames should not break convergence
        tex = make_texture(4)
        img = jnp.asarray(tex[:96, :128])
        uv_true = jnp.array([[40.0, 40.0], [70.0, 50.0]])
        offs = align._patch_offsets(align.ALIGN_HALF_PATCH)
        ref_patches = bilinear_sample(img, uv_true[:, None, :] + offs[None]) + 20.0
        uv_init = uv_true + jnp.array([[1.0, -1.0], [-0.8, 0.7]])
        uv_ref, conv = align.align2d(img, ref_patches, uv_init,
                                     jnp.ones((2,), bool))
        err = np.linalg.norm(np.asarray(uv_ref - uv_true), axis=1)
        assert err.max() < 0.05


class TestAffineWarp:
    def test_identity_warp(self):
        T = lie.se3_identity()
        uv = jnp.array([[50.0, 40.0]])
        A = align.affine_warp_matrix(uv, jnp.array([2.0]), T, CAM, CAM)
        np.testing.assert_allclose(np.asarray(A[0]), np.eye(2), atol=1e-3)

    def test_scale_level_selection(self):
        # a warp that doubles image area should pick a higher level
        A = jnp.array([[[2.0, 0.0], [0.0, 2.0]], [[1.0, 0.0], [0.0, 1.0]]])
        lvl = align.best_search_level(A, 4, 1.2)
        assert int(lvl[0]) > int(lvl[1])
