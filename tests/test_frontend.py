"""Golden tests for the image frontend: FAST ring test, Shi-Tomasi score,
pyramid, descriptors, and Hamming distances — all vs tiny numpy
reimplementations (SURVEY.md §4's prescription)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ygz_tpu.ops import fast, hamming, interp, orb, pyramid


def numpy_fast10(img, t):
    """Direct per-pixel FAST-10 reimplementation (slow, trusted)."""
    H, W = img.shape
    out = np.zeros((H, W), bool)
    offs = fast.RING_OFFSETS
    for y in range(3, H - 3):
        for x in range(3, W - 3):
            c = img[y, x]
            ring = np.array([img[y + dv, x + du] for dv, du in offs])
            for flags in (ring > c + t, ring < c - t):
                ext = np.concatenate([flags, flags])
                run = 0
                best = 0
                for f in ext:
                    run = run + 1 if f else 0
                    best = max(best, run)
                if best >= 10:
                    out[y, x] = True
    return out


@pytest.fixture(scope="module")
def test_img():
    rng = np.random.RandomState(7)
    img = rng.rand(48, 64).astype(np.float32) * 50.0
    # plant some strong corners
    img[10:20, 10:20] += 150.0
    img[30:38, 40:52] += 120.0
    return img


class TestFast:
    def test_corner_mask_matches_numpy(self, test_img):
        t = 20.0
        got = np.asarray(fast.fast_corner_mask(jnp.asarray(test_img), t))
        want = numpy_fast10(test_img, t)
        np.testing.assert_array_equal(got, want)

    def test_detect_level_finds_plants(self, test_img):
        uv, s, m = fast.detect_level(jnp.asarray(test_img), 20.0, cell=16,
                                     per_cell=4, border=4)
        uv, s, m = map(np.asarray, (uv, s, m))
        pts = uv[m]
        assert len(pts) >= 4
        # corners of the bright square at (10..20, 10..20) should appear
        d = np.linalg.norm(pts - np.array([10, 10]), axis=1).min()
        assert d <= 2.0

    def test_shi_tomasi_positive_at_corner(self, test_img):
        s = np.asarray(fast.shi_tomasi_score(jnp.asarray(test_img)))
        assert s[10, 10] > s[5, 5]
        assert s[10, 10] > 1.0

    def test_occupancy_mask_blocks_cells(self, test_img):
        """DSO-style occupancy (reference ORBextractor.cc:1275-1386): a
        cell holding an existing point yields no detections, and the
        budget it frees goes elsewhere."""
        img = jnp.asarray(test_img)
        # occupy the cell containing the bright square corner (10, 10)
        occ_uv = jnp.asarray([[12.0, 12.0]])
        occ_lvl = jnp.zeros((1,), jnp.int32)
        occ_m = jnp.ones((1,), bool)
        blocked = fast.occupied_cell_mask(occ_uv, occ_lvl, occ_m, 0,
                                          48, 64, 16, 1.0)
        assert bool(blocked[0])           # cell (0,0) of the 16px grid
        assert int(jnp.sum(blocked)) == 1
        uv, s, m = fast.detect_level(img, 20.0, cell=16, per_cell=4,
                                     border=4, low_threshold=None,
                                     blocked=blocked)
        pts = np.asarray(uv)[np.asarray(m)]
        in_blocked = (pts[:, 0] < 16) & (pts[:, 1] < 16)
        assert not in_blocked.any()
        # unoccupied detection still finds the other planted square
        d = np.linalg.norm(pts - np.array([40, 30]), axis=1).min()
        assert d <= 3.0

    def test_detect_pyramid_occupied_budget_moves(self, test_img):
        """With occupancy over one region, detect_pyramid keeps finding
        features but none at the occupied cells' level-0 footprint."""
        pyr = pyramid.build_pyramid(jnp.asarray(test_img), 2, 2.0)
        scales = np.array([1.0, 2.0], np.float32)
        occ_uv = jnp.asarray([[12.0, 12.0]])
        occ_lvl = jnp.zeros((1,), jnp.int32)
        occ_m = jnp.ones((1,), bool)
        kps = fast.detect_pyramid(pyr, scales, 20.0, 10.0, 64, cell=16,
                                  per_cell=4, border=4,
                                  occupied=(occ_uv, occ_lvl, occ_m))
        pts = np.asarray(kps.uv)[np.asarray(kps.mask)
                                 & (np.asarray(kps.level) == 0)]
        if len(pts):
            in_blocked = (pts[:, 0] < 16) & (pts[:, 1] < 16)
            assert not in_blocked.any()
        # still detects elsewhere
        assert int(np.asarray(kps.mask).sum()) >= 4

    def test_grid_topk_uniformity(self):
        score = jnp.asarray(np.random.RandomState(0).rand(64, 64).astype(np.float32))
        uv, s, m = fast.select_grid_topk(score, jnp.ones((64, 64), bool),
                                         cell=16, per_cell=2, border=0)
        uv = np.asarray(uv)[np.asarray(m)]
        # every 16x16 cell contributes at most 2 points
        cells = (uv // 16).astype(int)
        _, counts = np.unique(cells[:, 0] * 10 + cells[:, 1], return_counts=True)
        assert counts.max() <= 2


class TestPyramid:
    def test_levels_shapes(self):
        img = jnp.zeros((480, 752))
        pyr = pyramid.build_pyramid(img, 4, 2.0)
        assert pyr[0].shape == (480, 752)
        assert pyr[1].shape == (240, 376)
        assert pyr[3].shape == (60, 94)

    def test_blur_preserves_mean(self):
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(64, 64).astype(np.float32))
        out = pyramid.gaussian_blur(img)
        assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 1e-2

    def test_blur_matches_numpy_interior(self):
        rng = np.random.RandomState(4)
        img = rng.rand(32, 32).astype(np.float32)
        k = fast.np.convolve  # noqa - just use scipy-free separable conv
        from scipy.ndimage import gaussian_filter
        want = gaussian_filter(img, sigma=2.0, truncate=1.5, mode="reflect")
        got = np.asarray(pyramid.gaussian_blur(jnp.asarray(img), 7, 2.0))
        np.testing.assert_allclose(got[8:-8, 8:-8], want[8:-8, 8:-8], atol=0.02)


class TestInterp:
    def test_bilinear_exact_on_grid(self):
        img = jnp.asarray(np.arange(48, dtype=np.float32).reshape(6, 8))
        uv = jnp.array([[2.0, 3.0], [5.0, 1.0]])
        out = np.asarray(interp.bilinear_sample(img, uv))
        np.testing.assert_allclose(out, [3 * 8 + 2, 1 * 8 + 5])

    def test_bilinear_midpoint(self):
        img = jnp.asarray(np.array([[0.0, 2.0], [4.0, 6.0]], np.float32))
        out = float(interp.bilinear_sample(img, jnp.array([0.5, 0.5])))
        assert abs(out - 3.0) < 1e-6

    def test_gradient(self):
        # linear ramp image: gradient should be constant
        y, x = np.mgrid[0:16, 0:16].astype(np.float32)
        img = jnp.asarray(3.0 * x + 2.0 * y)
        uv = jnp.array([[5.3, 7.8], [2.2, 9.1]])
        val, gu, gv, valid = interp.bilinear_sample_with_grad(img, uv)
        np.testing.assert_allclose(np.asarray(gu), 3.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), 2.0, atol=1e-4)
        assert np.all(np.asarray(valid))


class TestOrb:
    def test_orientation_gradient_direction(self):
        # image brighter to the right -> centroid along +x -> angle ~ 0
        y, x = np.mgrid[0:64, 0:64].astype(np.float32)
        img = jnp.asarray(x)
        uv = jnp.array([[32.0, 32.0]])
        ang = float(orb.compute_orientations(img, uv, jnp.array([True]))[0])
        assert abs(ang) < 0.05
        # brighter downward -> angle ~ pi/2
        ang2 = float(orb.compute_orientations(jnp.asarray(y), uv, jnp.array([True]))[0])
        assert abs(ang2 - np.pi / 2) < 0.05

    def test_descriptor_rotation_invariance(self):
        # a descriptor computed on an image and on its 90deg rotation should
        # match when the keypoint angle tracks the rotation
        rng = np.random.RandomState(0)
        img = rng.rand(64, 64).astype(np.float32) * 255
        from scipy.ndimage import gaussian_filter, rotate
        imgb = gaussian_filter(img, 2.0)
        rot = rotate(imgb, -90, reshape=False, order=1)  # -90: x->y
        uv = jnp.array([[32.0, 32.0]])
        m = jnp.array([True])
        a0 = orb.compute_orientations(jnp.asarray(imgb), uv, m)
        d0 = orb.compute_descriptors(jnp.asarray(imgb), uv, a0, m)
        a1 = orb.compute_orientations(jnp.asarray(rot), uv, m)
        d1 = orb.compute_descriptors(jnp.asarray(rot), uv, a1, m)
        dist = int(hamming.hamming(d0[0], d1[0]))
        assert dist < 60  # same point, ~rotation-invariant (random pairs: ~128)

    def test_descriptor_distinct_points(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(96, 96).astype(np.float32) * 255)
        uv = jnp.array([[30.0, 30.0], [70.0, 60.0]])
        m = jnp.array([True, True])
        ang = orb.compute_orientations(img, uv, m)
        d = orb.compute_descriptors(img, uv, ang, m)
        assert int(hamming.hamming(d[0], d[1])) > 60


class TestHamming:
    def test_matrix_vs_numpy(self):
        rng = np.random.RandomState(2)
        a = rng.randint(0, 2**32, (5, 8), dtype=np.uint32)
        b = rng.randint(0, 2**32, (7, 8), dtype=np.uint32)
        got = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        want = np.zeros((5, 7), np.int32)
        for i in range(5):
            for j in range(7):
                want[i, j] = bin(int.from_bytes(a[i].tobytes(), "little")
                                 ^ int.from_bytes(b[j].tobytes(), "little")).count("1")
        np.testing.assert_array_equal(got, want)

    def test_best_two(self):
        d = jnp.array([[5, 2, 9, 3]])
        m = jnp.array([[True, True, True, True]])
        idx, d1, d2 = hamming.best_two(d, m)
        assert int(idx[0]) == 1 and int(d1[0]) == 2 and int(d2[0]) == 3
