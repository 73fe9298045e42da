"""Native C++ loader tests: decode correctness vs PIL, prefetch ordering."""

import os

import numpy as np
import pytest
from PIL import Image

from ygz_tpu import native


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        a = rng.randint(0, 255, (48, 64), dtype=np.uint8)
        p = str(d / f"{i:03d}.png")
        Image.fromarray(a, "L").save(p)
        paths.append((p, a))
    return paths


class TestNativeLoader:
    def test_lib_builds(self):
        assert native.get_lib() is not None

    def test_decode_matches_pil(self, png_dir):
        p, a = png_dir[0]
        img = native.decode_image(p)
        assert img.shape == a.shape
        np.testing.assert_allclose(img, a.astype(np.float32), atol=0.5)

    def test_prefetcher_order_and_content(self, png_dir):
        paths = [p for p, _ in png_dir]
        refs = [a for _, a in png_dir]
        pf = native.NativePrefetcher(paths, n_workers=3, queue_cap=4)
        out = list(pf)
        assert len(out) == len(paths)
        for got, want in zip(out, refs):
            np.testing.assert_allclose(got, want.astype(np.float32), atol=0.5)

    def test_rgb_png_grayscale(self, tmp_path):
        rng = np.random.RandomState(1)
        rgb = rng.randint(0, 255, (32, 40, 3), dtype=np.uint8)
        p = str(tmp_path / "rgb.png")
        Image.fromarray(rgb, "RGB").save(p)
        img = native.decode_image(p)
        want = np.asarray(Image.open(p).convert("L")).astype(np.float32)
        assert img.shape == want.shape
        # L conversions differ slightly in weights; just demand correlation
        c = np.corrcoef(img.reshape(-1), want.reshape(-1))[0, 1]
        assert c > 0.95

    def test_pgm(self, tmp_path):
        rng = np.random.RandomState(2)
        a = rng.randint(0, 255, (24, 30), dtype=np.uint8)
        p = str(tmp_path / "x.pgm")
        with open(p, "wb") as f:
            f.write(b"P5\n30 24\n255\n")
            f.write(a.tobytes())
        img = native.decode_image(p)
        np.testing.assert_array_equal(img, a.astype(np.float32))
