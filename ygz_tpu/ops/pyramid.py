"""Image pyramid construction: separable Gaussian blur + scale resize.

Replaces ORBextractor::ComputePyramid (/root/reference/src/ORBextractor.cc:
1129-1150, cv::resize INTER_LINEAR per level) and the 7x7 sigma=2 Gaussian
blur applied before describing (:1010,1083). Blur is two 1D convolutions
expressed as XLA conv_general_dilated so the compiler fuses and tiles them;
resize is jax.image bilinear, matching cv::resize for downscale factors
near the reference's 1.2/2.0.

Pyramids are returned as a tuple of [H_l, W_l] arrays (static shapes per
level — level count and scale are compile-time constants from config).
Images are float32 in [0, 255] throughout the framework (uint8 stays at
the dataset-loader boundary only).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(r * r) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding (matches cv::GaussianBlur
    BORDER_REFLECT_101 closely; boundary differences are inside the border
    region ORB ignores). img: [H, W] float32."""
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    x = img[None, None]  # NCHW
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kh = k.reshape(1, 1, ksize, 1)
    kw = k.reshape(1, 1, 1, ksize)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[0, 0]


def level_sizes(height: int, width: int, n_levels: int, scale_factor: float
                ) -> Tuple[Tuple[int, int], ...]:
    """Static per-level shapes, rounded like cv::resize(1/scale)."""
    out = []
    for lvl in range(n_levels):
        s = 1.0 / (scale_factor ** lvl)
        out.append((max(8, int(round(height * s))), max(8, int(round(width * s)))))
    return tuple(out)


def build_pyramid(img, n_levels: int, scale_factor: float):
    """img [H, W] float32 -> tuple of n_levels arrays, level 0 = full res.

    Each level is resized from the previous one (compounding, as the
    reference does) to keep the resample kernel small.
    """
    sizes = level_sizes(img.shape[0], img.shape[1], n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        prev = levels[-1]
        levels.append(jax.image.resize(prev, sizes[lvl], method="linear"))
    return tuple(levels)


def scale_factors(n_levels: int, scale_factor: float) -> np.ndarray:
    """Per-level scale (level l coordinates * factor[l] = level-0 coords)."""
    return np.array([scale_factor ** l for l in range(n_levels)], dtype=np.float32)


ATLAS_GUTTER = 24  # zero columns between levels (> align2d half+margin)


def atlas_from_pyramid(pyr):
    """Pack all pyramid levels side by side into ONE image so per-level
    batched ops (align2d, descriptor gathers) run as a single call instead
    of one masked call per level: a point at level l samples the atlas at
    (u_l + xoff[l], v_l). Levels are separated by ATLAS_GUTTER zero
    columns so an (half+margin)-radius patch can never read a neighboring
    level's pixels; vertical overruns land in the zero rows below each
    level (callers gate those with their own in-bounds masks / NCC).

    Returns (atlas [H0, sum(W_l + GUTTER)], xoffs tuple of static ints).
    """
    H0 = pyr[0].shape[0]
    cols, xoffs = [], []
    x = 0
    for img in pyr:
        h, w = img.shape
        col = jnp.zeros((H0, w + ATLAS_GUTTER), img.dtype)
        col = col.at[:h, :w].set(img)
        cols.append(col)
        xoffs.append(x)
        x += w + ATLAS_GUTTER
    return jnp.concatenate(cols, axis=1), tuple(xoffs)
