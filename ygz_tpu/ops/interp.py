"""Bilinear sampling and image gradients — the gather core shared by the
direct-alignment kernels, undistortion remap, and stereo matching.

The reference does per-pixel bilinear interpolation inline in C++ loops
(/root/reference/src/SparseImageAlign.cc:175-188, src/Align.cc:45-66,
src/Frame.cc:773-805 via cv::remap). Here it is one batched gather +
fused multiply-add over arbitrarily many sample points, which XLA maps
onto the VPU; points are the batch dimension so thousands of patches
sample in a single call.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img, uv, pad_value: float = 0.0):
    """Sample img [H, W] at continuous coords uv [..., 2] (u=x, v=y).

    Out-of-bounds samples return pad_value; callers carry masks anyway.
    """
    H, W = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    valid = (u0i >= 0) & (u0i < W - 1) & (v0i >= 0) & (v0i < H - 1)
    u0c = jnp.clip(u0i, 0, W - 2)
    v0c = jnp.clip(v0i, 0, H - 2)

    # four corners via flat gather (XLA lowers to one gather each)
    flat = img.reshape(-1)
    base = v0c * W + u0c
    i00 = flat[base]
    i01 = flat[base + 1]
    i10 = flat[base + W]
    i11 = flat[base + W + 1]

    top = i00 * (1.0 - fu) + i01 * fu
    bot = i10 * (1.0 - fu) + i11 * fu
    out = top * (1.0 - fv) + bot * fv
    return jnp.where(valid, out, pad_value)


def bilinear_sample_with_grad(img, uv):
    """Sample intensity and its image-space gradient (du, dv) in one pass.

    Uses the same four corner taps: d/du and d/dv of the bilinear surface,
    matching the reference's 0.5*(right-left) central differences closely
    enough for GN (the direct aligners only need gradient direction+scale).
    """
    H, W = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 2)
    valid = (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)

    flat = img.reshape(-1)
    base = v0i * W + u0i
    i00 = flat[base]
    i01 = flat[base + 1]
    i10 = flat[base + W]
    i11 = flat[base + W + 1]

    val = (i00 * (1 - fu) + i01 * fu) * (1 - fv) + (i10 * (1 - fu) + i11 * fu) * fv
    gu = (i01 - i00) * (1 - fv) + (i11 - i10) * fv
    gv = (i10 - i00) * (1 - fu) + (i11 - i01) * fu
    z = jnp.zeros_like(val)
    return (jnp.where(valid, val, z), jnp.where(valid, gu, z),
            jnp.where(valid, gv, z), valid)


def remap(img, grid):
    """Full-image warp: grid [H, W, 2] of source coords -> warped [H, W].

    Device equivalent of cv::remap used for image undistortion
    (/root/reference/src/Frame.cc:798-804)."""
    return bilinear_sample(img, grid)
