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


# ---------------------------------------------------------------------------
# block-gather patch sampling — the TPU fast path
# ---------------------------------------------------------------------------
# Element-wise gathers on TPU have a large fixed cost (~1.5 ms for 64k
# scalars, profiled); lax.gather with 2D slice_sizes moves whole patches
# per start index and is an order of magnitude faster. Every fixed-grid
# patch sampler on the per-frame hot path goes through gather_blocks.

import jax


def gather_blocks(img, v0, u0, h: int, w: int):
    """Gather [N, h, w] blocks with top-left integer corners (v0, u0).
    Out-of-range starts are clamped (XLA gather 'clip' semantics)."""
    idx = jnp.stack([v0, u0], axis=-1)  # [N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return jax.lax.gather(img, idx, dnums, slice_sizes=(h, w),
                          mode=jax.lax.GatherScatterMode.CLIP)


def sample_patch_grid(img, uv, half: int, with_grad: bool = False):
    """Bilinear samples on the integer offset grid [-half, half) around
    continuous centers uv [N, 2]: one block gather of (side+1)^2 per
    point + fused corner blending. Returns:
      values [N, side*side]  (+ gu, gv of the same shape if with_grad)
      valid  [N] (center's whole patch inside the image)
    """
    H, W = img.shape
    side = 2 * half
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None, None]
    fv = (v - v0)[:, None, None]
    u0i = u0.astype(jnp.int32) - half
    v0i = v0.astype(jnp.int32) - half
    valid = ((u0i >= 0) & (v0i >= 0)
             & (u0i + side + 1 <= W) & (v0i + side + 1 <= H))
    # clamp so the gather window stays inside (values masked by `valid`)
    u0c = jnp.clip(u0i, 0, W - side - 1)
    v0c = jnp.clip(v0i, 0, H - side - 1)

    B = gather_blocks(img, v0c, u0c, side + 1, side + 1)  # [N, s+1, s+1]
    b00 = B[:, :side, :side]
    b01 = B[:, :side, 1:]
    b10 = B[:, 1:, :side]
    b11 = B[:, 1:, 1:]
    val = (b00 * (1 - fu) + b01 * fu) * (1 - fv) \
        + (b10 * (1 - fu) + b11 * fu) * fv
    if not with_grad:
        return val.reshape(val.shape[0], -1), valid
    gu = (b01 - b00) * (1 - fv) + (b11 - b10) * fv
    gv = (b10 - b00) * (1 - fu) + (b11 - b01) * fu
    N = val.shape[0]
    return (val.reshape(N, -1), gu.reshape(N, -1), gv.reshape(N, -1), valid)


# ---------------------------------------------------------------------------
# gather-once iterative sampling
# ---------------------------------------------------------------------------
# Every gather on this TPU costs ~0.6 ms FIXED (profiled), so iterative
# aligners must not gather per GN iteration. Instead: gather ONE enlarged
# block per point at the initial position, then resample shifted patch
# windows from the in-register block with separable bilinear "tent"
# weights — pure VPU multiply-adds, zero further memory traffic.

def gather_anchored_blocks(img, uv_anchor, half: int, margin: int):
    """Gather [N, S, S] blocks (S = 2*half + 2*margin + 1) whose patch
    grid [-half, half) stays resolvable for shifts within +-margin px of
    uv_anchor. Returns (blocks, anchor_corner [N,2] float, valid [N])."""
    H, W = img.shape
    S = 2 * half + 2 * margin + 1
    u0 = jnp.floor(uv_anchor[..., 0]).astype(jnp.int32) - half - margin
    v0 = jnp.floor(uv_anchor[..., 1]).astype(jnp.int32) - half - margin
    valid = (u0 >= 0) & (v0 >= 0) & (u0 + S <= W) & (v0 + S <= H)
    u0c = jnp.clip(u0, 0, W - S)
    v0c = jnp.clip(v0, 0, H - S)
    blocks = gather_blocks(img, v0c, u0c, S, S)
    corner = jnp.stack([u0c, v0c], -1).astype(img.dtype)
    return blocks, corner, valid


def _tent(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _dtent(x):
    """d(sample)/d(shift) weights: the bilinear cell's forward difference,
    -1 on the lower tap (x in (-1, 0]) and +1 on the upper (x in (0, 1]],
    reproducing gu = B[j0+1] - B[j0] exactly (integer shifts included)."""
    return jnp.where((x > -1.0) & (x <= 0.0), -1.0,
                     jnp.where((x > 0.0) & (x <= 1.0), 1.0, 0.0))


def sample_blocks_shifted(blocks, local_uv, half: int, margin: int,
                          with_grad: bool = False):
    """Bilinear-resample the patch grid [-half, half) at continuous local
    coords `local_uv` (relative to the block CENTER pixel) from gathered
    blocks [N, S, S]. local_uv must satisfy |local_uv| <= margin for a
    fully valid window (caller masks). Separable tent-weight contraction:
    O(P * (2*margin+2)) VPU flops per point, no gathers.
    Returns values [N, P] (+ gu, gv) and valid [N]."""
    N, S, _ = blocks.shape
    side = 2 * half
    m2 = 2 * margin + 2  # tap count covering shift in [-margin, margin+1)
    k = jnp.arange(m2, dtype=blocks.dtype)

    su = local_uv[..., 0]
    sv = local_uv[..., 1]
    valid = (jnp.abs(su) <= margin) & (jnp.abs(sv) <= margin)
    su = jnp.clip(su, -margin, margin)
    sv = jnp.clip(sv, -margin, margin)

    # Banded weight matrices turn the separable window-shift into two
    # batched matmuls per output (MXU) instead of m2 slice ops (VPU):
    # Wv[n, s, i] = tent(s - i - (sv_n + margin)),  V = blocks^T Wv
    srange = jnp.arange(S, dtype=blocks.dtype)
    irange = jnp.arange(side, dtype=blocks.dtype)
    xv = srange[None, :, None] - irange[None, None, :] \
        - (sv[:, None, None] + margin)                 # [N, S, side]
    xu = srange[None, :, None] - irange[None, None, :] \
        - (su[:, None, None] + margin)

    Wv = _tent(xv)
    Wu = _tent(xu)
    # V1[n, i, c] = sum_s blocks[n, s, c] * Wv[n, s, i]
    V1 = jnp.einsum("nsc,nsi->nic", blocks, Wv,
                    preferred_element_type=blocks.dtype)
    val = jnp.einsum("nic,ncj->nij", V1, Wu,
                     preferred_element_type=blocks.dtype).reshape(N, -1)
    if not with_grad:
        return val, valid
    dWu = _dtent(xu)
    dWv = _dtent(xv)
    gu = jnp.einsum("nic,ncj->nij", V1, dWu,
                    preferred_element_type=blocks.dtype).reshape(N, -1)
    V2 = jnp.einsum("nsc,nsi->nic", blocks, dWv,
                    preferred_element_type=blocks.dtype)
    gv = jnp.einsum("nic,ncj->nij", V2, Wu,
                    preferred_element_type=blocks.dtype).reshape(N, -1)
    return val, gu, gv, valid
