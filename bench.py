"""Benchmark: steady-state per-frame tracking latency of the hybrid
tracker's device hot path on EuRoC-sized frames (752x480, 4-level
pyramid), on whatever accelerator jax.devices() provides.

The measured program is the per-frame compute the reference spends its
~20 ms/frame on (Note.md 2017.3.9): pyramid build + coarse-to-fine
sparse direct alignment (256 patches x 3 levels x 10 GN iterations) +
direct local-map patch alignment (512 candidate points x batched 8x8 KLT)
+ pose-only bundle adjustment (4x10 schedule). Host orchestration between
these calls is microseconds; this is the honest per-frame device cost.

Prints ONE JSON line: tracking FPS, vs_baseline = FPS / 50 (the
reference's ~20 ms/frame on CPU; >= 3 means the BASELINE.json 3x target
is met).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ygz_tpu.backend import ba
    from ygz_tpu.core import lie
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.ops import align, pyramid

    cam = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0,
                 width=752, height=480)
    n_levels, scale = 4, 2.0
    scales = tuple(float(s) for s in pyramid.scale_factors(n_levels, scale))
    N_ALIGN = 256      # sparse-align patches (reference tracks ~200-300)
    N_CACHE = 512      # direct local-map candidates (cache size)

    rng = np.random.RandomState(0)
    img_ref = jnp.asarray(rng.rand(480, 752).astype(np.float32) * 255.0)
    img_cur = jnp.asarray(rng.rand(480, 752).astype(np.float32) * 255.0)

    uv = jnp.asarray((rng.rand(N_ALIGN, 2) * np.array([700, 440]) + 20)
                     .astype(np.float32))
    depth = jnp.asarray(rng.uniform(2.0, 8.0, N_ALIGN).astype(np.float32))
    pts_ref = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx * depth,
                         (uv[:, 1] - cam.cy) / cam.fy * depth, depth], -1)
    mask = jnp.ones((N_ALIGN,), bool)

    uv_c = jnp.asarray((rng.rand(N_CACHE, 2) * np.array([700, 440]) + 20)
                       .astype(np.float32))
    ref_patches = jnp.asarray(
        rng.rand(N_CACHE, (2 * align.ALIGN_HALF_PATCH) ** 2)
        .astype(np.float32) * 255.0)
    mask_c = jnp.ones((N_CACHE,), bool)
    depth_c = jnp.asarray(rng.uniform(2.0, 8.0, N_CACHE).astype(np.float32))
    pts_c = jnp.stack([(uv_c[:, 0] - cam.cx) / cam.fx * depth_c,
                       (uv_c[:, 1] - cam.cy) / cam.fy * depth_c, depth_c], -1)
    inv_s2 = jnp.ones((N_CACHE,))
    ur = jnp.full((N_CACHE,), -1.0)

    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def frame_step(raw_cur, pyr_ref, T_init):
        pyr_cur = pyramid.build_pyramid(raw_cur, n_levels, scale)
        T, _ = align.sparse_image_align(
            T_init, pyr_ref, pyr_cur, uv, pts_ref, mask, cam, scales,
            max_level=n_levels - 1)
        uv_ref, conv = align.align2d(pyr_cur[0], ref_patches, uv_c, mask_c)
        if on_tpu:
            from ygz_tpu.ops import pallas_pose
            T2, inlier, n_in = pallas_pose.pose_optimization_fused(
                T, pts_c, uv_ref, inv_s2, conv,
                cam.fx, cam.fy, cam.cx, cam.cy)
        else:
            T2, inlier, n_in = ba.pose_optimization(
                T, pts_c, uv_ref, ur, inv_s2, conv,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
        return pyr_cur, T2["q"], T2["t"], n_in

    pyr_ref = pyramid.build_pyramid(img_ref, n_levels, scale)
    T0 = lie.se3_identity()

    # warmup / compile
    out = frame_step(img_cur, pyr_ref, T0)
    jax.block_until_ready(out)

    n_iter = 200
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = frame_step(img_cur, pyr_ref, T0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "tracking_fps_euroc_frame",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
