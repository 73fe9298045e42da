"""Micro-profiler for the per-frame hot path: the fused tracking step at
system-bench capacities, and the feature-extraction pipeline's interior.
Times are amortized over pipelined iterations (the device executes queued
programs serially, so total/n is true device throughput cost)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "assets", "bench_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import dataclasses
    import functools

    from ygz_tpu.core import lie
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.ops import align, fast, orb, pyramid
    from ygz_tpu.pipeline import fused_track, map_ops, mapstate
    from ygz_tpu.utils.config import SlamConfig

    cam = Camera(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                 width=752, height=480)
    cfg = SlamConfig(
        camera=cam, fps=20.0,
        n_features=1000, n_levels=4, scale_factor=2.0,
        ini_th_fast=12.0, min_th_fast=5.0,
        cache_features=150, init_min_matches=100,
        max_keyframes=64, max_map_points=8192,
        detect_cell=32, detect_per_cell=5)
    K, M, N = cfg.max_keyframes, cfg.max_map_points, cfg.n_features
    C = 512

    rng = np.random.RandomState(0)

    def _force(out):
        # axon's block_until_ready returns before device execution
        # completes; a real value readback of the LAST output is the only
        # true queue barrier (the core executes queued programs serially)
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf.reshape(-1)[:1] if hasattr(leaf, 'reshape')
                       else leaf)
        return out

    def timeit(name, fn, n=30):
        out = _force(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _force(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:<34} {dt:8.2f} ms", flush=True)
        return out

    img = jnp.asarray((rng.rand(480, 752) * 255).astype(np.float32))
    pyr_j = jax.jit(functools.partial(pyramid.build_pyramid,
                                      n_levels=4, scale_factor=2.0))
    pyr = jax.block_until_ready(pyr_j(img))
    pyr2 = jax.block_until_ready(
        pyr_j(jnp.asarray((rng.rand(480, 752) * 255).astype(np.float32))))

    print(f"backend={jax.default_backend()}")
    timeit("build_pyramid", lambda: pyr_j(img))

    # --- extraction interior (all jitted with the image as an ARG) -----
    fcm = jax.jit(lambda im: fast.fast_corner_mask(im, 12.0))
    timeit("fast_corner_mask L0", lambda: fcm(pyr[0]))
    sts = jax.jit(fast.shi_tomasi_score)
    timeit("shi_tomasi L0", lambda: sts(pyr[0]))
    nm = jax.jit(lambda s: fast.nonmax_3x3(s))
    score0 = jax.block_until_ready(sts(pyr[0]))
    timeit("nonmax_3x3 L0", lambda: nm(score0))
    sgt = jax.jit(lambda s, v: fast.select_grid_topk(s, v, 32, 5))
    v0 = jax.block_until_ready(fcm(pyr[0]))
    timeit("select_grid_topk L0", lambda: sgt(score0, v0))
    dl = jax.jit(lambda im: fast.detect_level(im, 12.0, 32, 5,
                                              low_threshold=5.0))
    timeit("detect_level L0", lambda: dl(pyr[0]))
    dp = jax.jit(lambda p: fast.detect_pyramid(
        p, cfg.scale_factors, 12.0, 5.0, N, cell=32, per_cell=5))
    kps = timeit("detect_pyramid (4L)", lambda: dp(pyr))

    gb = jax.jit(pyramid.gaussian_blur)
    timeit("gaussian_blur L0", lambda: gb(pyr[0]))
    blurred = tuple(jax.block_until_ready(gb(p)) for p in pyr)
    dk = jax.jit(lambda b, k: orb.describe_keypoints(b, k, cfg.scale_factors))
    timeit("describe_keypoints (4L)", lambda: dk(blurred, kps))

    from ygz_tpu.ops import orb as orb_mod
    from ygz_tpu.pipeline.frame import _extract_jit
    sel_mat = orb_mod._pattern_selector()
    timeit("_extract_jit full", lambda: _extract_jit(pyr, sel_mat, cfg))
    blurred2 = tuple(jax.block_until_ready(gb(p)) for p in pyr)
    at, xo = pyramid.atlas_from_pyramid(blurred2)
    at = jax.block_until_ready(at)
    dka = jax.jit(lambda a, k: orb_mod.describe_keypoints_atlas(
        a, xo, k.uv, k.level, k.mask, tuple(float(s) for s in cfg.scale_factors),
        selector=sel_mat))
    timeit("describe_keypoints_atlas", lambda: dka(at, kps))

    # --- fused tracking step at system capacities ------------------------
    ms = mapstate.make_empty(K, M, N, 100)
    n_mp = 6000
    pos = np.stack([rng.uniform(-4, 4, n_mp), rng.uniform(-3, 3, n_mp),
                    rng.uniform(4, 9, n_mp)], -1).astype(np.float32)
    ms = dataclasses.replace(
        ms,
        mp_pos=ms.mp_pos.at[:n_mp].set(jnp.asarray(pos)),
        mp_mask=ms.mp_mask.at[:n_mp].set(True),
        mp_normal=ms.mp_normal.at[:n_mp].set(
            jnp.asarray(np.tile([0, 0, -1.0], (n_mp, 1)))),
        mp_min_dist=ms.mp_min_dist.at[:n_mp].set(0.5),
        mp_max_dist=ms.mp_max_dist.at[:n_mp].set(50.0),
        mp_patch=ms.mp_patch.at[:n_mp].set(jnp.asarray(
            rng.rand(n_mp, ms.mp_patch.shape[1]).astype(np.float32) * 255)),
        kf_mask=ms.kf_mask.at[0].set(True))
    ms = jax.block_until_ready(ms)

    uv_c = (rng.rand(C, 2) * np.array([700, 440]) + 20).astype(np.float32)
    last_uv = jnp.zeros((N, 2)).at[:C].set(jnp.asarray(uv_c))
    last_mp = jnp.full((N,), -1, jnp.int32).at[:C].set(
        jnp.arange(C, dtype=jnp.int32))
    last_mask = jnp.zeros((N,), bool).at[:C].set(True)
    T_last = lie.se3_identity()
    vel = lie.se3_identity()
    cand = jnp.arange(C, dtype=jnp.int32)
    cand_valid = jnp.ones((C,), bool)

    timeit("fused_direct_step", lambda: fused_track.fused_direct_step(
        ms, pyr, last_uv, last_mp, last_mask, T_last, vel, pyr2,
        cand, cand_valid, 0, cfg).bundle)

    # interior of the fused step
    scales = tuple(float(s) for s in cfg.scale_factors)
    pts_last = jnp.asarray(
        np.stack([(uv_c[:, 0] - cam.cx) / cam.fx,
                  (uv_c[:, 1] - cam.cy) / cam.fy,
                  np.ones(C)], -1) * rng.uniform(4, 9, (C, 1))
    ).astype(jnp.float32)
    sa_mask_n = jnp.zeros((N,), bool).at[:C].set(True)
    pts_n = jnp.zeros((N, 3)).at[:C].set(pts_last)
    sa = jax.jit(lambda p1, p2: align.sparse_image_align(
        vel, p1, p2, last_uv, pts_n, sa_mask_n, cam, scales, 3))
    timeit("  sparse_image_align N=1000", lambda: sa(pyr, pyr2))
    sa256_uv = last_uv[:256]
    sa256 = jax.jit(lambda p1, p2: align.sparse_image_align(
        vel, p1, p2, sa256_uv, pts_n[:256], sa_mask_n[:256], cam, scales, 3))
    timeit("  sparse_image_align N=256", lambda: sa256(pyr, pyr2))
    slp = jax.jit(lambda m, p: map_ops.search_local_points_direct(
        m, cand, T_last, p, cam, cfg.n_levels, cfg.scale_factor))
    timeit("  search_local_points C=512", lambda: slp(ms, pyr2)[0])

    from ygz_tpu.ops import pallas_pose
    uv_m = jnp.asarray(uv_c)
    inv_s2 = jnp.ones((C,))
    po = jax.jit(lambda: pallas_pose.pose_optimization_fused(
        T_last, ms.mp_pos[cand], uv_m, inv_s2, cand_valid,
        cam.fx, cam.fy, cam.cx, cam.cy))
    timeit("  pallas pose_opt C=512", po)

    patches8 = jnp.asarray(
        rng.rand(C, (2 * align.ALIGN_HALF_PATCH) ** 2).astype(np.float32))
    a2 = jax.jit(lambda p: align.align2d(p, patches8, uv_m, cand_valid))
    timeit("  align2d C=512 x1 level", lambda: a2(pyr2[0]))


if __name__ == "__main__":
    main()
