"""Micro-profiler for the per-keyframe mapping programs (P1-P4) and the
KF-creation device path, at the system-bench capacities (K=64, M=8192,
N=1000). Run on the chip:

    python tools/profile_mapping.py

Builds a realistically filled MapState (every KF bound to ~600 points,
points spread in front of the cameras) and times each jitted program with
block_until_ready, so the printed numbers are true device+dispatch costs
— the interior of the 201 ms/KF `track.create_kf` stall (VERDICT r4 #2).
"""

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

    from ygz_tpu.core import lie
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.ops import pyramid
    from ygz_tpu.pipeline import map_ops, mapping_kernels as mk, mapstate
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
    NKF = 24          # alive keyframes
    BOUND = 600       # bound features per KF

    rng = np.random.RandomState(0)
    ms = mapstate.make_empty(K, M, N, 100)  # W matches the L=2 test vocab

    # map points on a plane in front of the cameras
    n_mp = 6000
    pos = np.stack([rng.uniform(-4, 4, n_mp), rng.uniform(-3, 3, n_mp),
                    rng.uniform(4, 9, n_mp)], -1).astype(np.float32)
    ms = dataclasses.replace(
        ms,
        mp_pos=ms.mp_pos.at[:n_mp].set(jnp.asarray(pos)),
        mp_mask=ms.mp_mask.at[:n_mp].set(True),
        mp_desc=ms.mp_desc.at[:n_mp].set(jnp.asarray(
            rng.randint(0, 2 ** 32, (n_mp, 8), np.uint32))),
        mp_normal=ms.mp_normal.at[:n_mp].set(
            jnp.asarray(np.tile([0, 0, -1.0], (n_mp, 1)))),
        mp_min_dist=ms.mp_min_dist.at[:n_mp].set(0.5),
        mp_max_dist=ms.mp_max_dist.at[:n_mp].set(50.0),
        mp_patch=ms.mp_patch.at[:n_mp].set(jnp.asarray(
            rng.rand(n_mp, ms.mp_patch.shape[1]).astype(np.float32) * 255)),
    )

    # keyframes along a line, each binding a random subset of points
    kf_q = np.tile([1.0, 0, 0, 0], (K, 1)).astype(np.float32)
    kf_t = np.zeros((K, 3), np.float32)
    kf_t[:NKF, 0] = np.linspace(-1, 1, NKF)
    kf_mp_idx = np.full((K, N), -1, np.int32)
    kf_uv = rng.rand(K, N, 2).astype(np.float32) * [700, 440] + 20
    kf_mask = np.zeros((K,), bool)
    kf_mask[:NKF] = True
    kf_feat = np.zeros((K, N), bool)
    kf_feat[:NKF] = True
    for k in range(NKF):
        # consecutive KFs share most of their points (covisibility)
        lo = (k * 150) % (n_mp - 2 * BOUND)
        ids = lo + rng.choice(2 * BOUND, BOUND, replace=False)
        kf_mp_idx[k, :BOUND] = ids
    ms = dataclasses.replace(
        ms,
        kf_q=jnp.asarray(kf_q), kf_t=jnp.asarray(kf_t),
        kf_mask=jnp.asarray(kf_mask),
        kf_frame_id=jnp.asarray(np.arange(K, dtype=np.int32) * 10),
        kf_timestamp=jnp.asarray(np.arange(K, dtype=np.float32)),
        kf_uv=jnp.asarray(kf_uv),
        kf_level=jnp.asarray(rng.randint(0, 4, (K, N), np.int32)),
        kf_desc=jnp.asarray(rng.randint(0, 2 ** 32, (K, N, 8), np.uint32)),
        kf_feat_mask=jnp.asarray(kf_feat),
        kf_mp_idx=jnp.asarray(kf_mp_idx))
    ms = map_ops.bind_observations(ms)
    ms = jax.block_until_ready(ms)

    img = jnp.asarray(rng.rand(480, 752).astype(np.float32) * 255.0)
    pyr = jax.block_until_ready(
        pyramid.build_pyramid(img, cfg.n_levels, cfg.scale_factor))

    ring_ids, ring_born, head = mk.make_ring()
    slot = jnp.int32(NKF - 1)
    protect = jnp.full((12,), -1, jnp.int32)

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

    print(f"backend={jax.default_backend()} K={K} M={M} N={N} "
          f"alive_kf={NKF} bound={BOUND}")

    timeit("p1_cull_and_triangulate", lambda: mk.cull_and_triangulate(
        ms, ring_ids, ring_born, head, 10, slot, pyr, False, cfg,
        do_tri=True))
    timeit("p2_fuse_step", lambda: mk.fuse_step(ms, slot, ring_ids, cfg))
    timeit("p3_local_ba_step", lambda: mk.local_ba_step(ms, slot, cfg))
    timeit("p4_cull_kf_and_refresh", lambda: mk.cull_kf_and_refresh(
        ms, ring_ids, slot, jnp.int32(NKF - 2), protect, 0.0,
        jnp.int32(0), jnp.int32(0), 0.0, cfg, False, do_cull=True))

    # components of P1
    from ygz_tpu.matching import search
    from ygz_tpu.pipeline.mapping import _fundamental, _triangulate_checked

    T1 = {"q": ms.kf_q[slot], "t": ms.kf_t[slot]}
    T2 = {"q": ms.kf_q[0], "t": ms.kf_t[0]}
    F12 = jax.block_until_ready(
        jax.jit(_fundamental)(T1, T2, jnp.asarray(cam.K)))
    lvl_sigma2 = jnp.asarray(cfg.level_sigma2)
    free1 = ms.kf_feat_mask[slot] & (ms.kf_mp_idx[slot] < 0)
    free2 = ms.kf_feat_mask[0] & (ms.kf_mp_idx[0] < 0)

    tri_search = jax.jit(lambda: search.search_for_triangulation(
        ms.kf_desc[slot], ms.kf_uv[slot], ms.kf_angle[slot], free1,
        ms.kf_desc[0], ms.kf_uv[0], ms.kf_angle[0], free2,
        F12, ms.kf_level[0], lvl_sigma2))
    timeit("  tri_search x1 pair", tri_search)

    cov = jax.jit(lambda: mapstate.covisibility_counts(ms, slot))
    timeit("  covisibility_counts", cov)
    refresh = jax.jit(lambda: map_ops.refresh_map_points(
        ms, jnp.ones((M,), bool), cfg.scale_factor, cfg.n_levels))
    timeit("  refresh_map_points", refresh)
    bindo = jax.jit(lambda: map_ops.bind_observations(ms))
    timeit("  bind_observations", bindo)

    # KF-creation path pieces (tracking.py)
    from ygz_tpu.pipeline import frame as frame_mod
    fr = frame_mod.make_frame(np.asarray(img, np.uint8), 123, 0.0, cfg)
    timeit("extract_features", lambda: frame_mod.extract_features(
        dataclasses.replace(fr, uv=None, level=None, angle=None,
                            desc=None, feat_mask=None), cfg).desc)

    from ygz_tpu.pipeline.tracking import (_direct_cache_jit,
                                           _merge_direct_features,
                                           _refine_kf_obs_jit)
    fr2 = frame_mod.extract_features(fr, cfg)
    direct_uv = jnp.asarray(rng.rand(N, 2).astype(np.float32)
                            * [700, 440] + 20)
    direct_lvl = jnp.zeros((N,), jnp.int32)
    direct_mp = jnp.arange(N, dtype=jnp.int32)
    direct_mask = jnp.ones((N,), bool)
    from ygz_tpu.ops import orb as orb_mod
    timeit("merge_direct_features", lambda: _merge_direct_features(
        direct_uv, direct_lvl, direct_mp, direct_mask,
        fr2.uv, fr2.level, fr2.angle, fr2.desc, fr2.feat_mask,
        fr2.blur_atlas, orb_mod._pattern_selector(), cfg)[0])
    timeit("refine_kf_obs", lambda: _refine_kf_obs_jit(
        ms, slot, fr.pyramid, cfg).kf_uv)
    timeit("direct_cache", lambda: _direct_cache_jit(ms, NKF - 1, 512)[0])

    from ygz_tpu.matching import vocabulary
    from ygz_tpu.pipeline.tracking import _insert_kf_jit
    seed_desc = rng.randint(0, 2 ** 32, (2000, 8), np.uint32)
    voc = vocabulary.train_vocabulary(seed_desc, k=cfg.vocab_k, L=2)
    timeit("insert_kf (voc L=2)", lambda: _insert_kf_jit(
        ms, voc, slot, T1, 0.0, 123, fr2.uv,
        jnp.full((N,), -1.0), fr2.level, fr2.angle, fr2.desc,
        fr2.feat_mask, jnp.full((N,), -1, jnp.int32)).kf_q)


if __name__ == "__main__":
    main()
