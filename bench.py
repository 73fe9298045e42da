"""Benchmark: per-frame tracking performance on EuRoC-sized frames
(752x480), on whatever accelerator jax.devices() provides.

Two measurements:

1. **System FPS** (headline): steady-state WALL-CLOCK THROUGHPUT of
   `System.track_monocular` over a synthetic textured world — measured
   frames divided by total elapsed time over the post-warm-up window,
   INCLUDING every pipeline-drain and keyframe/mapping frame. (A median
   of per-call times is invalid under pipelining: 7 of 8 calls only
   enqueue device work, so their latency measures the host, not the
   system — the round-3 headline made exactly that mistake and printed
   314 "FPS" against its own 84 FPS device ceiling.) The reference's
   per-frame boundary is Examples/Monocular/mono_euroc_vins.cc:142-163;
   throughput over that same boundary is what its median reports,
   because its calls block.
2. **Kernel FPS**: the tracking hot path as one fused device program
   (pyramid + sparse align + direct KLT + pose opt) — the device-side
   ceiling. Per-stage timings go to stderr for regression attribution.

Sanity gates: tracked_fraction >= 0.9 and system_fps <= kernel_fps * 1.2
(a "system" faster than its own hot-path ceiling is a metric artifact).

Prints ONE JSON line; vs_baseline = system FPS / 50 (the reference's
~20 ms/frame on CPU; >= 3 means the BASELINE.json 3x target is met).
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA/Mosaic compilation cache: first-ever compile of the
    fused Pallas kernels over the tunneled TPU costs minutes; cached
    reruns load in seconds. The cache directory is COMMITTED (pre-baked by
    running this bench on the chip at build time) so driver bench runs —
    which start from a fresh checkout — never pay the cold-compile wall
    that blew the 900 s budget in round 2 (BENCH_r02: TimeoutError at
    frame 16 of warm-up)."""
    import jax
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "assets", "bench_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache EVERYTHING: the warm-up wall is not a few big programs but
    # hundreds of small eager-op compiles (0.2-0.8 s each over the
    # tunnel) during init/KF frames — with the 0.5 s threshold those
    # never got cached and every driver run paid them again
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def bench_kernel(report_stages: bool = True):
    """Device hot path: one fused jit call per frame. Also times each
    stage separately (stderr) so a regression is attributable — the
    84-vs-226 FPS mystery of round 3 (tunnel variance, not code) would
    have been obvious with this breakdown."""
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
        # same stage parameters as the system's fused_direct_step:
        # 3-level sparse align (min_level=1, Tracking.cc:207 parity)
        # and the fused KLT on TPU
        T, _ = align.sparse_image_align(
            T_init, pyr_ref, pyr_cur, uv, pts_ref, mask, cam, scales,
            max_level=n_levels - 1, min_level=1)
        if on_tpu:
            from ygz_tpu.ops import pallas_align
            uv_ref, conv, _ = pallas_align.align2d_fused(
                pyr_cur[0], ref_patches, uv_c, mask_c)
        else:
            uv_ref, conv = align.align2d(pyr_cur[0], ref_patches, uv_c,
                                         mask_c)
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
    pyr_ref = jax.block_until_ready(pyr_ref)
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

    if report_stages:
        def timed(fn, *args, n=100):
            o = fn(*args)
            jax.block_until_ready(o)
            t = time.perf_counter()
            for _ in range(n):
                o = fn(*args)
            jax.block_until_ready(o)
            return (time.perf_counter() - t) / n, o

        s_pyr = jax.jit(lambda im: pyramid.build_pyramid(im, n_levels, scale))
        s_sa = jax.jit(lambda pr, pc: align.sparse_image_align(
            T0, pr, pc, uv, pts_ref, mask, cam, scales,
            max_level=n_levels - 1, min_level=1))
        if on_tpu:
            from ygz_tpu.ops import pallas_align as _pa
            s_klt = jax.jit(lambda im: _pa.align2d_fused(
                im, ref_patches, uv_c, mask_c)[:2])
        else:
            s_klt = jax.jit(lambda im: align.align2d(im, ref_patches, uv_c,
                                                     mask_c))
        t_p, pyr_cur = timed(s_pyr, img_cur)
        t_s, (T_sa, _) = timed(s_sa, pyr_ref, pyr_cur)
        t_k, (uv_r, conv) = timed(s_klt, pyr_cur[0])
        if on_tpu:
            from ygz_tpu.ops import pallas_pose
            s_po = jax.jit(lambda T, u, c: pallas_pose.pose_optimization_fused(
                T, pts_c, u, inv_s2, c, cam.fx, cam.fy, cam.cx, cam.cy))
        else:
            s_po = jax.jit(lambda T, u, c: ba.pose_optimization(
                T, pts_c, u, ur, inv_s2, c, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.bf))
        t_o, _ = timed(s_po, T_sa, uv_r, conv)
        print(f"[bench] kernel stages (ms): pyramid={t_p*1e3:.2f} "
              f"sparse_align={t_s*1e3:.2f} align2d={t_k*1e3:.2f} "
              f"pose_opt={t_o*1e3:.2f} | fused={dt*1e3:.2f} "
              f"({1.0/dt:.1f} FPS)", file=sys.stderr, flush=True)
    return 1.0 / dt


def bench_vio(report_stages: bool = True):
    """VIO device hot path (VERDICT r3 #5): the fused VI step — IMU
    preintegration + NavState prediction + sparse align + direct KLT +
    joint VI pose optimization with marginal prior — as ONE device
    program on EuRoC-sized frames, the program pipelined VIO dispatches
    per frame (reference hot path: /root/reference/src/Tracking.cc:
    1994-2105 + src/Optimizer.cc:278-618, ~20 ms/frame on CPU)."""
    import jax
    import jax.numpy as jnp
    from ygz_tpu.core import lie
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.imu import navstate as ns_mod
    from ygz_tpu.ops import align, pyramid
    from ygz_tpu.pipeline import fused_track, mapstate
    from ygz_tpu.pipeline.vio import FRAME_IMU_PAD, _pad_imu
    from ygz_tpu.utils.config import SlamConfig

    cam = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0,
                 width=752, height=480)
    cfg = SlamConfig(
        camera=cam, fps=20.0, use_imu=True,
        n_features=1000, n_levels=4, scale_factor=2.0,
        ini_th_fast=12.0, min_th_fast=5.0,
        cache_features=150, init_min_matches=100,
        max_keyframes=8, max_map_points=1024,
        detect_cell=32, detect_per_cell=5)
    N, C = cfg.n_features, 512
    rng = np.random.RandomState(0)
    img_last = jnp.asarray(rng.rand(480, 752).astype(np.float32) * 255.0)
    img_cur = jnp.asarray(rng.rand(480, 752).astype(np.float32) * 255.0)
    last_pyr = pyramid.build_pyramid(img_last, cfg.n_levels,
                                     cfg.scale_factor)
    cur_pyr = pyramid.build_pyramid(img_cur, cfg.n_levels, cfg.scale_factor)

    # synthetic local map: C points in front of the camera with patches
    uv_c = (rng.rand(C, 2) * np.array([700, 440]) + 20).astype(np.float32)
    depth_c = rng.uniform(2.0, 8.0, C).astype(np.float32)
    pts_c = np.stack([(uv_c[:, 0] - cam.cx) / cam.fx * depth_c,
                      (uv_c[:, 1] - cam.cy) / cam.fy * depth_c,
                      depth_c], -1)
    ms = mapstate.make_empty(cfg.max_keyframes, cfg.max_map_points, N, 64)
    side = int(np.sqrt(ms.mp_patch.shape[1]))
    import dataclasses as _dc
    ms = _dc.replace(
        ms,
        mp_pos=ms.mp_pos.at[:C].set(jnp.asarray(pts_c)),
        mp_mask=ms.mp_mask.at[:C].set(True),
        mp_patch=ms.mp_patch.at[:C].set(jnp.asarray(
            rng.rand(C, side * side).astype(np.float32) * 255.0)),
        mp_min_dist=ms.mp_min_dist.at[:C].set(0.1),
        mp_max_dist=ms.mp_max_dist.at[:C].set(100.0),
        mp_obs_count=ms.mp_obs_count.at[:C].set(3),
        kf_mask=ms.kf_mask.at[0].set(True))
    cand_idx = jnp.arange(C, dtype=jnp.int32)
    cand_valid = jnp.ones((C,), bool)

    # last frame: first 256 features bound to map points
    n_b = 256
    last_uv = jnp.zeros((N, 2)).at[:n_b].set(jnp.asarray(uv_c[:n_b]))
    last_mp_idx = jnp.full((N,), -1, jnp.int32).at[:n_b].set(
        jnp.arange(n_b, dtype=jnp.int32))
    last_mask = jnp.zeros((N,), bool).at[:n_b].set(True)
    T_last = lie.se3_identity()
    gw = jnp.array([0.0, 0.0, -9.81])
    ns = ns_mod.NavState(P=jnp.zeros(3), V=jnp.zeros(3),
                         q=lie.quat_identity(), bg=jnp.zeros(3),
                         ba=jnp.zeros(3))
    prior_H = jnp.eye(15) * 1e2
    # stationary IMU: accelerometer reads -g in body frame
    rows = np.zeros((10, 7), np.float32)
    rows[:, 0] = 0.005
    rows[:, 6] = 9.81
    imu_p, imu_m = _pad_imu(rows, FRAME_IMU_PAD)

    def step(cur):
        return fused_track.fused_vi_step(
            ms, last_pyr, last_uv, last_mp_idx, last_mask, T_last,
            ns, prior_H, imu_p, imu_m, jnp.zeros(3), jnp.zeros(3),
            gw, {k: jnp.asarray(v) for k, v in lie.se3_identity().items()},
            cur, cand_idx, cand_valid, 0, cfg)

    out = step(cur_pyr)
    jax.block_until_ready(out.bundle)
    n_iter = 100
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(cur_pyr)
    jax.block_until_ready(out.bundle)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"[bench] vio fused step: {dt*1e3:.2f} ms ({1.0/dt:.1f} FPS)",
          file=sys.stderr, flush=True)
    return 1.0 / dt


def bench_vio_system(n_frames: int = 150, warm_frames: int = 40):
    """End-to-end VIO throughput (VERDICT r4 #5): System.track_mono_vi
    over a synthetic 752x480 VI sequence (IMU at 100 Hz, camera 20 Hz),
    pipelined, wall-clock over the post-warm-up window — the VI
    counterpart of bench_system. Returns (fps, tracked_fraction)."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import dataclasses

    import jax
    import jax.numpy as jnp
    import synthetic
    from test_imu import DT, simulate_trajectory

    from ygz_tpu.core import lie
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.pipeline import tracking
    from ygz_tpu.pipeline.system import System
    from ygz_tpu.utils.config import SlamConfig

    fps = 20
    steps_per_frame = int(round(1.0 / fps / DT))
    cam = Camera(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                 width=752, height=480)
    cfg = SlamConfig(
        camera=cam, fps=float(fps), use_imu=True, vins_init_time=4.0,
        gravity=9.81,
        n_features=1000, n_levels=4, scale_factor=2.0,
        ini_th_fast=12.0, min_th_fast=5.0,
        cache_features=150, init_min_matches=100,
        max_keyframes=64, max_map_points=8192,
        detect_cell=32, detect_per_cell=5)

    total = n_frames + warm_frames
    n_steps = total * steps_per_frame + 1
    P, V, qs, imu = simulate_trajectory(n_steps, seed=11, amp=0.5,
                                        rot_amp=0.25)
    tex = synthetic.make_texture(3, size=(1400, 2000))
    render_jit = jax.jit(lambda T: synthetic_render_jittable(tex, T, cam))
    frames = []
    for i in range(total):
        k = i * steps_per_frame
        T_wb = {"q": jnp.asarray(qs[k]), "t": jnp.asarray(P[k])}
        img = render_jit(lie.se3_inverse(T_wb))
        frames.append(np.clip(np.asarray(img), 0, 255).astype(np.uint8))

    from ygz_tpu.utils import timing
    timing.enable(True)
    slam = System(cfg, use_loop_closing=False, pipelined=True,
                  pipeline_depth=8)
    t_meas = None
    times = []
    n_ok = 0
    budget_s = float(os.environ.get("BENCH_VIO_BUDGET_S", "420"))
    t_start = time.perf_counter()
    from ygz_tpu.utils.prefetch import prefetch_arrays
    feed = prefetch_arrays(frames, depth=6)
    for i, img_dev in enumerate(feed):
        if i == warm_frames:
            timing.reset()
            t_meas = time.perf_counter()
        rows = None
        if i > 0:
            a, b = (i - 1) * steps_per_frame, i * steps_per_frame
            rows = np.concatenate(
                [np.full((b - a, 1), DT, np.float32), imu[a:b, 1:7]],
                axis=1)
        t0 = time.perf_counter()
        slam.track_mono_vi(img_dev, rows, i / fps)
        if i >= warm_frames:
            times.append(time.perf_counter() - t0)
            n_ok += int(slam.tracker.state == tracking.OK)
        if time.perf_counter() - t_start > budget_s:
            if len(times) < 30:
                raise TimeoutError("vio system bench budget exhausted "
                                   f"at frame {i + 1}")
            break
    slam.tracker.flush_pipeline()
    wall = time.perf_counter() - t_meas
    fps_out = len(times) / wall
    tracked = n_ok / max(len(times), 1)
    print(f"[bench] vio system: {len(times)} frames in {wall:.1f}s -> "
          f"{fps_out:.1f} FPS (tracked {tracked:.2f}, "
          f"vins_inited={slam.tracker.vins_inited})", file=sys.stderr,
          flush=True)
    print("[bench] vio stage attribution:\n" + timing.report(min_total=0.05),
          file=sys.stderr, flush=True)
    return fps_out, tracked


def synthetic_render_jittable(tex, T_cw, cam):
    """tests/synthetic.render, trace-compatible (it already is — this
    indirection exists so jax.jit sees a single callable)."""
    import jax.numpy as jnp
    import synthetic
    H, W = cam.height, cam.width
    from ygz_tpu.core import lie
    from ygz_tpu.ops.interp import bilinear_sample
    rays = synthetic._pixel_rays(cam)
    T_wc = lie.se3_inverse(T_cw)
    origin = T_wc["t"]
    dirs = lie.quat_rotate(T_wc["q"], rays)
    texel_bg, _ = synthetic._plane_hit(tex, origin, dirs, synthetic.PLANE_Z,
                                       tex.shape)
    img = bilinear_sample(jnp.asarray(tex), texel_bg)
    occ, fg_tex = synthetic._fg_layer(0)
    texel_fg, tt = synthetic._plane_hit(fg_tex, origin, dirs,
                                        synthetic.PLANE_Z * 2.0 / 3.0,
                                        fg_tex.shape)
    fg_val = bilinear_sample(jnp.asarray(fg_tex), texel_fg)
    fg_occ = bilinear_sample(jnp.asarray(occ), texel_fg)
    hit = (fg_occ > 0.5) & (tt > 0)
    img = jnp.where(hit, fg_val, img)
    return img.reshape(H, W)


def bench_system(n_frames: int = 200, warm_frames: int = 220,
                 use_loop_closing: bool = False,
                 device_resident: bool = False):
    """Full-system steady-state throughput: System.track_monocular on a
    752x480 synthetic world, wall-clock over the post-warm-up window
    INCLUDING pipeline drains and keyframe/mapping work. Returns
    (throughput_fps, tracked_fraction, median_call_fps).

    device_resident=True stages all frames in HBM before the clock
    starts — the DMA/zero-copy-capture configuration. The headline run
    keeps frames host-side (every byte crosses the link inside the
    measured window); on this tunneled chip that link runs at ~30 MB/s
    (~12 ms/frame), which IS the headline's ceiling, so the secondary
    number is what the same system does when image delivery is not the
    bottleneck."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import synthetic
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.pipeline import tracking
    from ygz_tpu.pipeline.system import System
    from ygz_tpu.utils.config import SlamConfig

    cam = Camera(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                 width=752, height=480)
    cfg = SlamConfig(
        camera=cam, fps=20.0,
        n_features=1000, n_levels=4, scale_factor=2.0,  # EuRoC mono config
        ini_th_fast=12.0, min_th_fast=5.0,
        cache_features=150, init_min_matches=100,
        max_keyframes=64, max_map_points=8192,
        detect_cell=32, detect_per_cell=5)

    # pre-render the sequence (the "dataset" — not part of frame cost);
    # jit the renderer so each frame is one dispatch, not ~30 eager ops.
    # The sequence is a 240-frame sweep driven TWICE (same per-frame
    # motion as the r4 bench): the warm-up covers lap 1 — so the full
    # loop-closing chain (detect -> Sim3 -> correct -> essential graph ->
    # global BA) compiles and loads before the clock starts, instead of
    # charging a one-off multi-second executable load to steady state —
    # and the measured window is lap 2, where every stretch revisits
    # lap-1 keyframes and the loop thread does real work.
    import jax
    tex = synthetic.make_texture(0, size=(1400, 2000))
    lap = synthetic.orbit_trajectory(240, dt=0.05)
    traj = lap + [(ts + 240 * 0.05, T_cw) for ts, T_cw in lap]
    traj = traj[:n_frames + warm_frames]
    render_jit = jax.jit(
        lambda T: synthetic_render_jittable(tex, T, cam))
    lap_frames = [np.clip(np.asarray(render_jit(T_cw)),
                          0, 255).astype(np.uint8) for _, T_cw in lap]
    frames = (lap_frames + lap_frames)[:n_frames + warm_frames]

    # pipelined depth 8: gate readbacks batched 8 frames deep so device
    # work streams and the tunnel round trip amortizes; frames are fed
    # as uint8 like a real dataset loader. Throughput (below) charges
    # every drain to the clock, so pipelining cannot hide work — it only
    # overlaps it, exactly like the reference's mapping thread.
    from ygz_tpu.utils import timing
    from ygz_tpu.utils.prefetch import prefetch_arrays
    timing.enable(True)
    slam = System(cfg, use_loop_closing=use_loop_closing, pipelined=True,
                  pipeline_depth=8)
    times = []
    n_ok = 0
    # wall-clock budget: a cold compilation cache on a tunneled device can
    # spend minutes per first-seen program; report whatever steady-state
    # frames fit in the budget rather than blowing the driver's timeout
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    t_start = time.perf_counter()
    t_meas = None
    # frames are fed through the transfer-thread prefetcher exactly as a
    # real dataset loader would deliver them: every byte crosses the
    # link inside the measured window; the copy overlaps compute instead
    # of serializing into the dispatch stream (ygz_tpu/utils/prefetch.py)
    if device_resident:
        import jax.numpy as jnp
        feed = [jnp.asarray(f) for f in frames]
        jax.block_until_ready(feed[-1])
    else:
        feed = prefetch_arrays(frames, depth=6)
    for i, ((ts, _), img) in enumerate(zip(traj, feed)):
        if i == warm_frames:
            timing.reset()   # attribution covers ONLY the measured window
            t_meas = time.perf_counter()
        t0 = time.perf_counter()
        slam.track_monocular(img, ts)
        dt = time.perf_counter() - t0
        if dt > 1.0 or i % 50 == 0:
            print(f"[bench] frame {i}: {dt:.2f}s "
                  f"(elapsed {time.perf_counter() - t_start:.0f}s)",
                  file=sys.stderr, flush=True)
        if i >= warm_frames:
            times.append(dt)
            n_ok += int(slam.tracker.state == tracking.OK)
        if time.perf_counter() - t_start > budget_s:
            if len(times) < 40:
                raise TimeoutError(
                    f"system bench budget ({budget_s:.0f}s) exhausted "
                    f"during compilation warm-up at frame {i + 1}")
            print(f"[bench] budget hit after {i + 1} frames",
                  file=sys.stderr)
            break
    # the in-flight tail belongs to the measured work: flush inside the
    # clock so the last frames' device work can't escape the denominator
    slam.tracker.flush_pipeline()
    wall = time.perf_counter() - t_meas
    throughput = len(times) / wall
    med_call = float(np.median(times))
    tracked = n_ok / max(len(times), 1)
    print(f"[bench] {len(times)} measured frames in {wall:.1f}s -> "
          f"{throughput:.1f} FPS wall-clock (median call "
          f"{1.0/med_call:.1f}/s, tracked {tracked:.2f})", file=sys.stderr)
    print("[bench] stage attribution:\n" + timing.report(min_total=0.05),
          file=sys.stderr, flush=True)
    if tracked < 0.9:
        # a regression that fails most frames must not print a (fast!)
        # FPS line — failed frames are cheap and inflate the number
        raise RuntimeError(
            f"system bench invalid: tracked_fraction={tracked:.2f} < 0.9")
    return throughput, tracked, 1.0 / med_call


def main():
    _enable_compile_cache()
    # raise the main-thread stack ceiling: XLA's LLVM passes recurse
    # deeply on the big fused programs (see tests/conftest.py)
    import resource
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 << 20
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
    if os.environ.get("BENCH_SKIP_KERNEL"):
        kernel_fps = float("nan")
    else:
        kernel_fps = bench_kernel()
    vio_fps = None
    if not os.environ.get("BENCH_SKIP_VIO"):
        try:
            vio_fps = bench_vio()
        except Exception as e:  # pragma: no cover
            print(f"[bench] vio bench failed: {e!r}", file=sys.stderr)
    vio_system_fps = None
    if not os.environ.get("BENCH_SKIP_VIO_SYSTEM"):
        try:
            vio_system_fps, _ = bench_vio_system()
        except Exception as e:  # pragma: no cover
            print(f"[bench] vio system bench failed: {e!r}",
                  file=sys.stderr)
    try:
        # loop closing ON by default: the reference always runs its loop
        # thread in mono (System.cc:174-175) — this is the parity config
        system_fps, tracked, med_fps = bench_system(
            use_loop_closing=os.environ.get("BENCH_LOOP", "1") != "0")
    except Exception as e:  # pragma: no cover — keep the bench line alive
        print(f"[bench] system bench failed: {e!r}", file=sys.stderr)
        system_fps, tracked, med_fps = None, 0.0, 0.0

    dev_fps = None
    if system_fps is not None \
            and not os.environ.get("BENCH_SKIP_DEVICE_RESIDENT"):
        try:
            # secondary, separately-labeled configuration: frames staged
            # in HBM (zero-copy capture / DMA delivery) — shows system
            # throughput when the ~30 MB/s tunnel is not the ceiling
            dev_fps, dev_tracked, _ = bench_system(
                use_loop_closing=os.environ.get("BENCH_LOOP", "1") != "0",
                device_resident=True)
            if dev_tracked < 0.9:
                dev_fps = None
        except Exception as e:  # pragma: no cover
            print(f"[bench] device-resident bench failed: {e!r}",
                  file=sys.stderr)

    if system_fps is not None and np.isfinite(kernel_fps) \
            and system_fps > kernel_fps * 1.2:
        # a "system" faster than its own device hot path is a metric
        # artifact (round 3's 314-vs-84 contradiction); refuse to print it
        print(f"[bench] INVALID: system {system_fps:.1f} > kernel "
              f"{kernel_fps:.1f} x 1.2", file=sys.stderr)
        system_fps = None

    if system_fps is not None:
        out = {
            "metric": "system_tracking_fps_euroc_throughput",
            "value": round(system_fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(system_fps / 50.0, 3),
            "kernel_fps": round(kernel_fps, 2),
            "median_call_fps": round(med_fps, 2),
            "tracked_fraction": round(tracked, 3),
        }
    else:
        out = {
            "metric": "tracking_fps_euroc_frame",
            "value": round(kernel_fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(kernel_fps / 50.0, 3),
        }
    if dev_fps is not None:
        out["system_fps_device_resident"] = round(dev_fps, 2)
    if vio_fps is not None:
        out["vio_fps"] = round(vio_fps, 2)
    if vio_system_fps is not None:
        out["vio_system_fps"] = round(vio_system_fps, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
