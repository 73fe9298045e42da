"""On-chip long-run soak (VERDICT r4 #8): the 1000-frame two-lap growth
e2e exists on CPU (tests/test_e2e_long.py); this runs the same shape of
workload on the real TPU, where a capacity-growth retrace costs actual
minutes if mishandled, and records:

  * wall-clock FPS per 100-frame window (decay visible if any)
  * the frame indices where KF/MP capacity growth happened
  * fused-step retrace count (must stay O(log N), one per bucket)
  * tracking state health across boundaries

Prints a JSON summary for PROGRESS.md. Uses the monocular pipelined
path at EuRoC scale (752x480, same config as bench.py) with small
initial capacities so growth boundaries are crossed mid-run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np


def main():
    import jax

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "assets", "bench_cache")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import synthetic
    from bench import synthetic_render_jittable
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.pipeline import fused_track, tracking
    from ygz_tpu.pipeline.system import System
    from ygz_tpu.utils.config import SlamConfig

    n_frames = int(os.environ.get("SOAK_FRAMES", "600"))
    cam = Camera(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                 width=752, height=480)
    cfg = SlamConfig(
        camera=cam, fps=20.0,
        n_features=1000, n_levels=4, scale_factor=2.0,
        ini_th_fast=12.0, min_th_fast=5.0,
        cache_features=150, init_min_matches=100,
        # deliberately small: the run must cross >=2 growth boundaries
        max_keyframes=16, max_map_points=2048,
        detect_cell=32, detect_per_cell=5)

    tex = synthetic.make_texture(0, size=(1400, 2000))
    # pre-render a 300-frame lap and drive it repeatedly (same pattern
    # as bench.py): rendering inline cost a blocking 1.4 MB readback per
    # frame over the tunnel, which measured the renderer, not the system
    lap = synthetic.orbit_trajectory(300, dt=0.05)
    render_jit = jax.jit(lambda T: synthetic_render_jittable(tex, T, cam))
    lap_frames = [np.clip(np.asarray(render_jit(T)), 0, 255).astype(np.uint8)
                  for _, T in lap]
    reps = (n_frames + 299) // 300
    traj = [(k * 300 * 0.05 + ts, T) for k in range(reps)
            for ts, T in lap][:n_frames]
    frames = (lap_frames * reps)[:n_frames]

    slam = System(cfg, use_loop_closing=True, pipelined=True,
                  pipeline_depth=8)
    compiles0 = fused_track.fused_direct_step._cache_size()

    growth_events = []
    last_caps = (cfg.max_keyframes, cfg.max_map_points)
    win_fps = []
    n_ok = 0
    t_win = time.perf_counter()
    t0 = time.perf_counter()
    budget_s = float(os.environ.get("SOAK_BUDGET_S", "900"))
    done = 0
    from ygz_tpu.utils.prefetch import prefetch_arrays
    feed = prefetch_arrays(frames, depth=6)
    for i, ((ts, T_cw), img) in enumerate(zip(traj, feed)):
        slam.track_monocular(img, ts)
        done = i + 1
        n_ok += int(slam.tracker.state == tracking.OK)
        caps = (cfg.max_keyframes, cfg.max_map_points)
        if caps != last_caps:
            growth_events.append({"frame": i, "kf_cap": caps[0],
                                  "mp_cap": caps[1]})
            print(f"[soak] growth at frame {i}: {last_caps} -> {caps}",
                  flush=True)
            last_caps = caps
        if (i + 1) % 100 == 0:
            dt = time.perf_counter() - t_win
            win_fps.append(round(100.0 / dt, 1))
            print(f"[soak] frames {i - 99}-{i}: {100.0 / dt:.1f} FPS "
                  f"(elapsed {time.perf_counter() - t0:.0f}s)", flush=True)
            t_win = time.perf_counter()
        if time.perf_counter() - t0 > budget_s:
            print(f"[soak] budget hit at frame {i + 1}", flush=True)
            break
    slam.tracker.flush_pipeline()
    retraces = fused_track.fused_direct_step._cache_size() - compiles0

    out = {
        "frames": done, "tracked_fraction": round(n_ok / max(done, 1), 3),
        "window_fps": win_fps, "growth_events": growth_events,
        "fused_retraces": int(retraces),
        "n_kf": slam.tracker.n_kf,
        "final_caps": {"kf": cfg.max_keyframes,
                       "mp": cfg.max_map_points},
        "loops_closed": (slam.loop_closer.n_loops
                         if slam.loop_closer else 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
