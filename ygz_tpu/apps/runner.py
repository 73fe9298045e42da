"""Shared CLI runner: argument parsing, vocabulary handling, per-frame
timing statistics (median/mean as in the reference example mains,
/root/reference/Examples/Monocular/mono_euroc_vins.cc:142-163), optional
real-time pacing, and trajectory export."""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def make_parser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=name,
        description=f"ygz_tpu {name} — TPU-native SLAM dataset driver")
    p.add_argument("vocabulary",
                   help="vocabulary .npz (or 'none' to use a fresh one)")
    p.add_argument("settings", help="settings YAML (reference format)")
    p.add_argument("sequence", help="dataset sequence directory")
    p.add_argument("--associations", default=None,
                   help="TUM RGB-D associations file")
    p.add_argument("--out", default="KeyFrameTrajectory.txt",
                   help="keyframe trajectory output (TUM format)")
    p.add_argument("--frames-out", default=None,
                   help="full frame trajectory output")
    p.add_argument("--kitti-out", default=None,
                   help="frame trajectory in KITTI format")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--realtime", action="store_true",
                   help="pace frames to their timestamps")
    p.add_argument("--no-loop", action="store_true",
                   help="disable loop closing")
    p.add_argument("--max-kf", type=int, default=None,
                   help="keyframe capacity (static shape)")
    p.add_argument("--max-mp", type=int, default=None,
                   help="map point capacity (static shape)")
    p.add_argument("--detect-cell", type=int, default=None)
    p.add_argument("--detect-per-cell", type=int, default=None)
    p.add_argument("--pipelined", action="store_true",
                   help="overlap frames on device (deferred-gate tracking)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a JAX profiler trace of the run into DIR "
                        "(view with tensorboard or xprof; SURVEY §5 "
                        "tracing). Covers device + host activity.")
    p.add_argument("--log", default=None, choices=("debug", "info"),
                   help="enable structured pipeline logging")
    p.add_argument("--viewer", type=int, default=None, metavar="PORT",
                   help="serve a live map/frame viewer on this port "
                        "(browser dashboard; reference Viewer equivalent)")
    return p


def config_overrides(args) -> dict:
    out = {}
    if args.max_kf:
        out["max_keyframes"] = args.max_kf
    if args.max_mp:
        out["max_map_points"] = args.max_mp
    if args.detect_cell:
        out["detect_cell"] = args.detect_cell
    if args.detect_per_cell:
        out["detect_per_cell"] = args.detect_per_cell
    return out


def load_vocab(path: str, cfg):
    from ygz_tpu.matching import vocabulary as vm
    if path and path.lower() not in ("none", "-"):
        # same text/binary dispatch as the reference (System.cc:136-139)
        if path.endswith(".txt"):
            return vm.load_dbow_text(path)
        if path.endswith(".bin"):
            return vm.load_dbow_binary(path)
        import numpy as np
        import jax.numpy as jnp
        z = np.load(path)
        return vm.Vocabulary(k=int(z["k"]), L=int(z["L"]),
                             node_desc=jnp.asarray(z["node_desc"]),
                             word_idf=jnp.asarray(z["word_idf"]))
    return None


def run_sequence(system, frames, args, track_fn):
    """Drive the system over `frames`, collecting per-frame wall time."""
    if getattr(args, "log", None):
        from ygz_tpu.utils.log import enable
        enable(args.log)
    profile_dir = getattr(args, "profile", None)
    if profile_dir:
        import jax
        jax.profiler.start_trace(profile_dir)
    viewer = None
    if getattr(args, "viewer", None):
        from ygz_tpu.utils.live_viewer import LiveViewer
        viewer = LiveViewer(port=args.viewer, system=system).start()
    times = []
    t_prev = None
    n = 0
    # dataset images cross the host->device link on a dedicated transfer
    # thread, a few frames ahead — on a tunneled TPU the copy is the
    # single largest per-frame cost and serializes badly when issued
    # from the dispatch thread (ygz_tpu/utils/prefetch.py)
    from ygz_tpu.utils.prefetch import prefetch_arrays
    for item in prefetch_arrays(frames, depth=4):
        ts = item[0]
        if args.realtime and t_prev is not None:
            gap = ts - t_prev
            if gap > 0:
                time.sleep(min(gap, 1.0))
        t0 = time.perf_counter()
        track_fn(system, item)
        times.append(time.perf_counter() - t0)
        if viewer is not None:
            viewer.update(system.tracker, system.tracker.last_frame)
        t_prev = ts
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
        if n % 50 == 0:
            print(f"[{n}] median track time: "
                  f"{np.median(times[-50:]) * 1e3:.1f} ms  "
                  f"state={system.tracker.state} kfs={system.tracker.n_kf}")

    if profile_dir:
        import jax
        jax.profiler.stop_trace()
        print("profiler trace ->", profile_dir)
    if viewer is not None:
        viewer.stop()
    times = np.array(times)
    print(f"tracked {n} frames; per-frame time "
          f"median {np.median(times) * 1e3:.1f} ms / "
          f"mean {times.mean() * 1e3:.1f} ms")
    system.shutdown()
    system.save_keyframe_trajectory_tum(args.out)
    print("keyframe trajectory ->", args.out)
    if args.frames_out:
        system.save_trajectory_tum(args.frames_out)
    if args.kitti_out:
        system.save_trajectory_kitti(args.kitti_out)
    return times
