"""Host-side stage timers for attributing per-keyframe "drain" cost.

The reference self-measures with std::chrono in its example mains
(/root/reference/Examples/Monocular/mono_euroc_vins.cc:142-163); this is
the framework-internal analogue: named perf_counter brackets accumulated
into a global table, reported by the bench / CLI `--timing` flag.

Costs ~100 ns per bracket when disabled (one attribute check); brackets
measure HOST wall-clock, which on a tunneled device includes dispatch +
any blocking readback inside the bracket — exactly the quantity that
stalls the pipeline.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

# YGZ_SYNC_TIMING=1: `sync(x)` blocks on device completion so stage
# brackets measure true device+host cost instead of async enqueue time —
# diagnostic runs only (it serializes the pipeline it measures)
sync_mode = bool(os.environ.get("YGZ_SYNC_TIMING"))


def sync(x):
    if sync_mode and x is not None:
        import jax
        jax.block_until_ready(x)
    return x

_stats: dict = defaultdict(lambda: [0.0, 0, 0.0])   # name -> [total_s, n, max_s]
_durs: dict = defaultdict(list)                     # name -> [dt, ...] (for p50)
enabled = False


def enable(on: bool = True):
    global enabled
    enabled = on


@contextlib.contextmanager
def stage(name: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        add(name, dt)


def add(name: str, dt: float):
    """Record an externally measured duration."""
    s = _stats[name]
    s[0] += dt
    s[1] += 1
    s[2] = max(s[2], dt)
    d = _durs[name]
    if len(d) < 4096:
        d.append(dt)


def snapshot() -> dict:
    return {k: tuple(v) for k, v in _stats.items()}


def reset():
    _stats.clear()
    _durs.clear()


def report(min_total: float = 0.0) -> str:
    rows = sorted(_stats.items(), key=lambda kv: -kv[1][0])
    lines = [f"{'stage':<40} {'total_s':>9} {'n':>6} {'mean_ms':>9} "
             f"{'p50_ms':>9} {'max_ms':>9}"]
    for name, (tot, n, mx) in rows:
        if tot < min_total:
            continue
        d = sorted(_durs.get(name, ()))
        p50 = d[len(d) // 2] if d else 0.0
        lines.append(f"{name:<40} {tot:9.2f} {n:6d} "
                     f"{tot / max(n, 1) * 1e3:9.1f} {p50 * 1e3:9.1f} "
                     f"{mx * 1e3:9.1f}")
    return "\n".join(lines)
