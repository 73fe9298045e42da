"""Dedicated host->device frame-transfer thread.

On a tunneled TPU the host->device image copy is the single largest
per-frame cost (~12 ms for a 752x480 uint8 frame at ~30 MB/s), and —
measured — a transfer issued on the same thread as compute dispatches
breaks the tunnel's streaming pipeline: upload+dispatch interleaved on
one thread costs ~3x the sum of their isolated costs, while the same
work split across an uploader thread and a compute thread runs at
max(upload, compute).

This is the TPU-native analogue of the reference's camera/dataset
thread handing cv::Mats to the tracker (the reference reads frames on
the caller's thread, /root/reference/Examples/Monocular/mono_tum.cc —
here the handoff crosses the PCIe/tunnel boundary, so it gets its own
thread). Frames are uploaded in arrival order with a bounded look-ahead
so memory stays O(depth) and the transfer stream runs back-to-back.

Every byte still crosses the link inside the caller's timing window —
prefetching overlaps the copy with compute, it does not skip it.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax.numpy as jnp

__all__ = ["prefetch_arrays", "FrameUploader", "host_prefetch"]


def host_prefetch(x) -> None:
    """Start an async device->host copy of `x` (a jax array or pytree).
    The copy is enqueued behind the producing computation, so a later
    device_get of a finished value costs ~0 instead of a full tunnel
    round trip (measured: 27 ms -> 0.3 ms on the axon link). No-op on
    backends without the API."""
    import jax

    for leaf in jax.tree.leaves(x):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            return


def prefetch_arrays(items: Iterable, depth: int = 4) -> Iterator:
    """Yield device arrays for `items` (numpy frames), uploading up to
    `depth` frames ahead on a dedicated transfer thread. Tuples/lists
    are uploaded element-wise (stereo pairs). None passes through."""
    up = FrameUploader(depth=depth)

    def feed():
        try:
            for it in items:
                up.put(it)
        finally:
            up.close()

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    while True:
        out = up.get()
        if out is _DONE:
            break
        yield out
    t.join()


_DONE = object()


class FrameUploader:
    """Bounded-depth ordered uploader: put(np_img) on any thread,
    get() -> device array in FIFO order. The upload itself (jnp.asarray)
    runs on this object's internal thread so transfers stream without
    interleaving into the caller's dispatch stream."""

    def __init__(self, depth: int = 4):
        self._in: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._out: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _upload_one(self, item):
        if item is None:
            return None
        if isinstance(item, (tuple, list)):
            return type(item)(self._upload_one(x) for x in item)
        # only image-like payloads go to the device: timestamps, IMU
        # row-blocks and other small host-side metadata pass through
        # (dataset items are tuples like (ts, img) / (ts, imgL, imgR))
        if hasattr(item, "ndim") and item.ndim >= 2 and item.size >= 16384:
            return jnp.asarray(item)
        return item

    def _run(self):
        while True:
            item = self._in.get()
            if item is _DONE:
                self._out.put(_DONE)
                return
            self._out.put(self._upload_one(item))

    def put(self, item) -> None:
        self._in.put(item)

    def get(self):
        return self._out.get()

    def close(self) -> None:
        self._in.put(_DONE)
