"""Map checkpoint/restore: serialize the full MapState (+ tracker
bookkeeping) to a single .npz.

The reference left map save/load as a TODO
(/root/reference/include/System.h:136-138); with the map already being a
flat pytree of arrays, checkpointing is a direct dump — one more payoff
of the functional state design. Restoring into a fresh System enables
localization-only runs against a prebuilt map.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ygz_tpu.pipeline.mapstate import MapState


def save_map(path: str, tracker) -> None:
    ms = tracker.ms
    arrays = {f.name: np.asarray(getattr(ms, f.name))
              for f in dataclasses.fields(ms)}
    arrays["_n_kf"] = np.asarray(tracker.n_kf)
    arrays["_ref_kf"] = np.asarray(tracker.ref_kf)
    arrays["_last_kf_frame_id"] = np.asarray(tracker.last_kf_frame_id)
    np.savez_compressed(path, **arrays)


def load_map(path: str, tracker) -> None:
    """Restore a map into a tracker (its config capacities must match)."""
    z = np.load(path)
    fields = {f.name: jnp.asarray(z[f.name])
              for f in dataclasses.fields(MapState)}
    tracker.ms = MapState(**fields)
    tracker.n_kf = int(z["_n_kf"])
    tracker.ref_kf = int(z["_ref_kf"])
    tracker.last_kf_frame_id = int(z["_last_kf_frame_id"])
    # slot bookkeeping derived from the mask (older checkpoints may have
    # been saved before slot recycling existed)
    mask = np.asarray(tracker.ms.kf_mask)
    alive = np.where(mask)[0]
    tracker.kf_next = int(alive.max()) + 1 if len(alive) else 0
    tracker.kf_free = [int(k) for k in range(tracker.kf_next) if not mask[k]]
    tracker.n_kf = len(alive)
    # capacities may differ from the constructing config (growth)
    tracker.cfg.max_keyframes = int(mask.shape[0])
    tracker.cfg.max_map_points = int(tracker.ms.mp_mask.shape[0])
    from ygz_tpu.pipeline import tracking
    tracker.state = tracking.LOST if tracker.n_kf > 0 \
        else tracking.NOT_INITIALIZED
    tracker.direct_cache = False
    tracker.velocity = None
