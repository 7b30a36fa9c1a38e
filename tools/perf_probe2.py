#!/usr/bin/env python
"""Perf probe 2: pairing depth + tile shape at the north-star config."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def time_render(render_frame, frames, reps, pose):
    import jax

    out = render_frame(pose, np.uint32(1), np.int32(0))
    jax.device_get(out[3])
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rays = []
        for f in range(1, frames + 1):
            out = render_frame(pose, np.uint32(1 + f), np.int32(f))
            rays.append(out[3])
        total = float(sum(jax.device_get(rays)))
        dt = time.perf_counter() - t0
        meds.append(total / dt / 1e6)
    return statistics.median(meds)


def main():
    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel

    scene = load_scene("Cornell_Box").with_overrides(
        samples_per_pixel=16, max_depth=32
    )
    pose = Camera().pose()
    frames, reps = 48, 3

    variants = [
        ("pair8/th16 (default)", dict()),
        ("pair25/th16", dict(pair=25)),
        ("pair40/th16", dict(pair=40)),
        ("pair8/th8", dict(tile_h=8)),
        ("pair25/th8", dict(pair=25, tile_h=8)),
        ("pair8/th32", dict(tile_h=32)),
    ]
    for name, kw in variants:
        try:
            rf = jax.jit(pallas_kernel.make_sorted_render_frame(scene, **kw))
            mray = time_render(rf, frames, reps, pose)
            print(f"[probe2] {name:22s} {mray:8.1f} Mray/s", flush=True)
        except Exception as e:  # compile failures are data too
            print(f"[probe2] {name:22s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
