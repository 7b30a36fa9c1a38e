#!/usr/bin/env python
"""Perf probe 3: block-culled traversal vs brute-force baked sweep on
many-primitive scenes (real TPU), plus a north-star regression check."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def time_step(step, state, frames, reps, pose):
    import jax

    out = step(state, pose, np.uint32(1), np.int32(0))
    jax.device_get(out.rays)
    state = out.state
    meds = []
    f = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        rays = []
        for _ in range(frames):
            out = step(state, pose, np.uint32(1 + f), np.int32(f))
            state = out.state
            rays.append(out.rays)
            f += 1
        total = float(sum(jax.device_get(rays)))
        dt = time.perf_counter() - t0
        meds.append(total / dt / 1e6)
    return statistics.median(meds)


def main():
    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.models.gen import stress_scene
    from terminal_raytracer_tpu.runtime import init_state, make_render_step

    pose = Camera().pose()
    frames, reps = 48, 3

    for n in (128, 256):
        scene = stress_scene(n, seed=0)
        for accel in ("grid", "baked"):
            t0 = time.perf_counter()
            step = make_render_step(scene, backend="pallas", accel=accel)
            state = init_state(scene)
            mray = time_step(step, state, frames, reps, pose)
            print(f"[probe3] stress{n} accel={accel:6s} {mray:8.1f} Mray/s "
                  f"(incl. compile {time.perf_counter() - t0:.0f}s total)",
                  flush=True)

    # regression check: north star unaffected (auto -> baked, 11 prims)
    scene = load_scene("Cornell_Box").with_overrides(samples_per_pixel=16,
                                                     max_depth=32)
    step = make_render_step(scene, backend="pallas")
    mray = time_step(step, init_state(scene), frames, reps, pose)
    print(f"[probe3] north_star (auto)   {mray:8.1f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
