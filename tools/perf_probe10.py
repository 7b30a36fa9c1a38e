#!/usr/bin/env python
"""Perf probe 10: scheduler x traversal matrix on the 256-primitive stress
scene. Hypothesis: the block-culled traversal (ops/accel.py) lost under the
regen/sorted schedulers because path regeneration decorrelates the rays in
a tile; the lockstep scheduler keeps a tile's rays coherent (same pixel
block, same bounce), so the per-block any() culls may actually fire."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel as PK

    print(f"backend: {jax.default_backend()}", flush=True)
    scene = load_scene("stress:256")
    pose = Camera().pose()

    def bench(mode, accel, n=24, reps=3):
        f = jax.jit(PK.make_render_frame(scene, mode=mode, accel=accel))
        _c, _v, _t, r = f(pose, np.uint32(5), np.int32(0))
        jax.device_get(r)
        meds = []
        for _ in range(reps):
            tot = None
            t0 = time.perf_counter()
            for k in range(n):
                _c, _v, _t, r = f(pose, np.uint32(100 + k), np.int32(k))
                tot = r if tot is None else tot + r
            rays = float(jax.device_get(tot))
            dt = (time.perf_counter() - t0) / n
            meds.append(rays / n / dt / 1e6)
        return statistics.median(meds)

    for mode, accel in (("sorted", "baked"), ("sorted", "grid"),
                        ("regen", "grid"), ("lockstep", "baked"),
                        ("lockstep", "grid")):
        med = bench(mode, accel)
        print(f"{mode:9s} {accel:6s}: {med:.1f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
