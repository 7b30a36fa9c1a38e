#!/usr/bin/env python
"""Perf probe 8: pair (pixels per lane) and tile-shape scan for the
packed-stream sorted pipeline at the north-star config. The pair>8 and
tile-shape numbers in NOTES predate the packed stream (band layout, whose
tail costs differed) — re-measure on the current kernel."""

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
    scene = load_scene("Cornell_Box").with_overrides(
        width=400, height=200, samples_per_pixel=16, max_depth=32
    )
    pose = Camera().pose()

    def bench(tile_h, pair, n=48, reps=5):
        f = jax.jit(
            PK.make_sorted_render_frame(scene, tile_h=tile_h, pair=pair)
        )
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
        return statistics.median(meds), meds

    import sys as _sys
    combos = ((16, 8), (16, 12), (16, 16), (16, 6),
              (8, 8), (8, 16), (32, 8))
    if len(_sys.argv) > 1:
        combos = tuple(
            tuple(map(int, c.split(","))) for c in _sys.argv[1:]
        )
    for tile_h, pair in combos:
        med, reps = bench(tile_h, pair)
        print(f"tile_h={tile_h} pair={pair}: {med:.0f} Mray/s "
              f"(reps {[f'{m:.0f}' for m in reps]})", flush=True)


if __name__ == "__main__":
    main()
