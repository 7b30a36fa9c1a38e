"""Round-3 probe: array-resident sweep (ops/arrayscene.py) vs the unrolled
baked sweep on real TPU — Mosaic validation + the accel='auto' crossover.

Measures Mray/s for stress:N at N in (64, 128, 256, 512, 1024) with
accel='baked' (where it compiles in reasonable time) and accel='array',
plus a correctness spot-check (ray counts must match exactly between the
two on the same seeds). Run on v5e:

    python tools/perf_probe11.py [--frames 24] [--reps 3]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def bench_case(scene, accel, frames, reps):
    import jax

    from terminal_raytracer_tpu.models import Camera
    from terminal_raytracer_tpu.runtime import init_state, make_render_step

    pose = Camera().pose()
    t0 = time.time()
    step = make_render_step(scene, full_color=True, backend="pallas",
                            accel=accel)
    state = init_state(scene)
    out = step(state, pose, np.uint32(1), np.int32(0))
    rays0 = float(jax.device_get(out.rays))
    compile_s = time.time() - t0
    state = out.state

    mrays = []
    frame = 1
    for _ in range(reps):
        counts = []
        t0 = time.perf_counter()
        for _ in range(frames):
            out = step(state, pose, np.uint32(1 + frame), np.int32(frame))
            state = out.state
            counts.append(out.rays)
            frame += 1
        total = float(sum(jax.device_get(counts)))
        dt = time.perf_counter() - t0
        mrays.append(total / dt / 1e6)
    return statistics.median(mrays), compile_s, rays0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", default="64,128,256,512,1024")
    ap.add_argument("--skip-baked-above", type=int, default=300,
                    help="baked compile time explodes O(N); skip above")
    ap.add_argument("--unrolls", default="1,4,8",
                    help="array-sweep fori unroll factors to measure")
    args = ap.parse_args()

    from terminal_raytracer_tpu.models import load_scene
    from terminal_raytracer_tpu.ops import arrayscene

    unrolls = [int(u) for u in args.unrolls.split(",")]
    for n in [int(s) for s in args.sizes.split(",")]:
        scene = load_scene(f"stress:{n}")
        rays = {}
        if n <= args.skip_baked_above:
            m, c, r0 = bench_case(scene, "baked", args.frames, args.reps)
            rays["baked"] = r0
            print(f"stress:{n:5d} baked    : {m:7.1f} Mray/s "
                  f"(compile {c:5.1f}s)", flush=True)
        for u in unrolls:
            arrayscene.DEFAULT_UNROLL = u
            m, c, r0 = bench_case(scene, "array", args.frames, args.reps)
            rays[f"array u{u}"] = r0
            print(f"stress:{n:5d} array u{u:<2d}: {m:7.1f} Mray/s "
                  f"(compile {c:5.1f}s)", flush=True)
        arrayscene.DEFAULT_UNROLL = 1
        vals = set(rays.values())
        print(f"stress:{n:5d} rays "
              f"{'==' if len(vals) == 1 else f'MISMATCH {rays}'}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
