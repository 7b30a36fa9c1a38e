"""Round-3 probe: work-pairing (`pair`) at MANY-PRIMITIVE scales.

Hypothesis: at stress:N the per-iteration cost is dominated by the O(N)
array sweep (~35 vector ops per primitive), so the paired_step's O(pair)
park/seed select block — which capped pair at 8 for the north star
(pair=25 regressed 19%, NOTES.md) — is NEGLIGIBLE here. Higher pair sums
more iid pixel workloads per lane, tightening the per-lane work
distribution, so the measured 27.9% occupancy at stress:1024 should rise
toward the north star's 63-71% nearly for free.

Measures the full sorted pipeline (accel='array', u8) at stress:256 and
stress:1024 for pair in (8, 16, 32, 64): Mray/s + measured occupancy +
exact ray-count agreement across pairs (pairing is bit-compatible).

    python tools/perf_probe14.py [--frames 24] [--reps 3]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def bench_case(scene, pair, frames, reps):
    import jax

    from terminal_raytracer_tpu.models import Camera
    from terminal_raytracer_tpu.ops import pallas_kernel

    pose = Camera().pose()
    t0 = time.time()
    render = jax.jit(pallas_kernel.make_sorted_render_frame(
        scene, pair=pair, accel="array"))
    out = render(pose, np.uint32(1), np.int32(0))
    rays0 = float(jax.device_get(out[3]))
    occ = float(jax.device_get(out[4]))
    compile_s = time.time() - t0

    mrays = []
    frame = 1
    for _ in range(reps):
        counts = []
        t0 = time.perf_counter()
        for _ in range(frames):
            out = render(pose, np.uint32(1 + frame), np.int32(frame))
            counts.append(out[3])
            frame += 1
        total = float(sum(jax.device_get(counts)))
        dt = time.perf_counter() - t0
        mrays.append(total / dt / 1e6)
    return statistics.median(mrays), occ, compile_s, rays0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", default="256,1024")
    ap.add_argument("--pairs", default="8,16,32,64")
    args = ap.parse_args()

    from terminal_raytracer_tpu.models import load_scene

    for n in [int(s) for s in args.sizes.split(",")]:
        scene = load_scene(f"stress:{n}")
        rays = {}
        for pair in [int(p) for p in args.pairs.split(",")]:
            m, occ, c, r0 = bench_case(scene, pair, args.frames, args.reps)
            rays[pair] = r0
            print(f"stress:{n:5d} pair={pair:<3d}: {m:7.1f} Mray/s  "
                  f"occ {occ:5.1%}  (compile {c:5.1f}s)", flush=True)
        vals = set(rays.values())
        print(f"stress:{n:5d} rays "
              f"{'==' if len(vals) == 1 else f'MISMATCH {rays}'}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
