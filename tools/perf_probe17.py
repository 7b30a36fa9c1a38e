"""Round-3 probe: chunk-split (turbo) extra phase at STRESS scales.

probe15/16 located the stress-scale drag: at stress:1024 the extra phase +
glue cost ~4.3 ms of the ~12 ms frame for only ~5% of the rays — a few
hundred needy entries (needy 1.6-2.6%, budget = spp-base = 4) deep-loop in
one tile while every iteration pays the full O(N)-primitive array sweep.

chunk-splitting (each entry's budget split into <=chunk-sample sub-entries
with their own RNG sub-chains) measured DEAD at the north star (the bigger
sorted stream cost more than it saved, NOTES.md) — but here the economics
invert: more parallel lanes => fewer scheduler iterations => fewer O(N)
sweeps, and the glue grows by a tiny fraction of the frame.

Measures the full sorted pipeline (accel='array', pair from the auto
heuristic) at stress:256 / stress:1024 for chunk in (None, 2, 1):
Mray/s + occupancy. chunk=None is the bit-parity baseline; chunked runs
are parity-modulo-RNG (documented turbo semantics).

    python tools/perf_probe17.py [--frames 24] [--reps 3]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_case(scene, chunk, frames, reps):
    import jax

    from terminal_raytracer_tpu.models import Camera
    from terminal_raytracer_tpu.ops import pallas_kernel

    pose = Camera().pose()
    t0 = time.time()
    render = jax.jit(pallas_kernel.make_sorted_render_frame(
        scene, accel="array", chunk=chunk))
    out = render(pose, np.uint32(1), np.int32(0))
    rays0 = float(jax.device_get(out[3]))
    compile_s = time.time() - t0

    mrays, occs = [], []
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
        occs.append(float(jax.device_get(out[4])))
    return statistics.median(mrays), occs[-1], compile_s, rays0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", default="256,1024")
    ap.add_argument("--chunks", default="none,2,1")
    args = ap.parse_args()

    from terminal_raytracer_tpu.models import load_scene

    for n in [int(s) for s in args.sizes.split(",")]:
        scene = load_scene(f"stress:{n}")
        for tok in args.chunks.split(","):
            chunk = None if tok == "none" else int(tok)
            m, occ, c, r0 = bench_case(scene, chunk, args.frames, args.reps)
            print(f"stress:{n:5d} chunk={tok:>4s}: {m:7.1f} Mray/s  "
                  f"occ {occ:5.1%}  (compile {c:5.1f}s, warm rays "
                  f"{r0 / 1e6:.2f}M)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
