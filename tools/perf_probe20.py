"""Round-4 probe: heavy-pixel chunk-split A/B matrix at stress scales.

The round-3 verdict item: stress-scale occupancy (23-28%) is bounded by
single heavy pixels whose sequential sample chains no lane assignment can
split (NOTES.md "measured dead ends"). The chunk-split is now implemented
with oracle-matched sub-chain RNG in BOTH phases (ops/tracer.py
CHUNK_GOLDEN): this probe measures the (chunk_base, chunk_extra) policy
matrix to set the 'auto' defaults from data.

probe17 (extra-only chunking, round 3) measured: extra chunk=2 LOSES at
stress:256 (42.0 vs 49.8) and wins ~11% at stress:1024 — the base phase
was the missing half (it is ~76% of owed rays).

    python tools/perf_probe20.py [--frames 96] [--reps 3]
    python tools/perf_probe20.py --sizes 256,1024 --combos none:none,2:none,...

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_case(scene, cb, ce, frames, reps, pair="auto"):
    import jax

    from terminal_raytracer_tpu.models import Camera
    from terminal_raytracer_tpu.ops import pallas_kernel

    pose = Camera().pose()
    t0 = time.time()
    render = jax.jit(pallas_kernel.make_sorted_render_frame(
        scene, accel="array", chunk_base=cb, chunk=ce, pair=pair))
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
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scenes", default="stress:256,stress:1024",
                    help="comma list of scene names")
    ap.add_argument(
        "--combos",
        default="none:none,2:none,none:2,2:2,1:none,1:1",
        help="comma list of chunk_base:chunk_extra (none = off)",
    )
    args = ap.parse_args()

    from terminal_raytracer_tpu.models import load_scene

    def tok(v):
        return None if v == "none" else int(v)

    for name in args.scenes.split(","):
        scene = load_scene(name)
        for combo in args.combos.split(","):
            parts = combo.split(":")
            b, e = parts[0], parts[1]
            pair = "auto" if len(parts) < 3 else int(parts[2])
            m, occ, c, r0 = bench_case(scene, tok(b), tok(e),
                                       args.frames, args.reps, pair=pair)
            print(
                f"{name:>14s} cb={b:>4s} ce={e:>4s} pair={pair!s:>4s}: "
                f"{m:7.1f} Mray/s  occ {occ:5.3f}  compile {c:5.1f}s  "
                f"rays0 {r0:.3e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
