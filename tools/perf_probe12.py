"""Round-3 probe (VERDICT r2 #7): does sorting the base-phase pixel stream
by the PREVIOUS frame's measured per-pixel path length beat the dense
row-major packed stream?

Rationale: phase-1 occupancy is bounded (~40%) by per-path length variance
within a tile. Temporal per-PATH correlation is dead (0.10, NOTES.md), but
the per-PIXEL mean length is geometry-driven (mirror pixels trace long,
wall pixels short) and spatially stable — grouping pixels of similar
expected length into the same tile should cut each tile's
slowest-lane-bound iteration count.

Method: the packed-stream base kernel at pair=1 reads its entry coords
wholly from the xs0/ys0 operand planes (at pair>1 entry advance is
arithmetic, so only pair=1 permutes freely). Frame 0 renders dense and
yields per-lane ray counts; the probe then times `frames` frames with
(a) the dense stream, (b) the stream sorted by frame-0 ray counts
descending — same seeds, bit-identical totals — and (c) the shipped
pair=8 dense reference. Reports Mray/s + measured occupancy for each.

Run on v5e: python tools/perf_probe12.py [--frames 24] [--reps 3]
One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; axon "
                         "overrides JAX_PLATFORMS so this must be a "
                         "config update before any jax use)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel

    scene = load_scene("Cornell_Box").with_overrides(
        samples_per_pixel=args.spp, max_depth=args.depth,
        width=args.width, height=args.height,
    )
    pose = Camera().pose()
    n_lights = 2  # Cornell: two emissive triangles

    def bench_stream(pair, xs0, ys0, label):
        base_fn, tracer, _ = pallas_kernel.make_base_kernel(scene, pair=pair)
        call = base_fn.call
        sweeps = 1.0 + n_lights

        @jax.jit
        def run(xs0, ys0, seed, frame):
            bands = call(
                jnp.asarray(pose, jnp.float32),
                jnp.asarray(seed, jnp.uint32).reshape((1,)),
                jnp.asarray(frame, jnp.int32).reshape((1,)),
                jnp.asarray(0, jnp.int32).reshape((1,)),
                xs0, ys0,
            )
            rays = sum(jnp.sum(bands[8 * e + 7]) for e in range(pair))
            iters = jnp.sum(bands[8 * pair])
            return rays, iters

        xs0 = jnp.asarray(xs0)
        ys0 = jnp.asarray(ys0)
        r, it = jax.device_get(run(xs0, ys0, np.uint32(1), np.int32(0)))
        mrays, occs = [], []
        f = 1
        for _ in range(args.reps):
            outs = []
            t0 = time.perf_counter()
            for _ in range(args.frames):
                outs.append(run(xs0, ys0, np.uint32(1 + f), np.int32(f)))
                f += 1
            vals = jax.device_get(outs)
            dt = time.perf_counter() - t0
            total = sum(float(r) for r, _ in vals)
            iters = sum(float(i) for _, i in vals)
            mrays.append(total / dt / 1e6)
            occs.append(total / (iters * sweeps))
        m = statistics.median(mrays)
        print(f"{label:24s} {m:8.1f} Mray/s | occ {100*statistics.median(occs):5.1f}% "
              f"(reps {', '.join(f'{x:.0f}' for x in mrays)})", flush=True)
        return m

    # Dense coords at pair=1 (lane L = flat pixel L, padded rows inert).
    base_fn1, _t, _p = pallas_kernel.make_base_kernel(scene, pair=1)
    xs0_d, ys0_d = base_fn1.coords
    h, w = scene.height, scene.width
    n_lanes = xs0_d.size

    bench_stream(1, xs0_d, ys0_d, "pair=1 dense")

    # Frame-0 per-pixel ray counts (dense order) -> sorted permutation.
    call1 = base_fn1.call
    bands = call1(
        jnp.asarray(pose, jnp.float32),
        jnp.asarray(np.uint32(1)).reshape((1,)),
        jnp.asarray(np.int32(0)).reshape((1,)),
        jnp.asarray(np.int32(0)).reshape((1,)),
        jnp.asarray(xs0_d), jnp.asarray(ys0_d),
    )
    rays_lane = np.asarray(jax.device_get(bands[7])).reshape(-1)
    real = ys0_d.reshape(-1) < h
    order = np.argsort(-np.where(real, rays_lane, -1.0), kind="stable")
    xs0_s = xs0_d.reshape(-1)[order].reshape(xs0_d.shape)
    ys0_s = ys0_d.reshape(-1)[order].reshape(ys0_d.shape)
    bench_stream(1, xs0_s, ys0_s, "pair=1 sorted(prev rays)")

    # Shipped reference: pair=8 dense.
    base_fn8, _t8, pair8 = pallas_kernel.make_base_kernel(scene)
    xs0_8, ys0_8 = base_fn8.coords
    bench_stream(pair8, xs0_8, ys0_8, f"pair={pair8} dense (shipped)")


if __name__ == "__main__":
    sys.exit(main())
