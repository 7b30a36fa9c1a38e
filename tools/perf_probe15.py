"""Round-3 probe: stress-scale phase decomposition (sorted pipeline,
accel='array').

probe14 showed pairing can't lift stress occupancy past ~27% (pair 8-64
all land 17-33 Mray/s at occ 17-27%). This probe locates the idle sweeps:

  (a) base_fn alone — kernel A time + BASE-ONLY occupancy,
  (c) full sorted render_frame — pipeline time + occupancy,
  plus the needy-pixel fraction and the base/extra ray split.

If kernel A's own occupancy is already ~25%, the tail is per-PIXEL
workload outliers (deep mirror paths) that pairing provably can't fix;
if kernel A is fine and the pipeline number collapses, the extra phase's
entry stream is the drag. Run on v5e; one TPU process; exits cleanly.

    python tools/perf_probe15.py [--frames 24] [--reps 3]
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
    ap.add_argument("--sizes", default="256,1024")
    ap.add_argument("--pair", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel

    pose = np.asarray(Camera().pose(), np.float32)

    def timed(fn, label):
        out = fn(np.uint32(1), np.int32(0))
        jax.device_get(jax.tree_util.tree_leaves(out)[-1])
        meds = []
        f = 2
        for _ in range(args.reps):
            sync = []
            t0 = time.perf_counter()
            for _ in range(args.frames):
                out = fn(np.uint32(1 + f), np.int32(f))
                sync.append(jax.tree_util.tree_leaves(out)[-1])
                f += 1
            jax.device_get(sync)
            meds.append((time.perf_counter() - t0) / args.frames * 1e3)
        return statistics.median(meds), out

    for n in [int(s) for s in args.sizes.split(",")]:
        scene = load_scene(f"stress:{n}")
        base_fn, tracer, pair = pallas_kernel.make_base_kernel(
            scene, accel="array", pair=args.pair)
        spi = 1.0 + float(tracer.n_lights)

        @jax.jit
        def base_only(seed, frame):
            csum, csumsq, state, rays, it = base_fn(pose, seed, frame)
            r = jnp.sum(rays)
            var = tracer.variance_of(csum, csumsq)
            needs, additional = tracer.extra_quota(var)
            return (r / jnp.maximum(it * spi, 1.0), jnp.mean(needs),
                    jnp.mean(additional), r)

        full = jax.jit(pallas_kernel.make_sorted_render_frame(
            scene, accel="array", pair=args.pair))

        def full_fn(seed, frame):
            out = full(pose, seed, frame)
            return out[3], out[4]  # rays, occ

        ms_a, out_a = timed(base_only, "base")
        occ_a, needy, add_mean, rays_a = [float(jax.device_get(x))
                                          for x in out_a]
        ms_c, out_c = timed(full_fn, "full")
        rays_c, occ_c = [float(jax.device_get(x)) for x in out_c]
        print(f"stress:{n:5d} pair={args.pair} base : {ms_a:6.2f} ms  "
              f"occ {occ_a:5.1%}  needy {needy:5.1%}  "
              f"mean extra budget {add_mean:4.1f}", flush=True)
        print(f"stress:{n:5d} pair={args.pair} full : {ms_c:6.2f} ms  "
              f"occ {occ_c:5.1%}  extra share of rays "
              f"{(rays_c - rays_a) / rays_c:5.1%}  "
              f"extra inline cost {ms_c - ms_a:6.2f} ms  "
              f"-> {rays_c / ms_c / 1e3:6.1f} Mray/s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
