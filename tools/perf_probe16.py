"""Round-3 probe: fold_budget A/B + stress extra-phase cost.

(1) North star + stress configs: the OLD pipeline (base kernel without
    the fold, variance/budget as XLA glue, extra phase, combine) vs the
    NEW make_sorted_render_frame (budget folded into kernel A's epilogue).
    Reconstructing the old glue from the same builders isolates the fold.
(2) Per-rep times printed (probe15's stress:256 base-vs-full numbers were
    internally inconsistent; this prints the spread instead of medians
    only).

    python tools/perf_probe16.py [--frames 24] [--reps 3]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel

    pose = np.asarray(Camera().pose(), np.float32)

    def timed(fn, label):
        out = fn(np.uint32(1), np.int32(0))
        rays0 = float(jax.device_get(out[0]))
        times, f = [], 2
        for _ in range(args.reps):
            sync = []
            t0 = time.perf_counter()
            for _ in range(args.frames):
                out = fn(np.uint32(1 + f), np.int32(f))
                sync.append(out[0])
                f += 1
            total = float(sum(jax.device_get(sync)))
            times.append((time.perf_counter() - t0) / args.frames * 1e3)
        mr = total / (times[-1] * args.frames) / 1e3
        reps = "/".join(f"{t:.2f}" for t in times)
        print(f"  {label:18s}: [{reps}] ms  last-rep {mr:7.1f} Mray/s",
              flush=True)

    def old_pipeline(scene, accel, pair):
        base_fn, tracer, _p = pallas_kernel.make_base_kernel(
            scene, accel=accel, pair=pair)
        extra_phase = pallas_kernel.make_sorted_extra_phase(
            scene, h_out=scene.height, samp0_base=tracer.base_samples,
            accel=accel)

        @jax.jit
        def frame(seed, fnum):
            csum, csumsq, state, rays_a, _it = base_fn(pose, seed, fnum)
            var = tracer.variance_of(csum, csumsq)
            needs, additional = tracer.extra_quota(var)
            esum, rays_b, _it_b = extra_phase(pose, state, additional)
            current, total = tracer.combine_phases(csum, esum, needs,
                                                   additional)
            return jnp.sum(rays_a) + rays_b, current

        return frame

    def new_pipeline(scene, accel, pair):
        render = jax.jit(pallas_kernel.make_sorted_render_frame(
            scene, accel=accel, pair=pair))

        def frame(seed, fnum):
            out = render(pose, seed, fnum)
            return out[3], out[0]

        return frame

    cases = [
        ("north star", load_scene("Cornell_Box").with_overrides(
            samples_per_pixel=16, max_depth=32), "auto", "auto"),
        ("stress:256", load_scene("stress:256"), "array", 8),
        ("stress:1024", load_scene("stress:1024"), "array", 8),
    ]
    for name, scene, accel, pair in cases:
        print(f"{name}:", flush=True)
        timed(old_pipeline(scene, accel, pair), "old (glue budget)")
        timed(new_pipeline(scene, accel, pair), "new (folded)")


if __name__ == "__main__":
    sys.exit(main())
