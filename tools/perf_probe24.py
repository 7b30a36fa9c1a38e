"""Round-5 probe: does FUSING the two NEE shadow sweeps buy wall time?

VERDICT r4 #3's structural candidate: "amortize each primitive's operand
load across multiple ray payloads per sweep". At the north-star scene the
primitive operands are compile-time constants (baked traversal), so the
only amortizable work is the ORIGIN-dependent subexpressions the two
shadow rays share (both cast from p + normal*eps): the sphere's oc and
|oc|^2 - r^2, the plane's dot(point - o, normal), the triangle's
s = o - v0 and q = cross(s, edge1) — ~50 vector ops/iteration at Cornell
(3 spheres x ~8 + 6 planes x ~1 + 2 tris x ~10 of a ~1,100-op iteration,
i.e. <= ~5% of ops and, at the measured op-elasticity of round 4's cut
(-7.3% ops -> +1% wall), <= ~0.7% expected wall).

The fused path (PathTracer fuse_nee / tracer.FUSE_NEE -> direct_light's
deferred accumulation -> geometry.occluded2) hoists those subexpressions
explicitly; output is BIT-IDENTICAL (tests/test_pallas.py fuse block).
Two live hypotheses only a hardware A/B separates:

  (a) Mosaic's CSE already shares them across the two occluded() calls
      (identical subgraphs, same operands) -> fused == unfused;
  (b) it does not (the calls sit far apart in the schedule) -> fused wins
      the op delta, i.e. <= ~1%.

Either way the 2400-bar verdict stands or falls on the number, not the
inspection — this probe records it.

    python tools/perf_probe24.py [--frames 480] [--reps 3]

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
    ap.add_argument("--frames", type=int, default=480)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel
    from terminal_raytracer_tpu.ops import tracer as tracer_mod

    pose = np.asarray(Camera().pose(), np.float32)
    scene = load_scene("Cornell_Box").with_overrides(
        samples_per_pixel=16, max_depth=32)  # north-star params

    def timed(frame_fn):
        out = frame_fn(1)
        jax.device_get(out[0])  # warm-up + compile
        meds = []
        f = 2
        for _ in range(args.reps):
            sync = []
            t0 = time.perf_counter()
            for _ in range(args.frames):
                sync.append(frame_fn(f)[0])
                f += 1
            total = float(sum(jax.device_get(sync)))
            dt = time.perf_counter() - t0
            meds.append((total / dt / 1e6, dt / args.frames * 1e3))
        return meds

    def report(label, meds):
        mray = [m for m, _ in meds]
        ms = [t for _, t in meds]
        reps = "/".join(f"{m:.0f}" for m in mray)
        print(f"  {label:12s}: median {statistics.median(mray):7.1f} Mray/s"
              f"  {statistics.median(ms):6.3f} ms/frame  (reps {reps})",
              flush=True)

    # Interleave nothing: one build+measure per arm, unfused first (the
    # shipped default), fused second, same session.
    for label, flag in (("unfused", False), ("fused", True)):
        tracer_mod.FUSE_NEE = flag
        render = jax.jit(pallas_kernel.make_sorted_render_frame(scene))

        def frame(f, render=render):
            out = render(pose, np.uint32(1 + f), np.int32(f))
            return out[3], out[0]

        report(label, timed(frame))
    tracer_mod.FUSE_NEE = False


if __name__ == "__main__":
    main()
