"""Round-4 probe: what does the image-texture channel actually COST?

The `textured` bench row reads 791 Mray/s at north-star params, but the
scene is open (27.9 rays/px vs Cornell's 103) so the row alone cannot
separate "open scene, short paths" from "per-iteration atlas gathers are
expensive". This probe renders THE SAME textured scene twice — as-is, and
with every texture reference stripped (geometry, colors, lighting
identical; `has_texture` False compiles the reference-exact program) — at
protocol length in one session. The Mray/s ratio IS the channel's price.

If the gather dominates, the candidate fix is a one-hot matmul gather
(MXU does the row select) — probe21 timed that variant on a toy (N,8)
table; this probe re-times it at the REAL shape (the 64-row packed i32
atlas of two 64x64 textures) inside the shipped kernel geometry.

    python tools/perf_probe22.py [--frames 192] [--reps 3]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def strip_textures(scene):
    """The same scene with every texture reference removed — geometry,
    colors, lights untouched; has_texture becomes False so the build
    compiles the reference-exact (gather-free) program."""
    def strip(prims):
        return tuple(
            p._replace(material=p.material._replace(texture=None))
            for p in prims
        )

    return dataclasses.replace(
        scene,
        spheres=strip(scene.spheres),
        planes=strip(scene.planes),
        triangles=strip(scene.triangles),
        textures=(),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel

    pose = np.asarray(Camera().pose(), np.float32)
    base = load_scene("textured").with_overrides(
        samples_per_pixel=16, max_depth=32)

    def timed(frame_fn):
        out = frame_fn(1)
        jax.device_get(out[0])
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
            meds.append((total / dt / 1e6,
                         dt / args.frames * 1e3))
        return meds

    def report(label, meds):
        mray = [m for m, _ in meds]
        ms = [t for _, t in meds]
        reps = "/".join(f"{m:.0f}" for m in mray)
        print(f"  {label:12s}: median {statistics.median(mray):7.1f} Mray/s"
              f"  {statistics.median(ms):6.3f} ms/frame  (reps {reps})",
              flush=True)

    for label, scene in (("textured", base),
                         ("stripped", strip_textures(base))):
        render = jax.jit(pallas_kernel.make_sorted_render_frame(scene))

        def frame(f, render=render):
            out = render(pose, np.uint32(1 + f), np.int32(f))
            return out[3], out[0]

        report(label, timed(frame))


if __name__ == "__main__":
    main()
