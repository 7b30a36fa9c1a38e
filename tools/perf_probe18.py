"""Round-3 probe: fold_budget A/B at PROTOCOL length, static + dynamic.

probe16 (24f reps) showed the fold winning ~4% at the north star, but the
first full bench after shipping it measured north star 1920 (band 1850-
1985, was 1975) and dynamic 1307 (was 1499) — possibly session noise,
possibly a real dynamic-path regression (the folded epilogue adds two
output planes per entry to a kernel that also streams SMEM scene values).
This probe settles it: same session, 48 frames x 3 reps, fold on vs off,
north star + dynamic orbit at north-star params.

    python tools/perf_probe18.py [--frames 48] [--reps 3]

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
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.models.animate import (ANIMATOR_KEYS,
                                                       ANIMATORS)
    from terminal_raytracer_tpu.ops import pallas_kernel
    from terminal_raytracer_tpu.ops.dynamic import pack_scene

    pose = np.asarray(Camera().pose(), np.float32)
    scene = load_scene("Cornell_Box").with_overrides(
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
            meds.append(total / dt / 1e6)
        return meds

    def report(label, meds):
        reps = "/".join(f"{m:.0f}" for m in meds)
        print(f"  {label:11s}: median {statistics.median(meds):7.1f} Mray/s"
              f"  (reps {reps})", flush=True)

    print("north star (static):", flush=True)
    for fold in (False, True):
        render = jax.jit(pallas_kernel.make_sorted_render_frame(
            scene, fold_budget=fold))

        def frame(f, render=render):
            out = render(pose, np.uint32(1 + f), np.int32(f))
            return out[3], out[0]

        report(f"fold={fold}", timed(frame))

    print("dynamic (orbit animator, north-star params):", flush=True)
    arrays0 = pack_scene(scene)
    for fold in (False, True):
        render = jax.jit(pallas_kernel.make_sorted_render_frame(
            scene, dynamic=True, animated=ANIMATOR_KEYS["orbit"],
            fold_budget=fold))

        def frame(f, render=render):
            arrays = ANIMATORS["orbit"](arrays0, float(f))
            out = render(pose, np.uint32(1 + f), np.int32(f), arrays)
            return out[3], out[0]

        report(f"fold={fold}", timed(frame))


if __name__ == "__main__":
    sys.exit(main())
