#!/usr/bin/env python
"""Perf probe 4: where does the packed-stream base kernel's per-frame cost
go? Times, per config: the raw pallas_call (no glue), base_fn (with the
assemble glue), and the full sorted render_frame. Each timed call is
CHAINED through the seed (device-sequential), per CLAUDE.md."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, seed0, n=48, reps=3):
    """fn(seed u32 scalar array) -> u32 scalar array (chained)."""
    import jax
    import jax.numpy as jnp

    s = jnp.asarray(seed0, jnp.uint32)
    s = fn(s)
    jax.device_get(s)  # block_until_ready does not round-trip the tunnel
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        jax.device_get(s)
        meds.append((time.perf_counter() - t0) / n * 1e3)
    return statistics.median(meds)


def main():
    import jax
    import jax.numpy as jnp

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel

    pose = Camera().pose()
    frame = np.int32(1)
    print(f"backend: {jax.default_backend()}", flush=True)

    for name, ov in (
        ("cornell_80x40", dict(width=80, height=40, samples_per_pixel=1,
                               max_depth=4)),
        ("north_star", dict(samples_per_pixel=16, max_depth=32)),
    ):
        scene = load_scene("Cornell_Box").with_overrides(**ov)

        for pair in ("auto", 1):
            base_fn, tracer, k = pallas_kernel.make_base_kernel(scene,
                                                                pair=pair)
            raw = base_fn.call

            @jax.jit
            def run_raw(seed):
                outs = raw(
                    jnp.asarray(pose, jnp.float32),
                    seed.reshape((1,)),
                    jnp.asarray(frame, jnp.int32).reshape((1,)),
                    jnp.zeros((1,), jnp.int32),
                    jnp.asarray(base_fn.coords[0]),
                    jnp.asarray(base_fn.coords[1]),
                )
                acc = jnp.float32(0)
                for o in outs:
                    acc = acc + jnp.sum(o[:1, :1].astype(jnp.float32))
                return acc.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

            @jax.jit
            def run_base(seed):
                csum, csumsq, state, rays, _it = base_fn(pose, seed, frame)
                acc = jnp.sum(csum.x[:1, :1]) + jnp.sum(rays[:1, :1])
                return acc.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

            t_raw = timeit(run_raw, 7)
            t_base = timeit(run_base, 7)
            print(f"[{name}] pair={k}: raw kernel {t_raw:.3f} ms | "
                  f"base_fn(+glue) {t_base:.3f} ms", flush=True)

        rf = pallas_kernel.make_render_frame(scene)

        @jax.jit
        def run_rf(seed):
            cur, var, tot, rays = rf(pose, seed, frame)
            acc = jnp.sum(cur.x[:1, :1]) + rays
            return acc.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

        t_rf = timeit(run_rf, 7)
        print(f"[{name}] sorted render_frame {t_rf:.3f} ms", flush=True)


def _unused():
    main()

# -- appended: step-shaped overhead probe at tiny config -------------------
def step_probe():
    import jax
    import jax.numpy as jnp

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel, tonemap as tm
    from terminal_raytracer_tpu.ops.vecmath import V3

    pose = Camera().pose()
    frame = np.int32(1)
    scene = load_scene("Cornell_Box").with_overrides(
        width=80, height=40, samples_per_pixel=1, max_depth=4
    )
    rf = pallas_kernel.make_render_frame(scene)

    @jax.jit
    def run_steplike(seed):
        cur, var, tot, rays = rf(pose, seed, frame)
        acc = jnp.stack([cur.x, cur.y, cur.z]) * 0.5
        rgb = tm.tonemap_fullcolor(V3(acc[0], acc[1], acc[2]))
        s = (jnp.sum(rgb[:1, :1, 0].astype(jnp.float32)) + rays)
        return s.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

    t = timeit(run_steplike, 7)
    print(f"[cornell_80x40] step-shaped (rf+accum+tonemap): {t:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
    step_probe()
