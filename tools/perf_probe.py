#!/usr/bin/env python
"""Perf probe: time scheduler/glue variants of the Pallas pipeline on the
real TPU in ONE process (first-transfer cost paid once). Not part of the
benchmark contract — a development tool feeding NOTES.md.

Usage: python tools/perf_probe.py [--frames 48] [--reps 3]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def time_render(render_frame, frames, reps, pose):
    import jax

    out = render_frame(pose, np.uint32(1), np.int32(0))
    jax.device_get(out[3])
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rays = []
        for f in range(1, frames + 1):
            out = render_frame(pose, np.uint32(1 + f), np.int32(f))
            rays.append(out[3])
        total = float(sum(jax.device_get(rays)))
        dt = time.perf_counter() - t0
        meds.append(total / dt / 1e6)
    return statistics.median(meds), total / frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--config", default="north_star",
                    choices=["north_star", "cornell_shipped"])
    args = ap.parse_args()

    import jax

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel, sampling

    if args.config == "north_star":
        scene = load_scene("Cornell_Box").with_overrides(
            samples_per_pixel=16, max_depth=32
        )
    else:
        scene = load_scene("Cornell_Box")
    pose = Camera().pose()

    variants = {
        "sorted(argsort)": dict(mode="sorted"),
        "sorted(partition)": dict(mode="sorted", order_mode="partition"),
        "sorted(no-order)": dict(mode="sorted", order_mode="none"),
        "regen(1-kernel)": dict(mode="regen"),
    }

    results = {}
    for name, kw in variants.items():
        mode = kw.pop("mode")
        if mode == "sorted":
            rf = pallas_kernel.make_sorted_render_frame(scene, **kw)
        else:
            rf = pallas_kernel.make_render_frame(scene, mode=mode)
        rf = jax.jit(rf, static_argnames=())
        mray, rpf = time_render(rf, args.frames, args.reps, pose)
        results[name] = mray
        print(f"[probe] {name:20s} {mray:8.1f} Mray/s  ({rpf:.3e} rays/f)",
              flush=True)

    # sin/cos fusion experiment: sin(phi) from cos(phi) via sqrt + sign
    # (phi = 2*pi*r2, so sign(sin) = r2 < 0.5). Patch the samplers at trace
    # time and rebuild the default pipeline.
    import jax.numpy as jnp
    from terminal_raytracer_tpu.ops import rng as prng
    from terminal_raytracer_tpu.ops import vecmath as vm
    from terminal_raytracer_tpu.ops.vecmath import V3

    TWO_PI = sampling.TWO_PI

    def fused_sincos(r2):
        c = jnp.cos(TWO_PI * r2)
        s = jnp.sqrt(jnp.maximum(0.0, 1.0 - c * c))
        return c, jnp.where(r2 < 0.5, s, -s)

    orig_cos_hemi = sampling.cosine_hemisphere
    orig_sphere = sampling.sphere_light_point

    def cosine_hemisphere_fused(state, normal, gate=None):
        state, r1, r2 = prng.next_f32_pair(state, gate)
        cos_theta = jnp.sqrt(r1)
        sin_theta = jnp.sqrt(1.0 - r1)
        cphi, sphi = fused_sincos(r2)
        x = sin_theta * cphi
        y = sin_theta * sphi
        z = cos_theta
        w = vm.normalize(normal)
        u, v = sampling.orthonormal_basis(w)
        return state, vm.normalize(u * x + v * y + w * z)

    def sphere_light_point_fused(state, center, radius, gate=None):
        state, r1, r2 = prng.next_f32_pair(state, gate)
        cos_theta = 1.0 - 2.0 * r1
        sin_theta = jnp.sqrt(1.0 - cos_theta * cos_theta)
        cphi, sphi = fused_sincos(r2)
        local = V3(sin_theta * cphi, sin_theta * sphi, cos_theta)
        point = center + local * radius
        area = 4.0 * sampling.PI * radius * radius
        return state, point, local, area

    sampling.cosine_hemisphere = cosine_hemisphere_fused
    sampling.sphere_light_point = sphere_light_point_fused
    try:
        rf = pallas_kernel.make_sorted_render_frame(scene)
        rf = jax.jit(rf)
        mray, rpf = time_render(rf, args.frames, args.reps, pose)
        results["sorted+sincos-fused"] = mray
        print(f"[probe] {'sorted+sincos-fused':20s} {mray:8.1f} Mray/s  "
              f"({rpf:.3e} rays/f)", flush=True)
    finally:
        sampling.cosine_hemisphere = orig_cos_hemi
        sampling.sphere_light_point = orig_sphere

    best = max(results, key=results.get)
    print(f"[probe] best: {best} at {results[best]:.1f} Mray/s")


if __name__ == "__main__":
    main()
