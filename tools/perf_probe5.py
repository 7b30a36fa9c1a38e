#!/usr/bin/env python
"""Perf probe 5: decompose the sorted pipeline's extra phase at the
north-star config — glue+fixed-tile cost (all-zero budgets) vs real work
(budgets from an actual frame)."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, s0, n=48, reps=3):
    import jax
    import jax.numpy as jnp

    s = jnp.asarray(s0, jnp.uint32)
    s = fn(s)
    jax.device_get(s)
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

    scene = load_scene("Cornell_Box").with_overrides(
        samples_per_pixel=16, max_depth=32
    )
    base_fn, tracer, k = pallas_kernel.make_base_kernel(scene)
    ep = pallas_kernel.make_sorted_extra_phase(scene)

    @jax.jit
    def base_stats(seed):
        csum, csumsq, state, rays, _it = base_fn(pose, seed, frame)
        var = tracer.variance_of(csum, csumsq)
        needs, add = tracer.extra_quota(var)
        return state, add

    state, add = base_stats(np.uint32(7))
    add_np = np.asarray(jax.device_get(add))
    nz = int((add_np > 0).sum())
    print(f"real budgets: {nz} / {add_np.size} pixels nonzero, "
          f"sum={add_np.sum():.0f}, max={add_np.max():.0f}", flush=True)

    for label, add_in in (("zero", jnp.zeros_like(add)), ("real", add)):
        @jax.jit
        def run_ep(seed, add_in=add_in):
            esum, rays, _it = ep(pose, state, add_in)
            acc = jnp.sum(esum.x[:1, :1]) + rays + seed.astype(jnp.float32)
            return acc.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

        t = timeit(run_ep, 7)
        print(f"extra_phase[{label} budgets]: {t:.3f} ms", flush=True)

    # Glue-only reference: order + gather + pad + scatter with NO kernel B
    # (approximates the pure XLA cost of the compaction).
    h, w = scene.height, scene.width

    @jax.jit
    def run_glue(seed):
        add_flat = add.reshape(-1)
        order = jnp.argsort(-add_flat)
        st = state.reshape(-1)[order]
        xs = jnp.arange(h * w, dtype=jnp.int32)[order]
        back = (
            jnp.zeros((h * w,), jnp.float32)
            .at[order % (h * w)]
            .add(st.astype(jnp.float32) + xs.astype(jnp.float32))
        )
        acc = jnp.sum(back[:1]) + seed.astype(jnp.float32)
        return acc.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

    t = timeit(run_glue, 7)
    print(f"sort+gather+scatter glue alone: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
