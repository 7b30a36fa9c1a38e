"""Round-3 probe: north-star sorted-pipeline phase decomposition.

Times, at the north-star config (Cornell 400x200, 16 spp, depth 32):
  (a) base_fn alone (kernel A),
  (b) base_fn + variance/budget math (no compaction, no kernel B),
  (c) the full sorted render_frame,
  (d) extra_phase alone on a frozen (state, additional) input
      (glue + kernel B; note XLA may overlap less here than in (c)).

The differences locate the remaining wall-clock: kernel A vs sort/compact
glue vs kernel B. Run on v5e; one TPU process; exits cleanly.

    python tools/perf_probe13.py [--frames 24] [--reps 3]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from terminal_raytracer_tpu.models import Camera, load_scene
    from terminal_raytracer_tpu.ops import pallas_kernel
    from terminal_raytracer_tpu.ops import tracer as tracer_mod

    scene = load_scene("Cornell_Box").with_overrides(
        samples_per_pixel=16, max_depth=32
    )
    pose = np.asarray(Camera().pose(), np.float32)

    base_fn, tracer, pair = pallas_kernel.make_base_kernel(scene)
    extra_phase = pallas_kernel.make_sorted_extra_phase(
        scene, h_out=scene.height, samp0_base=tracer.base_samples
    )
    full = pallas_kernel.make_sorted_render_frame(scene)

    def timeit(fn, label, make_args):
        outs = fn(*make_args(1))
        jax.device_get(jax.tree_util.tree_leaves(outs)[-1])
        meds = []
        f = 2
        for _ in range(args.reps):
            sync = []
            t0 = time.perf_counter()
            for _ in range(args.frames):
                outs = fn(*make_args(f))
                sync.append(jax.tree_util.tree_leaves(outs)[-1])
                f += 1
            jax.device_get(sync)
            meds.append((time.perf_counter() - t0) / args.frames * 1e3)
        m = statistics.median(meds)
        print(f"{label:42s} {m:7.3f} ms/frame "
              f"(reps {', '.join(f'{x:.3f}' for x in meds)})", flush=True)
        return m

    @jax.jit
    def run_base(seed, frame):
        csum, csumsq, state, rays, it = base_fn(pose, seed, frame)
        return jnp.sum(rays)

    @jax.jit
    def run_base_budget(seed, frame):
        csum, csumsq, state, rays, it = base_fn(pose, seed, frame)
        var = tracer.variance_of(csum, csumsq)
        needs, additional = tracer.extra_quota(var)
        return jnp.sum(rays) + jnp.sum(additional)

    @jax.jit
    def run_full(seed, frame):
        cur, var, tot, rays, occ = full(pose, seed, frame)
        return rays

    t_a = timeit(run_base, "(a) kernel A only",
                 lambda f: (np.uint32(f), np.int32(f)))
    t_b = timeit(run_base_budget, "(b) A + variance/budget",
                 lambda f: (np.uint32(f), np.int32(f)))
    t_c = timeit(run_full, "(c) full sorted pipeline",
                 lambda f: (np.uint32(f), np.int32(f)))

    # Frozen inputs for the extra phase: one real base render's state +
    # budgets.
    @jax.jit
    def mk_inputs(seed, frame):
        csum, csumsq, state, rays, it = base_fn(pose, seed, frame)
        var = tracer.variance_of(csum, csumsq)
        needs, additional = tracer.extra_quota(var)
        return state, additional

    state0, add0 = mk_inputs(np.uint32(3), np.int32(3))
    state0 = jax.device_get(state0)
    add0 = jax.device_get(add0)
    print(f"    frozen budget: {float(np.sum(add0)):.3e} extra samples, "
          f"{float((add0 > 0).mean()) * 100:.1f}% pixels needy", flush=True)

    @jax.jit
    def run_extra(seed, frame):
        esum, rays_b, it_b = extra_phase(pose, jnp.asarray(state0),
                                         jnp.asarray(add0))
        return rays_b

    t_d = timeit(run_extra, "(d) glue + kernel B (frozen input)",
                 lambda f: (np.uint32(f), np.int32(f)))

    print(f"\nimplied: kernel A {t_a:.3f} | budget math {t_b - t_a:+.3f} | "
          f"glue+B (c-b) {t_c - t_b:.3f} | standalone glue+B {t_d:.3f}",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
