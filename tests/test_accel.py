"""Block-culled traversal (ops/accel.py): structural invariants of the
blocked reorder, output-invariance of culling (dense blocked == culled
Pallas, exact), and full-pipeline agreement on a many-primitive scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from terminal_raytracer_tpu.models import Camera, load_scene
from terminal_raytracer_tpu.models.gen import stress_scene
from terminal_raytracer_tpu.ops import accel as accel_mod
from terminal_raytracer_tpu.ops import geometry as geom
from terminal_raytracer_tpu.ops.vecmath import V3
from terminal_raytracer_tpu.runtime import init_state, make_render_step

POSE = Camera().pose()


def small_stress(n=48):
    # 48 primitives: small enough to compile fast on CPU, big enough for
    # several guarded blocks; accel='grid' is forced explicitly in the
    # render tests (the auto threshold is covered by test_auto_threshold,
    # which only constructs tracers).
    return stress_scene(n, seed=3, width=64, height=16,
                        samples_per_pixel=4, max_depth=2)


def test_blocked_scene_structure():
    scene = small_stress(96)  # structure-only: no compile
    scene2, groups = accel_mod.blocked_scene(scene)
    # Same real primitives (padding only adds far-away inert spheres).
    real = [s for s in scene2.spheres if s.center[0] != accel_mod._PAD_POS]
    assert sorted(map(repr, real)) == sorted(map(repr, scene.spheres))
    assert len(scene2.spheres) % accel_mod.BLOCK == 0
    # Light order preserved exactly (RNG-gate parity).
    assert scene2.lights == scene.lights
    # Guarded groups have finite AABBs covering their real members.
    for g in groups:
        if g.aabb is None:
            continue
        lo, hi = np.array(g.aabb[0]), np.array(g.aabb[1])
        assert np.all(lo < hi)
        assert np.all(np.abs(lo) < 1e6) and np.all(np.abs(hi) < 1e6)


def test_dense_blocked_matches_original_order():
    """Reordering affects only tie resolution (strictly-closer-wins), so a
    full render over the blocked scene matches the original order."""
    scene = small_stress(48)
    step_a = make_render_step(scene, backend="jnp", accel="baked")
    step_b = make_render_step(scene, backend="jnp", accel="grid")  # dense fallback
    a = step_a(init_state(scene), POSE, np.uint32(5), np.int32(0))
    b = step_b(init_state(scene), POSE, np.uint32(5), np.int32(0))
    np.testing.assert_allclose(
        np.asarray(a.state.acc), np.asarray(b.state.acc), atol=1e-6
    )
    assert float(a.rays) == float(b.rays)


def test_culled_pallas_matches_oracle():
    """The pl.when-gated culled traversal (interpret mode) matches the
    dense jnp oracle on the same blocked order: culling is output-invariant
    per lane, so ray counts and adaptive budgets are EXACTLY equal; the
    radiance tolerance covers fma-contraction differences between the two
    program structures amplified through the bounce recursion (the same
    equivalence class as bench.py's on-TPU gate, maxrel < 5e-3)."""
    scene = small_stress(48)
    step_j = make_render_step(scene, backend="jnp", accel="grid")
    step_p = make_render_step(scene, backend="pallas", accel="grid")
    a = step_j(init_state(scene), POSE, np.uint32(9), np.int32(0))
    b = step_p(init_state(scene), POSE, np.uint32(9), np.int32(0))
    assert float(a.rays) == float(b.rays)
    np.testing.assert_allclose(
        np.asarray(a.state.acc), np.asarray(b.state.acc),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(a.state.samples), np.asarray(b.state.samples)
    )


def test_accel_selection():
    from terminal_raytracer_tpu.ops.arrayscene import ArrayPrims
    from terminal_raytracer_tpu.ops.tracer import PathTracer

    # auto == baked at shipped scale, the array-resident sweep above the
    # primitive-count threshold (see PathTracer.__init__); culling never
    # wins (measured, tools/perf_probe3.py) so 'grid' stays opt-in.
    small = load_scene("Cornell_Box")
    assert isinstance(PathTracer(small).prims, geom.ScenePrims)
    big = small_stress(96)  # 96 spheres + 1 plane > ARRAY_AUTO_THRESHOLD
    assert isinstance(PathTracer(big).prims, ArrayPrims)
    assert isinstance(PathTracer(big, accel="baked").prims, geom.ScenePrims)
    assert isinstance(PathTracer(big, accel="grid").prims,
                      accel_mod.CulledPrims)


def test_slab_any_conservative():
    """No false culls: random rays vs a box — whenever a sphere inside the
    box is hit, the slab test must pass."""
    rng = np.random.RandomState(0)
    lo, hi = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)
    o = V3(*(jnp.asarray(rng.uniform(-4, 4, 256), jnp.float32)
             for _ in range(3)))
    d_np = rng.normal(size=(3, 256)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=0, keepdims=True)
    d = V3(*(jnp.asarray(c) for c in d_np))
    # Axis-parallel rays too (zero direction components).
    t = geom.intersect_sphere(o, d, V3(0.0, 0.0, 0.0), 0.9, 1e-3, 1e10)
    hit = np.asarray(t) > 0
    # Per-lane slab pass reimplemented here via _slab_any on single lanes.
    for i in np.where(hit)[0][:50]:
        oi = V3(o.x[i:i+1], o.y[i:i+1], o.z[i:i+1])
        di = V3(d.x[i:i+1], d.y[i:i+1], d.z[i:i+1])
        ok = accel_mod._slab_any(
            oi, di, 1e-3, jnp.asarray([1e10], jnp.float32), (lo, hi), None
        )
        assert bool(ok), f"false cull for lane {i}"
