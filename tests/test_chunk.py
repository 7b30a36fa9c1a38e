"""Heavy-pixel chunk-split (ops/tracer.py CHUNK_GOLDEN design note).

At array scales the base/extra phases split each pixel's sequential sample
chain into decorrelated sub-chains so single heavy pixels spread across
lanes (the occupancy tail no lane ASSIGNMENT can fix — NOTES.md "measured
dead ends"). The SAME sub-chain derivation runs in the jnp oracle drivers
and the Pallas kernels, so the pallas-vs-jnp estimator-equality gate holds
on the chunked estimator; parity with the reference stays "modulo RNG"
(BASELINE.md). Reference-scale scenes (baked traversal) keep the exact
sequential chains (shader.wgsl:517 per-sample re-hash order).
"""

import jax
import jax.numpy as jnp
import numpy as np

from terminal_raytracer_tpu.models import Camera, load_scene
from terminal_raytracer_tpu.ops import pallas_kernel
from terminal_raytracer_tpu.ops.tracer import (
    ARRAY_CHUNK_BASE,
    ARRAY_CHUNK_EXTRA,
    PathTracer,
)

POSE = Camera().pose()


def _stress(n=120, **kw):
    d = dict(width=64, height=16, samples_per_pixel=8, max_depth=3)
    d.update(kw)
    return load_scene(f"stress:{n}:7").with_overrides(**d)


def test_auto_policy():
    """Chunking fires only at genuine array scale with a whole budget:
    baked scenes, small scenes forcing accel='array' (the bit-parity
    tests' configuration), and sample-split shares (base_quota) all stay
    on the exact sequential chains."""
    at_scale = PathTracer(_stress())
    assert at_scale.accel == "array"
    assert at_scale.chunk_base == ARRAY_CHUNK_BASE
    assert at_scale.chunk_extra == ARRAY_CHUNK_EXTRA

    small = load_scene("Cornell_Box").with_overrides(
        width=64, height=16, samples_per_pixel=8, max_depth=3)
    assert PathTracer(small).chunk_base is None
    assert PathTracer(small, accel="array").chunk_base is None
    assert PathTracer(small, accel="array").chunk_extra is None
    assert PathTracer(_stress(), base_quota=2).chunk_base is None
    # Degenerate sizes collapse to the sequential chain.
    assert PathTracer(_stress(samples_per_pixel=4),
                      chunk_base=8).chunk_base is None


def test_chunked_schedulers_decision_exact():
    """All three Pallas schedulers implement the chunked sub-chain
    derivation identically to the oracle: ray counts and adaptive budgets
    EXACT, radiance to interpret-mode float rounding."""
    scene = _stress()
    tr = PathTracer(scene)
    assert tr.chunk_base is not None and tr.chunk_extra is not None
    co, vo, to, ro = jax.device_get(
        jax.jit(tr.render_frame)(POSE, np.uint32(123), np.int32(2)))
    for mode in ("sorted", "lockstep", "regen"):
        cp, vp, tp, rp, occ = jax.device_get(jax.jit(
            pallas_kernel.make_render_frame(scene, mode=mode)
        )(POSE, np.uint32(123), np.int32(2)))
        assert float(rp) == float(ro), mode
        np.testing.assert_array_equal(np.asarray(to), np.asarray(tp),
                                      err_msg=mode)
        for q, (a, b) in (("x", (co.x, cp.x)), ("y", (co.y, cp.y)),
                          ("z", (co.z, cp.z))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-5,
                                       err_msg=f"{mode}:{q}")
        assert 0.0 < float(occ) <= 1.0, mode


def test_chunk0_base_is_sequential_chain_head():
    """Chunk 0 re-derives nothing: with the extra phase statically absent
    (spp == base) and chunk_base == base, the 'chunked' program must be
    BIT-identical to the sequential one (one chunk IS the chain — the
    resolution collapses it), and chunk_base == base//2's chunk-0 samples
    draw the same values (same seed, same absolute indices)."""
    scene = _stress(samples_per_pixel=4)  # base == spp == 4: base only
    seq = jax.device_get(jax.jit(PathTracer(
        scene, chunk_base=None, chunk_extra=None).render_frame
    )(POSE, np.uint32(11), np.int32(0)))
    collapsed = jax.device_get(jax.jit(PathTracer(
        scene, chunk_base=4, chunk_extra=None).render_frame
    )(POSE, np.uint32(11), np.int32(0)))
    np.testing.assert_array_equal(np.asarray(seq[0].x),
                                  np.asarray(collapsed[0].x))
    assert float(seq[3]) == float(collapsed[3])


def test_chunked_estimator_mean_agreement():
    """The chunked estimator agrees with the sequential one in the mean
    (decorrelated sub-chains are the same unbiased sampler): global mean
    within 2% over 24 seeds on a stress scene."""
    scene = _stress(width=48, height=12)
    fc = jax.jit(PathTracer(scene).render_frame)
    fn = jax.jit(PathTracer(scene, chunk_base=None,
                            chunk_extra=None).render_frame)
    mc = mn = 0.0
    n = 24
    for f in range(n):
        cc, *_ = fc(POSE, np.uint32(1000 + f), np.int32(f))
        cn, *_ = fn(POSE, np.uint32(1000 + f), np.int32(f))
        mc += float(jnp.mean(cc.x) + jnp.mean(cc.y) + jnp.mean(cc.z))
        mn += float(jnp.mean(cn.x) + jnp.mean(cn.y) + jnp.mean(cn.z))
    assert abs(mc - mn) / abs(mn) < 0.02, (mc / n, mn / n)


def test_chunked_px_sharding_bit_identical():
    """Pixel-row sharding composes with chunking: the derivation is
    pixel-local (global pixel seed + c*GOLDEN), so a px:2 sharded step
    equals the single-chip chunked oracle bitwise."""
    from terminal_raytracer_tpu.parallel.mesh import (
        make_mesh, make_sharded_render_step)

    scene = _stress()
    tr = PathTracer(scene)
    assert tr.chunk_base is not None
    co, _vo, _to, ro = jax.device_get(
        jax.jit(tr.render_frame)(POSE, np.uint32(77), np.int32(0)))
    mesh = make_mesh(n_px=2, devices=jax.devices()[:2])
    step, init = make_sharded_render_step(scene, mesh, backend="jnp")
    out = step(init(), POSE, np.uint32(77), np.int32(0))
    acc = jax.device_get(out.state.acc)
    np.testing.assert_array_equal(np.asarray(co.x), acc[0])
    np.testing.assert_array_equal(np.asarray(co.z), acc[2])
