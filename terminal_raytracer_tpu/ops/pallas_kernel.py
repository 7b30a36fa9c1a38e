"""The Pallas TPU megakernel.

The TPU-native re-design of the reference's single WGSL compute dispatch
(reference: src/shader.wgsl:497-622, launched as ceil(w/8) x ceil(h/8)
workgroups of 8x8 threads, src/lib.rs:450-453). Here the launch geometry is
a Pallas grid of pixel *tiles* shaped to the VPU: each grid program renders
a (TILE_H, TILE_W) = (8, 128)-aligned block of pixels with every per-pixel
quantity held as an (8, 128) vector register tile — the direct hardware
analog of a full GPU workgroup per VPU op.

All of the actual path-tracing math is `ops.tracer.PathTracer` — the *same*
code the jnp oracle runs — so this module is memory orchestration only:

* scene geometry is baked into the kernel as compile-time constants
  (models/scene.py), so the hot loop touches no HBM at all;
* per-frame camera pose / seed / frame-number land in SMEM;
* per-tile outputs (current-sample color planes, variance, sample counts,
  per-pixel ray counts) stream back to HBM through the grid pipeline.

Three schedulers (`mode`), in increasing occupancy (north-star Mray/s on
v5e, round-2 medians: 329 / 852 / 1935):

* 'lockstep' — fixed-trip fori loops, every lane executes max_depth bounces
  per sample (the straightforward port of the reference's loop nest; kept
  for benchmarking and as a fallback).
* 'regen' — path regeneration: per-lane path state lives in VMEM scratch;
  a lax.while_loop with scalar-only carries (Mosaic cannot legalize vector
  while carries — mutating scratch refs from the body sidesteps that)
  keeps every lane busy on its own sample stream and exits the moment no
  lane in the tile owes work.
* 'sorted' (default) — the two-kernel pipeline: the packed-stream base
  phase (k pixels per lane over a dense row-major stream), then an
  on-device variadic lax.sort compacts pixels by adaptive extra-sample
  budget so the extra phase runs over workload-homogeneous tiles with
  zero-work tiles gated off (see the section at the bottom of this file).

On non-TPU backends the kernel runs in interpreter mode (tests); the oracle
backend remains the fast path off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on some CPU-only installs.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ..models import scene as scene_mod
from . import tracer as tracer_mod
from .vecmath import V3

# Tile shape: (16, 128) won the tile scan on v5e (two f32 register tiles
# deep amortizes the scheduler loop's scalar overhead; wider/deeper tiles
# lose to drain-tail waste). The minimum f32 tile is (8, 128).
TILE_H = 16
TILE_W = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _sweep_scratch_shapes(tracer, tile_h, tile_w):
    """Extra VMEM scratch for traversals that carry sweep state through
    refs: the block-culled traversal's pl.when sweeps (ops/accel.py) or
    the gathered walk's per-lane DDA state (ops/gathered.py — Mosaic
    cannot legalize vector while-loop carries, so the walk loop keeps its
    state in scratch planes and carries only scalars). Empty list for the
    plain baked sweep."""
    from . import accel as accel_mod
    from . import gathered as gathered_mod

    mk = pltpu.VMEM if _HAS_PLTPU else pl.MemoryRef
    if isinstance(tracer.prims, gathered_mod.GatheredPrims):
        return [mk((gathered_mod.N_STATE, tile_h, tile_w), jnp.float32)]
    if not isinstance(tracer.prims, accel_mod.CulledPrims):
        return []
    # Instance attribute: up to +9 extension planes (glass 2, rough 1,
    # checker 4, texture 2) on top of the 13 base planes.
    return [mk((tracer.prims.N_SCRATCH, tile_h, tile_w), jnp.float32)]


def _gather_kernel_loop(scratch):
    """The Pallas driver for the gathered walk (ops/gathered.py): state in
    the VMEM scratch planes, a lax.while_loop with scalar-only carries
    (iteration count + live-lane count) — the same idiom as the regen
    scheduler's carry refs."""
    from . import gathered as gathered_mod

    n_state = gathered_mod.N_STATE

    def loop(prims, o, d, t_min, st0, any_hit):
        for i, leaf in enumerate(st0):
            scratch[i] = leaf

        def n_active(st):
            return jnp.sum(
                jnp.where(st.active != 0.0, 1, 0)
            ).astype(jnp.int32)

        def cond(c):
            it, n = c
            return (it < prims.max_trips) & (n > 0)

        def body(c):
            it, _ = c
            st = gathered_mod.WalkState(
                *[scratch[i] for i in range(n_state)]
            )
            st2 = prims.walk_step(o, d, t_min, st, any_hit=any_hit)
            for i, leaf in enumerate(st2):
                scratch[i] = leaf
            return (it + 1, n_active(st2))

        jax.lax.while_loop(cond, body, (jnp.int32(0), n_active(st0)))
        return gathered_mod.WalkState(*[scratch[i] for i in range(n_state)])

    return loop


def _maybe_bind_sweep(tracer, rest):
    """Split (rest_without_sweep, ...) and bind the sweep scratch (the last
    entry of `rest`) into the tracer's traversal, if it uses one."""
    from . import accel as accel_mod
    from . import gathered as gathered_mod

    if isinstance(tracer.prims, gathered_mod.GatheredPrims):
        tracer.prims._kernel_loop = _gather_kernel_loop(rest[-1])
        return rest[:-1]
    if isinstance(tracer.prims, accel_mod.CulledPrims):
        tracer.prims.bind(rest[-1])
        return rest[:-1]
    return rest


def _gather_ops(tracer):
    """Host-side: the gathered traversal's table operands (f32 geometry/
    material channels + i32 CSR indices/offsets) — whole-array VMEM inputs
    appended after the texel atlas, same protocol (pallas rejects captured
    array constants). () for other traversals."""
    from . import gathered as gathered_mod

    if not isinstance(tracer.prims, gathered_mod.GatheredPrims):
        return ()
    return tracer.prims.table_operands()


def _gather_specs(tracer, grid_rank, vmem):
    """The matching in_spec list: both tables replicated to every grid
    step."""
    from . import gathered as gathered_mod

    if not isinstance(tracer.prims, gathered_mod.GatheredPrims):
        return []
    index_map = ((lambda i, j: (0, 0)) if grid_rank == 2
                 else (lambda i: (0, 0)))
    out = []
    for tab in (tracer.prims.f32_tab_host, tracer.prims.i32_tab_host):
        r, c = tab.shape
        out.append(pl.BlockSpec((r, c), index_map, **vmem))
    return out


def _gather_bind_front(tracer, rest):
    """Pop the two gathered-traversal table refs off the front of `rest`
    (right after the texel atlas) and bind them. No-op otherwise."""
    from . import gathered as gathered_mod

    if not isinstance(tracer.prims, gathered_mod.GatheredPrims):
        return rest
    tracer.prims.bind_tables(rest[0], rest[1])
    return rest[2:]


def _dyn_layout(tracer):
    """The tracer's runtime-value operand layout [(key, count)]: the
    dynamic tracer's traced scene values (DynPrims), or the array-resident
    sweep's SoA arrays (ArrayPrims). Empty for baked tracers."""
    return getattr(tracer.prims, "dyn_layout", [])


def _tex_ops(tracer):
    """Host-side: the texel-atlas operand tuple for an atlas-reading
    tracer (primitive textures and/or a sky texture) — pallas rejects
    captured array constants, so the per-scene atlas rides as one
    whole-array VMEM input (gathered in tracer._fetch_texel), appended
    AFTER the scene-value operands. () when no texture is read."""
    if not getattr(tracer, "needs_atlas", False):
        return ()
    return (jnp.asarray(tracer.tex_atlas_host, jnp.int32),)


def _tex_specs(tracer, grid_rank, vmem):
    """The matching in_spec list: the whole (rows, 128) atlas replicated
    to every grid step."""
    if not getattr(tracer, "needs_atlas", False):
        return []
    r, c = tracer.tex_atlas_host.shape
    index_map = ((lambda i, j: (0, 0)) if grid_rank == 2
                 else (lambda i: (0, 0)))
    return [pl.BlockSpec((r, c), index_map, **vmem)]


def _tex_bind_front(tracer, rest):
    """Pop the texel-atlas VMEM ref off the front of `rest` (right after
    the scene-value refs) and bind it into the tracer; rows are then read
    lazily inside the trace (`tab[k:k+1, :]` works on refs and arrays
    alike). No-op for atlas-free tracers."""
    if not getattr(tracer, "needs_atlas", False):
        return rest
    tracer.bind_texture(rest[0])
    return rest[1:]


def _dyn_bind_front(tracer, rest):
    """Pop the scene-value SMEM refs off the front of `rest` and bind them
    into the tracer's prims. DynPrims (PREREAD) gets each value pre-read
    into per-primitive traced scalars, once, outside the scheduler loops
    (ops/dynamic.py design note); ArrayPrims gets the refs THEMSELVES —
    its fori_loop sweep reads `ref[i]` at a traced index, which a pre-read
    would re-unroll into the O(N) code the loop exists to avoid. No-op for
    baked tracers."""
    layout = _dyn_layout(tracer)
    if not layout:
        return rest
    if hasattr(tracer.prims, "bind_refs"):
        # ArrayDynPrims: SoA sweep keys keep their refs, compact light
        # keys pre-read (O(n_lights)).
        tracer.prims.bind_refs(
            {k: ref for (k, _n), ref in zip(layout, rest)}
        )
    elif getattr(tracer.prims, "PREREAD", True):
        vals = {
            k: [ref[i] for i in range(n)]
            for (k, n), ref in zip(layout, rest)
        }
        tracer.prims.bind(vals)
    else:
        tracer.prims.bind({k: ref for (k, _n), ref in zip(layout, rest)})
    return rest[len(layout):]


def _auto_scene_ops(tracer):
    """The operand tuple a STATIC array-resident tracer (accel='array')
    appends automatically at call time — its own SoA value arrays. None
    when the caller supplies the values (dynamic mode) or the traversal is
    baked."""
    if getattr(tracer, "dynamic", False):
        return None
    arrays = getattr(tracer.prims, "host_arrays", None)
    if arrays is None:
        return None
    return _dyn_ops(tracer.prims.dyn_layout, arrays)


def _dyn_ops(layout, arrays):
    """Host-side: the operand tuple for a render call, in layout order."""
    return tuple(jnp.asarray(arrays[k], jnp.float32) for k, _n in layout)


def _dyn_values(tracer, arrays):
    """Host-side operand tuple from a dynamic step's pack_scene `arrays`
    input: ArrayDynPrims derives its SoA + light operands in-graph
    (kernel_operands); DynPrims operands are the arrays themselves."""
    prims = tracer.prims
    if hasattr(prims, "kernel_operands"):
        return prims.kernel_operands(arrays)
    return _dyn_ops(prims.dyn_layout, arrays)


def _carry_dtype_counts(tracer, tile_h, tile_w):
    """Leaf dtypes of the regen carry, for sizing scratch buffers."""
    dummy = jax.eval_shape(
        lambda: tracer.regen_carry0(
            tracer_mod.Cam(
                V3(0.0, 0.0, 0.0), V3(0.0, 0.0, 1.0),
                V3(1.0, 0.0, 0.0), V3(0.0, 1.0, 0.0),
            ),
            jnp.zeros((tile_h, tile_w), jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.uint32),
            jnp.zeros((tile_h, tile_w), jnp.float32),
        )
    )
    leaves = jax.tree_util.tree_leaves(dummy)
    counts = {"uint32": 0, "int32": 0, "float32": 0}
    for leaf in leaves:
        counts[str(leaf.dtype)] += 1
    return counts


def make_render_frame(
    scene: scene_mod.Scene,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: str = "auto",
    mode: str = "sorted",
    unbiased: bool = False,
    transport: str = None,
    shard_rows: int = None,
    accel: str = "auto",
    dynamic: bool = False,
    animated=None,
    chunk_base="auto",
    chunk_extra="auto",
):
    """Build `render_frame(pose, seed, frame_number[, y0])` backed by the
    Pallas megakernel. Same signature/returns as PathTracer.render_frame.

    `chunk_base`/`chunk_extra`: heavy-pixel chunk-split sizes (PathTracer;
    'auto' = on above CHUNK_AUTO_THRESHOLD primitives).

    `shard_rows`: when set, the kernel renders a `shard_rows x width` row
    block of the (globally-sized) image starting at runtime row offset `y0`
    — the per-device body of the shard_map multi-chip step
    (parallel/mesh.py). Pixel seeds and camera rays use global coordinates,
    so shards tile seamlessly.

    `accel`: traversal choice ('auto'/'baked'/'grid', see PathTracer).

    `dynamic`: geometry/material values become runtime inputs — the kernels
    read them from SMEM operands (ops/dynamic.py layout) and
    `render_frame` gains a trailing `arrays` argument. Animated scenes
    re-invoke the one compiled kernel with new values, never recompiling.
    All three schedulers serve dynamic scenes, including the two-kernel
    'sorted' pipeline (the value operands thread through both kernels; the
    compaction glue is value-independent).

    `animated`: with `dynamic`, the subset of pack_scene keys that actually
    vary — everything else folds back to baked constants (DynPrims)."""
    if mode == "sorted":
        return make_sorted_render_frame(
            scene, tile_h=tile_h, tile_w=tile_w, interpret=interpret,
            unbiased=unbiased, transport=transport,
            shard_rows=shard_rows, accel=accel, dynamic=dynamic,
            animated=animated, chunk_base=chunk_base, chunk=chunk_extra,
        )
    # Mosaic cannot legalize while-loops with vector carries; the lockstep
    # path uses fixed-trip fori loops (PathTracer.loop_mode='fori') and the
    # regen path keeps its vectors in scratch refs.
    tracer = tracer_mod.PathTracer(scene, loop_mode="fori", unbiased=unbiased,
                                   transport=transport, accel=accel,
                                   dynamic=dynamic, dyn_animated=animated,
                                   chunk_base=chunk_base,
                                   chunk_extra=chunk_extra)
    dyn_operands = _dyn_layout(tracer)

    def _bind_dyn(rest):
        return _dyn_bind_front(tracer, rest)
    sweep_scratch = _sweep_scratch_shapes(tracer, tile_h, tile_w)
    h, w = scene.height, scene.width
    h_out = shard_rows if shard_rows is not None else h
    grid = (_cdiv(h_out, tile_h), _cdiv(w, tile_w))

    if interpret == "auto":
        interp = not jax.default_backend().startswith("tpu")
    else:
        interp = bool(interpret)

    def _tile_coords(y0):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        local_y = ti * tile_h + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 0
        )
        ys = y0 + local_y
        xs = tj * tile_w + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        # Edge tiles: lanes past the image (or past this shard's row block)
        # are ballast — they must not draw RNG, trace, or count rays (the
        # reference's bounds check, shader.wgsl:503).
        active = (xs < w) & (ys < h) & (local_y < h_out)
        return xs, ys, active

    def _write_outputs(refs, cur, var, tot, rays):
        r_ref, g_ref, b_ref, var_ref, tot_ref, rays_ref = refs
        r_ref[:, :] = cur.x
        g_ref[:, :] = cur.y
        b_ref[:, :] = cur.z
        var_ref[:, :] = var
        tot_ref[:, :] = tot
        rays_ref[:, :] = rays

    def kernel_lockstep(pose_ref, seed_ref, frame_ref, y0_ref, *rest):
        rest = _bind_dyn(rest)
        rest = _tex_bind_front(tracer, rest)
        rest = _gather_bind_front(tracer, rest)
        out_refs = _maybe_bind_sweep(tracer, rest)
        xs, ys, active = _tile_coords(y0_ref[0])
        cam = tracer_mod.cam_from_pose(pose_ref)
        out = tracer.render_lanes(
            cam, xs, ys, seed_ref[0], frame_ref[0], active=active
        )
        _write_outputs(out_refs, *out)

    # --- regen: carry lives in typed scratch planes --------------------------

    def _carry_to_refs(carry, refs):
        idx = {"uint32": 0, "int32": 0, "float32": 0}
        for leaf in jax.tree_util.tree_leaves(carry):
            d = str(leaf.dtype)
            refs[d][idx[d]] = leaf
            idx[d] += 1

    def _carry_from_refs(treedef, leaf_dtypes, refs):
        idx = {"uint32": 0, "int32": 0, "float32": 0}
        out = []
        for d in leaf_dtypes:
            out.append(refs[d][idx[d]])
            idx[d] += 1
        return jax.tree_util.tree_unflatten(treedef, out)

    def kernel_regen(pose_ref, seed_ref, frame_ref, y0_ref, *rest):
        rest = _bind_dyn(rest)
        rest = _tex_bind_front(tracer, rest)
        rest = _gather_bind_front(tracer, rest)
        rest = _maybe_bind_sweep(tracer, rest)
        (r_ref, g_ref, b_ref, var_ref, tot_ref, rays_ref, it_ref,
         u32_s, i32_s, f32_s) = rest
        xs, ys, active = _tile_coords(y0_ref[0])
        cam = tracer_mod.cam_from_pose(pose_ref)
        xf = xs.astype(jnp.float32)
        yf = ys.astype(jnp.float32)
        refs = {"uint32": u32_s, "int32": i32_s, "float32": f32_s}
        max_iters = (scene.samples_per_pixel + 1) * scene.max_depth + 4
        # Chunked tracers invoke the driver once per chunk — executed
        # iterations accumulate across invocations.
        it_ref[:, :] = jnp.zeros((tile_h, tile_w), jnp.float32)

        def driver(carry0):
            leaves, treedef = jax.tree_util.tree_flatten(carry0)
            leaf_dtypes = [str(l.dtype) for l in leaves]
            _carry_to_refs(carry0, refs)

            def cond(c):
                it, n = c
                return (it < max_iters) & (n > 0)

            def body(c):
                it, _ = c
                carry = _carry_from_refs(treedef, leaf_dtypes, refs)
                carry = tracer.regen_step(cam, xf, yf, carry)
                _carry_to_refs(carry, refs)
                return (it + 1, tracer.regen_pending(carry))

            final = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tracer.regen_pending(carry0))
            )
            # Occupancy denominator: broadcast the tile's executed
            # iteration count over its lanes, so sum(plane) over all tiles
            # IS the executed lane-iteration total.
            it_ref[:, :] = it_ref[:, :] + final[0].astype(jnp.float32)
            return _carry_from_refs(treedef, leaf_dtypes, refs)

        out = tracer.render_lanes_regen(
            cam, xs, ys, seed_ref[0], frame_ref[0], active=active,
            driver=driver,
        )
        _write_outputs((r_ref, g_ref, b_ref, var_ref, tot_ref, rays_ref), *out)

    if _HAS_PLTPU:
        vmem = {"memory_space": pltpu.VMEM}
        smem = {"memory_space": pltpu.SMEM}
    else:  # pragma: no cover
        vmem = smem = {}
    tile_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), **vmem)
    plane = jax.ShapeDtypeStruct((h_out, w), jnp.float32)

    if mode == "regen":
        counts = _carry_dtype_counts(tracer, tile_h, tile_w)
        if _HAS_PLTPU:
            scratch_shapes = [
                pltpu.VMEM((counts["uint32"], tile_h, tile_w), jnp.uint32),
                pltpu.VMEM((counts["int32"], tile_h, tile_w), jnp.int32),
                pltpu.VMEM((counts["float32"], tile_h, tile_w), jnp.float32),
            ]
        else:  # pragma: no cover
            scratch_shapes = [
                pl.MemoryRef((counts["uint32"], tile_h, tile_w), jnp.uint32),
                pl.MemoryRef((counts["int32"], tile_h, tile_w), jnp.int32),
                pl.MemoryRef((counts["float32"], tile_h, tile_w), jnp.float32),
            ]
        kernel = kernel_regen
    elif mode == "lockstep":
        scratch_shapes = []
        kernel = kernel_lockstep
    else:
        raise ValueError(f"unknown kernel mode {mode!r}")
    scratch_shapes = scratch_shapes + sweep_scratch

    n_out = 7 if mode == "regen" else 6
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(**smem),  # pose (16,)
            pl.BlockSpec(**smem),  # seed (1,)
            pl.BlockSpec(**smem),  # frame (1,)
            pl.BlockSpec(**smem),  # y0 row offset (1,)
        ] + [pl.BlockSpec(**smem)] * len(dyn_operands)  # scene values
        + _tex_specs(tracer, 2, vmem)  # texel atlas (textured scenes)
        + _gather_specs(tracer, 2, vmem),  # gathered-traversal tables
        out_specs=[tile_spec] * n_out,
        # r, g, b, variance, total samples, per-pixel ray counts
        # (+ regen: the per-tile executed-iteration plane)
        out_shape=[plane] * n_out,
        scratch_shapes=scratch_shapes,
        interpret=interp,
    )

    # Measured sweep-weighted lane occupancy (owed sweeps / executed
    # lane-iteration sweeps), same definition as the sorted pipeline's.
    # regen surfaces its executed while-loop trip counts; lockstep's
    # denominator is STATIC — every lane of every tile runs the full
    # fixed-trip spp x max_depth schedule (render_lanes loop_mode='fori').
    sweeps_per_iter = 1.0 + float(tracer.nee_sweeps)
    n_lanes = grid[0] * grid[1] * tile_h * tile_w
    # base + extra fixed-trip loops = max(base, spp) samples x max_depth
    # bounces (the extra loop is statically absent when base >= spp; a
    # chunked extra phase runs ceil((spp-base)/ce) loops of ce trips).
    if tracer.base_samples >= tracer.spp:
        lockstep_samples = tracer.base_samples
    elif tracer.chunk_extra:
        ce = tracer.chunk_extra
        lockstep_samples = (tracer.base_samples
                            + _cdiv(tracer.spp - tracer.base_samples, ce) * ce)
    else:
        lockstep_samples = tracer.spp
    lockstep_iters = float(n_lanes * lockstep_samples * scene.max_depth)

    def _finish(outs):
        if mode == "regen":
            r, g, b, var, tot, rays, iters = outs
            lane_iters = jnp.sum(iters)
        else:
            r, g, b, var, tot, rays = outs
            lane_iters = lockstep_iters
        occ = jnp.sum(rays) / jnp.maximum(lane_iters * sweeps_per_iter, 1.0)
        return V3(r, g, b), var, tot, jnp.sum(rays), occ

    if dynamic:

        def render_frame(pose, seed, frame_number, arrays, y0=0):
            pose = jnp.asarray(pose, jnp.float32)
            seed = jnp.asarray(seed, jnp.uint32).reshape((1,))
            frame = jnp.asarray(frame_number, jnp.int32).reshape((1,))
            y0 = jnp.asarray(y0, jnp.int32).reshape((1,))
            scene_ops = _dyn_values(tracer, arrays)
            return _finish(call(pose, seed, frame, y0, *scene_ops,
                                *_tex_ops(tracer), *_gather_ops(tracer)))
    else:
        auto_ops = _auto_scene_ops(tracer)

        def render_frame(pose, seed, frame_number, y0=0):
            pose = jnp.asarray(pose, jnp.float32)
            seed = jnp.asarray(seed, jnp.uint32).reshape((1,))
            frame = jnp.asarray(frame_number, jnp.int32).reshape((1,))
            y0 = jnp.asarray(y0, jnp.int32).reshape((1,))
            return _finish(call(pose, seed, frame, y0, *(auto_ops or ()),
                                *_tex_ops(tracer), *_gather_ops(tracer)))

    return render_frame


# ---------------------------------------------------------------------------
# The two-kernel sorted pipeline (mode='sorted')
# ---------------------------------------------------------------------------
#
# The single-kernel regen scheduler is bounded by its slowest lane per tile:
# adaptive sampling hands isolated pixels up to (spp - base) extra samples of
# long paths while their tile neighbors idle (~21% occupancy bound measured
# at the north-star config). This pipeline restores occupancy by sorting the
# *work*, entirely on device:
#
#   kernel A   render the uniform base-sample phase (+ variance, RNG state)
#   XLA        compute each pixel's extra-sample budget (shader.wgsl:561-562),
#              argsort pixels by budget, gather (coords, state, budget) into
#              a compact sorted stream
#   kernel B   run the extra phase over the sorted stream — tiles are
#              workload-homogeneous, and the (many) zero-budget tiles exit
#              after a single scheduler iteration
#   XLA        scatter the extra sums back and apply the reference's
#              normalization (tracer.combine_phases)
#
# RNG chains are untouched (each pixel's phase-2 draws continue from its
# phase-1 state with the same per-sample re-hash), so results remain
# bit-compatible with the single-kernel scheduler.


def _regen_driver(tracer, cam, xf, yf, refs, max_iters, iters_cell=None):
    """Scratch-ref scalar-carry while driver, shared by regen kernels.
    `iters_cell` (optional list) receives the executed scheduler-iteration
    count — the occupancy denominator (each iteration runs every lane
    through one traversal + n_lights shadow sweeps, busy or not)."""

    def driver(carry0):
        leaves, treedef = jax.tree_util.tree_flatten(carry0)
        leaf_dtypes = [str(l.dtype) for l in leaves]
        idx = {"uint32": 0, "int32": 0, "float32": 0}
        for leaf in leaves:
            d = str(leaf.dtype)
            refs[d][idx[d]] = leaf
            idx[d] += 1

        def read():
            i = {"uint32": 0, "int32": 0, "float32": 0}
            out = []
            for d in leaf_dtypes:
                out.append(refs[d][i[d]])
                i[d] += 1
            return jax.tree_util.tree_unflatten(treedef, out)

        def write(carry):
            i = {"uint32": 0, "int32": 0, "float32": 0}
            for leaf in jax.tree_util.tree_leaves(carry):
                d = str(leaf.dtype)
                refs[d][i[d]] = leaf
                i[d] += 1

        def cond(c):
            it, n = c
            return (it < max_iters) & (n > 0)

        def body(c):
            it, _ = c
            carry = tracer.regen_step(cam, xf, yf, read())
            write(carry)
            return (it + 1, tracer.regen_pending(carry))

        final = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tracer.regen_pending(carry0))
        )
        if iters_cell is not None:
            iters_cell.append(final[0])
        return read()

    return driver


def _memspaces():
    if _HAS_PLTPU:
        return {"memory_space": pltpu.VMEM}, {"memory_space": pltpu.SMEM}
    return {}, {}  # pragma: no cover


def _interp(interpret) -> bool:
    if interpret == "auto":
        return not jax.default_backend().startswith("tpu")
    return bool(interpret)


def make_base_kernel(
    scene: scene_mod.Scene,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: str = "auto",
    unbiased: bool = False,
    transport: str = None,
    shard_rows: int = None,
    base_quota: int = None,
    base_dynamic: bool = False,
    pair: "int | str" = "auto",
    accel: str = "auto",
    dynamic: bool = False,
    animated=None,
    fold_budget: bool = False,
    chunk_base="auto",
):
    """Kernel A builder: the packed-stream base phase as a standalone
    callable.

    ``chunk_base``: heavy-pixel chunk-split of the base phase
    (tracer.CHUNK_GOLDEN design note; 'auto' = on at array scales). The
    entry stream becomes chunk-major over n_chunks x n_pix entries —
    entry i renders sub-chain chunk i // n_pix of pixel i % n_pix — so a
    single heavy pixel's base samples spread across lanes. The SAME
    sub-chain derivation runs in the jnp oracle drivers, keeping
    pallas-vs-jnp estimator equality exact; parity with the reference
    stays "modulo RNG" (BASELINE.md). When chunked, ``fold_budget`` is
    forced off (per-entry parked sums are per-chunk partials; the
    variance needs the per-pixel totals the glue assembles).

    Returns ``(base_fn, tracer, pair)`` where
    ``base_fn(pose, seed, frame_number, y0, scene_ops=()) -> (csum V3,
    csumsq V3, state u32, rays, lane_iters)`` — the first four as
    ``(h_out, w)`` planes, ``lane_iters`` the scalar executed
    lane-iteration count (occupancy denominator); ``h_out`` is
    ``shard_rows`` (the per-device row block under shard_map) or the full
    image height, and ``y0`` is the block's global row offset (pixel seeds
    and camera rays use global coordinates, so shards tile seamlessly).

    ``fold_budget``: the kernel epilogue also computes each entry's
    luminance variance and adaptive extra budget (tracer.variance_of +
    tracer.extra_quota — the SAME traced ops, so results stay bit-exact
    vs the jnp glue) and ``base_fn`` returns two extra ``(h_out, w)``
    planes ``(..., var, additional)``. This folds the between-kernel
    budget math of the sorted pipeline into kernel A — one dispatch and
    one HBM round-trip over the image planes less per frame. Ignored
    (no-op) when base >= spp: there is no extra phase to budget for.
    The multi-chip sample-split path must NOT fold: its variance is
    computed from psum-merged global sums (parallel/mesh.py).

    Launch geometry is a 1-D grid over a *packed pixel stream* (like
    kernel B): lane L of the n_lanes = tiles * tile_h * tile_w stream
    handles row-major flat pixels L, L + n_lanes, ... — so every tile is
    full of real pixels up to the single tail tile, independent of how the
    image dims align to the (tile_h, tile_w) grid. (The previous 2-D band
    layout left up to ~39% of lanes as edge ballast at the north-star
    config: 25-row bands over 16-row tiles, 400 cols over 128-lane tiles.)

    ``base_quota``: base samples actually rendered per pixel — the
    sample-split multi-chip path gives each 'sp' shard its share of the
    global max(4, spp/4) budget (parallel/mesh.py); default is the full
    reference budget.

    ``base_dynamic``: the per-pixel base quota becomes a runtime i32 SMEM
    operand (``base_fn`` gains a ``base_q`` argument, bounded above by the
    static ``base_quota``) — unequal sample-split shares (floor/ceil of
    base/n_sp) run the SAME compiled kernel under shard_map.

    ``pair``: k pixels per lane (work pairing — sums k independent
    workloads per lane to tighten the per-lane work distribution;
    bit-compatible, each pixel's RNG chain is unchanged). 'auto' picks k=8
    for short base quotas (measured +8.5% at base=4; concentration no
    longer pays at base>=~16), adjusted within [1, k0+4] to minimize the
    tail tile's padding waste.

    ``dynamic`` / ``animated``: runtime scene values as trailing SMEM
    operands (the make_render_frame contract); callers pass the prepared
    operand tuple (see _dyn_ops) via ``scene_ops``.
    """
    tracer = tracer_mod.PathTracer(scene, loop_mode="fori", unbiased=unbiased,
                                   transport=transport, base_quota=base_quota,
                                   accel=accel, dynamic=dynamic,
                                   dyn_animated=animated,
                                   chunk_base=chunk_base)
    dyn_operands = _dyn_layout(tracer)
    sweep_scratch = _sweep_scratch_shapes(tracer, tile_h, tile_w)
    h, w = scene.height, scene.width
    h_out = shard_rows if shard_rows is not None else h
    base = tracer.base_samples
    cb = tracer.chunk_base
    n_chunks_b = _cdiv(base, cb) if cb else 1
    fold_budget = bool(fold_budget) and base < tracer.spp and cb is None
    bpe = 10 if fold_budget else 8  # output bands per entry
    n_pix = h_out * w
    n_entries = n_chunks_b * n_pix  # chunk-major expanded entry stream
    lpt = tile_h * tile_w  # lanes per tile

    def _waste(k):
        return _cdiv(n_entries, k * lpt) * k * lpt - n_entries

    if pair == "auto":
        if base <= 8:
            # k=8 measured +8.5% at base=4 (north star); with the
            # array-resident sweep the O(pair) park/seed block is noise
            # next to the O(N)-primitive sweep, and k=16 buys another
            # +14% at stress:256 (flat at 1024 — tools/perf_probe14.py).
            k0 = 16 if tracer.accel == "array" else 8
            pair = min(range(1, k0 + 5),
                       key=lambda k: (_waste(k), abs(k - k0)))
        else:
            pair = 1
    pair = int(pair)
    tiles = _cdiv(n_entries, pair * lpt)
    n_lanes = tiles * lpt

    interp = _interp(interpret)
    vmem, smem = _memspaces()
    tile_spec = pl.BlockSpec((tile_h, tile_w), lambda i: (i, 0), **vmem)
    mk_scratch = pltpu.VMEM if _HAS_PLTPU else pl.MemoryRef

    i32_tile = jnp.zeros((tile_h, tile_w), jnp.int32)
    stream_dummy = jax.eval_shape(
        lambda: tracer.stream_carry0(
            jnp.zeros((tile_h, tile_w), jnp.float32), pair, i32_tile,
            i32_tile, cs0=(i32_tile if cb else None),
        )
    )
    pcounts = {"uint32": 0, "int32": 0, "float32": 0}
    for leaf in jax.tree_util.tree_leaves(stream_dummy):
        pcounts[str(leaf.dtype)] += 1
    stream_scratch = [
        mk_scratch((pcounts["uint32"], tile_h, tile_w), jnp.uint32),
        mk_scratch((pcounts["int32"], tile_h, tile_w), jnp.int32),
        mk_scratch((pcounts["float32"], tile_h, tile_w), jnp.float32),
    ]

    def kernel_base(pose_ref, seed_ref, frame_ref, y0_ref, xs0_ref, ys0_ref,
                    *rest):
        if cb:
            cs0_ref = rest[0]
            rest = rest[1:]
        if base_dynamic:
            base_q = rest[0][0]
            rest = rest[1:]
        else:
            base_q = None
        rest = _dyn_bind_front(tracer, rest)
        rest = _tex_bind_front(tracer, rest)
        rest = _gather_bind_front(tracer, rest)
        rest = _maybe_bind_sweep(tracer, rest)
        out_refs = rest[:-3]
        u32_s, i32_s, f32_s = rest[-3:]
        # Entry-0 pixel coords of each lane (lane L = entry L of the
        # stream): precomputed host-side constants streamed per tile —
        # Mosaic's i32 vector division is a slow serial expansion, so the
        # divmod lives off-kernel.
        xs0 = xs0_ref[:, :]
        ys0 = ys0_ref[:, :]
        cam = tracer_mod.cam_from_pose(pose_ref)
        refs = {"uint32": u32_s, "int32": i32_s, "float32": f32_s}
        seed = seed_ref[0]
        frame = frame_ref[0]
        y0 = y0_ref[0]
        # Per-entry quota: the chunk size when chunked, else the full base.
        max_iters = pair * (((cb or base) + 1) * scene.max_depth + 5)

        carry0 = tracer.stream_carry0(
            xs0.astype(jnp.float32), pair, xs0, ys0,
            cs0=(cs0_ref[:, :] if cb else None),
        )
        leaves, treedef = jax.tree_util.tree_flatten(carry0)
        leaf_dtypes = [str(l.dtype) for l in leaves]

        def write(carry):
            i = {"uint32": 0, "int32": 0, "float32": 0}
            for leaf in jax.tree_util.tree_leaves(carry):
                d = str(leaf.dtype)
                refs[d][i[d]] = leaf
                i[d] += 1

        def read():
            i = {"uint32": 0, "int32": 0, "float32": 0}
            out = []
            for d in leaf_dtypes:
                out.append(refs[d][i[d]])
                i[d] += 1
            return jax.tree_util.tree_unflatten(treedef, out)

        write(carry0)

        def cond(c):
            it, n = c
            return (it < max_iters) & (n > 0)

        def body(c):
            it, _ = c
            carry = tracer.stream_step(
                cam, y0, h_out, n_lanes, pair, seed, frame, read(),
                base_q=base_q,
            )
            write(carry)
            return (it + 1, tracer.stream_pending(carry, pair))

        final_it, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tracer.stream_pending(carry0, pair))
        )
        # Occupancy denominator: this tile's executed scheduler iterations,
        # broadcast to its lanes (host sums the plane -> lane-iterations).
        out_refs[-1][:, :] = (jnp.zeros((tile_h, tile_w), jnp.float32)
                              + final_it.astype(jnp.float32))
        out_refs = out_refs[:-1]
        parked = read()[-1]
        for e in range(pair):
            cs = parked[4 * e + 0]
            cq = parked[4 * e + 1]
            st = parked[4 * e + 2]
            ry = parked[4 * e + 3]
            (cr_ref, cg_ref, cb_ref, qr_ref, qg_ref, qb_ref, state_ref,
             rays_ref) = out_refs[bpe * e: bpe * e + 8]
            cr_ref[:, :] = cs.x
            cg_ref[:, :] = cs.y
            cb_ref[:, :] = cs.z
            qr_ref[:, :] = cq.x
            qg_ref[:, :] = cq.y
            qb_ref[:, :] = cq.z
            state_ref[:, :] = st
            rays_ref[:, :] = ry
            if fold_budget:
                # Same traced ops as the jnp glue (tracer.variance_of /
                # extra_quota) — bit-exact, just computed tile-local
                # before the results ever leave VMEM.
                var = tracer.variance_of(cs, cq)
                _needs, additional = tracer.extra_quota(var)
                var_ref, add_ref = out_refs[bpe * e + 8: bpe * e + 10]
                var_ref[:, :] = var
                add_ref[:, :] = additional

    stream_f32 = jax.ShapeDtypeStruct((tiles * tile_h, tile_w), jnp.float32)
    stream_u32 = jax.ShapeDtypeStruct((tiles * tile_h, tile_w), jnp.uint32)
    lane_np = np.arange(n_lanes, dtype=np.int32).reshape(tiles * tile_h,
                                                         tile_w)
    if cb:
        # Chunk-major expanded stream: lane L starts on entry L = chunk
        # L // n_pix of pixel L % n_pix (lanes can outnumber one chunk's
        # pixels on tiny images — the modular form covers that too).
        p_np = lane_np % n_pix
        xs0_np = p_np % w
        ys0_np = p_np // w
        cs0_np = lane_np // n_pix
    else:
        xs0_np = lane_np % w
        ys0_np = lane_np // w
    call_a = pl.pallas_call(
        kernel_base,
        grid=(tiles,),
        # pose, seed, frame, y0 in SMEM; entry-0 coord (+ chunk) planes per
        # tile; then the optional runtime base quota and the dynamic
        # scene-value operands (SMEM scalar arrays)
        in_specs=[pl.BlockSpec(**smem)] * 4 + [tile_spec] * (3 if cb else 2)
        + [pl.BlockSpec(**smem)] * (int(base_dynamic) + len(dyn_operands))
        + _tex_specs(tracer, 1, vmem)  # texel atlas (textured scenes)
        + _gather_specs(tracer, 1, vmem),  # gathered-traversal tables
        # per-entry result bands + the trailing per-tile iteration plane
        out_specs=[tile_spec] * (bpe * pair + 1),
        out_shape=([stream_f32] * 6 + [stream_u32, stream_f32]
                   + [stream_f32] * (bpe - 8)) * pair
        + [stream_f32],
        scratch_shapes=stream_scratch + sweep_scratch,
        interpret=interp,
    )

    auto_ops = _auto_scene_ops(tracer)

    def base_fn(pose, seed, frame_number, y0=0, scene_ops=(), base_q=None):
        if auto_ops is not None:
            scene_ops = auto_ops  # accel='array': the tracer's own arrays
        pose = jnp.asarray(pose, jnp.float32)
        seed_a = jnp.asarray(seed, jnp.uint32).reshape((1,))
        frame_a = jnp.asarray(frame_number, jnp.int32).reshape((1,))
        y0_a = jnp.asarray(y0, jnp.int32).reshape((1,))
        quota_ops = ()
        if base_dynamic:
            if base_q is None:
                base_q = base
            quota_ops = (jnp.asarray(base_q, jnp.int32).reshape((1,)),)
        coord_ops = ((jnp.asarray(cs0_np),) if cb else ())
        bands = call_a(pose, seed_a, frame_a, y0_a,
                       jnp.asarray(xs0_np), jnp.asarray(ys0_np),
                       *coord_ops, *quota_ops, *scene_ops,
                       *_tex_ops(tracer), *_gather_ops(tracer))

        def assemble(q, reduce="sum"):
            # Entry e of lane L is stream entry e*n_lanes + L, so
            # concatenating the per-entry streams IS the row-major image
            # (chunked: the chunk-major expanded stream) plus tail padding
            # — a pure reshape, no gather.
            parts = [bands[bpe * e + q].reshape(-1) for e in range(pair)]
            flat = parts[0] if pair == 1 else jnp.concatenate(parts)
            if not cb:
                return flat[:n_pix].reshape(h_out, w)
            by_chunk = flat[:n_entries].reshape(n_chunks_b, n_pix)
            if reduce == "chunk0":
                # The extra phase continues chunk 0's end state (the head
                # of the sequential chain — CHUNK_GOLDEN design note).
                return by_chunk[0].reshape(h_out, w)
            # Per-pixel totals, accumulated in chunk order — the exact f32
            # addition order of the chunked oracle drivers.
            tot = by_chunk[0]
            for c in range(1, n_chunks_b):
                tot = tot + by_chunk[c]
            return tot.reshape(h_out, w)

        csum = V3(assemble(0), assemble(1), assemble(2))
        csumsq = V3(assemble(3), assemble(4), assemble(5))
        state = assemble(6, reduce="chunk0")
        rays = assemble(7)
        # Executed lane-iterations (occupancy denominator): every lane of
        # a tile — tail-padding ballast included — runs its tile's
        # iterations.
        lane_iters = jnp.sum(bands[bpe * pair])
        if fold_budget:
            return (csum, csumsq, state, rays, lane_iters,
                    assemble(8), assemble(9))
        return csum, csumsq, state, rays, lane_iters

    base_fn.call = call_a  # raw kernel access (profiling/experiments)
    base_fn.coords = (xs0_np, ys0_np)
    return base_fn, tracer, pair


def make_extra_kernel(
    scene: scene_mod.Scene,
    rows_b: int,
    cols_b: int,
    max_quota: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: str = "auto",
    unbiased: bool = False,
    transport: str = None,
    accel: str = "auto",
    dynamic: bool = False,
    animated=None,
):
    """Kernel B builder: the adaptive extra phase over a compacted entry
    stream. Returns ``extra_fn(pose, xs, ys, state, add, samp0,
    scene_ops=()) -> (esum V3, rays, lane_iters)`` — the first two on
    ``(rows_b, cols_b)`` lane planes, ``lane_iters`` the scalar executed
    lane-iteration count (occupancy denominator);
    each lane renders ``add`` extra samples of pixel (xs, ys) continuing
    RNG state ``state`` at sample index ``samp0``. ``dynamic``/``animated``
    add the runtime scene-value SMEM operands (same layout as kernel A —
    both kernels of a dynamic sorted pipeline read the same values)."""
    tracer = tracer_mod.PathTracer(scene, loop_mode="fori", unbiased=unbiased,
                                   transport=transport, accel=accel,
                                   dynamic=dynamic, dyn_animated=animated)
    dyn_operands = _dyn_layout(tracer)
    sweep_scratch = _sweep_scratch_shapes(tracer, tile_h, tile_w)
    interp = _interp(interpret)
    vmem, smem = _memspaces()
    mk_scratch = pltpu.VMEM if _HAS_PLTPU else pl.MemoryRef
    counts = _carry_dtype_counts(tracer, tile_h, tile_w)
    scratch_shapes = [
        mk_scratch((counts["uint32"], tile_h, tile_w), jnp.uint32),
        mk_scratch((counts["int32"], tile_h, tile_w), jnp.int32),
        mk_scratch((counts["float32"], tile_h, tile_w), jnp.float32),
    ]

    def kernel_extra(pose_ref, xs_ref, ys_ref, state_ref, add_ref, samp0_ref,
                     *rest):
        dyn_refs = rest[: len(dyn_operands)]
        rest = _tex_bind_front(tracer, rest[len(dyn_operands):])
        rest = _gather_bind_front(tracer, rest)
        rest = _maybe_bind_sweep(tracer, rest)
        er_ref, eg_ref, eb_ref, rays_ref, it_ref, u32_s, i32_s, f32_s = rest
        zeros_t = jnp.zeros((tile_h, tile_w), jnp.float32)
        er_ref[:, :] = zeros_t
        eg_ref[:, :] = zeros_t
        eb_ref[:, :] = zeros_t
        rays_ref[:, :] = zeros_t
        it_ref[:, :] = zeros_t  # gated-off tiles execute zero iterations

        # The entry stream is budget-sorted, so most tiles are all-zero
        # quota; skip their entire carry-init/driver/readback (the fixed
        # per-tile cost otherwise dominates the phase — measured 4.2 ms at
        # the north-star config for a no-work stream of 40 tiles).
        @pl.when(jnp.sum(add_ref[:, :]) > 0.0)
        def _run_tile():
            # Dynamic scene values: pre-read + bind inside the gate, so
            # zero-work tiles skip the SMEM scalar reads too.
            _dyn_bind_front(tracer, dyn_refs)
            cam = tracer_mod.cam_from_pose(pose_ref)
            xf = xs_ref[:, :].astype(jnp.float32)
            yf = ys_ref[:, :].astype(jnp.float32)
            refs = {"uint32": u32_s, "int32": i32_s, "float32": f32_s}
            iters_cell = []
            run = _regen_driver(tracer, cam, xf, yf, refs,
                                (max_quota + 1) * scene.max_depth + 4,
                                iters_cell=iters_cell)
            zeros = jnp.zeros_like(xf)
            esum, rays = tracer.extra_phase(
                cam, xf, yf, state_ref[:, :], add_ref[:, :], zeros, run,
                samp0=samp0_ref[:, :],
            )
            er_ref[:, :] = esum.x
            eg_ref[:, :] = esum.y
            eb_ref[:, :] = esum.z
            rays_ref[:, :] = rays
            it_ref[:, :] = zeros + iters_cell[0].astype(jnp.float32)

    grid_b = (rows_b // tile_h, cols_b // tile_w)
    plane_b = jax.ShapeDtypeStruct((rows_b, cols_b), jnp.float32)
    lane_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), **vmem)
    call_b = pl.pallas_call(
        kernel_extra,
        grid=grid_b,
        in_specs=[pl.BlockSpec(**smem)] + [lane_spec] * 5
        + [pl.BlockSpec(**smem)] * len(dyn_operands)
        + _tex_specs(tracer, 2, vmem)  # texel atlas (textured scenes)
        + _gather_specs(tracer, 2, vmem),  # gathered-traversal tables
        out_specs=[lane_spec] * 5,
        out_shape=[plane_b] * 5,
        scratch_shapes=scratch_shapes + sweep_scratch,
        interpret=interp,
    )

    auto_ops = _auto_scene_ops(tracer)

    def extra_fn(pose, xs, ys, state, add, samp0, scene_ops=()):
        if auto_ops is not None:
            scene_ops = auto_ops  # accel='array': the tracer's own arrays
        pose = jnp.asarray(pose, jnp.float32)
        er, eg, eb, rays, iters = call_b(pose, xs, ys, state, add, samp0,
                                         *scene_ops, *_tex_ops(tracer),
                                         *_gather_ops(tracer))
        return V3(er, eg, eb), rays, jnp.sum(iters)

    return extra_fn


def _partition_order(budget_e, n_buckets: int, max_budget: float):
    """Descending-budget counting partition: a permutation grouping entries
    of similar extra budget, replacing the full XLA argsort. Kernel B only
    needs workload-*homogeneous* tiles — the exact order within and between
    nearby budgets is irrelevant — so bucketing budgets into `n_buckets`
    classes and computing (class offset + stable rank within class) with
    one-hot cumsums is enough, and much cheaper than an O(N log^2 N)
    compare-exchange sort on TPU."""
    n = budget_e.shape[0]
    scale = float(n_buckets) / float(max_budget + 1.0)
    b = jnp.floor(budget_e * scale).astype(jnp.int32)
    b = (n_buckets - 1) - jnp.clip(b, 0, n_buckets - 1)  # 0 = largest
    onehot = (b[:, None] == jnp.arange(n_buckets, dtype=jnp.int32)[None, :])
    onehot = onehot.astype(jnp.int32)
    counts = jnp.sum(onehot, axis=0)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    excl = jnp.cumsum(onehot, axis=0) - onehot
    rank = jnp.sum(excl * onehot, axis=1)
    pos = rank + jnp.sum(onehot * offsets[None, :], axis=1)
    return jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32)
    )


def make_sorted_extra_phase(
    scene: scene_mod.Scene,
    h_out: int = None,
    samp0_base: int = None,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: str = "auto",
    unbiased: bool = False,
    transport: str = None,
    chunk: int = None,
    order_mode: str = "auto",
    accel: str = "auto",
    dynamic: bool = False,
    animated=None,
):
    """The XLA glue + kernel B of the sorted pipeline, as a standalone
    phase (usable per shard under shard_map — all glue ops are local to the
    shard's row block).

    Returns ``extra_phase(pose, state, additional, y0, scene_ops=()) ->
    (esum V3 over (h_out, w) planes, rays, lane_iters)``: compacts pixels
    into a stream sorted by
    descending extra budget, runs kernel B over workload-homogeneous tiles,
    scatters the extra sums back. ``samp0_base`` is the sample index the
    extra chain continues at (the per-pixel base-phase quota); the returned
    ``extra_phase`` also takes a runtime ``samp0`` scalar override (unequal
    sample-split shares, parallel/mesh.py) — ``samp0_base`` then only sizes
    the entry stream and must lower-bound the runtime value, keeping
    max_extra an upper bound.
    ``dynamic``/``animated``: runtime scene values — the compaction glue is
    value-independent, so only kernel B consumes ``scene_ops``.

    ``chunk``: split each pixel's budget into independent entries of <=
    chunk samples, each seeded with its own sub-chain
    (pcg_hash-decorrelated) — equalizes per-lane work in kernel B at the
    cost of exact per-pixel RNG-chain parity (still the reference's
    estimator: "parity modulo RNG", BASELINE.md). chunk=None keeps the
    bit-parity sequential chain.

    ``order_mode``: 'auto' (default) = 'sort'; 'sort' = exact descending
    variadic lax.sort; 'binary' = stable two-way cumsum partition (needy
    pixels first — sufficient at every shipped config, whose budgets are
    all-or-nothing: needy implies var > 10, so var*50 > 500 >= spp-base;
    measured SLOWER than the sort on v5e, kept for reference —
    tools/perf_probe7.py); 'partition' = 16-bucket counting partition
    (also measured slower); 'none' = image order (for measuring the
    compaction win itself)."""
    h, w = scene.height, scene.width
    h_out = h if h_out is None else h_out
    base = (samp0_base if samp0_base is not None
            else tracer_mod.base_sample_count(scene.samples_per_pixel))
    spp = scene.samples_per_pixel
    max_extra = max(spp - base, 0)
    n_chunks = 1 if not chunk else _cdiv(max_extra, chunk)
    chunk_sz = max_extra if not chunk else chunk
    if order_mode == "auto":
        # 'binary' is eligible whenever budgets are all-or-nothing (every
        # needy pixel's budget is exactly max_extra: var > 10 implies
        # var*50 > 500 >= max_extra) — but MEASURED SLOWER on v5e than the
        # variadic sort (tools/perf_probe7.py: cumsum+scatter partition
        # 1.99 ms vs lax.sort 1.07 ms at 80k entries; XLA's fused sort
        # network beats scatter-based compaction). auto = sort.
        order_mode = "sort"

    # Sorted-stream view: (rows_b, cols_b) tile-aligned, >= n_entries
    # lanes; the tail is sentinel lanes with zero budget (their tiles exit
    # instantly).
    n_entries = n_chunks * h_out * w
    cols_b = 4 * tile_w
    rows_b = _cdiv(_cdiv(n_entries, cols_b), tile_h) * tile_h
    n_pad = rows_b * cols_b - n_entries

    extra_fn = make_extra_kernel(
        scene, rows_b, cols_b, max_quota=chunk_sz, tile_h=tile_h,
        tile_w=tile_w, interpret=interpret, unbiased=unbiased,
        transport=transport, accel=accel, dynamic=dynamic, animated=animated,
    )

    def extra_phase(pose, state, additional, y0=0, scene_ops=(), samp0=None):
        # Build the (possibly chunk-split) entry stream. Entry e = c*HW + p
        # handles samples [base + c*chunk, ...) of pixel p, up to its
        # budget slice. Chunk c > 0 entries get independent RNG sub-chains.
        add_flat = additional.reshape(-1)
        st_flat = state.reshape(-1)
        hw = h_out * w
        budgets, states = [], []
        golden = jnp.uint32(0x9E3779B9)
        for c in range(n_chunks):
            budgets.append(
                jnp.clip(add_flat - float(c * chunk_sz), 0.0, float(chunk_sz))
            )
            states.append(
                st_flat if c == 0
                else st_flat + jnp.uint32(c) * golden
            )
        budget_e = jnp.concatenate(budgets)
        state_e = jnp.concatenate(states)
        idx_e = jnp.arange(n_entries, dtype=jnp.int32)

        # Compact: entries in (exactly or approximately) descending budget
        # order. The payloads (entry id, RNG state) ride the sort itself —
        # one variadic lax.sort instead of argsort + a gather per stream
        # (measured ~1.4 ms of XLA glue at the north-star config).
        if order_mode == "binary":
            # Stable two-way partition via one cumsum: needy entries keep
            # index order at the front, the rest follow. The inverse
            # permutation is one unique-index scatter + gathers. Budgets
            # keep their values (the sample-split shards hand out
            # floor/ceil shares, two adjacent values — still
            # tile-homogeneous to within one iteration).
            needy = (budget_e > 0.0).astype(jnp.int32)
            c = jnp.cumsum(needy)
            n_needy = c[-1]
            pos = jnp.where(needy == 1, c - 1, n_needy + idx_e - c)
            idx_s = jnp.zeros((n_entries,), jnp.int32).at[pos].set(
                idx_e, unique_indices=True
            )
            st_f = state_e[idx_s]
            add_f = budget_e[idx_s]
        elif order_mode == "sort":
            neg_s, idx_s, st_f = jax.lax.sort(
                (-budget_e, idx_e, state_e), num_keys=1, is_stable=False
            )
            add_f = -neg_s
        else:
            if order_mode == "partition":
                order = _partition_order(
                    budget_e, n_buckets=min(16, int(chunk_sz) + 1),
                    max_budget=float(chunk_sz),
                )
            elif order_mode == "none":
                order = jnp.arange(budget_e.shape[0], dtype=jnp.int32)
            else:
                raise ValueError(f"unknown order_mode {order_mode!r}")
            idx_s = order
            st_f = state_e[order]
            add_f = budget_e[order]

        # Everything else is elementwise in the sorted entry id.
        pix_f = idx_s % hw if n_chunks > 1 else idx_s
        chunk_f = idx_s // hw if n_chunks > 1 else jnp.zeros_like(idx_s)

        def pad(a, fill):
            return jnp.concatenate(
                [a, jnp.full((n_pad,), fill, a.dtype)]
            ).reshape(rows_b, cols_b)

        pix_s = pad(pix_f, 0)
        xs_s = pix_s % w
        ys_s = jnp.asarray(y0, jnp.int32) + pix_s // w
        st_s = pad(st_f, 0)
        add_s = pad(add_f, 0.0)
        s0_base = (jnp.int32(base) if samp0 is None
                   else jnp.asarray(samp0, jnp.int32))
        s0_s = s0_base + pad(chunk_f, 0) * jnp.int32(chunk_sz)

        esum_s, rays_b, iters_b = extra_fn(pose, xs_s, ys_s, st_s, add_s,
                                           s0_s, scene_ops=scene_ops)

        pix_of_entry = pix_f

        def unsort(plane_sorted):
            flat = plane_sorted.reshape(-1)[: n_entries]
            if n_chunks == 1:
                # Entry ids are a permutation of the pixels: a unique-index
                # set scatter beats the accumulate scatter (probe6: 1.09 vs
                # 1.13 ms at the north-star entry count).
                return (
                    jnp.zeros((h_out * w,), flat.dtype)
                    .at[pix_of_entry]
                    .set(flat, unique_indices=True)
                    .reshape(h_out, w)
                )
            return (
                jnp.zeros((h_out * w,), flat.dtype)
                .at[pix_of_entry]
                .add(flat)
                .reshape(h_out, w)
            )

        esum = V3(unsort(esum_s.x), unsort(esum_s.y), unsort(esum_s.z))
        return esum, jnp.sum(rays_b), iters_b

    return extra_phase


def make_sorted_render_frame(
    scene: scene_mod.Scene,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: str = "auto",
    unbiased: bool = False,
    transport: str = None,
    chunk="auto",
    pair: "int | str" = "auto",
    shard_rows: int = None,
    order_mode: str = "auto",
    accel: str = "auto",
    dynamic: bool = False,
    animated=None,
    fold_budget: bool = True,
    chunk_base="auto",
):
    """The two-kernel sorted pipeline, composed from make_base_kernel +
    make_sorted_extra_phase. With `shard_rows`, renders a row block at
    runtime offset y0 — the per-device body under shard_map (the glue ops
    between the kernels are all shard-local).

    `chunk_base` / `chunk` (the extra-phase chunk size): heavy-pixel
    chunk-split of the two phases (tracer.CHUNK_GOLDEN design note);
    'auto' resolves both from the tracer (on at array scales, off
    everywhere else — reference-scale scenes keep exact sequential-chain
    parity). The same sub-chain derivation runs in the jnp oracle, so
    pallas-vs-jnp estimator equality stays exact on chunked configs.

    With `dynamic`, the scene-value operands thread through BOTH kernels
    (same SMEM layout; the sort/compaction glue between them is
    value-independent) and `render_frame` gains the trailing `arrays`
    argument — animated scenes get the full sorted-pipeline occupancy, not
    a regen fallback. Reference analog: per-frame buffer update + the same
    kernel (src/lib.rs:442-455).

    `fold_budget=False` keeps the variance/budget math as XLA glue between
    the kernels instead of kernel A's epilogue (A/B instrument; results
    are bit-identical either way)."""
    base_fn, tracer, _pair = make_base_kernel(
        scene, tile_h=tile_h, tile_w=tile_w, interpret=interpret,
        unbiased=unbiased, transport=transport, shard_rows=shard_rows,
        pair=pair, accel=accel, dynamic=dynamic, animated=animated,
        fold_budget=fold_budget, chunk_base=chunk_base,
    )
    if chunk == "auto":
        chunk = tracer.chunk_extra
    fold_budget = fold_budget and tracer.chunk_base is None
    base, spp = tracer.base_samples, tracer.spp
    h_out = shard_rows if shard_rows is not None else scene.height

    extra_phase = None
    if base < spp:
        extra_phase = make_sorted_extra_phase(
            scene, h_out=h_out, samp0_base=base, tile_h=tile_h,
            tile_w=tile_w, interpret=interpret, unbiased=unbiased,
            transport=transport, chunk=chunk, order_mode=order_mode,
            accel=accel, dynamic=dynamic, animated=animated,
        )

    # Each scheduler iteration runs EVERY lane through one traversal +
    # n_lights shadow sweeps (masked or not); `rays` counts the sweeps the
    # reference's control flow actually owes. Their ratio is the measured
    # sweep-weighted occupancy — the quantity NOTES.md's perf analysis
    # derived from throwaway probes, now first-class (VERDICT r2 #6).
    sweeps_per_iter = 1.0 + float(tracer.nee_sweeps)

    def render_body(pose, seed, frame_number, y0, scene_ops):
        out_a = base_fn(pose, seed, frame_number, y0, scene_ops=scene_ops)
        csum, csumsq, state, rays_a, it_a = out_a[:5]

        if base >= spp:
            var = tracer.variance_of(csum, csumsq)
            current = csum * (1.0 / spp)
            total = jnp.zeros_like(var) + float(base)
            rays = jnp.sum(rays_a)
            occ = rays / jnp.maximum(it_a * sweeps_per_iter, 1.0)
            return current, var, total, rays, occ

        if fold_budget:
            # Kernel A already computed var + the adaptive budget in its
            # epilogue (fold_budget) — no between-kernel elementwise pass.
            # needs == (additional > 0) exactly: the reference's constants
            # make budgets all-or-nothing (var > 10 => floor(var*50) >= 500
            # >= spp - base, shader.wgsl:561-562), so a needy pixel's
            # budget is never rounded to zero.
            var, additional = out_a[5], out_a[6]
            needs = additional > 0.0
        else:
            var = tracer.variance_of(csum, csumsq)
            needs, additional = tracer.extra_quota(var)
        esum, rays_b, it_b = extra_phase(pose, state, additional, y0,
                                         scene_ops=scene_ops)
        current, total = tracer.combine_phases(csum, esum, needs, additional)
        rays = jnp.sum(rays_a) + rays_b
        occ = rays / jnp.maximum((it_a + it_b) * sweeps_per_iter, 1.0)
        return current, var, total, rays, occ

    if dynamic:

        def render_frame(pose, seed, frame_number, arrays, y0=0):
            return render_body(pose, seed, frame_number, y0,
                               _dyn_values(tracer, arrays))
    else:

        def render_frame(pose, seed, frame_number, y0=0):
            return render_body(pose, seed, frame_number, y0, ())

    return render_frame
