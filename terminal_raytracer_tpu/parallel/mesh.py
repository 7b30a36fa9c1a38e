"""Multi-chip scale-out: shard_map over a ('px', 'sp') device mesh.

The reference is strictly single-GPU (SURVEY.md §2 parallelism inventory:
pixel-data-parallel within one chip, nothing across chips). This module is
the capability *extension* mandated by SURVEY.md §5.8, designed the JAX way:
pick a mesh, annotate shardings, let XLA insert collectives.

Two orthogonal parallel axes — both ride ICI only:

* ``px`` — pixel-row data parallelism. The image (and all frame state) is
  sharded along H. Embarrassingly parallel: zero collectives until the host
  gathers the final uint8 frame.
* ``sp`` — sample parallelism. Each shard renders ``spp / n_sp`` samples of
  *every* pixel with a decorrelated seed, merged by one ``jax.lax.pmean``
  over ICI per frame. Use when a single frame must go faster than one
  chip's pixel throughput allows (latency-bound interactive rendering).

With ``n_sp == 1`` output is bit-identical to the single-chip renderer.
With ``n_sp > 1`` the adaptive-sampling control loop (variance -> extra
samples, shader.wgsl:561) runs *per shard* on its own sample subset and the
shards' (quirkily normalized) means are averaged — a documented statistical
deviation; disable adaptive effects by choosing spp so that
``spp/n_sp <= 4`` if exactness across sp matters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import scene as scene_mod
from ..ops import tonemap as tm
from ..ops import tracer as tracer_mod
from ..ops.vecmath import V3
from ..runtime.state import FrameOutput, FrameState


def make_mesh(n_px: Optional[int] = None, n_sp: int = 1, devices=None) -> Mesh:
    """Build a ('px', 'sp') mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_px is None:
        n_px = len(devices) // n_sp
    if n_px * n_sp != len(devices):
        devices = devices[: n_px * n_sp]
    arr = np.array(devices).reshape(n_px, n_sp)
    return Mesh(arr, ("px", "sp"))


def _split_spp(spp: int, n_sp: int) -> int:
    if n_sp == 1:
        return spp
    if spp % n_sp:
        raise ValueError(f"samples_per_pixel={spp} not divisible by sp={n_sp}")
    return spp // n_sp


def make_sharded_render_step(
    scene: scene_mod.Scene,
    mesh: Mesh,
    full_color: bool = True,
    backend: str = "auto",
    jit: bool = True,
):
    """Build the multi-chip render step.

    Returns (step, init_state_fn). `step(state, pose, seed, frame_number) ->
    FrameOutput` with all [.., H, ..] outputs/state sharded along 'px' and
    replicated along 'sp'. `init_state_fn()` builds the sharded FrameState.
    """
    n_px = mesh.shape["px"]
    n_sp = mesh.shape["sp"]
    h, w = scene.height, scene.width
    if h % n_px:
        raise ValueError(f"height={h} not divisible by px={n_px}")
    rows = h // n_px
    shard_spp = _split_spp(scene.samples_per_pixel, n_sp)

    # Each shard traces its sample share of its row block. The tracer is
    # built at the *shard* spp so base/adaptive math follows the reference
    # formulas on the shard's own budget; width/height stay global so pixel
    # indices, seeds and ray gen are exact. backend='pallas' runs the
    # row-offset-aware megakernel per shard (the TPU path); 'jnp' runs the
    # XLA tracer (CPU tests / dryrun).
    shard_scene = scene.with_overrides(samples_per_pixel=shard_spp)

    if backend == "auto":
        backend = "pallas" if jax.default_backend().startswith("tpu") else "jnp"
    if backend == "pallas":
        from ..ops import pallas_kernel

        shard_kernel = pallas_kernel.make_render_frame(
            shard_scene, shard_rows=rows
        )
    else:
        shard_kernel = None
        tracer = tracer_mod.PathTracer(shard_scene, loop_mode="while")

    def shard_render(pose, seed, frame_number):
        """Runs per device under shard_map; lane grid = (rows, W) block."""
        px_i = jax.lax.axis_index("px")
        sp_i = jax.lax.axis_index("sp")
        y0 = px_i.astype(jnp.int32) * rows
        # Decorrelate sample shards exactly like frames decorrelate: bump
        # the seed by shard index (host seeds are random u32 anyway).
        seed_l = jnp.asarray(seed, jnp.uint32) + sp_i.astype(jnp.uint32) * jnp.uint32(
            2654435761
        )
        if shard_kernel is not None:
            cur, var, tot, rays = shard_kernel(pose, seed_l, frame_number, y0)
        else:
            y = y0 + jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
            x = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
            cam = tracer_mod.cam_from_pose(pose)
            cur, var, tot, rays = tracer.render_lanes(
                cam, x, y, seed_l, frame_number
            )
        # Merge the sample axis: mean of shard estimates; variance/samples
        # and ray counts reduce additively or by mean as appropriate.
        if n_sp > 1:
            cur = V3(
                jax.lax.pmean(cur.x, "sp"),
                jax.lax.pmean(cur.y, "sp"),
                jax.lax.pmean(cur.z, "sp"),
            )
            var = jax.lax.pmean(var, "sp")
            tot = jax.lax.psum(tot, "sp")
            rays = jax.lax.psum(rays, "sp")
        return cur, var, tot, jnp.sum(rays)

    def step(state: FrameState, pose, seed, frame_number) -> FrameOutput:
        cur, variance, samples, rays = shard_render(pose, seed, frame_number)
        fn = jnp.asarray(frame_number, jnp.float32)
        alpha = jnp.where(fn == 0.0, 1.0, 1.0 / (fn + 1.0))
        cur_s = jnp.stack([cur.x, cur.y, cur.z])
        acc = state.acc * (1.0 - alpha) + cur_s * alpha
        acc_v = V3(acc[0], acc[1], acc[2])
        if full_color:
            rgb = tm.tonemap_fullcolor(acc_v)
            glyphs = jnp.zeros(rgb.shape[:2], jnp.uint8)
        else:
            rgb, glyphs = tm.tonemap_ascii(acc_v)
        return FrameOutput(
            state=FrameState(acc=acc, variance=variance, samples=samples),
            rgb=rgb,
            glyphs=glyphs,
            rays=jax.lax.psum(rays, "px"),
        )

    state_specs = FrameState(
        acc=P(None, "px", None), variance=P("px", None), samples=P("px", None)
    )
    out_specs = FrameOutput(
        state=state_specs,
        rgb=P("px", None, None),
        glyphs=P("px", None),
        rays=P(),
    )
    # check_vma off: the tracer's loop carries start from constant zeros,
    # which the varying-manual-axes checker flags against the loop's varying
    # outputs; the collectives here (pmean/psum) are hand-placed.
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(state_specs, P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    if jit:
        sharded = jax.jit(sharded, donate_argnums=(0,))

    def init_state() -> FrameState:
        zero = FrameState(
            acc=jnp.zeros((3, h, w), jnp.float32),
            variance=jnp.zeros((h, w), jnp.float32),
            samples=jnp.zeros((h, w), jnp.float32),
        )
        return jax.device_put(
            zero,
            FrameState(
                acc=NamedSharding(mesh, state_specs.acc),
                variance=NamedSharding(mesh, state_specs.variance),
                samples=NamedSharding(mesh, state_specs.samples),
            ),
        )

    return sharded, init_state
