"""The Pallas TPU megakernel.

The TPU-native re-design of the reference's single WGSL compute dispatch
(reference: src/shader.wgsl:497-622, launched as ceil(w/8) x ceil(h/8)
workgroups of 8x8 threads, src/lib.rs:450-453). Here the launch geometry is
a Pallas grid of pixel *tiles* shaped to the VPU: each grid program renders
a (TILE_H, TILE_W) = (8, 128)-aligned block of pixels with every per-pixel
quantity held as an (8, 128) vector register tile — the direct hardware
analog of a full GPU workgroup per VPU op.

All of the actual path-tracing math is `ops.tracer.PathTracer.render_lanes`
— the *same* code the jnp oracle runs — so this module is memory
orchestration only:

* scene geometry is baked into the kernel as compile-time constants
  (models/scene.py), so the hot loop touches no HBM at all;
* per-frame camera pose / seed / frame-number land in SMEM;
* per-tile outputs (current-sample color planes, variance, sample counts)
  stream back to HBM through the grid pipeline;
* the ray counter reduces per-tile into a tiny [grid] array, summed outside.

On non-TPU backends the kernel runs in interpreter mode (tests); the oracle
backend remains the fast path off-TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on some CPU-only installs.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ..models import scene as scene_mod
from . import tracer as tracer_mod

# VPU-native tile: 8 sublanes x 128 lanes of f32.
TILE_H = 8
TILE_W = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def make_render_frame(
    scene: scene_mod.Scene,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    interpret: str = "auto",
):
    """Build `render_frame(pose, seed, frame_number)` backed by the Pallas
    megakernel. Same signature/returns as PathTracer.render_frame."""
    # Mosaic cannot legalize while-loops with vector carries: fixed-trip
    # fori loops with dead-lane masking instead (see PathTracer.loop_mode).
    tracer = tracer_mod.PathTracer(scene, loop_mode="fori")
    h, w = scene.height, scene.width
    grid = (_cdiv(h, tile_h), _cdiv(w, tile_w))

    if interpret == "auto":
        interp = not jax.default_backend().startswith("tpu")
    else:
        interp = bool(interpret)

    def kernel(pose_ref, seed_ref, frame_ref, r_ref, g_ref, b_ref, var_ref,
               tot_ref, rays_ref):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        ys = ti * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        xs = tj * tile_w + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        # Edge tiles: lanes past the image are ballast — they must not draw
        # RNG, trace, or count rays (the reference's bounds check,
        # shader.wgsl:503).
        active = (xs < w) & (ys < h)

        cam = tracer_mod.cam_from_pose(pose_ref)
        cur, var, tot, rays = tracer.render_lanes(
            cam, xs, ys, seed_ref[0], frame_ref[0], active=active
        )
        r_ref[:, :] = cur.x
        g_ref[:, :] = cur.y
        b_ref[:, :] = cur.z
        var_ref[:, :] = var
        tot_ref[:, :] = tot
        rays_ref[:, :] = rays

    if _HAS_PLTPU:
        vmem = {"memory_space": pltpu.VMEM}
        smem = {"memory_space": pltpu.SMEM}
    else:  # pragma: no cover
        vmem = smem = {}
    tile_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), **vmem)
    plane = jax.ShapeDtypeStruct((h, w), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(**smem),  # pose (16,)
            pl.BlockSpec(**smem),  # seed (1,)
            pl.BlockSpec(**smem),  # frame (1,)
        ],
        out_specs=[tile_spec] * 6,
        # r, g, b, variance, total samples, per-pixel ray counts
        out_shape=[plane] * 6,
        interpret=interp,
    )

    def render_frame(pose, seed, frame_number):
        pose = jnp.asarray(pose, jnp.float32)
        seed = jnp.asarray(seed, jnp.uint32).reshape((1,))
        frame = jnp.asarray(frame_number, jnp.int32).reshape((1,))
        r, g, b, var, tot, rays = call(pose, seed, frame)
        from .vecmath import V3

        return V3(r, g, b), var, tot, jnp.sum(rays)

    return render_frame
