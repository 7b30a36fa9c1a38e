"""Offline batched rendering: temporal accumulation as one compiled
``lax.scan`` over frames.

The interactive loop drives one compiled step per frame from Python
(runtime/engine.py) because input arrives between frames. Offline — golden
images, benchmarks, the BASELINE "100-frame temporal accumulation" config —
has no input, so the whole frame sequence compiles into a single XLA
program: zero per-frame dispatch overhead and no host round-trips until the
final image. The per-frame math is the same render path; frame_number runs
0..n-1 so accumulation reproduces shader.wgsl:612-620 exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import scene as scene_mod
from ..ops import tonemap as tm
from ..ops.vecmath import V3
from .state import FrameState, init_state, make_render_step


def make_scan_renderer(
    scene: scene_mod.Scene,
    n_frames: int,
    full_color: bool = True,
    backend: str = "auto",
    accel: str = "auto",
    transport: str = None,
):
    """Build `render(state0, pose, seeds, frame0=0) -> (state, rgb, glyphs,
    rays)`.

    `seeds` is a (n_frames,) uint32 array (one per frame, like the host
    reseeding at lib.rs:423). Accumulation runs frame_number frame0 ..
    frame0+n_frames-1; frame0=0 starts with a reset, frame0>0 continues a
    restored accumulation (--load-state resume).
    """
    step = make_render_step(scene, full_color=full_color, backend=backend,
                            jit=False, accel=accel, transport=transport)

    def render(state: FrameState, pose, seeds, frame0=jnp.int32(0)):
        def body(state, inp):
            seed, frame_number = inp
            out = step(state, pose, seed, frame_number)
            return out.state, out.rays

        frames = jnp.asarray(frame0, jnp.int32) + jnp.arange(
            n_frames, dtype=jnp.int32
        )
        state, rays = jax.lax.scan(body, state, (seeds, frames))

        acc_v = V3(state.acc[0], state.acc[1], state.acc[2])
        if full_color:
            rgb = tm.tonemap_fullcolor(acc_v)
            glyphs = jnp.zeros(rgb.shape[:2], jnp.uint8)
        else:
            rgb, glyphs = tm.tonemap_ascii(acc_v)
        return state, rgb, glyphs, jnp.sum(rays)

    return jax.jit(render, donate_argnums=(0,))


def render_accumulated(
    scene: scene_mod.Scene,
    pose,
    n_frames: int,
    seed: Optional[int] = None,
    full_color: bool = True,
    backend: str = "auto",
    transport: Optional[str] = None,
):
    """One-call offline render: n accumulated frames, returns host arrays
    (rgb u8, glyphs u8, rays)."""
    rng = np.random.RandomState(seed)
    seeds = (
        rng.randint(0, 2**32, size=n_frames, dtype=np.uint64)
        + np.arange(n_frames, dtype=np.uint64)
    ).astype(np.uint32)
    render = make_scan_renderer(scene, n_frames, full_color, backend,
                                transport=transport)
    state, rgb, glyphs, rays = render(init_state(scene), pose, jnp.asarray(seeds))
    rgb, glyphs, rays = jax.device_get((rgb, glyphs, rays))
    return state, rgb, glyphs, float(rays)
