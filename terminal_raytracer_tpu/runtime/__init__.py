"""Runtime: jit-stable render step + frame state, terminal frontend,
native ANSI blitter, phase timers."""

from .state import FrameOutput, FrameState, init_state, make_render_step  # noqa: F401
