"""Checkpoint / resume for the render state — a capability superset of the
reference, whose accumulation buffer lives and dies with the process
(SURVEY.md §5.4). Saves the FrameState + frame counter + camera pose as an
npz; resuming restores progressive refinement exactly where it stopped."""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import jax
import numpy as np

from ..models.camera import Camera
from ..runtime.state import FrameState


def save_state(path, state: FrameState, frame_count: int, camera: Camera) -> None:
    np.savez_compressed(
        Path(path),
        acc=np.asarray(jax.device_get(state.acc)),
        variance=np.asarray(jax.device_get(state.variance)),
        samples=np.asarray(jax.device_get(state.samples)),
        frame_count=np.int64(frame_count),
        cam_position=np.asarray(camera.position, np.float32),
        cam_yaw=np.float64(camera.yaw),
        cam_pitch=np.float64(camera.pitch),
    )


def load_state(path, expect_shape: Tuple[int, int] = None
               ) -> Tuple[FrameState, int, Camera]:
    """`expect_shape` (height, width): when given, reject a checkpoint whose
    resolution doesn't match the scene about to consume it — otherwise the
    mismatch only surfaces as a cryptic XLA shape error at the first step."""
    z = np.load(Path(path))
    if expect_shape is not None and tuple(z["acc"].shape[1:]) != tuple(
        expect_shape
    ):
        h, w = z["acc"].shape[1:]
        eh, ew = expect_shape
        raise ValueError(
            f"state file {path} holds a {w}x{h} accumulation but the scene "
            f"renders {ew}x{eh}; pass --width/--height (or --no-clamp) to "
            f"match the checkpoint"
        )
    state = FrameState(
        acc=jax.numpy.asarray(z["acc"]),
        variance=jax.numpy.asarray(z["variance"]),
        samples=jax.numpy.asarray(z["samples"]),
    )
    cam = Camera(
        position=z["cam_position"].astype(np.float32),
        yaw=float(z["cam_yaw"]),
        pitch=float(z["cam_pitch"]),
    )
    return state, int(z["frame_count"]), cam
