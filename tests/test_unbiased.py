"""--unbiased light transport: removes the reference's emission+NEE double
counting. Same RNG chains/paths; emission gated to camera hits and
post-mirror hits only."""

import jax
import numpy as np

from terminal_raytracer_tpu.models import Camera, load_scene
from terminal_raytracer_tpu.models.scene import scene_from_dict
from terminal_raytracer_tpu.runtime import init_state, make_render_step

POSE = Camera().pose()


def _render(scene, unbiased, seed=5):
    step = make_render_step(scene, backend="jnp", unbiased=unbiased)
    return step(init_state(scene), POSE, np.uint32(seed), np.int32(0))


def test_same_paths_darker_image():
    scene = load_scene("scene2").with_overrides(
        width=64, height=24, samples_per_pixel=4, max_depth=4
    )
    ref = _render(scene, unbiased=False)
    unb = _render(scene, unbiased=True)
    a, b = np.asarray(ref.state.acc), np.asarray(unb.state.acc)
    # identical paths -> identical ray counts and sample totals
    assert float(ref.rays) == float(unb.rays)
    np.testing.assert_array_equal(
        np.asarray(ref.state.samples), np.asarray(unb.state.samples)
    )
    # removing double-counted emission can only darken
    assert (b <= a + 1e-6).all()
    assert b.mean() < a.mean()


def test_depth1_identical():
    # At depth 1 the camera hit's emission is legitimate in both modes.
    scene = load_scene("scene2").with_overrides(
        width=64, height=24, samples_per_pixel=4, max_depth=1
    )
    ref = _render(scene, unbiased=False)
    unb = _render(scene, unbiased=True)
    np.testing.assert_array_equal(
        np.asarray(ref.state.acc), np.asarray(unb.state.acc)
    )


def test_mirror_view_of_light_kept():
    """A light seen through a perfect mirror must still emit in unbiased
    mode (NEE cannot sample that path)."""
    cfg = {
        "width": 32, "height": 32, "samples_per_pixel": 4, "max_depth": 3,
        "frames_to_accumulate": 1,
        "camera": {"fov_degrees": 60.0, "char_aspect_ratio": 1.0},
        # mirror straight ahead, light behind the camera
        "spheres": [
            {"center": [0, 0, 10], "radius": 5.0, "color": [0, 0, 0],
             "emission": [3, 3, 3], "reflectivity": 0.0},
        ],
        "planes": [
            {"point": [0, 0, -4], "normal": [0, 0, 1], "color": [1, 1, 1],
             "emission": [0, 0, 0], "reflectivity": 1.0},
        ],
    }
    scene = scene_from_dict(cfg)
    unb = _render(scene, unbiased=True)
    center = np.asarray(unb.state.acc)[:, 16, 16]
    # camera ray -> mirror -> light: emission 3 through a perfect mirror
    np.testing.assert_allclose(center, 3.0, rtol=1e-4)


def test_furnace_unbiased_single_emission():
    """Inside an emissive sphere, unbiased mode counts emission once (the
    camera hit): value = L exactly, vs L/(1-rho) in reference mode."""
    L, rho = 1.0, 0.5
    cfg = {
        "width": 16, "height": 16, "samples_per_pixel": 4, "max_depth": 12,
        "frames_to_accumulate": 1,
        "camera": {"fov_degrees": 60.0, "char_aspect_ratio": 1.0},
        "spheres": [{"center": [0, 0, 0], "radius": 5.0,
                     "color": [rho] * 3, "emission": [L] * 3,
                     "reflectivity": 0.0}],
        "planes": [],
    }
    scene = scene_from_dict(cfg)
    unb = _render(scene, unbiased=True)
    acc = np.asarray(unb.state.acc)
    # NEE inside the sphere contributes 0 (cosL <= 0 for chords), diffuse
    # bounces never re-emit -> exactly the first hit's emission.
    np.testing.assert_allclose(acc, L, rtol=1e-5)
