"""Tonemap/quantization/glyph-index semantics vs reference lib.rs:509-524."""

import jax.numpy as jnp
import numpy as np

from terminal_raytracer_tpu.ops import tonemap as tm
from terminal_raytracer_tpu.ops.vecmath import V3


def _img(vals):
    a = jnp.asarray(np.array(vals, np.float32)).reshape(1, -1)
    return V3(a, a, a)


def test_ramp():
    assert len(tm.GLYPH_RAMP) == 68
    assert tm.GLYPH_RAMP[0] == " " and tm.GLYPH_RAMP[-1] == "$"
    assert tm.GLYPH_RAMP[1] == "." and tm.GLYPH_RAMP[27] == "\\"


def test_fullcolor_sqrt_gamma():
    acc = _img([0.0, 0.25, 1.0, 4.0])
    rgb = np.asarray(tm.tonemap_fullcolor(acc))
    # sqrt gamma: 0 -> 0, 0.25 -> 127 (0.5*255 truncated), 1 -> 255, 4 -> clamp 255
    np.testing.assert_array_equal(rgb[0, :, 0], [0, 127, 255, 255])
    assert rgb.dtype == np.uint8


def test_ascii_pow_gamma_and_luma():
    acc = _img([0.0, 0.5, 1.0])
    rgb, idx = tm.tonemap_ascii(acc)
    rgb, idx = np.asarray(rgb), np.asarray(idx)
    expected_c = np.clip((np.array([0.0, 0.5, 1.0]) ** 0.3) * 255, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(rgb[0, :, 1], expected_c)
    # grey pixel: luma == value; index = trunc(min(luma^0.3 * 67, 67))
    expected_idx = np.minimum((np.array([0.0, 0.5, 1.0]) ** 0.3) * 67, 67).astype(np.uint8)
    np.testing.assert_array_equal(idx[0], expected_idx)


def test_luma_weights():
    r = V3(jnp.ones((1, 1)), jnp.zeros((1, 1)), jnp.zeros((1, 1)))
    _, idx_r = tm.tonemap_ascii(r)
    g = V3(jnp.zeros((1, 1)), jnp.ones((1, 1)), jnp.zeros((1, 1)))
    _, idx_g = tm.tonemap_ascii(g)
    # Green contributes more luma than red (0.7152 > 0.2126)
    assert np.asarray(idx_g).item() > np.asarray(idx_r).item()
    assert np.asarray(idx_r).item() == int(min(0.2126**0.3 * 67, 67))


def test_glyph_index_clamps_hdr():
    acc = _img([100.0])
    _, idx = tm.tonemap_ascii(acc)
    assert np.asarray(idx).item() == 67


def test_variance_heatmap():
    v = jnp.asarray(np.array([[0.0, 5.0, 100.0]], np.float32))
    hm = np.asarray(tm.variance_heatmap(v))
    assert hm.shape == (1, 3, 3) and hm.dtype == np.uint8
    assert hm[0, 0, 2] == 255 and hm[0, 0, 0] == 0  # cold = blue
    assert hm[0, 2, 0] == 255 and hm[0, 2, 2] == 0  # hot = red
