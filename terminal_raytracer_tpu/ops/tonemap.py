"""On-device tonemapping, quantization and glyph selection.

The reference does all of this on the *CPU*, per pixel, inside the rayon
row encoder (reference: src/lib.rs:509-524). Moving it on-device does two
things: the math fuses into the render step's epilogue for free under XLA,
and the per-frame device->host transfer shrinks from 16 B/pixel f32 radiance
(the reference's staging copy, lib.rs:269,461) to 3-4 B/pixel uint8 — the
"communication backend" win of SURVEY.md §5.8.

Semantics match lib.rs exactly:

* full-color mode: sqrt gamma, x255, clamp, truncate to u8 (lib.rs:510-512);
* ASCII mode: pow(0.3) gamma for the color channels, Rec.709 luma
  (0.2126/0.7152/0.0722) of the *linear* color, glyph index =
  trunc(min(luma^0.3 * 67, 67)) into the 68-glyph ramp — the scale is
  len-1 (lib.rs:516-524).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .vecmath import V3

# The 68-glyph luminance ramp, dark -> bright (lib.rs:521); the index scale
# is len-1 = 67 (lib.rs:522).
GLYPH_RAMP = (
    " .`^\",:;Il!i><~+_-?][}{1)(|\\tfjrxnuvczXYUJCLQ0OZmwqpdbkhao*#MW&8%B@$"
)
assert len(GLYPH_RAMP) == 68

ASCII_GAMMA = 0.3  # lib.rs:515
LUMA = (0.2126, 0.7152, 0.0722)  # lib.rs:520


def _quant_u8(x: jnp.ndarray) -> jnp.ndarray:
    """(x * 255).clamp(0, 255) as u8 — Rust `as u8` truncates (lib.rs:510)."""
    return jnp.clip(x * 255.0, 0.0, 255.0).astype(jnp.uint8)


def tonemap_fullcolor(acc: V3) -> jnp.ndarray:
    """[H, W, 3] uint8 with sqrt gamma (lib.rs:509-513)."""
    r = _quant_u8(jnp.sqrt(acc.x))
    g = _quant_u8(jnp.sqrt(acc.y))
    b = _quant_u8(jnp.sqrt(acc.z))
    return jnp.stack([r, g, b], axis=-1)


def tonemap_ascii(acc: V3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """([H, W, 3] uint8 color, [H, W] uint8 glyph index), lib.rs:515-524."""
    r = _quant_u8(jnp.power(acc.x, ASCII_GAMMA))
    g = _quant_u8(jnp.power(acc.y, ASCII_GAMMA))
    b = _quant_u8(jnp.power(acc.z, ASCII_GAMMA))
    rgb = jnp.stack([r, g, b], axis=-1)
    luma = LUMA[0] * acc.x + LUMA[1] * acc.y + LUMA[2] * acc.z
    n = float(len(GLYPH_RAMP) - 1)
    idx = jnp.minimum(jnp.power(luma, ASCII_GAMMA) * n, n).astype(jnp.uint8)
    return rgb, idx


def variance_heatmap(variance: jnp.ndarray, scale: float = 10.0) -> jnp.ndarray:
    """Debug view: per-pixel sample variance as a blue->red heat map,
    [H, W, 3] uint8. Completes the reference's evident intent — it computes
    and stores variance "for debugging/visualization" (shader.wgsl:607-608)
    but never reads it back (SURVEY.md §5.5)."""
    t = jnp.clip(variance / scale, 0.0, 1.0)
    r = _quant_u8(t)
    g = _quant_u8(0.25 * jnp.sin(t * 3.14159265) ** 2)
    b = _quant_u8(1.0 - t)
    return jnp.stack([r, g, b], axis=-1)
