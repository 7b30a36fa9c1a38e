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

Display-control extensions (statically gated — the defaults compile the
exact reference math above):

* `mode`: "reference" (above), "aces" (the Narkowicz 2015 rational fit of
  the ACES filmic RRT+ODT, then sRGB-ish 1/2.2 display gamma), or
  ("gamma", G) for a plain 1/G power curve. Parse user specs with
  `parse_mode` ("gamma:2.2" -> ("gamma", 2.2)).
* `scale`: linear pre-tonemap exposure multiplier (the CLI exposes stops:
  --exposure E -> scale 2**E). 1.0 compiles no extra op.

In ASCII mode the glyph index always comes from the TONEMAPPED luma (the
reference applies its 0.3 curve to the Rec.709 luma of the linear color;
aces/gamma apply theirs the same way), so brightness ranking between the
glyph ramp and the color channels stays consistent across modes.
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


def parse_mode(spec) -> "str | tuple":
    """User tonemap spec -> the `mode` the tonemap functions take:
    "reference", "aces", or "gamma:G" -> ("gamma", G). Raises ValueError
    on anything else (the CLI surfaces it as a flag error)."""
    if isinstance(spec, tuple):
        spec = f"{spec[0]}:{spec[1]}"
    s = str(spec).strip().lower()
    if s in ("reference", "aces"):
        return s
    if s.startswith("gamma:"):
        try:
            g = float(s.partition(":")[2])
        except ValueError:
            g = float("nan")
        if not g > 0.0:
            raise ValueError(f"bad --tonemap gamma value in {spec!r}; "
                             f"expected gamma:G with G > 0")
        return ("gamma", g)
    raise ValueError(f"unknown --tonemap mode {spec!r}; expected "
                     f"reference, aces, or gamma:G")


def aces(x: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz 2015 per-channel rational fit of the ACES filmic curve
    (RRT+ODT): x(2.51x+0.03) / (x(2.43x+0.59)+0.14), clamped to [0, 1].
    Display-linear out — callers apply the 1/2.2 display gamma."""
    return jnp.clip(x * (2.51 * x + 0.03) / (x * (2.43 * x + 0.59) + 0.14),
                    0.0, 1.0)


def _curve(x: jnp.ndarray, mode, ascii_mode: bool) -> jnp.ndarray:
    """Linear radiance channel/luma -> display value in [0, ~1]."""
    if mode == "reference":
        return jnp.power(x, ASCII_GAMMA) if ascii_mode else jnp.sqrt(x)
    if mode == "aces":
        return jnp.power(aces(x), 1.0 / 2.2)
    if isinstance(mode, tuple) and mode[0] == "gamma":
        return jnp.power(x, 1.0 / float(mode[1]))
    raise ValueError(f"unknown tonemap mode {mode!r} (use parse_mode)")


def _exposed(acc: V3, scale: float) -> V3:
    return acc if scale == 1.0 else acc * float(scale)


def tonemap_fullcolor(acc: V3, mode="reference",
                      scale: float = 1.0) -> jnp.ndarray:
    """[H, W, 3] uint8; defaults = sqrt gamma (lib.rs:509-513) exactly."""
    acc = _exposed(acc, scale)
    r = _quant_u8(_curve(acc.x, mode, False))
    g = _quant_u8(_curve(acc.y, mode, False))
    b = _quant_u8(_curve(acc.z, mode, False))
    return jnp.stack([r, g, b], axis=-1)


def tonemap_ascii(acc: V3, mode="reference",
                  scale: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """([H, W, 3] uint8 color, [H, W] uint8 glyph index); defaults =
    lib.rs:515-524 exactly."""
    acc = _exposed(acc, scale)
    r = _quant_u8(_curve(acc.x, mode, True))
    g = _quant_u8(_curve(acc.y, mode, True))
    b = _quant_u8(_curve(acc.z, mode, True))
    rgb = jnp.stack([r, g, b], axis=-1)
    luma = LUMA[0] * acc.x + LUMA[1] * acc.y + LUMA[2] * acc.z
    n = float(len(GLYPH_RAMP) - 1)
    idx = jnp.minimum(_curve(luma, mode, True) * n, n).astype(jnp.uint8)
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
