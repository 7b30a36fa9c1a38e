"""Round-4 probe (c): texture-channel building blocks on Mosaic.

probe21b: lane gather (take_along_axis axis=1) lowers and is ~free;
rowsel full-table gather ~1.1 us at R=16 rows. Remaining unknowns:

  packed     rowsel on an i32-PACKED rgb table (r<<16|g<<8|b): one gather
             per row instead of three, unpack via shifts/ands + i32->f32
  atan2      jnp.arctan2 elementwise (spherical uv mapping)
  f2i        jnp.floor + f32->i32 cast (texel index from uv)

    python tools/perf_probe21c.py [--iters 512]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import time

import numpy as np


def build(variant, iters, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    R = 8  # one 32x32 texture packed as (8,128) i32

    def kern(tab_ref, x_ref, out_ref):
        x0 = x_ref[...]

        def body(i, acc):
            x = x0 + 0.001 * i
            if variant == "none":
                return acc + x
            if variant == "atan2":
                return acc + jnp.arctan2(x, 1.0 - x)
            # texel index from uv in [0,1): 32x32 grid
            u = x - jnp.floor(x)
            v = (x * 1.7) - jnp.floor(x * 1.7)
            iu = jnp.floor(u * 32.0).astype(jnp.int32)
            iv = jnp.floor(v * 32.0).astype(jnp.int32)
            idx = iv * 32 + iu
            if variant == "f2i":
                return acc + idx.astype(jnp.float32)
            # packed rowsel gather
            tab = tab_ref[...]
            r = jax.lax.shift_right_logical(idx, 7)
            c = jnp.bitwise_and(idx, 127)
            g = jnp.zeros(idx.shape, jnp.int32)
            for k in range(R):
                row = jnp.broadcast_to(tab[k:k + 1, :], idx.shape)
                gk = jnp.take_along_axis(row, c, axis=1)
                g = jnp.where(r == k, gk, g)
            red = jax.lax.shift_right_logical(g, 16).astype(jnp.float32)
            grn = jnp.bitwise_and(
                jax.lax.shift_right_logical(g, 8), 255).astype(jnp.float32)
            blu = jnp.bitwise_and(g, 255).astype(jnp.float32)
            s = 1.0 / 255.0
            return acc + red * s + grn * s + blu * s

        out_ref[...] = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((16, 128), jnp.float32))

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    tab = jnp.asarray(
        rng.integers(0, 1 << 24, size=(8, 128)), dtype=jnp.int32)
    x = jnp.asarray(rng.random((16, 128), dtype=np.float32))

    base_ms = None
    for variant in ("none", "f2i", "atan2", "packed"):
        try:
            t0 = time.time()
            f = build(variant, args.iters, interpret=args.interpret)
            out = np.asarray(jax.device_get(f(tab, x)))
            compile_s = time.time() - t0
        except Exception as e:  # noqa: BLE001 -- report and move on
            msg = str(e).replace("\n", " ")[:160]
            print(f"{variant:8s} FAIL: {msg}", flush=True)
            continue
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.device_get(f(tab, x))
            ts.append((time.perf_counter() - t0) * 1e3)
        ms = min(ts)
        finite = np.isfinite(out).all()
        if variant == "none":
            base_ms = ms
            print(f"{variant:8s} {ms:8.3f} ms (compile {compile_s:.1f}s) "
                  f"[baseline, finite={finite}]", flush=True)
            continue
        per_us = (ms - base_ms) / args.iters * 1e3
        print(f"{variant:8s} {ms:8.3f} ms  {per_us:7.2f} us/iter "
              f"(compile {compile_s:.1f}s) [finite={finite}]", flush=True)


if __name__ == "__main__":
    main()
