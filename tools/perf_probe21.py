"""Round-4 probe: per-lane texel GATHER strategies inside a Pallas kernel.

The image-texture channel (VERDICT r3 #6) needs rgb = table[idx] where idx
is a per-lane (16,128) i32 texel index and table is a small VMEM-resident
texel array. Candidate lowerings, compile-checked and timed on the real
chip at steady state (fori_loop of ITERS gathers, loop overhead baseline
subtracted):

  take       jnp.take(tab, idx)            -- Mosaic dynamic_gather if legal
  getitem    tab[idx]                      -- same lowering, fancy indexing
  onehotmm   per-sublane-row one-hot matmul (128,N)@(N,8) x 16 rows (MXU)
  selectacc  O(N) iota-compare masked accumulate (VPU, the checker pattern)

    python tools/perf_probe21.py [--sizes 128,256,1024,4096] [--iters 512]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import functools
import sys
import time

import numpy as np


def build(variant, n, iters, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def gather_take(tab, idx):
        return jnp.take(tab, idx)

    def gather_getitem(tab, idx):
        return tab[idx]

    def gather_onehotmm(tab, idx):
        rows = []
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, n), 1)
        tab2 = jnp.broadcast_to(tab[:, None], (n, 8))
        for r in range(16):
            row_idx = idx[r, :]
            oh = (iota == row_idx[:, None]).astype(jnp.float32)
            rows.append(jax.lax.dot(oh, tab2)[:, 0])
        return jnp.stack(rows, axis=0)

    def gather_selectacc(tab, idx):
        acc = jnp.zeros(idx.shape, jnp.float32)
        for k in range(n):
            acc = acc + jnp.where(idx == k, tab[k], 0.0)
        return acc

    gather = {"take": gather_take, "getitem": gather_getitem,
              "onehotmm": gather_onehotmm, "selectacc": gather_selectacc,
              "none": None}[variant]

    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[...]
        idx0 = idx_ref[...]

        def body(i, acc):
            idx = jnp.bitwise_and(idx0 + i, n - 1)
            if gather is None:
                g = idx.astype(jnp.float32)
            else:
                g = gather(tab, idx)
            return acc + g

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
    ap.add_argument("--sizes", default="128,256,1024,4096")
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sizes = [int(s) for s in args.sizes.split(",")]
    rng = np.random.default_rng(0)

    for n in sizes:
        tab = jnp.asarray(rng.random(n, dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(16, 128)), dtype=jnp.int32)
        want = None
        base_ms = None
        for variant in ("none", "take", "getitem", "onehotmm", "selectacc"):
            if variant == "selectacc" and n > 512:
                continue
            try:
                t0 = time.time()
                f = build(variant, n, args.iters, interpret=args.interpret)
                out = jax.device_get(f(tab, idx))
                compile_s = time.time() - t0
            except Exception as e:  # noqa: BLE001 -- report and move on
                msg = str(e).replace("\n", " ")[:160]
                print(f"N={n:5d} {variant:10s} FAIL: {msg}", flush=True)
                continue
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.device_get(f(tab, idx))
                ts.append((time.perf_counter() - t0) * 1e3)
            ms = min(ts)
            if variant == "none":
                base_ms = ms
                print(f"N={n:5d} {variant:10s} {ms:8.3f} ms "
                      f"(compile {compile_s:.1f}s) [loop baseline]",
                      flush=True)
                continue
            per_gather_us = (ms - base_ms) / args.iters * 1e3
            if want is None:
                want = out
                ok = "ref"
            else:
                ok = "match" if np.array_equal(out, want) else "MISMATCH"
            print(f"N={n:5d} {variant:10s} {ms:8.3f} ms  "
                  f"{per_gather_us:7.2f} us/gather  (compile {compile_s:.1f}s) "
                  f"[{ok}]", flush=True)


if __name__ == "__main__":
    main()
