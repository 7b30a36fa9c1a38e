"""Round-4 probe (b): WHICH 2-D gather forms lower in Mosaic?

probe21 found jnp.take on a 1-D table fails with "Only 2D gather is
supported" — so some 2-D form lowers. Candidates, each timed at steady
state like probe21:

  tala1      jnp.take_along_axis(tab(16,128), idx, axis=1)   lane gather
  tala0      jnp.take_along_axis(tab(16,128), idx, axis=0)   sublane gather
  tala1_8    same as tala1 on an (8,128) operand broadcast to 16 rows
  rowsel     full 2048-texel gather: out[i,j] = tab[r,c] via 16x
             (row-broadcast + lane gather + select on r==k)
  onehot_hi  probe21's one-hot matmul with precision=HIGHEST (exactness
             check against rowsel/selectacc semantics)

    python tools/perf_probe21b.py [--iters 512]

One TPU process; exits cleanly (never kill it mid-run).
"""

import argparse
import sys
import time

import numpy as np


def build(variant, iters, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    N = 2048  # full table: (16,128) f32

    def g_tala1(tab, idx):
        # out[i,j] = tab[i, idx[i,j] & 127]
        return jnp.take_along_axis(tab, jnp.bitwise_and(idx, 127), axis=1)

    def g_tala0(tab, idx):
        # out[i,j] = tab[idx[i,j] & 15, j]
        return jnp.take_along_axis(tab, jnp.bitwise_and(idx, 15), axis=0)

    def g_rowsel(tab, idx):
        # full gather over all 2048 texels: r = idx >> 7, c = idx & 127
        r = jax.lax.shift_right_logical(idx, 7)
        c = jnp.bitwise_and(idx, 127)
        out = jnp.zeros(idx.shape, jnp.float32)
        for k in range(16):
            row = jnp.broadcast_to(tab[k:k + 1, :], idx.shape)
            g = jnp.take_along_axis(row, c, axis=1)
            out = jnp.where(r == k, g, out)
        return out

    def g_onehot_hi(tab, idx):
        rows = []
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, N), 1)
        tabf = tab.reshape(N)
        tab2 = jnp.broadcast_to(tabf[:, None], (N, 8))
        for rr in range(16):
            row_idx = idx[rr, :]
            oh = (iota == row_idx[:, None]).astype(jnp.float32)
            rows.append(jax.lax.dot(
                oh, tab2, precision=jax.lax.Precision.HIGHEST)[:, 0])
        return jnp.stack(rows, axis=0)

    def g_selectacc_ref(tab, idx):
        tabf = tab.reshape(N)
        acc = jnp.zeros(idx.shape, jnp.float32)
        for k in range(N):
            acc = acc + jnp.where(idx == k, tabf[k], 0.0)
        return acc

    gather = {"tala1": g_tala1, "tala0": g_tala0, "rowsel": g_rowsel,
              "onehot_hi": g_onehot_hi, "selectacc": g_selectacc_ref,
              "none": None}[variant]

    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[...]
        idx0 = idx_ref[...]

        def body(i, acc):
            idx = jnp.bitwise_and(idx0 + i, N - 1)
            g = idx.astype(jnp.float32) if gather is None else gather(tab, idx)
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
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((16, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, 2048, size=(16, 128)), dtype=jnp.int32)

    results = {}
    base_ms = None
    order = ("none", "tala1", "tala0", "rowsel", "onehot_hi")
    if args.interpret:
        order = order + ("selectacc",)
    for variant in order:
        try:
            t0 = time.time()
            f = build(variant, args.iters, interpret=args.interpret)
            out = np.asarray(jax.device_get(f(tab, idx)))
            compile_s = time.time() - t0
        except Exception as e:  # noqa: BLE001 -- report and move on
            msg = str(e).replace("\n", " ")[:160]
            print(f"{variant:10s} FAIL: {msg}", flush=True)
            continue
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.device_get(f(tab, idx))
            ts.append((time.perf_counter() - t0) * 1e3)
        ms = min(ts)
        results[variant] = out
        if variant == "none":
            base_ms = ms
            print(f"{variant:10s} {ms:8.3f} ms (compile {compile_s:.1f}s) "
                  f"[loop baseline]", flush=True)
            continue
        per_us = (ms - base_ms) / args.iters * 1e3
        # rowsel/onehot_hi/selectacc compute the same full-table gather;
        # tala1/tala0 compute different (restricted) semantics.
        tag = ""
        if variant in ("onehot_hi", "selectacc") and "rowsel" in results:
            tag = (" [match rowsel]" if np.array_equal(out, results["rowsel"])
                   else " [MISMATCH vs rowsel]")
        print(f"{variant:10s} {ms:8.3f} ms  {per_us:7.2f} us/gather  "
              f"(compile {compile_s:.1f}s){tag}", flush=True)


if __name__ == "__main__":
    main()
