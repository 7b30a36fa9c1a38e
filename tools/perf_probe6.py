#!/usr/bin/env python
"""Perf probe 6: XLA glue variants for the sorted pipeline at north-star
scale (80000 entries) — sort formulations and scatter-back formulations."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, s0, n=48, reps=3):
    import jax
    import jax.numpy as jnp

    s = jnp.asarray(s0, jnp.uint32)
    s = fn(s)
    jax.device_get(s)
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        jax.device_get(s)
        meds.append((time.perf_counter() - t0) / n * 1e3)
    return statistics.median(meds)


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", flush=True)
    n = 80000
    rng = np.random.RandomState(0)
    bud_np = np.where(rng.rand(n) < 0.1,
                      rng.randint(1, 13, n), 0).astype(np.float32)
    st_np = rng.randint(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    bud = jnp.asarray(bud_np)
    st = jnp.asarray(st_np)
    idx = jnp.arange(n, dtype=jnp.int32)

    def chain(x, seed):
        s = jnp.sum(x[:1].astype(jnp.float32)) + seed.astype(jnp.float32)
        return s.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

    @jax.jit
    def v_variadic(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        k_s, i_s, s_s = jax.lax.sort((-b, idx, st), num_keys=1,
                                     is_stable=False)
        return chain(k_s + i_s.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    @jax.jit
    def v_packed(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        key = ((jnp.uint32(4095) - b.astype(jnp.uint32)) << jnp.uint32(20)
               ) | idx.astype(jnp.uint32)
        key_s = jax.lax.sort(key, is_stable=False)
        i_s = (key_s & jnp.uint32(0xFFFFF)).astype(jnp.int32)
        b_s = 4095.0 - (key_s >> jnp.uint32(20)).astype(jnp.float32)
        s_s = st[i_s]
        return chain(b_s + i_s.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    @jax.jit
    def v_argsort(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        order = jnp.argsort(-b)
        s_s = st[order]
        b_s = b[order]
        return chain(b_s + order.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    vals = jnp.asarray(rng.rand(n), jnp.float32)
    pix = jnp.asarray(rng.permutation(n).astype(np.int32))

    @jax.jit
    def sc_add(seed):
        v = vals + seed.astype(jnp.float32) * 0.0
        out = jnp.zeros((n,), jnp.float32).at[pix].add(v)
        return chain(out, seed)

    @jax.jit
    def sc_add_unique(seed):
        v = vals + seed.astype(jnp.float32) * 0.0
        out = jnp.zeros((n,), jnp.float32).at[pix].add(v, unique_indices=True)
        return chain(out, seed)

    @jax.jit
    def sc_set_unique(seed):
        v = vals + seed.astype(jnp.float32) * 0.0
        out = jnp.zeros((n,), jnp.float32).at[pix].set(v, unique_indices=True)
        return chain(out, seed)

    for name, fn in (("sort variadic(key,idx,state)", v_variadic),
                     ("sort packed u32 key + 1 gather", v_packed),
                     ("argsort + 2 gathers", v_argsort),
                     ("scatter add", sc_add),
                     ("scatter add unique", sc_add_unique),
                     ("scatter set unique", sc_set_unique)):
        t = timeit(fn, 7)
        print(f"{name}: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
