#!/usr/bin/env python
"""Perf probe 9: exact top_k compaction vs the full variadic sort for the
extra-phase glue (80k entries, ~10% needy). top_k(k=20%) + payload gathers
would let kernel B see a 5x smaller stream IF top_k beats the sort."""

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
    k = 16384
    rng = np.random.RandomState(0)
    bud_np = np.where(rng.rand(n) < 0.1, 12.0, 0.0).astype(np.float32)
    st_np = rng.randint(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    bud = jnp.asarray(bud_np)
    st = jnp.asarray(st_np)
    idx = jnp.arange(n, dtype=jnp.int32)

    def chain(x, seed):
        s = jnp.sum(x[:1].astype(jnp.float32)) + seed.astype(jnp.float32)
        return s.astype(jnp.uint32) % jnp.uint32(97) + jnp.uint32(7)

    @jax.jit
    def v_sort(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        k_s, i_s, s_s = jax.lax.sort((-b, idx, st), num_keys=1,
                                     is_stable=False)
        return chain(k_s + i_s.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    @jax.jit
    def v_topk(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        vals, inds = jax.lax.top_k(b, k)
        s_s = st[inds]
        return chain(vals + inds.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    @jax.jit
    def v_topk_small(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        vals, inds = jax.lax.top_k(b, 8192)
        s_s = st[inds]
        return chain(vals + inds.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    for name, fn in (("variadic sort 80k", v_sort),
                     (f"top_k k={k} + 1 gather", v_topk),
                     ("top_k k=8192 + 1 gather", v_topk_small)):
        t = timeit(fn, 7)
        print(f"{name}: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
