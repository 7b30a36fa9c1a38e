#!/usr/bin/env python
"""Perf probe 7: binary-budget partition glue vs the variadic sort, at the
north-star entry count (80000, ~10% needy). Budgets at every shipped config
are all-or-nothing (var>10 -> var*50 > 500 >= spp-base), so a stable
partition is enough to compact the needy pixels."""

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
    def v_partition_scatter(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        needy = (b > 0.0).astype(jnp.int32)
        c = jnp.cumsum(needy)
        n_needy = c[-1]
        pos = jnp.where(needy == 1, c - 1,
                        n_needy + idx - c)  # idx - c = rank among rest
        i_s = jnp.zeros((n,), jnp.int32).at[pos].set(
            idx, unique_indices=True)
        s_s = jnp.zeros((n,), jnp.uint32).at[pos].set(
            st, unique_indices=True)
        b_s = jnp.zeros((n,), jnp.float32).at[pos].set(
            b, unique_indices=True)
        return chain(b_s + i_s.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    @jax.jit
    def v_partition_gather(seed):
        b = bud + seed.astype(jnp.float32) * 0.0
        needy = (b > 0.0).astype(jnp.int32)
        c = jnp.cumsum(needy)
        n_needy = c[-1]
        pos = jnp.where(needy == 1, c - 1, n_needy + idx - c)
        inv = jnp.zeros((n,), jnp.int32).at[pos].set(
            idx, unique_indices=True)
        i_s = inv
        s_s = st[inv]
        b_s = b[inv]
        return chain(b_s + i_s.astype(jnp.float32)
                     + s_s.astype(jnp.float32), seed)

    # correctness (pure numpy -- eager TPU dispatches are expensive here)
    needy_np = (bud_np > 0).astype(np.int32)
    c_np = np.cumsum(needy_np)
    n_needy = int(c_np[-1])
    idx_np = np.arange(n, dtype=np.int32)
    pos_np = np.where(needy_np == 1, c_np - 1, n_needy + idx_np - c_np)
    assert sorted(pos_np.tolist()) == list(range(n)), "not a permutation"
    b_s = np.zeros(n, np.float32)
    b_s[pos_np] = bud_np
    assert (b_s[:n_needy] > 0).all() and (b_s[n_needy:] == 0).all()
    print(f"partition correct: {n_needy} needy first", flush=True)

    for name, fn in (("variadic sort", v_sort),
                     ("binary partition + 3 scatters", v_partition_scatter),
                     ("binary partition + inv + 2 gathers",
                      v_partition_gather)):
        t = timeit(fn, 7)
        print(f"{name}: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
