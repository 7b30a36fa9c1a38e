#!/usr/bin/env python
"""Does Mosaic legalize scalar-pred lax.cond with VECTOR results, and does
it actually skip the untaken branch (predicated jump) or execute both?

Kernel: per grid step, loop K times; each iteration either runs a heavy
vector expression under lax.cond(pred, heavy, cheap) or runs it unguarded.
pred is data-dependent scalar, false ~F fraction of iterations. If cond
skips, runtime ~ F * unguarded."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SHAPE = (16, 128)
    K = 400
    HEAVY = 40  # multiply-add chain length

    def heavy(x):
        y = x
        for _ in range(HEAVY):
            y = y * 1.000001 + 0.5
            y = y - jnp.floor(y * 0.5)
        return y

    def make_kernel(frac_true: float, use_cond: bool):
        def kernel(seed_ref, out_ref):
            x = jax.lax.broadcasted_iota(jnp.int32, SHAPE, 1).astype(
                jnp.float32
            ) * 0.01

            def body(i, x):
                # scalar pred, true for frac_true of iterations, depends on
                # runtime seed so the compiler can't fold it
                pred = ((i * 40503 + seed_ref[0]) % 1000) < int(
                    frac_true * 1000
                )
                if use_cond:
                    return jax.lax.cond(pred, heavy, lambda v: v + 0.0, x)
                return jnp.where(pred, 1.0, 0.0) * 0.0 + heavy(x)

            x = jax.lax.fori_loop(0, K, body, x)
            out_ref[:, :] = x

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                SHAPE, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            grid=(256,),
        )

    def bench(fn, seed):
        out = fn(jnp.asarray([seed], jnp.int32))
        out.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for r in range(20):
                out = fn(jnp.asarray([seed + r], jnp.int32))
            out.block_until_ready()
            ts.append((time.perf_counter() - t0) / 20)
        return statistics.median(ts) * 1e3

    try:
        full = bench(make_kernel(1.0, use_cond=False), 7)
        print(f"[cond] unguarded always-heavy: {full:.3f} ms")
        for frac in (1.0, 0.25, 0.05):
            t = bench(make_kernel(frac, use_cond=True), 7)
            print(f"[cond] lax.cond frac_true={frac}: {t:.3f} ms "
                  f"(skip-ratio {t / full:.2f})")
    except Exception as e:
        print(f"[cond] FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
