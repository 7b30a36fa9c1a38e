#!/usr/bin/env python
"""Does pl.when (scalar pred, VMEM-ref side effects) actually skip the
untaken branch in Mosaic? Heavy body depends on a runtime VMEM input so it
cannot be folded; pred is data-dependent with controllable truth fraction.
If skipping works, runtime scales with frac_true."""

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
    K = 256
    HEAVY = 48

    def make_kernel(frac_true: float, guarded: bool):
        def kernel(seed_ref, x_ref, out_ref, acc):
            acc[:, :] = x_ref[:, :]

            def body(i, _):
                pred = ((i * 40503 + seed_ref[0]) % 1000) < int(
                    frac_true * 1000
                )

                def heavy():
                    y = acc[:, :]
                    for _ in range(HEAVY):
                        y = y * 1.0000001 + 0.3
                        y = y - jnp.floor(y * 0.25)
                    acc[:, :] = y

                if guarded:
                    pl.when(pred)(heavy)
                else:
                    heavy()
                return 0

            jax.lax.fori_loop(0, K, body, 0)
            out_ref[:, :] = acc[:, :]

        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(SHAPE, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(SHAPE, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            scratch_shapes=[pltpu.VMEM(SHAPE, jnp.float32)],
            grid=(64,),
        )

    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE), jnp.float32)

    def bench(fn, seed):
        out = fn(jnp.asarray([seed], jnp.int32), x)
        out.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for r in range(20):
                out = fn(jnp.asarray([seed + r], jnp.int32), x)
            out.block_until_ready()
            ts.append((time.perf_counter() - t0) / 20)
        return statistics.median(ts) * 1e3

    try:
        full = bench(make_kernel(1.0, guarded=False), 7)
        print(f"[when] unguarded always-heavy: {full:.3f} ms")
        for frac in (1.0, 0.5, 0.1, 0.02):
            t = bench(make_kernel(frac, guarded=True), 7)
            print(f"[when] pl.when frac_true={frac}: {t:.3f} ms "
                  f"(ratio {t / full:.2f})")
    except Exception as e:
        print(f"[when] FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
