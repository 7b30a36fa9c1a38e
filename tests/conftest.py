"""Test harness: run everything on the CPU backend with 8 virtual devices.

The multi-chip sharding tests use an 8-way CPU-device mesh — the JAX-native
analog of a fake collective backend (SURVEY.md §4.6). In this environment
the TPU platform plugin overrides the JAX_PLATFORMS env var, so the backend
is forced via jax.config before anything initializes it.

CI sharding: TEST_SHARD=i/n (e.g. "0/3") selects a deterministic subset of
test FILES per job so the workflow splits the suite across parallel runners
(the suite is ~37 min serial and growing — one job was closing on its
timeout, VERDICT r3 #5). Files shard as whole units (module-level fixtures
and XLA compile caches stay coherent); the three dominant files are pinned
to separate shards, the rest hash-distribute.
"""

import os
import zlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Measured heavyweights (serial runtimes, round-4 session): keep them on
# separate shards so no job inherits two of them.
_PINNED_SHARD = {
    "test_parallel.py": 0,
    "test_pallas.py": 1,
    "test_arrayscene.py": 2,
}


def pytest_collection_modifyitems(config, items):
    shard = os.environ.get("TEST_SHARD")
    if not shard:
        return
    idx, n = (int(x) for x in shard.split("/"))
    keep, drop = [], []
    for item in items:
        fname = os.path.basename(str(item.fspath))
        owner = _PINNED_SHARD.get(fname, zlib.crc32(fname.encode()) % n)
        (keep if owner % n == idx else drop).append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)
