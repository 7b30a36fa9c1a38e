"""Test harness: run everything on the CPU backend with 8 virtual devices.

The multi-chip sharding tests use an 8-way CPU-device mesh — the JAX-native
analog of a fake collective backend (SURVEY.md §4.6). In this environment
the TPU platform plugin overrides the JAX_PLATFORMS env var, so the backend
is forced via jax.config before anything initializes it.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
