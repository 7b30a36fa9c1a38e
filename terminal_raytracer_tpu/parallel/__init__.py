"""Multi-chip scale-out via jax.sharding Mesh + shard_map."""

from .mesh import make_mesh, make_sharded_render_step  # noqa: F401
