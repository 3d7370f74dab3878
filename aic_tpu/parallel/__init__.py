"""Multi-chip parallelism (SPMD over jax.sharding.Mesh)."""

from .mesh import make_mesh, render_sharded, replicate, trace_rays_sharded

__all__ = ["make_mesh", "render_sharded", "replicate", "trace_rays_sharded"]
