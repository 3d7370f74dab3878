"""Multi-chip sharding: tiled raytrace + sharded relight over a device mesh.

The reference is a single-process shared-memory engine whose parallel
structures are rayon loops and channels (SURVEY §2.9); the TPU-native
equivalent is SPMD over a `jax.sharding.Mesh`:

- the raytrace is data-parallel over pixels: rays are sharded along rows
  ("the rayon par-iter over pixel rows", renderer.rs:543, becomes a mesh
  axis), space state replicated;
- the relight batch is data-parallel over queued cubes (the rayon batch of
  32, updater.rs:206, becomes the batch axis sharded across chips);
- (planned, SURVEY §7.11) Space slab sharding with halo exchange of
  light/occupancy borders over ICI for worlds larger than one chip's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..raytrace.options import GraphicsOptions
from ..raytrace.tracer import trace_rays
from ..space.state import SpaceState


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but platform "
                f"{jax.default_backend()!r} has only {len(devs)} device(s); "
                "a silently-smaller mesh would make sharding tests vacuous"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate(state, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def trace_rays_sharded(
    state: SpaceState,
    origins,
    directions,
    options: GraphicsOptions,
    mesh: Mesh,
    include_sky: bool = True,
):
    """Raytrace with rays sharded across the mesh's first axis.

    origins/directions: (N, ..., 3) with N divisible by the mesh size.
    State is replicated; XLA partitions the embarrassingly-parallel ray
    loop with zero collectives (the final image gather happens on fetch).
    """
    axis = mesh.axis_names[0]
    ray_sharding = NamedSharding(mesh, P(axis))
    origins = jax.device_put(origins, ray_sharding)
    directions = jax.device_put(directions, ray_sharding)
    state = replicate(state, mesh)
    return trace_rays(state, origins, directions, options, include_sky=include_sky)


def render_sharded(state: SpaceState, camera, mesh: Mesh):
    """Full-frame render with rows sharded across chips."""
    origins, directions = camera.pixel_rays()
    h = origins.shape[0]
    n = mesh.devices.size
    pad = (-h) % n
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0), (0, 0)), mode="edge")
        directions = jnp.pad(directions, ((0, pad), (0, 0), (0, 0)), mode="edge")
    light, trans = trace_rays_sharded(
        state, origins, directions, camera.options, mesh
    )
    return light[:h], trans[:h]
