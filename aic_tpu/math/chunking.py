"""Chunking: distance-sorted chunk offset charts.

Reference: all-is-cubes/src/chunking.rs:55 `ChunkPos`, :179 `ChunkChart` —
a precomputed list of chunk offsets within a view distance, sorted
near-to-far, used to process world chunks in the order that matters for
rendering/meshing. The chart is octant-symmetric and cached per distance.
"""

from __future__ import annotations

import functools

import numpy as np

CHUNK_SIZE = 16  # the GPU renderer's chunk size (all-is-cubes-gpu/src/space.rs:46)


@functools.lru_cache(maxsize=16)
def chunk_chart(view_distance_chunks: float) -> np.ndarray:
    """Offsets (i32[N,3]) of all chunks whose nearest point is within
    `view_distance_chunks` of the center chunk, sorted by distance
    (chunking.rs:179 ChunkChart::new)."""
    r = int(np.ceil(view_distance_chunks)) + 1
    rng = np.arange(-r, r + 1)
    g = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1).reshape(-1, 3)
    # Distance from the center chunk's boundary to the nearest point of
    # the offset chunk (chebyshev→euclid per-axis nearest, matching the
    # reference's nearest-point metric).
    nearest = np.maximum(np.abs(g) - 1, 0)
    keep = (nearest**2).sum(-1) <= view_distance_chunks**2
    g = g[keep]
    # Sort by chunk-center distance so iteration is near→far with the
    # center chunk first (ties among equal distances are stable).
    order = np.argsort((g**2).sum(-1), kind="stable")
    return g[order].astype(np.int32)


def cube_to_chunk(cube, chunk_size: int = CHUNK_SIZE):
    return tuple(int(np.floor(c / chunk_size)) for c in cube)


def chunks_near(center_chunk, view_distance_cubes: float, chunk_size: int = CHUNK_SIZE):
    """Iterate chunk positions near→far around `center_chunk`
    (chunking.rs:298 `chunks()`)."""
    chart = chunk_chart(view_distance_cubes / chunk_size)
    c = np.asarray(center_chunk, np.int32)
    for off in chart:
        yield tuple(int(v) for v in (c + off))
