"""Traversal acceleration structures: packed cells + skip-distance field.

Measured on TPU v5e (see PERF.md): XLA gathers cost ~10ns per *row*
regardless of row width, and a fori_loop chain sustains ~100M rows/s. The
DDA therefore packs everything traversal needs into ONE i32 per cube and
skips empty space with a chebyshev distance field, so each loop iteration
costs ~2 gathers instead of ~36, and empty runs collapse into single
jumps. (This module is the analog of the reference raytracer's
`TracingCubeData.always_invisible` fast path, sr.rs:569, generalized to
distances — the same role its chunk-level skipping plays.)

Packed cell layout (i32):
  bits  0..15  palette index
  bit   16     visible (block contributes to rendering)
  bit   17     is_voxel (resolution > 1 → descend into voxel grid)
  bits 18..23  skip distance D (0..63): all cubes at chebyshev distance
               < D are invisible (D=0 on visible cubes)
  bits 24..26  log2(resolution)

Voxel cells (i32[V, R, R, R]) use the same bit 16/18..23 scheme.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

VISIBLE_BIT = 1 << 16
VOXEL_BIT = 1 << 17
SKIP_SHIFT = 18
SKIP_MASK = 63
RES_SHIFT = 24
MAX_SKIP = 63


def unpack_cell(cell):
    idx = cell & 0xFFFF
    visible = (cell & VISIBLE_BIT) != 0
    is_voxel = (cell & VOXEL_BIT) != 0
    skip = (cell >> SKIP_SHIFT) & SKIP_MASK
    res_log2 = (cell >> RES_SHIFT) & 7
    return idx, visible, is_voxel, skip, res_log2


def _min_neighborhood(d):
    """3³ chebyshev min filter with +inf padding: three sequential per-axis
    3-point min passes (the chebyshev structuring element is separable)."""
    out = d
    for axis in range(3):
        padded = jnp.pad(out, [(1, 1) if a == axis else (0, 0) for a in range(3)],
                         constant_values=jnp.inf)
        sl = lambda s: tuple(
            slice(s, s + out.shape[a]) if a == axis else slice(None) for a in range(3)
        )
        out = jnp.minimum(jnp.minimum(padded[sl(0)], padded[sl(1)]), padded[sl(2)])
    return out


def skip_distance_field(visible, cap: int = 15):
    """Chebyshev distance-to-nearest-visible, clamped to cap (device).

    visible: bool[X,Y,Z]. Returns i32[X,Y,Z] with the packing semantics
    above (0 on visible cubes; D means all cubes at chebyshev < D
    invisible). Iterative 3³-min relaxation: cap passes.
    """
    d = jnp.where(visible, 0.0, jnp.float32(cap))
    for _ in range(cap):
        d = jnp.minimum(d, _min_neighborhood(d) + 1.0)
    return jnp.asarray(d, jnp.int32)


def np_skip_distance_field(visible: np.ndarray, cap: int = 15) -> np.ndarray:
    """Host (numpy) variant for snapshot-time construction."""
    d = np.where(visible, 0.0, float(cap)).astype(np.float32)
    for _ in range(cap):
        m = d
        for axis in range(3):
            p = np.pad(m, [(1, 1) if a == axis else (0, 0) for a in range(3)],
                       constant_values=np.inf)
            sls = lambda s: tuple(
                slice(s, s + d.shape[a]) if a == axis else slice(None) for a in range(3)
            )
            m = np.minimum(np.minimum(p[sls(0)], p[sls(1)]), p[sls(2)])
        d = np.minimum(d, m + 1.0)
    return d.astype(np.int32)


def pack_cells(
    contents, palette_visible, palette_voxel, palette_res_log2, skip, payload=None
):
    """Assemble packed cells (works for jnp and np inputs).

    contents: int[X,Y,Z] palette indices; palette_*: per-index rows;
    skip: i32[X,Y,Z]. `payload` (per-palette i32) is what goes in the low
    16 bits: palette index for atoms, voxel-table row for voxel blocks —
    so the traversal loop never needs a second table lookup (the palette
    index of a voxel-block *outer* cell is never used: such cells always
    descend, and shading voxel hits reads `vox_rows` directly).
    """
    if isinstance(contents, np.ndarray):
        take = lambda t: t[contents]
        asty = lambda x: x.astype(np.int32)
    else:
        take = lambda t: jnp.take(t, contents.astype(jnp.int32), axis=0)
        asty = lambda x: jnp.asarray(x, jnp.int32)
    low = asty(contents) if payload is None else asty(take(payload))
    cell = (
        low
        | asty(take(palette_visible)) * VISIBLE_BIT
        | asty(take(palette_voxel)) * VOXEL_BIT
        | (asty(skip) & SKIP_MASK) << SKIP_SHIFT
        | asty(take(palette_res_log2)) << RES_SHIFT
    )
    return cell


BRICK = 4  # cells per brick edge; a brick row = 64 cells = one gather row


def brick_dims(shape):
    """Number of bricks along each axis for a cell grid `shape`."""
    return tuple((s + BRICK - 1) // BRICK for s in shape)


def to_bricks(cells3d):
    """[X,Y,Z] cells → [n_bricks, 64] brick rows (4³ bricks, row-local
    order lx*16+ly*4+lz). Pads to brick multiples with 0 (air, invisible).

    Row gathers on TPU cost per *row* independent of width (PERF.md), so
    fetching a whole 4³ neighborhood costs the same as one cell — the
    traversal loop then takes several DDA steps per fetch.
    """
    if isinstance(cells3d, np.ndarray):
        pad_mod, transpose, reshape = np.pad, np.transpose, np.reshape
    else:
        pad_mod, transpose, reshape = jnp.pad, jnp.transpose, jnp.reshape
    bx, by, bz = brick_dims(cells3d.shape)
    pads = [(0, bx * BRICK - cells3d.shape[0]),
            (0, by * BRICK - cells3d.shape[1]),
            (0, bz * BRICK - cells3d.shape[2])]
    p = pad_mod(cells3d, pads)
    p = reshape(p, (bx, BRICK, by, BRICK, bz, BRICK))
    p = transpose(p, (0, 2, 4, 1, 3, 5))
    return reshape(p, (bx * by * bz, BRICK**3))


def cell_payload(palette_voxel_index):
    """Low-16-bit cell payload per palette entry (see pack_cells)."""
    if isinstance(palette_voxel_index, np.ndarray):
        idx = np.arange(palette_voxel_index.shape[0], dtype=np.int32)
        return np.where(palette_voxel_index >= 0, palette_voxel_index, idx)
    idx = jnp.arange(palette_voxel_index.shape[0], dtype=jnp.int32)
    return jnp.where(palette_voxel_index >= 0, palette_voxel_index, idx)


def build_trace_cells(
    contents, palette_visible, palette_voxel, palette_res_log2, cap=15, payload=None
):
    """Full rebuild: visibility grid → skip field → packed cells."""
    if isinstance(contents, np.ndarray):
        vis = palette_visible[contents]
        skip = np_skip_distance_field(vis, cap)
    else:
        vis = jnp.take(palette_visible, contents.astype(jnp.int32), axis=0)
        skip = skip_distance_field(vis, cap)
    return pack_cells(
        contents, palette_visible, palette_voxel, palette_res_log2, skip, payload
    )
