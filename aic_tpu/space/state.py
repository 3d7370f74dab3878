"""Device-resident Space state (layer 1) — the arrays the TPU computes on.

This is the TPU-native re-design of the reference's `Space`
(all-is-cubes/src/space.rs:102): palette-compressed contents
(`BlockIndex = u16`, space.rs:77), a packed light field (light/data.rs:51),
and palette-derived block tables produced by host block evaluation. All
fields are fixed-shape JAX arrays so an entire simulation step compiles to
one XLA program; palette growth or bounds changes rebuild the state on host
(rare, content-time events — the same cadence at which the reference
re-evaluates blocks).

Layout notes (TPU-first):
- contents is `uint16[X, Y, Z]` in C order = the reference's Z-major
  linearization (vol.rs:274), so serialized payloads interchange.
- light is `uint8[X, Y, Z, 4]` = the exact `PackedLight::as_texel` layout
  (data.rs:162) the reference uploads to its GPU light texture.
- Per-voxel tables hold only multi-voxel ("Recur") palette entries, indexed
  through `voxel_index`; atoms are fully described by the per-block rows.
  Entries with resolution R < the table's padded R occupy the [0, R)³
  corner; kernels index with the entry's own R.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockTables:
    """Palette-derived per-block data (host block eval output).

    P = padded palette size, V = padded voxel-entry count, R = padded
    voxel resolution. Rows beyond the live palette are air-like.
    """

    # Per-block scalar/derived rows [P, ...]:
    resolution: jax.Array  # i32[P]   (1 for atoms)
    visible: jax.Array  # bool[P]  visible_or_animated (evaluated.rs:252)
    opaque_faces: jax.Array  # bool[P,6] (derived.rs opaque)
    face_colors: jax.Array  # f32[P,7,4] faces 0..5 + mean color at 6
    light_emission: jax.Array  # f32[P,3]
    collision_uniform: jax.Array  # i32[P]: -1 non-uniform, else class
    #: Resolution of the entry's row in `vox_solid` = min(resolution, 32).
    #: Collision geometry is quantized to 1/32-cube boxes for finer
    #: blocks (conservative any-solid pooling): the flattened window
    #: sweep materializes 125·R³ candidate boxes, so R must stay bounded
    #: (the reference recurses per-ray instead, collision.rs:305-333,
    #: and pays no such cost — this is the documented precision tradeoff
    #: of the vectorized design).
    collision_res: jax.Array  # i32[P]
    voxel_index: jax.Array  # i32[P]: -1 = atom, else row in vox_* tables
    res_log2: jax.Array  # i32[P] log2(resolution) (for cell packing)
    #: Light-walk rows [P*6, 8]: per (block, entered-face) everything one
    #: chart step needs — face r,g,b,alpha; flags (opaque + 2·visible);
    #: emission rgb. One row gather replaces four element gathers.
    light_face_rows: jax.Array  # f32[P*6, 8]
    # Shading rows (one wide row-gather fetches all material data; rows
    # cost the same as single elements on TPU — see raytrace/accel.py):
    palette_rows: jax.Array  # f32[P,8]: atom rgba, emission rgb, spare
    vox_rows: jax.Array  # f32[V,R,R,R,8]: voxel rgba, emission rgb, spare
    #: bool[V,Rc,Rc,Rc] collision==HARD (physics), Rc = min(R, 32) — see
    #: `collision_res`.
    vox_solid: jax.Array

    @property
    def padded_palette_size(self) -> int:
        return self.resolution.shape[0]

    @property
    def padded_voxel_resolution(self) -> int:
        return self.vox_rows.shape[1]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SpaceState:
    """Complete device state of one Space.

    `lower` (bounds lower corner) and light physics parameters are static
    metadata so kernels compile them as constants.
    """

    contents: jax.Array  # u16[X,Y,Z] palette indices
    light: jax.Array  # u8[X,Y,Z,4] PackedLight texels
    light_dirty: jax.Array  # u8[X,Y,Z] relight priority (0 = clean)
    #: Packed traversal cells (raytrace/accel.py) in 4³-brick row order:
    #: space bricks first, then each voxel-block entry's bricks. The
    #: raytracer fetches ONE brick row per loop iteration and takes
    #: several DDA steps inside it (row gathers cost per row, not width).
    cells: jax.Array  # i32[n_space_bricks + V*entry_bricks, 64]
    tables: BlockTables
    sky_faces: jax.Array  # f32[6,3] BlockSky per-face (quantized)
    sky_octants: jax.Array  # f32[8,3]
    sky_mean: jax.Array  # f32[3] (quantized)
    lower: tuple[int, int, int] = field(metadata=dict(static=True))
    light_max_distance: int = field(metadata=dict(static=True))
    light_enabled: bool = field(metadata=dict(static=True))

    @property
    def size(self) -> tuple[int, int, int]:
        return self.contents.shape

    def cube_to_index(self, cubes):
        """World cube coords (..., 3) → array indices (..., 3)."""
        return cubes - jnp.asarray(self.lower, jnp.int32)


def in_bounds_mask(state: SpaceState, idx):
    """Mask of index-space positions (..., 3) inside the contents array."""
    size = jnp.asarray(state.contents.shape, jnp.int32)
    return jnp.all((idx >= 0) & (idx < size), axis=-1)


def lookup_contents(state: SpaceState, idx, oob_index=0):
    """Gather palette indices at index-space positions (..., 3).

    Out-of-bounds positions return `oob_index` (air). Gathers use a
    flattened index so XLA emits a single 1-D gather (fast path on TPU).
    """
    size = state.contents.shape
    mask = in_bounds_mask(state, idx)
    ic = jnp.clip(idx, 0, jnp.asarray(size, jnp.int32) - 1)
    flat = (ic[..., 0] * size[1] + ic[..., 1]) * size[2] + ic[..., 2]
    vals = jnp.take(state.contents.reshape(-1), flat, axis=0).astype(jnp.int32)
    return jnp.where(mask, vals, oob_index), mask


def lookup_light(state: SpaceState, idx):
    """Gather light texels at index-space positions (..., 3) → (u8[...,4], in_bounds).

    Out-of-bounds handling (sky faces / NO_RAYS per sky.rs:96
    `BlockSky::light_outside`) is done by callers because the substitute
    value is f32 sky light, not a texel.
    """
    size = state.light.shape[:3]
    mask = in_bounds_mask(state, idx)
    ic = jnp.clip(idx, 0, jnp.asarray(size, jnp.int32) - 1)
    flat = (ic[..., 0] * size[1] + ic[..., 1]) * size[2] + ic[..., 2]
    vals = jnp.take(state.light.reshape(-1, 4), flat, axis=0)
    return vals, mask


def scatter_set_cubes(state: SpaceState, idx, new_indices):
    """Set contents[idx] = new_indices; returns new state with dirty marks.

    The device half of `SpaceTransaction` commit (space/space_txn.rs:34):
    positions are index-space (N, 3); callers have already checked
    preconditions. Light dirty marks are set on the cubes and their 6
    neighbors (light/updater.rs re-enqueue semantics on content change),
    and the traversal cells (skip-distance field included) are rebuilt —
    a dense VPU pass, the device analog of the reference's `SpaceChange`
    listener fan-out to its renderers.
    """
    from ..math.faces import FACE7_NORMALS  # local import to avoid cycle
    from ..raytrace.accel import build_trace_cells, cell_payload, to_bricks
    from ..raytrace.accel import brick_dims as _brick_dims

    size = state.contents.shape
    contents = state.contents.at[idx[:, 0], idx[:, 1], idx[:, 2]].set(
        new_indices.astype(state.contents.dtype), mode="drop"
    )

    neighbors = idx[:, None, :] + jnp.asarray(FACE7_NORMALS, jnp.int32)[None, :, :]
    flatn = neighbors.reshape(-1, 3)
    dirty = state.light_dirty.at[flatn[:, 0], flatn[:, 1], flatn[:, 2]].max(
        jnp.uint8(255), mode="drop"
    )

    t = state.tables
    space_cells = build_trace_cells(
        contents.astype(jnp.int32),
        t.visible,
        t.voxel_index >= 0,
        t.res_log2,
        payload=cell_payload(t.voxel_index),
    )
    space_bricks = to_bricks(space_cells)
    n_sb = int(np.prod(_brick_dims(size)))
    cells = jnp.concatenate([space_bricks, state.cells[n_sb:]], axis=0)

    import dataclasses

    return dataclasses.replace(
        state, contents=contents, light_dirty=dirty, cells=cells
    )


def visible_light_volume(state: SpaceState, view_position, view_distance: float):
    """World-coordinate window for which rendering needs data: the view
    sphere's bounding box (plus a chunk-diagonal margin) intersected with
    the space bounds (gpu/src/light_texture.rs:39 visible_light_volume).

    Returns (lower, upper) world coords, always a non-empty box clipped
    to the state's bounds.
    """
    margin = 16.0 * 1.75  # CAMERA_MARGIN_RADIUS (light_texture.rs:34)
    p = np.asarray(view_position, np.float64)
    r = float(view_distance) + margin
    lo = np.floor(p - r).astype(np.int64)
    hi = np.ceil(p + r).astype(np.int64)
    s_lo = np.asarray(state.lower, np.int64)
    s_hi = s_lo + np.asarray(state.contents.shape, np.int64)
    lo = np.clip(lo, s_lo, s_hi - 1)
    hi = np.clip(hi, lo + 1, s_hi)
    return tuple(int(v) for v in lo), tuple(int(v) for v in hi)


def window_state(state: SpaceState, lower, upper) -> SpaceState:
    """Slice a SpaceState to the world-coordinate window [lower, upper).

    The big-world analog of the reference's windowed light texture
    (gpu/src/light_texture.rs:139-239 region mapping): spaces larger than
    the renderer wants to traverse are windowed to the visible volume.
    Contents/light slice directly; the traversal cells' space-brick
    section is rebuilt for the window (the skip field must not reference
    visibility outside it), while the palette-level voxel-block brick
    rows are shared unchanged. Rays exiting the window see sky — the same
    far-clip behavior as the reference's view-distance culling.

    Host-side operation: intended to run when the camera crosses window
    boundaries, not per frame.
    """
    from ..raytrace import accel

    lo_w = np.asarray(lower, np.int64)
    hi_w = np.asarray(upper, np.int64)
    s_lo = np.asarray(state.lower, np.int64)
    rel_lo = lo_w - s_lo
    rel_hi = hi_w - s_lo
    size = np.asarray(state.contents.shape, np.int64)
    if (rel_lo < 0).any() or (rel_hi > size).any() or (rel_hi <= rel_lo).any():
        raise ValueError(f"window {lower}..{upper} outside state bounds")
    sl = tuple(slice(int(a), int(b)) for a, b in zip(rel_lo, rel_hi))

    contents_np = np.asarray(state.contents)[sl]
    tables = state.tables
    visible = np.asarray(tables.visible)
    voxel_index = np.asarray(tables.voxel_index)
    res_log2 = np.asarray(tables.res_log2)
    space_cells = accel.build_trace_cells(
        contents_np.astype(np.int32),
        visible,
        voxel_index >= 0,
        res_log2,
        payload=accel.cell_payload(voxel_index),
    )
    n_space_bricks_old = int(np.prod(accel.brick_dims(state.contents.shape)))
    vox_brick_rows = state.cells[n_space_bricks_old:]
    cells = jnp.concatenate(
        [jnp.asarray(accel.to_bricks(space_cells)), vox_brick_rows], axis=0
    )

    import dataclasses

    return dataclasses.replace(
        state,
        contents=jnp.asarray(contents_np),
        light=jnp.asarray(np.asarray(state.light)[sl]),
        light_dirty=jnp.asarray(np.asarray(state.light_dirty)[sl]),
        cells=cells,
        lower=tuple(int(v) for v in lo_w),
    )
