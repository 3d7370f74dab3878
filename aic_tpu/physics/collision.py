"""Collision geometry: solid-box extraction and box/ray tests (device).

TPU-native re-design of the reference collision core
(all-is-cubes/src/physics/collision.rs). Where the reference's
`collide_along_ray` walks an `aab_raycast` and *recurses* into `Recur`
blocks' voxel grids (collision.rs:100-225, recursion at :305-333), we
flatten the recursion: every cube in a static candidate window around the
body contributes its solid geometry as a set of axis-aligned boxes —

  - one unit box when the block's collision is uniformly Hard,
  - one box of edge 1/resolution per solid voxel when the block has
    voxel-resolution collision (the `vox_solid` palette table),

and the swept/overlap tests run over ALL boxes at once as masked VPU
math. This compiles to one fixed gather + slab-test pattern per segment
(vmap-friendly over bodies) instead of a data-dependent DDA recursion.

Semantics preserved per reference:
  - t ties and entry axes follow the slab test like aab_raycast;
  - already-overlapping boxes never block movement
    (StopAt::NotAlreadyColliding, collision.rs:84-98,192-205) but are
    reported as `within` contacts;
  - touching exactly (zero-width overlap) never counts as collision —
    the reference maintains an epsilon gap via nudge_on_ray (:498).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..space.state import SpaceState

POSITION_EPSILON = 1e-4  # physics/mod.rs POSITION_EPSILON (nudge gap)
_EPS = 1e-6

#: Static candidate window half-size (cubes) for per-segment sweeps:
#: covers a body box up to ~2.2 cubes plus 1 cube of per-segment motion.
WINDOW = 2

_OFFSETS = np.stack(
    np.meshgrid(*([np.arange(-WINDOW, WINDOW + 1)] * 3), indexing="ij"), axis=-1
).reshape(-1, 3).astype(np.int32)


def window_solid_boxes(state: SpaceState, center_cube):
    """All solid collision boxes in the (2·WINDOW+1)³ cube window.

    center_cube: i32[3] world coords. Returns (lo f32[N,3], hi f32[N,3],
    valid bool[N]) in world coordinates. N is static: 125 uniform boxes
    plus 125·R³ voxel boxes when the palette has voxel entries.
    """
    t = state.tables
    offsets = jnp.asarray(_OFFSETS)
    cand = center_cube[None, :] + offsets  # [C,3] world
    size = jnp.asarray(state.contents.shape, jnp.int32)
    idxs = cand - jnp.asarray(state.lower, jnp.int32)
    inside = ((idxs >= 0) & (idxs < size)).all(-1)
    ic = jnp.clip(idxs, 0, size - 1)
    flat = (ic[..., 0] * size[1] + ic[..., 1]) * size[2] + ic[..., 2]
    pal = jnp.take(state.contents.reshape(-1), flat, axis=0).astype(jnp.int32)
    pal = jnp.where(inside, pal, 0)  # outside bounds = air (no world border)
    cu = jnp.take(t.collision_uniform, pal, axis=0)  # 1 hard / 0 none / -1 voxel

    cand_f = jnp.asarray(cand, jnp.float32)
    uni_lo = cand_f
    uni_hi = cand_f + 1.0
    uni_valid = inside & (cu == 1)

    n_vox_entries = t.vox_solid.shape[0]
    if n_vox_entries == 0:
        return uni_lo, uni_hi, uni_valid

    r_pad = t.vox_solid.shape[1]
    ventry = jnp.take(t.voxel_index, pal, axis=0)  # [C]
    # Collision granularity (min(resolution, 32)): vox_solid rows are
    # stored at this capped resolution — see BlockTables.collision_res.
    res = jnp.take(t.collision_res, pal, axis=0)  # [C]
    solid = jnp.take(
        t.vox_solid.reshape(n_vox_entries, -1), jnp.maximum(ventry, 0), axis=0
    )  # [C, R³]
    vgrid = np.stack(
        np.meshgrid(*([np.arange(r_pad)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3).astype(np.float32)  # [R³,3]
    vgrid = jnp.asarray(vgrid)
    res_f = jnp.asarray(res, jnp.float32)[:, None, None]  # [C,1,1]
    vox_lo = cand_f[:, None, :] + vgrid[None, :, :] / res_f
    vox_hi = cand_f[:, None, :] + (vgrid[None, :, :] + 1.0) / res_f
    in_res = (vgrid[None, :, :] < res_f).all(-1)  # [C,R³]
    vox_valid = inside[:, None] & (cu == -1)[:, None] & solid & in_res

    lo = jnp.concatenate([uni_lo, vox_lo.reshape(-1, 3)], axis=0)
    hi = jnp.concatenate([uni_hi, vox_hi.reshape(-1, 3)], axis=0)
    valid = jnp.concatenate([uni_valid, vox_valid.reshape(-1)], axis=0)
    return lo, hi, valid


def boxes_overlap(lo, hi, body_lo, body_hi):
    """Strict (nonzero-volume) overlap of each box with the body box.

    Touching exactly does not count (reference keeps an epsilon gap)."""
    return (
        (body_hi[None, :] > lo + _EPS) & (body_lo[None, :] < hi - _EPS)
    ).all(-1)


def sweep_boxes(lo, hi, valid, pos, delta, box_lo, box_hi):
    """Swept collision of a moving body box against candidate boxes.

    Minkowski: the body's origin point vs boxes dilated by the body
    extents. Returns dict(hit_any, t_hit, axis, first (index), within_any)
    following collide_along_ray + collide_and_advance semantics.
    """
    dlo = lo - box_hi[None, :]
    dhi = hi + (0.0 - box_lo)[None, :]

    # Already overlapping at t=0 → never blocks movement, but reported.
    in_slab0 = (pos[None, :] > dlo + _EPS) & (pos[None, :] < dhi - _EPS)
    overlap0 = in_slab0.all(-1)
    within_any = (valid & overlap0).any()

    safe_d = jnp.where(delta == 0.0, 1e-30, delta)
    t0 = (dlo - pos[None, :]) / safe_d[None, :]
    t1 = (dhi - pos[None, :]) / safe_d[None, :]
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    t_lo = jnp.where(delta[None, :] == 0.0, jnp.where(in_slab0, -jnp.inf, jnp.inf), t_lo)
    t_hi = jnp.where(delta[None, :] == 0.0, jnp.where(in_slab0, jnp.inf, -jnp.inf), t_hi)
    t_enter = t_lo.max(-1)
    t_exit = t_hi.min(-1)
    entry_axis = jnp.argmax(t_lo, axis=-1)

    hits = (
        valid & ~overlap0 & (t_enter <= t_exit) & (t_enter >= 0.0) & (t_enter < 1.0)
    )
    t_hit = jnp.where(hits, t_enter, jnp.inf).min()
    hit_any = jnp.isfinite(t_hit)
    first = jnp.argmin(jnp.where(hits, t_enter, jnp.inf))
    axis = entry_axis[first]
    return dict(
        hit_any=hit_any,
        t_hit=t_hit,
        axis=axis,
        first=first,
        dlo=dlo,
        dhi=dhi,
        within_any=within_any,
    )


def colliding_at(state: SpaceState, pos, box_lo, box_hi):
    """Is the body box at `pos` strictly overlapping any solid box?"""
    center = jnp.floor(pos + (box_lo + box_hi) * 0.5).astype(jnp.int32)
    lo, hi, valid = window_solid_boxes(state, center)
    return (valid & boxes_overlap(lo, hi, pos + box_lo, pos + box_hi)).any()
