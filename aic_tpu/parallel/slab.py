"""Slab-sharded Space: the world partitioned across a device mesh.

The scale-out design SURVEY §2.9 maps to the reference's single-node
shared-memory world (space.rs:102 + the GPU windowed light texture,
gpu/src/light_texture.rs:139-239): worlds larger than one chip's HBM are
split into X-slabs — contents/light/cells live sharded along the mesh's
slab axis — and the two volume passes run SPMD:

- **relight** (the dense Jacobi pass, light/dense.py): each device relights
  its own slab. The chart windows read up to `pad = min(max_distance+1, X)`
  cubes past the slab on either side, so each pass first exchanges light
  halos with the slab neighbors over ICI via `lax.ppermute` (multi-hop when
  the halo is deeper than a slab). Beyond the world bounds the halo decays
  to the BlockSky planes, exactly like the replicated `_padded_light`.
  The contents-derived chart volumes (RelightCtx) are built sharded the
  same way, with a one-time contents halo exchange.
- **raytrace**: every device traces the full ray set against its slab
  window only (include_sky off), producing per-slab premultiplied light +
  transmittance; slabs are composited front-to-back in the ray's X
  direction (slabs partition X, so a ray crosses them in X order) and the
  sky term is applied once at the end. The per-slab window states reuse
  `window_state`'s cell rebuild (space/state.py:203).

Equality against the replicated implementations is pinned by
tests/test_slab.py; `__graft_entry__.dryrun_multichip` runs both passes on
the driver's virtual mesh.

Contents are uint16 slabs: a 2048³ world is 16 GiB of light + 16 GiB of
contents replicated, but 4 GiB per chip on an 8-chip slab mesh — the
reason this exists (BASELINE config 5, "multi-chip tiles").
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..light import dense as _dense
from ..math import faces, lightpack
from ..raytrace.options import GraphicsOptions
from ..raytrace.tracer import trace_rays
from ..space.state import SpaceState, window_state


@dataclasses.dataclass
class SlabSharded:
    """A Space's device state sharded in X-slabs over `mesh`.

    `vols` holds the stacked per-slab arrays (leading axis = device):
    contents u16[D,Xs,Y,Z], light u8[D,Xs,Y,Z,4], light_dirty u8[D,Xs,Y,Z],
    cells i32[D,rows,64]. Tables/sky are replicated; `full_cells` keeps the
    unsliced traversal cells so `gather()` restores a replicated state
    without a host rebuild.
    """

    mesh: Mesh
    axis: str
    vols: dict
    tables: object
    sky_faces: jax.Array
    sky_octants: jax.Array
    sky_mean: jax.Array
    lower: tuple
    light_max_distance: int
    light_enabled: bool
    global_size: tuple
    slab_x: int
    full_cells: jax.Array

    @property
    def n_devices(self) -> int:
        return int(self.mesh.devices.size)

    def gather(self) -> SpaceState:
        """Reassemble a replicated SpaceState (host-visible light)."""
        def unstack(a):
            return jnp.concatenate([a[i] for i in range(a.shape[0])], axis=0)

        return SpaceState(
            contents=unstack(self.vols["contents"]),
            light=unstack(self.vols["light"]),
            light_dirty=unstack(self.vols["light_dirty"]),
            cells=self.full_cells,
            tables=self.tables,
            sky_faces=self.sky_faces,
            sky_octants=self.sky_octants,
            sky_mean=self.sky_mean,
            lower=self.lower,
            light_max_distance=self.light_max_distance,
            light_enabled=self.light_enabled,
        )


def shard_space(state: SpaceState, mesh: Mesh) -> SlabSharded:
    """Split `state` into equal X-slabs across `mesh`'s first axis.

    X must be divisible by the device count (slabs must be equal for SPMD;
    content-time concern, like the reference's chunk alignment). Each
    slab's traversal cells are rebuilt for its window (the skip field must
    not see visibility outside the slab) via window_state.
    """
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    size = state.contents.shape
    if size[0] % n_dev:
        raise ValueError(
            f"slab sharding needs X ({size[0]}) divisible by the device "
            f"count ({n_dev}); pad the space bounds to a multiple"
        )
    xs = size[0] // n_dev
    lo = np.asarray(state.lower, np.int64)
    hi = lo + np.asarray(size, np.int64)
    slabs = [
        window_state(
            state,
            (int(lo[0] + d * xs), int(lo[1]), int(lo[2])),
            (int(lo[0] + (d + 1) * xs), int(hi[1]), int(hi[2])),
        )
        for d in range(n_dev)
    ]
    sharding = NamedSharding(mesh, P(axis))
    vols = {
        "contents": jnp.stack([s.contents for s in slabs]),
        "light": jnp.stack([s.light for s in slabs]),
        "light_dirty": jnp.stack([s.light_dirty for s in slabs]),
        "cells": jnp.stack([s.cells for s in slabs]),
    }
    vols = {k: jax.device_put(v, sharding) for k, v in vols.items()}
    return SlabSharded(
        mesh=mesh,
        axis=axis,
        vols=vols,
        tables=state.tables,
        sky_faces=state.sky_faces,
        sky_octants=state.sky_octants,
        sky_mean=state.sky_mean,
        lower=tuple(int(v) for v in state.lower),
        light_max_distance=state.light_max_distance,
        light_enabled=state.light_enabled,
        global_size=tuple(int(v) for v in size),
        slab_x=xs,
        full_cells=state.cells,
    )


def _halo_ext(local, axis_name: str, n_dev: int, halo: int, slab: int):
    """Extend `local` ([Xs, ...]) with `halo` planes from each X neighbor
    via ppermute hops (zeros past the chain ends = outside the world)."""
    hops = max(1, math.ceil(halo / slab))
    fwd = [(i, i + 1) for i in range(n_dev - 1)]  # receive from left
    bwd = [(i + 1, i) for i in range(n_dev - 1)]  # receive from right
    parts, cur = [], local
    for _ in range(hops):
        cur = jax.lax.ppermute(cur, axis_name, fwd)
        parts.insert(0, cur)
    parts.append(local)
    cur = local
    for _ in range(hops):
        cur = jax.lax.ppermute(cur, axis_name, bwd)
        parts.append(cur)
    ext = jnp.concatenate(parts, axis=0)
    start = hops * slab - halo
    return jax.lax.slice_in_dim(ext, start, start + slab + 2 * halo, axis=0)


def _global_x(axis_name: str, slab: int, n: int, offset: int):
    """Global X coordinate of each of `n` local planes starting `offset`
    before this device's slab start."""
    x0 = jax.lax.axis_index(axis_name) * slab
    return x0 - offset + jnp.arange(n, dtype=jnp.int32)


def _slab_light_pad(light_u8, pad, sky, axis, n_dev, global_size):
    """Per-slab `_padded_light` (dense.py:184): decoded light with chart
    halos from the neighbors and the BlockSky one-ring at the world faces,
    expressed with arithmetic masks on global coordinates so interior and
    boundary devices run the same program."""
    xs, Y, Z = light_u8.shape[:3]
    X = global_size[0]
    dec = lightpack.decode_rgb(light_u8)
    ext = _halo_ext(dec, axis, n_dev, pad[0], xs)
    lp = jnp.pad(ext, ((0, 0), (pad[1], pad[1]), (pad[2], pad[2]), (0, 0)))

    xg = _global_x(axis, xs, xs + 2 * pad[0], pad[0])  # [nx]
    nx = xs + 2 * pad[0]
    ny, nz = Y + 2 * pad[1], Z + 2 * pad[2]
    gy = jnp.arange(ny, dtype=jnp.int32) - pad[1]
    gz = jnp.arange(nz, dtype=jnp.int32) - pad[2]
    in_x = ((xg >= 0) & (xg < X))[:, None, None]
    in_y = ((gy >= 0) & (gy < Y))[None, :, None]
    in_z = ((gz >= 0) & (gz < Z))[None, None, :]

    def put(mask, rgb):
        return jnp.where(mask[..., None], jnp.broadcast_to(rgb, lp.shape), lp)

    lp = put((xg == -1)[:, None, None] & in_y & in_z, sky[0])
    lp = put((xg == X)[:, None, None] & in_y & in_z, sky[3])
    lp = put((gy == -1)[None, :, None] & in_x & in_z, sky[1])
    lp = put((gy == Y)[None, :, None] & in_x & in_z, sky[4])
    lp = put((gz == -1)[None, None, :] & in_x & in_y, sky[2])
    lp = put((gz == Z)[None, None, :] & in_x & in_y, sky[5])
    return lp


def _slab_ctx(contents, pad, t, w_cosines, axis, n_dev):
    """Per-slab RelightCtx (dense.build_relight_ctx:120): pointwise fields
    on the slab, 1-halo shifts and the face_vol x-halo taken from the
    contents halo exchange (air/zero beyond the world — air rows are
    all-zero, and out-of-world steps are masked by the chart's inside
    test anyway)."""
    xs = contents.shape[0]
    idx_ext = _halo_ext(
        contents.astype(jnp.int32), axis, n_dev, pad[0], xs
    )  # [Xs+2px, Y, Z]
    inner = slice(pad[0], pad[0] + xs)

    rows = jnp.take(
        t.light_face_rows.reshape(t.padded_palette_size, 6, 8).astype(jnp.bfloat16),
        idx_ext,
        axis=0,
    )  # [Xs+2px, Y, Z, 6, 8]
    rows = jnp.moveaxis(rows, 3, 0)
    face_vol = jnp.pad(
        rows, ((0, 0), (0, 0), (pad[1], pad[1]), (pad[2], pad[2]), (0, 0))
    )

    visible_e = jnp.take(t.visible, idx_ext, axis=0)
    emission_e = jnp.take(t.light_emission, idx_ext, axis=0)
    emissive_e = (emission_e != 0).any(-1)
    idx = idx_ext[inner]
    visible_v = visible_e[inner]
    emission_v = emission_e[inner]
    origin_opaque = jnp.take(t.opaque_faces.all(-1), idx, axis=0)
    mean_alpha = jnp.clip(jnp.take(t.face_colors[:, 6, 3], idx, axis=0), 0.0, 1.0)

    normals = faces.FACE_NORMALS
    vis_sh = [_dense._shift_bool(visible_e, normals[f])[inner] for f in range(6)]
    emis_sh = [_dense._shift_bool(emissive_e, normals[f])[inner] for f in range(6)]
    opp = faces.OPPOSITE[:6]
    dir_weights = jnp.stack(
        [
            jnp.where(visible_v | vis_sh[int(opp[f])] | emis_sh[f], 1.0, 0.0)
            for f in range(6)
        ],
        axis=-1,
    )

    root_pickup = visible_v & ~origin_opaque & (mean_alpha < 1.0)
    root_contrib = jnp.where(root_pickup[..., None], emission_v, 0.0)
    alpha0 = jnp.where(root_pickup, 1.0 - mean_alpha, 1.0)
    w_total = dir_weights @ w_cosines
    return _dense.RelightCtx(
        face_vol=face_vol,
        dir_weights=dir_weights,
        alpha0=alpha0,
        incoming0=root_contrib * w_total[..., None],
        origin_opaque=origin_opaque,
        origin_emission=emission_v,
        pad=pad,
    )


def relight_pass_slab(sh: SlabSharded, lanes: int | None = None):
    """One whole-volume Jacobi relight pass, slab-sharded.

    Per-cube results are identical to `relight_all_pass` on the
    replicated state (pinned by tests/test_slab.py): each device scans
    the same global chart pair stream over its slab, with window reads
    satisfied from the ppermute'd halos. Returns (stats, updated sh).
    """
    size = sh.global_size
    md = sh.light_max_distance
    pad = tuple(min(md + 1, s) for s in size)
    if lanes is None:
        lanes = _dense._default_lanes((sh.slab_x,) + size[1:])
    ch_full = _dense._pair_tables(md, size)
    cosines = jnp.asarray(ch_full["cosines"])
    w_cosines = jnp.asarray(ch_full["cosines"].sum(axis=0))
    sky_ray_table = (cosines @ sh.sky_faces) / cosines.sum(-1, keepdims=True)
    if lanes == 1:
        xs_tab = {
            k: jnp.asarray(ch_full[k])
            for k in ("off", "face", "is_end", "ray_new", "ray_id")
        }
    else:
        ch = _dense._pair_tables_sharded(md, size, lanes)
        xs_tab = {
            k: jnp.moveaxis(jnp.asarray(ch[k]), 0, 1)
            for k in ("off", "face", "is_end", "ray_new", "ray_id")
        }

    slab = sh.slab_x
    local_size = (slab,) + size[1:]

    axis, n_dev = sh.axis, sh.n_devices

    def shard_fn(vols, repl):
        tables, sky_faces, cosines, w_cosines, sky_ray_table, xs_tab = repl
        contents = vols["contents"][0]
        light = vols["light"][0]
        light_pad = _slab_light_pad(light, pad, sky_faces, axis, n_dev, size)
        ctx = _slab_ctx(contents, pad, tables, w_cosines, axis, n_dev)
        origin = jnp.stack(
            [
                (jax.lax.axis_index(axis) * slab).astype(jnp.int32),
                jnp.int32(0),
                jnp.int32(0),
            ]
        )
        incoming, total_w = _dense._run_pairs(
            ctx,
            local_size,
            light_pad,
            cosines,
            sky_ray_table,
            xs_tab,
            origin=origin,
            full_size=size,
        )
        new_light = _dense._finish(ctx, incoming + ctx.incoming0, total_w)
        return new_light[None]

    fn = jax.shard_map(
        shard_fn,
        mesh=sh.mesh,
        in_specs=(P(sh.axis), P()),
        out_specs=P(sh.axis),
        check_vma=False,
    )
    new_light = fn(
        sh.vols,
        (sh.tables, sh.sky_faces, cosines, w_cosines, sky_ray_table, xs_tab),
    )
    diff = lightpack.difference_priority(sh.vols["light"], new_light)
    stats = dict(max_diff=diff.max())
    sh.vols["light"] = new_light
    return stats


def evaluate_light_slab(sh: SlabSharded, max_passes: int = 32) -> int:
    """Slab-sharded `evaluate_light_dense`: Jacobi passes (each with halo
    exchange) until no cube moves by more than one packed step
    (updater.rs:340 re-enqueue threshold). Returns passes run."""
    passes = 0
    for _ in range(max_passes):
        stats = relight_pass_slab(sh)
        passes += 1
        if int(stats["max_diff"]) <= 1:
            break
    sh.vols["light_dirty"] = jnp.zeros_like(sh.vols["light_dirty"])
    return passes


def trace_rays_slab(
    sh: SlabSharded,
    origins,
    directions,
    options: GraphicsOptions,
    include_sky: bool = True,
):
    """Raytrace against the slab-sharded world.

    Every device traces the full ray set within its own slab window
    (sky off), then slabs composite front-to-back in the ray's X
    direction — slabs partition X, so along any ray the slab entry order
    is ascending X iff dx >= 0 (dx == 0 rays intersect one slab; the
    others contribute identity). The sky term is applied once after the
    composite. Matches replicated trace_rays (tests/test_slab.py) up to
    the per-slab early-out threshold.
    """
    batch_shape = origins.shape[:-1]
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
    slab = sh.slab_x

    def shard_fn(vols, repl):
        tables, sky_faces, sky_octants, sky_mean, o, d = repl
        state_local = SpaceState(
            contents=vols["contents"][0],
            light=vols["light"][0],
            light_dirty=vols["light_dirty"][0],
            cells=vols["cells"][0],
            tables=tables,
            sky_faces=sky_faces,
            sky_octants=sky_octants,
            sky_mean=sky_mean,
            lower=(0, 0, 0),
            light_max_distance=sh.light_max_distance,
            light_enabled=sh.light_enabled,
        )
        x0 = (jax.lax.axis_index(sh.axis) * slab).astype(jnp.float32)
        shift = jnp.stack([jnp.float32(sh.lower[0]) + x0,
                           jnp.float32(sh.lower[1]),
                           jnp.float32(sh.lower[2])])
        light, trans = trace_rays(
            state_local, o - shift, d, options, include_sky=False, beam_tile=0
        )
        # dx == 0 rays whose origin lies exactly on a slab cut are "inside"
        # both adjacent slab boxes (inclusive edge test in ray_entry_setup);
        # only the slab owning the replicated tracer's start cube
        # (floor(o_x), clipped to bounds) may contribute.
        own = jnp.clip(
            jnp.floor(o[:, 0] - jnp.float32(sh.lower[0])),
            0.0,
            jnp.float32(sh.global_size[0] - 1),
        ).astype(jnp.int32) // slab
        foreign = (d[:, 0] == 0.0) & (own != jax.lax.axis_index(sh.axis))
        light = jnp.where(foreign[:, None], 0.0, light)
        trans = jnp.where(foreign, 1.0, trans)
        return light[None], trans[None]

    fn = jax.shard_map(
        shard_fn,
        mesh=sh.mesh,
        in_specs=(P(sh.axis), P()),
        out_specs=(P(sh.axis), P(sh.axis)),
        check_vma=False,
    )
    Lg, Tg = fn(
        sh.vols, (sh.tables, sh.sky_faces, sh.sky_octants, sh.sky_mean, o, d)
    )  # [D, n, 3], [D, n]

    def composite(Ls, Ts):
        # Exclusive prefix product of transmittance (robust to Ts == 0).
        before = jnp.concatenate(
            [jnp.ones_like(Ts[:1]), jnp.cumprod(Ts, axis=0)[:-1]], axis=0
        )
        return (Ls * before[..., None]).sum(0)

    asc = composite(Lg, Tg)
    desc = composite(Lg[::-1], Tg[::-1])
    fwd = (d[:, 0] >= 0.0)[:, None]
    light = jnp.where(fwd, asc, desc)
    trans = jnp.prod(Tg, axis=0)
    if include_sky:
        oct_idx = (
            (d[:, 0] >= 0).astype(jnp.int32) * 4
            + (d[:, 1] >= 0).astype(jnp.int32) * 2
            + (d[:, 2] >= 0).astype(jnp.int32)
        )
        sky_rgb = jnp.take(sh.sky_octants, oct_idx, axis=0)
        light = light + sky_rgb * trans[..., None]
        trans = jnp.zeros_like(trans)
    return light.reshape(batch_shape + (3,)), trans.reshape(batch_shape)
