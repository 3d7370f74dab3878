"""The raytracer core: vectorized two-level DDA over a SpaceState.

TPU-native re-design of the reference's `SpaceRaytracer::trace_ray`
(all-is-cubes-render/src/raytracer/sr.rs:51,135 and surface.rs:255-357):
instead of a per-ray iterator with data-dependent control flow, every ray
runs the same fixed-structure loop step under masks — the standard way to
map divergent ray traversal onto a SIMD machine. One `lax.while_loop`
iterates until all rays are done (or fuel runs out); each iteration performs
one DDA step for every live ray.

Two-level traversal (the engine's defining feature, "all is cubes,
recursively"): rays step over space cubes; on entering a cube whose block
has voxel resolution R > 1, the ray *pushes* its outer DDA registers and
re-parameterizes into the block's voxel grid exactly like
`recursive_raycast` (raycast.rs:458) — except we scale the direction by R
so inner t values stay in world units, avoiding the reference's
double-bookkeeping of sub-ray t. Exiting the voxel grid *pops* back to the
saved outer registers.

Shading follows surface.rs:73-200 `Surface::to_light` + illumination
options; compositing is front-to-back premultiplied alpha
(raytracer_components.rs:87).

All math is float32 (deviation from the reference's f64 ray setup: image
comparison thresholds, not bit equality, are the contract — SURVEY §7
"hard parts" #3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math import faces, lightpack
from ..space.state import SpaceState
from .options import (
    GraphicsOptions,
    LIGHT_COARSE,
    LIGHT_FLAT,
    LIGHT_LINEAR,
    LIGHT_NONE,
    LIGHT_SMOOTHSTEP,
    TRANSPARENCY_SURFACE,
    TRANSPARENCY_THRESHOLD,
    TRANSPARENCY_VOLUMETRIC,
)

_INF = jnp.float32(np.inf)


def _argmin_axis(tmax):
    """DDA axis choice with the reference's tie-break (raycast.rs:584):
    prefer Z, then Y, then X on equal t. tmax: f32[N,3] → i32[N]."""
    x, y, z = tmax[..., 0], tmax[..., 1], tmax[..., 2]
    return jnp.where(x < y, jnp.where(x < z, 0, 2), jnp.where(y < z, 1, 2))


def _gather_block_row(table, idx):
    return jnp.take(table, idx, axis=0)


def _fetch_light_texel(state: SpaceState, cube):
    """get_packed_light (sr.rs:241): in-bounds → stored texel;
    out-of-bounds → BlockSky::light_outside (sky.rs:96): the face's sky
    value if the cube directly abuts exactly one face, else NO_RAYS.

    cube: i32[...,3] (index space). Returns f32[...,4] = rgb + AO weight
    (data.rs:146 value_with_ambient_occlusion).
    """
    size = jnp.asarray(state.light.shape[:3], jnp.int32)
    below = cube < 0
    above = cube >= size
    outside_any = (below | above).any(axis=-1)
    ic = jnp.clip(cube, 0, size - 1)
    flat = (ic[..., 0] * size[1] + ic[..., 1]) * size[2] + ic[..., 2]
    texel = jnp.take(state.light.reshape(-1, 4), flat, axis=0)
    stored = lightpack.decode_with_ao(texel)

    # Outside: which face? exactly one axis out, by exactly one cube.
    at_lower = cube == -1
    at_upper = cube == size
    adjacent = at_lower | at_upper
    outside_axes = (below | above).sum(axis=-1)
    touching = (outside_axes == 1) & (adjacent.sum(axis=-1) == 1)
    # Face index: lower x→NX(0) ... upper z→PZ(5).
    face_idx = jnp.argmax(
        jnp.concatenate([at_lower, at_upper], axis=-1).astype(jnp.int32), axis=-1
    )
    sky_rgb = jnp.take(state.sky_faces, face_idx, axis=0)
    sky_val = jnp.concatenate(
        [sky_rgb, jnp.ones(sky_rgb.shape[:-1] + (1,), jnp.float32)], axis=-1
    )
    no_rays = jnp.zeros_like(sky_val)
    outside_val = jnp.where(touching[..., None], sky_val, no_rays)
    return jnp.where(outside_any[..., None], outside_val, stored)


def _fetch_light_valid(state: SpaceState, cube):
    """Whether stored light at cube has status VISIBLE (for leak fix)."""
    size = jnp.asarray(state.light.shape[:3], jnp.int32)
    inside = ((cube >= 0) & (cube < size)).all(axis=-1)
    ic = jnp.clip(cube, 0, size - 1)
    flat = (ic[..., 0] * size[1] + ic[..., 1]) * size[2] + ic[..., 2]
    status = jnp.take(state.light.reshape(-1, 4), flat, axis=0)[..., 3]
    # Outside counts as valid if it is a sky face (touching), else not; the
    # leak fix only cares about interior walls, so treat outside as valid.
    return jnp.where(inside, status == lightpack.STATUS_VISIBLE, True)


def _interp_modifier(mix, mode: str):
    if mode == LIGHT_SMOOTHSTEP:
        return mix * mix * (3.0 - 2.0 * mix)
    if mode == LIGHT_COARSE:
        # Coarse = no tangential interpolation (snap to near sample).
        return jnp.zeros_like(mix)
    return mix


def _interpolated_light(state: SpaceState, cube, point, face, mode: str):
    """get_interpolated_light (sr.rs:248): smooth lighting by bilinear
    interpolation on a half-cube-offset grid, with AO weighting and the
    diagonal-wall light-leak fix. Vectorized over rays.

    cube: i32[N,3]; point: f32[N,3] (index space); face: i32[N].
    """
    eps = 0.5 / 256.0
    frames = jnp.asarray(faces.FACE_TANGENT_FRAMES, jnp.float32)  # [6,3,3]
    f = jnp.clip(face, 0, 5)
    u = jnp.take(frames[:, 0, :], f, axis=0)  # [N,3]
    v = jnp.take(frames[:, 1, :], f, axis=0)
    n = jnp.take(jnp.asarray(faces.FACE_NORMALS, jnp.float32), f, axis=0)

    mix1 = jnp.mod((point * u).sum(-1) - 0.5, 1.0)
    mix2 = jnp.mod((point * v).sum(-1) - 0.5, 1.0)
    flip1 = mix1 > 0.5
    flip2 = mix2 > 0.5
    mix1 = jnp.where(flip1, 1.0 - mix1, mix1)
    mix2 = jnp.where(flip2, 1.0 - mix2, mix2)
    dir1 = jnp.where(flip1[..., None], -u, u)
    dir2 = jnp.where(flip2[..., None], -v, v)
    mix1 = _interp_modifier(mix1, mode)
    mix2 = _interp_modifier(mix2, mode)

    center = jnp.asarray(cube, jnp.float32) + 0.5
    height = ((point - center) * n).sum(-1) + 0.5

    def fetch_2d(origin):  # origin: f32[N,3] → f32[N,4]
        def get(offset_sign1, offset_sign2):
            p = origin + dir1 * (0.5 * offset_sign1) + dir2 * (0.5 * offset_sign2)
            c = jnp.floor(p).astype(jnp.int32)
            return _fetch_light_texel(state, c), c

        near12, _ = get(-1.0, -1.0)
        near1far2, c_nf = get(-1.0, 1.0)
        near2far1, c_fn = get(1.0, -1.0)
        far12, _ = get(1.0, 1.0)
        # Light-leak fix (sr.rs:317): if both adjacent-far samples invalid,
        # the far corner is behind a diagonal wall.
        leak = (~_fetch_light_valid(state, c_nf)) & (~_fetch_light_valid(state, c_fn))
        far12 = jnp.where(leak[..., None], near12, far12)
        m2 = mix2[..., None]
        m1 = mix1[..., None]
        lo = near12 * (1 - m2) + near1far2 * m2
        hi = near2far1 * (1 - m2) + far12 * m2
        return lo * (1 - m1) + hi * m1

    in_front = fetch_2d(point + n * (1.0 - eps))
    same = fetch_2d(point + n * eps)
    hmix = jnp.clip(height, 0.0, 1.0)[..., None]
    final = jnp.where(
        (height > 1.0 - eps)[..., None], in_front, same * (1 - hmix) + in_front * hmix
    )
    weight = jnp.maximum(final[..., 3], 0.1)
    return final[..., :3] / weight[..., None]


def _flat_light(state: SpaceState, cube, face):
    """LightingOption::Flat (surface.rs:176): stored light at cube+normal."""
    normals = jnp.asarray(faces.FACE7_NORMALS, jnp.int32)
    n = jnp.take(normals, jnp.clip(face, 0, 6), axis=0)
    return _fetch_light_texel(state, cube + n)[..., :3]


def _apply_transmittance_jax(rgba, thickness):
    """raytracer_components.rs:215 apply_transmittance, vectorized.

    rgba: f32[N,4]; thickness: f32[N] (world-distance through material).
    Returns (alpha', emission_coeff).
    """
    thickness = jnp.maximum(thickness, 0.0)
    alpha = jnp.clip(rgba[..., 3], 0.0, 1.0)
    ut = 1.0 - alpha
    dt = jnp.power(jnp.maximum(ut, 0.0), thickness)
    out_alpha = 1.0 - dt
    coeff = jnp.where(ut == 1.0, thickness, (dt - 1.0) / jnp.minimum(ut - 1.0, -1e-9))
    # thickness == 0 edge case: opaque stays opaque, transparent vanishes.
    zero = thickness == 0.0
    out_alpha = jnp.where(zero, jnp.where(alpha >= 1.0, 1.0, 0.0), out_alpha)
    coeff = jnp.where(zero, jnp.where(alpha >= 1.0, 1.0, 0.0), coeff)
    return out_alpha, jnp.maximum(coeff, 0.0)


@functools.partial(
    jax.jit, static_argnames=("options", "include_sky", "max_steps")
)
def trace_rays(
    state: SpaceState,
    origins,
    directions,
    options: GraphicsOptions,
    include_sky: bool = True,
    max_steps: Optional[int] = None,
):
    """Trace rays through a SpaceState. Origins/directions in world
    coordinates, any batch shape (..., 3). Direction length defines the
    t unit; `t_to_view_distance` fog scaling follows sr.rs:150.

    Returns (light f32[..., 3] HDR premultiplied scene light,
             transmittance f32[...]).
    """
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3).astype(jnp.float32) - jnp.asarray(
        state.lower, jnp.float32
    )
    d = directions.reshape(-1, 3).astype(jnp.float32)
    n_rays = o.shape[0]
    size_i = jnp.asarray(state.contents.shape, jnp.int32)
    size_f = jnp.asarray(state.contents.shape, jnp.float32)

    if max_steps is None:
        max_steps = int(4 * (sum(state.contents.shape) + 16))

    d_len = jnp.linalg.norm(d, axis=-1)
    t_to_view = (d_len / jnp.float32(options.view_distance)).astype(jnp.float32)

    safe_d = jnp.where(d == 0.0, 1e-30, d)
    inv_d = 1.0 / safe_d
    step = jnp.where(d > 0, 1, jnp.where(d < 0, -1, 0)).astype(jnp.int32)
    t_delta_base = jnp.abs(inv_d)

    # Slab test: entry/exit t of the bounds box [0, size].
    t0 = (0.0 - o) * inv_d
    t1 = (size_f - o) * inv_d
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    # Axes with d == 0: inside slab → (-inf, +inf); outside → miss.
    in_slab = (o >= 0.0) & (o <= size_f)
    t_lo = jnp.where(d == 0.0, jnp.where(in_slab, -_INF, _INF), t_lo)
    t_hi = jnp.where(d == 0.0, jnp.where(in_slab, _INF, -_INF), t_hi)
    t_enter = jnp.maximum(t_lo.max(axis=-1), 0.0)
    t_exit = t_hi.min(axis=-1)
    hits_box = t_exit > t_enter

    # Initial cube: position nudged just inside at entry.
    started_inside = t_lo.max(axis=-1) <= 0.0
    p_start = o + d * (t_enter[..., None] + 1e-5)
    cube0 = jnp.clip(jnp.floor(p_start).astype(jnp.int32), 0, size_i - 1)
    # Next-crossing t per axis from the true origin (no error accumulation).
    boundary = cube0 + (step > 0).astype(jnp.int32)
    tmax0 = (jnp.asarray(boundary, jnp.float32) - o) * inv_d
    tmax0 = jnp.where(step == 0, _INF, tmax0)
    # Rays entering from outside must *shade* the entry cube (the reference's
    # `within` yields it with its entry face, raycast.rs:223). Start the DDA
    # one virtual cube before the entry along the entry axis, so the first
    # loop iteration performs the entry crossing at t_enter.
    entry_axis = jnp.argmax(t_lo, axis=-1)
    entry_onehot = jax.nn.one_hot(entry_axis, 3, dtype=jnp.int32)
    cube_pre = cube0 - entry_onehot * step
    tmax_pre = jnp.where(entry_onehot == 1, t_enter[..., None], tmax0)
    cube0 = jnp.where(started_inside[..., None], cube0, cube_pre)
    tmax0 = jnp.where(started_inside[..., None], tmax0, tmax_pre)

    sky_rgb = _sky_sample(state, d)

    fog_on = options.fog != "none"
    fog_blend = jnp.float32(options.fog_blend())
    lighting = options.lighting_display
    transparency = options.transparency

    init = dict(
        cube=cube0,
        tmax=tmax0,
        tdelta=t_delta_base,
        mode=jnp.zeros(n_rays, jnp.int32),  # 0 outer, 1 inner
        res=jnp.ones(n_rays, jnp.int32),
        ventry=jnp.zeros(n_rays, jnp.int32),
        saved_cube=cube0,
        saved_tmax=tmax0,
        block_cube=cube0,
        light=jnp.zeros((n_rays, 3), jnp.float32),
        trans=jnp.ones(n_rays, jnp.float32),
        done=~hits_box,
        fuel=jnp.int32(max_steps),
    )

    tables = state.tables
    max_r = tables.padded_voxel_resolution
    vox_flat_color = tables.vox_color.reshape(-1, 4)
    vox_flat_emission = tables.vox_emission.reshape(-1, 3)

    def shade(
        st, active, rgba, emission, face, t_hit, space_cube, point, thickness
    ):
        """Surface::to_light (surface.rs:73) + accumulate. Returns new
        (light, trans, done)."""
        alpha = jnp.clip(rgba[..., 3], 0.0, 1.0)
        if transparency == TRANSPARENCY_THRESHOLD:
            solid = alpha > options.transparency_threshold
            alpha = jnp.where(solid, 1.0, 0.0)
            emission_scaled = emission
        elif transparency == TRANSPARENCY_VOLUMETRIC:
            alpha, coeff = _apply_transmittance_jax(rgba, thickness * d_len)
            emission_scaled = emission * coeff[..., None]
        else:
            emission_scaled = emission

        visible = active & ((alpha > 0.0) | (emission_scaled != 0.0).any(-1))

        if lighting == LIGHT_NONE:
            illum = jnp.ones((n_rays, 3), jnp.float32)
        elif lighting == LIGHT_FLAT:
            illum = _flat_light(state, space_cube, face)
        else:
            illum = _interpolated_light(state, space_cube, point, face, lighting)

        out_rgb = rgba[..., :3] * illum * alpha[..., None] + emission_scaled
        surf_trans = 1.0 - alpha

        if fog_on:
            rel = jnp.clip(t_hit * t_to_view, 0.0, 1.0)
            fog_exp = (1.0 - jnp.exp(-1.6 * rel)) / 0.79810348
            fog_amount = fog_exp * (1.0 - fog_blend) + rel**4 * fog_blend
            out_rgb = out_rgb * (1.0 - fog_amount[..., None]) + sky_rgb * fog_amount[..., None]
            surf_trans = surf_trans * (1.0 - fog_amount)

        new_light = st["light"] + jnp.where(
            visible[..., None], out_rgb * st["trans"][..., None], 0.0
        )
        new_trans = jnp.where(visible, st["trans"] * surf_trans, st["trans"])
        new_done = st["done"] | (new_trans < 1.0 / 256.0)  # ColorBuf::opaque
        return new_light, new_trans, new_done

    def body(st):
        live = ~st["done"]
        axis = _argmin_axis(st["tmax"])
        t_hit = jnp.take_along_axis(st["tmax"], axis[..., None], axis=-1)[..., 0]
        step_axis = jnp.take_along_axis(step, axis[..., None], axis=-1)[..., 0]
        face = jnp.where(step_axis > 0, axis, axis + 3)

        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_cube = st["cube"] + onehot * step
        new_tmax = st["tmax"] + jnp.asarray(onehot, jnp.float32) * st["tdelta"]

        inner = st["mode"] == 1
        grid_hi = jnp.where(inner[..., None], st["res"][..., None], size_i)
        inside = ((new_cube >= 0) & (new_cube < grid_hi)).all(-1)

        # --- outer-mode content lookup (harmless garbage in inner mode) ---
        oc = jnp.clip(new_cube, 0, size_i - 1)
        flat = (oc[..., 0] * size_i[1] + oc[..., 1]) * size_i[2] + oc[..., 2]
        idx = jnp.take(state.contents.reshape(-1), flat, axis=0).astype(jnp.int32)
        blk_visible = _gather_block_row(tables.visible, idx)
        blk_res = _gather_block_row(tables.resolution, idx)
        blk_ventry = _gather_block_row(tables.voxel_index, idx)
        atom_rgba = _gather_block_row(tables.atom_color, idx)
        atom_emission = _gather_block_row(tables.atom_emission, idx)

        outer = ~inner
        exit_outer = live & outer & ~inside
        hit_atom = live & outer & inside & blk_visible & (blk_res == 1)
        enter_block = live & outer & inside & blk_visible & (blk_res > 1)
        exit_inner = live & inner & ~inside
        step_inner = live & inner & inside

        # --- entering a voxel block: push outer registers, re-parameterize.
        res_f = jnp.asarray(blk_res, jnp.float32)
        entry_p = o + d * t_hit[..., None]  # index-space point on block face
        inner_p = (entry_p - jnp.asarray(new_cube, jnp.float32)) * res_f[..., None]
        nudge = d * (1e-4 / jnp.maximum(d_len, 1e-30))[..., None]
        icube_entry = jnp.clip(
            jnp.floor(inner_p + nudge).astype(jnp.int32),
            0,
            blk_res[..., None] - 1,
        )
        iboundary = icube_entry + (step > 0).astype(jnp.int32)
        io = (o - jnp.asarray(new_cube, jnp.float32)) * res_f[..., None]
        itmax = (jnp.asarray(iboundary, jnp.float32) - io) * inv_d / res_f[..., None]
        itmax = jnp.where(step == 0, _INF, itmax)
        itdelta = t_delta_base / res_f[..., None]

        # --- inner-mode voxel lookup (the voxel is `new_cube` in voxel
        # coords in inner mode, or `icube_entry` on block entry) ---
        vcube = jnp.where(enter_block[..., None], icube_entry, new_cube)
        ventry_now = jnp.where(enter_block, blk_ventry, st["ventry"])
        res_now = jnp.where(enter_block, blk_res, st["res"])
        vc = jnp.clip(vcube, 0, max_r - 1)
        vflat = (
            (jnp.clip(ventry_now, 0, None) * max_r + vc[..., 0]) * max_r + vc[..., 1]
        ) * max_r + vc[..., 2]
        vox_rgba = jnp.take(vox_flat_color, vflat, axis=0)
        vox_emission = jnp.take(vox_flat_emission, vflat, axis=0)

        # --- select surface properties & shade ---
        shade_mask = hit_atom | enter_block | step_inner
        use_vox = (enter_block | step_inner)[..., None]
        rgba = jnp.where(use_vox, vox_rgba, atom_rgba)
        emission = jnp.where(use_vox, vox_emission, atom_emission)
        space_cube = jnp.where(
            (enter_block | hit_atom | exit_outer)[..., None], new_cube, st["block_cube"]
        )

        # Thickness (volumetric): world-t distance to the *next* crossing
        # in the grid we'll be stepping next.
        tmax_after = jnp.where(enter_block[..., None], itmax, new_tmax)
        next_t = jnp.min(tmax_after, axis=-1)
        # On block entry, the material thickness caps at the inner exit.
        thickness = jnp.maximum(next_t - t_hit, 0.0)

        light, trans, done = shade(
            st,
            shade_mask,
            rgba,
            emission,
            face,
            t_hit,
            space_cube,
            entry_p,
            thickness,
        )

        done = done | exit_outer

        # --- register updates ---
        mode = jnp.where(enter_block, 1, jnp.where(exit_inner, 0, st["mode"]))
        cube = jnp.where(
            enter_block[..., None],
            icube_entry,
            jnp.where(exit_inner[..., None], st["saved_cube"], new_cube),
        )
        tmax = jnp.where(
            enter_block[..., None],
            itmax,
            jnp.where(exit_inner[..., None], st["saved_tmax"], new_tmax),
        )
        tdelta = jnp.where(
            enter_block[..., None],
            itdelta,
            jnp.where(exit_inner[..., None], t_delta_base, st["tdelta"]),
        )
        saved_cube = jnp.where(enter_block[..., None], new_cube, st["saved_cube"])
        saved_tmax = jnp.where(enter_block[..., None], new_tmax, st["saved_tmax"])
        block_cube = jnp.where(enter_block[..., None], new_cube, st["block_cube"])
        res = jnp.where(enter_block, blk_res, st["res"])
        ventry = jnp.where(enter_block, blk_ventry, st["ventry"])

        return dict(
            cube=cube,
            tmax=tmax,
            tdelta=tdelta,
            mode=mode,
            res=res,
            ventry=ventry,
            saved_cube=saved_cube,
            saved_tmax=saved_tmax,
            block_cube=block_cube,
            light=light,
            trans=trans,
            done=done,
            fuel=st["fuel"] - 1,
        )

    def cond(st):
        return (st["fuel"] > 0) & (~st["done"]).any()

    final = jax.lax.while_loop(cond, body, init)

    light = final["light"]
    trans = final["trans"]
    if include_sky:
        light = light + sky_rgb * trans[..., None]
        trans = jnp.zeros_like(trans)

    return light.reshape(batch_shape + (3,)), trans.reshape(batch_shape)


def _sky_sample(state: SpaceState, d):
    """Sky::sample (sky.rs:35): octant by direction signs."""
    oct_idx = (
        (d[..., 0] >= 0).astype(jnp.int32) * 4
        + (d[..., 1] >= 0).astype(jnp.int32) * 2
        + (d[..., 2] >= 0).astype(jnp.int32)
    )
    return jnp.take(state.sky_octants, oct_idx, axis=0)
