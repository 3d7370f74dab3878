"""The raytracer core: two-level DDA over a SpaceState, tuned for TPU.

TPU-native re-design of the reference's `SpaceRaytracer::trace_ray`
(all-is-cubes-render/src/raytracer/sr.rs:51,135 and surface.rs:255-357).
Structure (driven by measured TPU characteristics — gathers cost per *row*
regardless of width, ~100M rows/s in a loop; see PERF.md):

1. **Packed single-gather traversal**: everything a DDA step needs lives in
   one i32 per cell (accel.py): visibility, voxel-block flag, palette index,
   resolution, and a chebyshev *skip distance*. Space cells and all voxel-
   block cells are concatenated into ONE flat array so outer and inner
   stepping share a single gather per iteration.
2. **Empty-space skipping**: a cell with skip distance D ≥ 2 lets the ray
   jump (D-1) cubes in L∞ and re-derive its DDA registers arithmetically —
   long air runs collapse to one iteration (the generalization of the
   reference's `always_invisible` fast path, sr.rs:569).
3. **Hit-buffered shading**: the traversal loop only *finds* surfaces; the
   expensive shading (palette/light gathers, interpolation, fog) runs once
   per phase over all buffered hits, outside the loop. K phases handle
   transparency (each phase consumes one surface per ray).
4. Two-level recursion: entering a cube whose block has resolution R > 1
   re-parameterizes the ray into the voxel grid exactly like
   `recursive_raycast` (raycast.rs:458) with direction scaled by R so inner
   t stays in world units; exiting pops the saved outer registers.

Shading follows surface.rs:73-200 `Surface::to_light`; compositing is
front-to-back premultiplied alpha (raytracer_components.rs:87). All math is
float32 (images validated by perceptual thresholds, not bit equality —
SURVEY §7 hard-part #3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math import faces, lightpack
from ..space.state import SpaceState
from .accel import RES_SHIFT, SKIP_MASK, SKIP_SHIFT, VISIBLE_BIT, VOXEL_BIT
from .options import (
    GraphicsOptions,
    LIGHT_BOUNCE,
    LIGHT_COARSE,
    LIGHT_FLAT,
    LIGHT_LINEAR,
    LIGHT_NONE,
    LIGHT_SMOOTHSTEP,
    TRANSPARENCY_THRESHOLD,
    TRANSPARENCY_VOLUMETRIC,
)

_INF = jnp.float32(np.inf)

HIT_NONE = 0
HIT_ATOM = 1
HIT_VOXEL = 2

#: The hit-buffer fields a phase shader consumes (shared between the XLA
#: tracer below and the Pallas tracer in pallas_trace.py).
HIT_KEYS = (
    "hit_kind", "hit_idx", "hit_vflat", "hit_face",
    "hit_t", "hit_next_t", "hit_cube",
)


def _argmin_axis(tmax):
    """DDA axis choice with the reference's tie-break (raycast.rs:584):
    prefer Z, then Y, then X on equal t."""
    x, y, z = tmax[..., 0], tmax[..., 1], tmax[..., 2]
    return jnp.where(x < y, jnp.where(x < z, 0, 2), jnp.where(y < z, 1, 2))


def _fetch_light_texel(state: SpaceState, cube):
    """get_packed_light (sr.rs:241) → ([r,g,b,AO-weight] f32, valid bool);
    OOB resolves through BlockSky::light_outside (sky.rs:96). `valid` is
    derived from the already-gathered status byte (no extra gather)."""
    size = jnp.asarray(state.light.shape[:3], jnp.int32)
    below = cube < 0
    above = cube >= size
    outside_any = (below | above).any(axis=-1)
    ic = jnp.clip(cube, 0, size - 1)
    flat = (ic[..., 0] * size[1] + ic[..., 1]) * size[2] + ic[..., 2]
    texel = jnp.take(state.light.reshape(-1, 4), flat, axis=0)
    stored = lightpack.decode_with_ao(texel)

    at_lower = cube == -1
    at_upper = cube == size
    adjacent = at_lower | at_upper
    touching = ((below | above).sum(axis=-1) == 1) & (adjacent.sum(axis=-1) == 1)
    face_idx = jnp.argmax(
        jnp.concatenate([at_lower, at_upper], axis=-1).astype(jnp.int32), axis=-1
    )
    # 6-row table lookup as one-hot matmul, not a per-ray gather
    # (gathers cost per row — PERF.md).
    sky_rgb = _onehot_matmul(face_idx, state.sky_faces)
    sky_val = jnp.concatenate(
        [sky_rgb, jnp.ones(sky_rgb.shape[:-1] + (1,), jnp.float32)], axis=-1
    )
    outside_val = jnp.where(touching[..., None], sky_val, jnp.zeros_like(sky_val))
    # light_outside (sky.rs:129-146): face-adjacent OOB texels carry the
    # sky face (Visible → valid); edge/corner/far OOB are NO_RAYS, which
    # is invalid (data.rs:127) — they trigger the diagonal leak fix.
    valid = jnp.where(
        outside_any, touching, texel[..., 3] == lightpack.STATUS_VISIBLE
    )
    return jnp.where(outside_any[..., None], outside_val, stored), valid


def _interp_modifier(mix, mode: str):
    if mode == LIGHT_SMOOTHSTEP:
        return mix * mix * (3.0 - 2.0 * mix)
    if mode == LIGHT_COARSE:
        # coarsestep (surface.rs:514-518): 4-level quantizer, clamped so
        # coarsestep(1.0) == coarsestep(0.999).
        return (jnp.clip(jnp.floor(mix * 4.0), 0.0, 3.0) + 0.5) / 4.0
    return mix



#: Maximum volume (cubes) for which the per-(cube, face) interpolation-row
#: table is built: 432 B/cube; above this the tracer falls back to
#: per-texel fetches.
_INTERP_ROWS_MAX_VOLUME = 1 << 19


def _build_interp_rows(state: SpaceState):
    """Pack the 18 light texels smooth lighting can touch per (cube, face)
    into one gatherable row: u8[vol*6, 18*4].

    Smooth lighting (`get_interpolated_light`, sr.rs:248) samples 8 texels
    per hit, all within {cube + p·n + su·u + sv·v : p∈{0,1}, su,sv∈{-1,0,1}}
    — 18 candidates. On TPU a row gather costs the same as an element
    gather (PERF.md), so shading drops from 16 texel gathers (plus decode
    table lookups) per ray to ONE row gather plus VPU selects.

    Out-of-bounds texels follow BlockSky::light_outside: face slabs carry
    the (already quantized) sky face value with VISIBLE status; edges and
    corners are NO_RAYS (sky.rs:145).
    """
    size = state.light.shape[:3]
    pad = jnp.zeros((size[0] + 2, size[1] + 2, size[2] + 2, 4), jnp.uint8)
    # Edge/corner/far OOB texels are NO_RAYS (light_outside, sky.rs:145):
    # value 0, AO-weight 0, invalid → they trigger the diagonal leak fix.
    pad = pad.at[..., 3].set(lightpack.STATUS_NO_RAYS)
    inner = tuple(slice(1, 1 + size[a]) for a in range(3))
    pad = pad.at[inner[0], inner[1], inner[2]].set(state.light)
    sky_texels = lightpack.encode_rgb(state.sky_faces)  # [6,4]
    for a in range(3):
        lo = [inner[0], inner[1], inner[2]]
        hi = [inner[0], inner[1], inner[2]]
        lo[a] = 0
        hi[a] = size[a] + 1
        pad = pad.at[lo[0], lo[1], lo[2]].set(sky_texels[a])
        pad = pad.at[hi[0], hi[1], hi[2]].set(sky_texels[a + 3])

    frames = np.asarray(faces.FACE_TANGENT_FRAMES, np.int32)  # [6,2,3]
    normals = np.asarray(faces.FACE_NORMALS, np.int32)
    per_face = []
    for f in range(6):
        u, v, n = frames[f, 0], frames[f, 1], normals[f]
        shifts = []
        for p in (0, 1):
            for su in (-1, 0, 1):
                for sv in (-1, 0, 1):
                    d = p * n + su * u + sv * v
                    shifts.append(
                        pad[
                            1 + d[0] : 1 + d[0] + size[0],
                            1 + d[1] : 1 + d[1] + size[1],
                            1 + d[2] : 1 + d[2] + size[2],
                        ]
                    )
        per_face.append(jnp.stack(shifts, axis=-2))  # [X,Y,Z,18,4]
    rows = jnp.stack(per_face, axis=-3)  # [X,Y,Z,6,18,4]
    return rows.reshape(-1, 18 * 4)


def _onehot_matmul(idx, table):
    """take() from a tiny constant table without a gather: one-hot × table."""
    k = table.shape[0]
    oh = jax.nn.one_hot(idx, k, dtype=jnp.float32)
    return oh @ jnp.asarray(table, jnp.float32)


def _decode_row_texel(texel):
    """u8[...,4] packed texel → (rgbw f32[...,4], valid bool[...])
    matching _fetch_light_texel's semantics."""
    rgb = lightpack.decode_scalar(texel[..., :3])
    status = texel[..., 3].astype(jnp.int32)
    weight = jnp.where(
        status == lightpack.STATUS_VISIBLE,
        1.0,
        jnp.where(status == lightpack.STATUS_OPAQUE, 0.25, 0.0),
    )
    valid = status == lightpack.STATUS_VISIBLE
    return jnp.concatenate([rgb, weight[..., None]], axis=-1), valid


def _interpolated_light_rows(state, rows, cube, point, face, mode: str):
    """get_interpolated_light via the interp-row table: one row gather per
    hit, texel selection as VPU one-hot sums. Same math as
    _interpolated_light (AO-weighted bilinear + leak fix + height blend)."""
    eps = 0.5 / 256.0
    f = jnp.clip(face, 0, 5)
    frames = np.asarray(faces.FACE_TANGENT_FRAMES, np.float32)
    u = _onehot_matmul(f, frames[:, 0, :])
    v = _onehot_matmul(f, frames[:, 1, :])
    n = _onehot_matmul(f, np.asarray(faces.FACE_NORMALS, np.float32))

    size = state.light.shape[:3]
    flat = (cube[..., 0] * size[1] + cube[..., 1]) * size[2] + cube[..., 2]
    row = jnp.take(rows, flat * 6 + f, axis=0).reshape(point.shape[:-1] + (18, 4))

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

    cube_f = jnp.asarray(cube, jnp.float32)
    iota18 = jnp.arange(18, dtype=jnp.int32)

    def texel_at(sample_point):
        """Select the texel whose cube is floor(sample_point) from the row."""
        off = jnp.floor(sample_point) - cube_f  # each component ∈ {-1,0,1}
        su = jnp.asarray(jnp.round((off * u).sum(-1)), jnp.int32)
        sv = jnp.asarray(jnp.round((off * v).sum(-1)), jnp.int32)
        sn = jnp.asarray(jnp.round((off * n).sum(-1)), jnp.int32)
        idx = jnp.clip(sn, 0, 1) * 9 + (jnp.clip(su, -1, 1) + 1) * 3 + (
            jnp.clip(sv, -1, 1) + 1
        )
        sel = (idx[..., None] == iota18).astype(jnp.float32)  # [n,18]
        texel = jnp.einsum("...t,...tc->...c", sel, row.astype(jnp.float32))
        return _decode_row_texel(texel.astype(jnp.uint8))

    def fetch_2d(origin):
        def get(s1, s2):
            return texel_at(origin + dir1 * (0.5 * s1) + dir2 * (0.5 * s2))

        near12, _ = get(-1.0, -1.0)
        near1far2, v_nf = get(-1.0, 1.0)
        near2far1, v_fn = get(1.0, -1.0)
        far12, _ = get(1.0, 1.0)
        leak = (~v_nf) & (~v_fn)
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


def _interpolated_light(state: SpaceState, cube, point, face, mode: str):
    """get_interpolated_light (sr.rs:248): AO-weighted bilinear smooth
    lighting with the diagonal light-leak fix."""
    eps = 0.5 / 256.0
    frames = jnp.asarray(faces.FACE_TANGENT_FRAMES, jnp.float32)
    f = jnp.clip(face, 0, 5)
    u = jnp.take(frames[:, 0, :], f, axis=0)
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

    def fetch_2d(origin):
        def get(s1, s2):
            p = origin + dir1 * (0.5 * s1) + dir2 * (0.5 * s2)
            c = jnp.floor(p).astype(jnp.int32)
            return _fetch_light_texel(state, c)

        near12, _ = get(-1.0, -1.0)
        near1far2, v_nf = get(-1.0, 1.0)
        near2far1, v_fn = get(1.0, -1.0)
        far12, _ = get(1.0, 1.0)
        leak = (~v_nf) & (~v_fn)
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
    n = _onehot_matmul(
        jnp.clip(face, 0, 6), np.asarray(faces.FACE7_NORMALS, np.float32)
    ).astype(jnp.int32)
    rgbw, _ = _fetch_light_texel(state, cube + n)
    return rgbw[..., :3]


def ray_entry_setup(o, d, size_i, size_f):
    """DDA register init shared by the XLA and Pallas tracers: bounds slab
    test + entry one virtual cube early (`within` semantics, raycast.rs:223).

    o, d: f32[n, 3] space-local origins/directions. Returns a dict of
    per-ray arrays: inv_d, step, step_pos, t_delta_base, d_len, max_abs_d,
    cube0, tmax0, hits_box, t_enter, t_exit.
    """
    d_len = jnp.linalg.norm(d, axis=-1)
    max_abs_d = jnp.maximum(jnp.abs(d).max(axis=-1), 1e-30)
    safe_d = jnp.where(d == 0.0, 1e-30, d)
    inv_d = 1.0 / safe_d
    step = jnp.where(d > 0, 1, jnp.where(d < 0, -1, 0)).astype(jnp.int32)
    step_pos = (step > 0).astype(jnp.int32)
    t_delta_base = jnp.abs(inv_d)

    t0 = (0.0 - o) * inv_d
    t1 = (size_f - o) * inv_d
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    in_slab = (o >= 0.0) & (o <= size_f)
    t_lo = jnp.where(d == 0.0, jnp.where(in_slab, -_INF, _INF), t_lo)
    t_hi = jnp.where(d == 0.0, jnp.where(in_slab, _INF, -_INF), t_hi)
    t_enter = jnp.maximum(t_lo.max(axis=-1), 0.0)
    t_exit = t_hi.min(axis=-1)
    hits_box = t_exit > t_enter

    started_inside = t_lo.max(axis=-1) <= 0.0
    p_start = o + d * (t_enter[..., None] + 1e-5)
    cube0 = jnp.clip(jnp.floor(p_start).astype(jnp.int32), 0, size_i - 1)
    boundary = cube0 + step_pos
    tmax0 = (jnp.asarray(boundary, jnp.float32) - o) * inv_d
    tmax0 = jnp.where(step == 0, _INF, tmax0)
    # Rays entering from outside start one virtual cube early so the first
    # iteration performs the entry crossing and shades the boundary cube.
    entry_axis = jnp.argmax(t_lo, axis=-1)
    entry_onehot = jax.nn.one_hot(entry_axis, 3, dtype=jnp.int32)
    cube_pre = cube0 - entry_onehot * step
    tmax_pre = jnp.where(entry_onehot == 1, t_enter[..., None], tmax0)
    cube0 = jnp.where(started_inside[..., None], cube0, cube_pre)
    tmax0 = jnp.where(started_inside[..., None], tmax0, tmax_pre)
    return dict(
        inv_d=inv_d, step=step, step_pos=step_pos,
        t_delta_base=t_delta_base, d_len=d_len, max_abs_d=max_abs_d,
        cube0=cube0, tmax0=tmax0, hits_box=hits_box,
        t_enter=t_enter, t_exit=t_exit, started_inside=started_inside,
    )


def make_phase_shader(state: SpaceState, options, o, d, d_len, t_to_view, sky_rgb):
    """Build the per-phase hit-buffer shader (Surface::to_light,
    surface.rs:73-200 + fog + front-to-back compositing) shared by
    trace_rays and trace_rays_pallas.

    Returns shade(hits, light_acc, trans_acc, phase_illum=None) →
    (light_acc', trans_acc'), where `hits` carries the HIT_KEYS fields.
    """
    n_rays = o.shape[0]
    tables = state.tables
    palette_rows = tables.palette_rows  # f32[P,8]
    vox_rows = tables.vox_rows.reshape(-1, 8)  # f32[V*R³,8]
    n_space = int(np.prod(state.contents.shape))

    fog_on = options.fog != "none"
    fog_blend = jnp.float32(options.fog_blend())
    lighting = options.lighting_display
    if not state.light_enabled:
        # LightPhysics::None → unit illumination (updater.rs:580 get()).
        lighting = LIGHT_NONE
    transparency = options.transparency

    use_interp_rows = (
        lighting in (LIGHT_LINEAR, LIGHT_SMOOTHSTEP, LIGHT_COARSE)
        and n_space <= _INTERP_ROWS_MAX_VOLUME
    )
    interp_rows = _build_interp_rows(state) if use_interp_rows else None

    # One combined material table: gathers cost per ROW (PERF.md), so
    # separate palette/vox gathers were two ~2M-row gathers per phase
    # (~20 ms each on atrium 1080p); a concat + kind-selected index makes
    # it one.
    n_pal = palette_rows.shape[0]
    mat_rows = jnp.concatenate([palette_rows, vox_rows], axis=0)

    def shade(hits, light_acc, trans_acc, phase_illum=None):
        """Shade all buffered hits (one gather-heavy pass per phase)."""
        has_hit = hits["hit_kind"] != HIT_NONE
        is_vox = hits["hit_kind"] == HIT_VOXEL
        mat_idx = jnp.where(is_vox, n_pal + hits["hit_vflat"], hits["hit_idx"])
        mat = jnp.take(mat_rows, mat_idx, axis=0)
        rgba = mat[..., 0:4]
        emission = mat[..., 4:7]

        alpha = jnp.clip(rgba[..., 3], 0.0, 1.0)
        point = o + d * hits["hit_t"][..., None]
        if transparency == TRANSPARENCY_THRESHOLD:
            alpha = jnp.where(alpha > options.transparency_threshold, 1.0, 0.0)
            emission_scaled = emission
        elif transparency == TRANSPARENCY_VOLUMETRIC:
            thickness = (hits["hit_next_t"] - hits["hit_t"]) * d_len
            alpha, coeff = _apply_transmittance_jax(alpha, thickness)
            emission_scaled = emission * coeff[..., None]
        else:
            emission_scaled = emission

        shade_m = has_hit & ((alpha > 0.0) | (emission_scaled != 0.0).any(-1))

        if lighting == LIGHT_NONE:
            illum = jnp.ones((n_rays, 3), jnp.float32)
        elif lighting in (LIGHT_FLAT, LIGHT_BOUNCE):
            # Bounce past its budget shades Flat (surface.rs:173-177).
            illum = _flat_light(state, hits["hit_cube"], hits["hit_face"])
        elif use_interp_rows:
            illum = _interpolated_light_rows(
                state, interp_rows, hits["hit_cube"], point, hits["hit_face"],
                lighting,
            )
        else:
            illum = _interpolated_light(
                state, hits["hit_cube"], point, hits["hit_face"], lighting
            )
        if phase_illum is not None:
            illum = phase_illum

        out_rgb = rgba[..., :3] * illum * alpha[..., None] + emission_scaled
        surf_trans = 1.0 - alpha
        if fog_on:
            rel = jnp.clip(hits["hit_t"] * t_to_view, 0.0, 1.0)
            fog_exp = (1.0 - jnp.exp(-1.6 * rel)) / 0.79810348
            fog_amount = fog_exp * (1.0 - fog_blend) + rel**4 * fog_blend
            out_rgb = (
                out_rgb * (1.0 - fog_amount[..., None]) + sky_rgb * fog_amount[..., None]
            )
            surf_trans = surf_trans * (1.0 - fog_amount)

        light_acc2 = light_acc + jnp.where(
            shade_m[..., None], out_rgb * trans_acc[..., None], 0.0
        )
        trans_acc2 = jnp.where(shade_m, trans_acc * surf_trans, trans_acc)
        return light_acc2, trans_acc2

    return shade


def _apply_transmittance_jax(alpha, thickness):
    """raytracer_components.rs:215, vectorized. Returns (alpha', coeff)."""
    thickness = jnp.maximum(thickness, 0.0)
    alpha = jnp.clip(alpha, 0.0, 1.0)
    ut = 1.0 - alpha
    dt = jnp.power(jnp.maximum(ut, 0.0), thickness)
    out_alpha = 1.0 - dt
    coeff = jnp.where(ut == 1.0, thickness, (dt - 1.0) / jnp.minimum(ut - 1.0, -1e-9))
    zero = thickness == 0.0
    out_alpha = jnp.where(zero, jnp.where(alpha >= 1.0, 1.0, 0.0), out_alpha)
    coeff = jnp.where(zero, jnp.where(alpha >= 1.0, 1.0, 0.0), coeff)
    return out_alpha, jnp.maximum(coeff, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "options", "include_sky", "max_steps", "phases", "substeps", "compact",
        "return_stats", "beam_tile", "return_hits", "count_steps",
    ),
)
def trace_rays(
    state: SpaceState,
    origins,
    directions,
    options: GraphicsOptions,
    include_sky: bool = True,
    max_steps: Optional[int] = None,
    phases: int = 4,
    substeps: int = 2,
    compact: bool = False,
    return_stats: bool = False,
    beam_tile: int = 8,
    return_hits: bool = False,
    count_steps: bool = False,
    illum_override=None,
):
    """Trace rays (world coords, any batch shape (..., 3)). Returns
    (light f32[...,3] premultiplied HDR, transmittance f32[...]); with
    return_stats, appends a dict (per-phase loop iteration counts and
    walker counts) — the RaytraceInfo analog (sr.rs:520); with
    return_hits, appends the first phase's hit buffer (for bounce
    lighting). `illum_override` (f32[n_rays,3]) replaces the stored-light
    illumination for the FIRST phase's hits — the hook through which
    `trace_rays_bounce` injects its Lambertian-sampled illumination.

    LightingOption::Bounce dispatch (surface.rs:169-177): within this
    function Bounce shades as Flat (the bounce budget is spent by the
    caller injecting illum_override); use trace_rays_bounce for the full
    effect."""
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3).astype(jnp.float32) - jnp.asarray(state.lower, jnp.float32)
    d = directions.reshape(-1, 3).astype(jnp.float32)
    if illum_override is not None:
        illum_override = illum_override.reshape(-1, 3)
    n_rays = o.shape[0]
    size_i = jnp.asarray(state.contents.shape, jnp.int32)
    size_f = jnp.asarray(state.contents.shape, jnp.float32)
    n_space = int(np.prod(state.contents.shape))
    max_r = state.tables.padded_voxel_resolution
    vox_r3 = max_r * max_r * max_r

    if max_steps is None:
        max_steps = int(2 * (sum(state.contents.shape) + 8 * max_r))

    entry = ray_entry_setup(o, d, size_i, size_f)
    d_len = entry["d_len"]
    max_abs_d = entry["max_abs_d"]
    inv_d, step, step_pos = entry["inv_d"], entry["step"], entry["step_pos"]
    t_delta_base = entry["t_delta_base"]
    cube0, tmax0 = entry["cube0"], entry["tmax0"]
    hits_box, t_enter, t_exit = entry["hits_box"], entry["t_enter"], entry["t_exit"]
    t_to_view = (d_len / jnp.float32(options.view_distance)).astype(jnp.float32)

    sky_rgb = _sky_sample(state, d)

    # Brick-ordered traversal cells: one row gather per loop iteration
    # fetches a whole 4³ neighborhood; the iteration then takes up to
    # `substeps` DDA steps inside it (row gathers cost per row, not per
    # element — PERF.md). Rays whose next cell leaves the fetched brick
    # stall until the next iteration's fetch (progress ≥ 1 step/iter).
    from .accel import BRICK, brick_dims

    cells_rows = state.cells  # i32[total_bricks, 64]
    total_bricks = cells_rows.shape[0]
    sbd = brick_dims(state.contents.shape)
    vbd = brick_dims((max_r, max_r, max_r))
    n_sb = int(np.prod(sbd))
    n_vb = int(np.prod(vbd))
    local_iota = jnp.arange(BRICK**3, dtype=jnp.int32)

    def _brick_key(cube, inner, ventry):
        """Global brick-row index of `cube` in its current grid (unique
        across the outer space and every voxel entry's grid)."""
        b = cube >> 2
        outer = (b[..., 0] * sbd[1] + b[..., 1]) * sbd[2] + b[..., 2]
        innerk = (
            n_sb
            + ventry * n_vb
            + (b[..., 0] * vbd[1] + b[..., 1]) * vbd[2] + b[..., 2]
        )
        return jnp.where(inner, innerk, outer)

    # ---- beam pre-pass: per-tile conservative start distance ------------
    # Cone-march the skip-distance field (a chebyshev distance-to-visible,
    # accel.py) for each beam_tile×beam_tile pixel tile: the whole tile's
    # rays provably hit nothing before the beam's stop distance, so the
    # full-resolution DDA starts there, skipping most of the march. This
    # is sphere tracing on the same field the per-ray skip jumps use.
    use_beams = (
        beam_tile > 0
        and len(batch_shape) == 2
        and batch_shape[0] % beam_tile == 0
        and batch_shape[1] % beam_tile == 0
    )

    def _beam_start(th):
        ht, wt = batch_shape[0] // th, batch_shape[1] // th
        o_t = o.reshape(ht, th, wt, th, 3)
        d_t = d.reshape(ht, th, wt, th, 3)
        dn = d_t / jnp.linalg.norm(d_t, axis=-1, keepdims=True)
        u = dn.mean(axis=(1, 3))
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)  # [ht,wt,3]
        o_c = o_t.mean(axis=(1, 3))
        # Cone: radius(s) = r0 + s·spread bounds every tile ray's distance
        # from the center-ray point at equal projection s (|Δo| + arc·sinθ
        # with arc ≈ s·sec θ; the 1.15 factor absorbs the sec θ and
        # sinθ-vs-tanθ slack for tile half-angles up to ~30°).
        spread = 1.15 * jnp.linalg.norm(
            dn - u[:, None, :, None, :], axis=-1
        ).max(axis=(1, 3))
        r0 = jnp.linalg.norm(
            o_t - o_c[:, None, :, None, :], axis=-1
        ).max(axis=(1, 3))

        # Per-member box entry, as projections onto the center ray: the
        # march must start no later than the FIRST member enters the box
        # (everything before that projection is outside the box ⇒ empty).
        proj = (d_t * u[:, None, :, None, :]).sum(-1)  # [ht,th,wt,tw]
        ooff = ((o_t - o_c[:, None, :, None, :]) * u[:, None, :, None, :]).sum(-1)
        t_enter_t = t_enter.reshape(ht, th, wt, th)
        hits_t = hits_box.reshape(ht, th, wt, th) & (proj > 1e-9)
        member_entry_s = jnp.where(
            hits_t, ooff + t_enter_t * jnp.maximum(proj, 1e-9), jnp.inf
        )
        s_first = member_entry_s.min(axis=(1, 3))
        s_last_exit = jnp.where(
            hits_t,
            ooff + t_exit.reshape(ht, th, wt, th) * jnp.maximum(proj, 1e-9),
            -jnp.inf,
        ).max(axis=(1, 3))

        max_abs_u = jnp.maximum(jnp.abs(u).max(-1), 1e-30)
        t = jnp.maximum(s_first, 0.0)
        done = ~jnp.isfinite(s_first)
        t = jnp.where(done, 0.0, t)
        no_inner = jnp.zeros(t.shape, bool)
        zero_v = jnp.zeros(t.shape, jnp.int32)

        def bstep(carry):
            t, done, k = carry
            p = o_c + u * t[..., None]
            # L∞ distance from p to the volume box: the ball of that
            # radius contains no in-bounds cubes at all.
            m = jnp.maximum(jnp.maximum(-p, p - size_f), 0.0).max(-1)
            cube = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, size_i - 1)
            bkey = _brick_key(cube, no_inner, zero_v)
            rowb = jnp.take(cells_rows, bkey, axis=0)
            local = (
                ((cube[..., 0] & 3) << 4)
                | ((cube[..., 1] & 3) << 2)
                | (cube[..., 2] & 3)
            )
            cell = (rowb * (local_iota == local[..., None])).sum(-1)
            vis = (cell & VISIBLE_BIT) != 0
            skip = (cell >> SKIP_SHIFT) & SKIP_MASK
            dist = jnp.where(vis, 0, skip).astype(jnp.float32)
            # Safe empty radius around p: either everything within m is
            # outside the box, or (skip field, clipped-cube penalty) no
            # visible cube within dist − m − 2.
            safe = jnp.maximum(m, dist - m - 2.0)
            r = r0 + t * spread
            adv = (safe - r) * 0.99 / (max_abs_u + spread)
            good = ~done & (adv > 1e-3) & (t < s_last_exit)
            t = jnp.where(good, t + adv, t)
            return t, done | ~good, k + 1

        def bcond(carry):
            t, done, k = carry
            return (k < 32) & ~done.all()

        t, _, _ = jax.lax.while_loop(bcond, bstep, (t, done, jnp.int32(0)))
        # Ray-param bound: the guarantee covers points whose projection on
        # the center ray is ≤ t, so τ ≤ (t − (o_r−o_c)·u) / (d_r·u).
        tau = (t[:, None, :, None] - ooff) / jnp.maximum(proj, 1e-9)
        tau = jnp.where((proj > 1e-9) & ~done[:, None, :, None], jnp.maximum(tau, 0.0), 0.0)
        return tau.reshape(n_rays)

    if use_beams:
        tau_beam = _beam_start(beam_tile)
        # Only skip ahead when the beam proved at least half a cube of
        # empty space past the entry: a stalled beam (entry cube visible)
        # must keep the boundary-shading entry init.
        beyond = tau_beam > t_enter + 0.51 / max_abs_d
        t_eff = jnp.maximum(t_enter, tau_beam)
        p_b = o + d * (t_eff[..., None] + 1e-5)
        cube_b = jnp.clip(jnp.floor(p_b).astype(jnp.int32), 0, size_i - 1)
        boundary_b = cube_b + step_pos
        tmax_b = (jnp.asarray(boundary_b, jnp.float32) - o) * inv_d
        tmax_b = jnp.where(step == 0, _INF, tmax_b)
        cube0 = jnp.where(beyond[..., None], cube_b, cube0)
        tmax0 = jnp.where(beyond[..., None], tmax_b, tmax0)
        # Beam start beyond the volume exit → the ray hits nothing.
        hits_box = hits_box & ~(beyond & (t_eff >= t_exit))

    tables = state.tables

    # ---- origin inside a voxel-block cube: descend immediately ----------
    # recursive_raycast applies to the ORIGIN cube too (raycast.rs:458;
    # SurfaceIter enters Recur voxels for the cube containing the ray
    # origin) — without this, a camera standing inside an R>1 block's
    # bounds (e.g. the Smallest exhibit's R128 macro shot) sees nothing.
    # The origin voxel itself is not shaded, matching the outer DDA's
    # treatment of the origin cube.
    _false1 = jnp.zeros(n_rays, bool)
    _zero1 = jnp.zeros(n_rays, jnp.int32)
    bkey0 = _brick_key(cube0, _false1, _zero1)
    row0 = jnp.take(cells_rows, jnp.clip(bkey0, 0, total_bricks - 1), axis=0)
    local0 = (
        ((cube0[..., 0] & 3) << 4) | ((cube0[..., 1] & 3) << 2) | (cube0[..., 2] & 3)
    )
    cell0 = (row0 * (local_iota == local0[..., None])).sum(-1)
    isvox0 = (
        entry["started_inside"]
        & hits_box
        & ((cell0 & VOXEL_BIT) != 0)
        & ((cell0 & VISIBLE_BIT) != 0)
    )
    res0_l2 = (cell0 >> RES_SHIFT) & 7
    res0_i = jnp.int32(1) << res0_l2
    res0_f = jnp.asarray(res0_i, jnp.float32)
    ventry0 = cell0 & 0xFFFF
    io0 = (o - jnp.asarray(cube0, jnp.float32)) * res0_f[..., None]
    icube0 = jnp.clip(jnp.floor(io0).astype(jnp.int32), 0, res0_i[..., None] - 1)
    itmax0 = (
        jnp.asarray(icube0 + step_pos, jnp.float32) - io0
    ) * inv_d / res0_f[..., None]
    itmax0 = jnp.where(step == 0, _INF, itmax0)
    iv = isvox0[..., None]
    cube_init = jnp.where(iv, icube0, cube0)
    tmax_init = jnp.where(iv, itmax0, tmax0)
    mode_init = isvox0.astype(jnp.int32)
    resf_init = jnp.where(isvox0, res0_f, 1.0)
    resi_init = jnp.where(isvox0, res0_i, 1)
    ventry_init = jnp.where(isvox0, ventry0, 0)

    zero3i = jnp.zeros((n_rays, 3), jnp.int32)
    zero3f = jnp.zeros((n_rays, 3), jnp.float32)

    # Per-ray constants, as a pytree so the compaction path can permute
    # and slice them together with the traversal state.
    ctx0 = dict(
        o=o,
        d=d,
        inv_d=inv_d,
        step=step,
        step_pos=step_pos,
        t_delta_base=t_delta_base,
        d_len=d_len,
        max_abs_d=max_abs_d,
    )

    init = dict(
        cube=cube_init,
        tmax=tmax_init,
        mode=mode_init,
        res_f=resf_init,
        ventry=ventry_init,
        res_i=resi_init,
        saved_cube=cube0,
        saved_tmax=tmax0,
        block_cube=cube0,
        walking=hits_box,
        exited=~hits_box,
        # Hit buffer:
        hit_kind=jnp.zeros(n_rays, jnp.int32),
        hit_idx=jnp.zeros(n_rays, jnp.int32),
        hit_vflat=jnp.zeros(n_rays, jnp.int32),
        hit_face=jnp.zeros(n_rays, jnp.int32),
        hit_t=jnp.zeros(n_rays, jnp.float32),
        hit_next_t=jnp.zeros(n_rays, jnp.float32),
        hit_cube=zero3i,
    )
    if count_steps:
        # Per-ray traversal cost accumulator (debug_pixel_cost,
        # graphics_options.rs:145).
        init["steps"] = jnp.zeros(n_rays, jnp.int32)

    def sub_step(st, ctx, row, bkey):
        # Local aliases shadow the full-width closures so the same body
        # works on compacted (sliced) ray sets.
        o, d, inv_d = ctx["o"], ctx["d"], ctx["inv_d"]
        step, step_pos = ctx["step"], ctx["step_pos"]
        t_delta_base, d_len = ctx["t_delta_base"], ctx["d_len"]
        max_abs_d = ctx["max_abs_d"]

        walking = st["walking"]
        inner = st["mode"] == 1

        # Axis choice + per-axis selects as pure VPU ops (take_along_axis
        # lowers to a gather-class op on TPU — ~0.5 ms per 65k rays per
        # iteration; these selects are ~free).
        axis = _argmin_axis(st["tmax"])
        t_hit = jnp.min(st["tmax"], axis=-1)
        step_axis = jnp.where(
            axis == 0, step[..., 0], jnp.where(axis == 1, step[..., 1], step[..., 2])
        )
        face = jnp.where(step_axis > 0, axis, axis + 3)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_cube = st["cube"] + onehot * step
        # Inner t_delta = base / R (direction scaled by R).
        tdelta = t_delta_base / st["res_f"][..., None]
        new_tmax = st["tmax"] + jnp.asarray(onehot, jnp.float32) * tdelta

        # A ray acts this sub-step only if the cell it is entering lies in
        # the fetched brick row (always true on sub-step 1); otherwise it
        # stalls, keeping all state, and retries after the next fetch.
        act = walking & (_brick_key(new_cube, inner, st["ventry"]) == bkey)

        grid_hi = jnp.where(inner[..., None], st["res_i"][..., None], size_i)
        inside = ((new_cube >= 0) & (new_cube < grid_hi)).all(-1)

        exit_outer = act & ~inner & ~inside
        exit_inner = act & inner & ~inside

        # --- extract the entered cell from the fetched brick row --------
        local = (
            ((new_cube[..., 0] & 3) << 4)
            | ((new_cube[..., 1] & 3) << 2)
            | (new_cube[..., 2] & 3)
        )
        cell = (row * (local_iota == local[..., None])).sum(-1)
        # Unbricked voxel-table index for shading (vox_rows layout).
        oc = jnp.clip(new_cube, 0, grid_hi - 1)
        flat_inner = (
            n_space
            + st["ventry"] * vox_r3
            + (oc[..., 0] * max_r + oc[..., 1]) * max_r
            + oc[..., 2]
        )

        visible = (cell & VISIBLE_BIT) != 0
        is_voxel = (cell & VOXEL_BIT) != 0
        skip = (cell >> SKIP_SHIFT) & SKIP_MASK
        pal_idx = cell & 0xFFFF
        res_log2 = (cell >> RES_SHIFT) & 7

        stepping = act & inside
        hit_atom = stepping & visible & ~is_voxel & ~inner
        hit_vox = stepping & visible & inner
        enter_block = stepping & visible & is_voxel & ~inner
        can_jump = stepping & ~visible & (skip >= 2)

        # --- voxel-block entry: push outer registers, set up the inner DDA
        # one virtual voxel early along the entry axis (same trick as the
        # bounds entry) so the entry voxel itself gets traversed.
        blk_res = jnp.int32(1) << res_log2
        blk_res_f = jnp.asarray(blk_res, jnp.float32)
        # Voxel-block cells carry their vox-table row in the low 16 bits
        # (accel.pack_cells payload) — no second table gather needed.
        blk_ventry = pal_idx
        io = (o - jnp.asarray(new_cube, jnp.float32)) * blk_res_f[..., None]
        entry_p_inner = io + d * blk_res_f[..., None] * t_hit[..., None]
        nudge = d * (1e-4 / d_len)[..., None]
        icube_entry = jnp.clip(
            jnp.floor(entry_p_inner + nudge).astype(jnp.int32),
            0,
            blk_res[..., None] - 1,
        )
        iboundary = icube_entry + step_pos
        itmax = (jnp.asarray(iboundary, jnp.float32) - io) * inv_d / blk_res_f[..., None]
        itmax = jnp.where(step == 0, _INF, itmax)
        icube_pre = icube_entry - onehot * step
        itmax_pre = jnp.where(onehot == 1, t_hit[..., None], itmax)

        # --- skip jump: advance (skip-1)·0.99 cubes in the current grid's
        # L∞ metric and re-derive registers from the true origin.
        grid_scale = jnp.where(inner, st["res_f"], 1.0)
        jump_dt = (jnp.asarray(skip, jnp.float32) - 1.0) * 0.99 / (max_abs_d * grid_scale)
        t_jump = t_hit + jump_dt
        # Grid-space position at the jump target.
        base = jnp.where(
            inner[..., None],
            (o - jnp.asarray(st["block_cube"], jnp.float32)) * grid_scale[..., None],
            o,
        )
        p_jump = base + d * (grid_scale * t_jump)[..., None]
        jcube = jnp.clip(jnp.floor(p_jump).astype(jnp.int32), 0, grid_hi - 1)
        jboundary = jcube + step_pos
        jtmax = (jnp.asarray(jboundary, jnp.float32) - base) * inv_d / grid_scale[..., None]
        jtmax = jnp.where(step == 0, _INF, jtmax)

        # --- commit register updates by case (stalled rays keep state) ------
        w = act[..., None]
        cube = jnp.where(
            enter_block[..., None],
            icube_pre,
            jnp.where(
                exit_inner[..., None],
                st["saved_cube"],
                jnp.where(can_jump[..., None], jcube, jnp.where(w, new_cube, st["cube"])),
            ),
        )
        tmax = jnp.where(
            enter_block[..., None],
            itmax_pre,
            jnp.where(
                exit_inner[..., None],
                st["saved_tmax"],
                jnp.where(can_jump[..., None], jtmax, jnp.where(w, new_tmax, st["tmax"])),
            ),
        )
        mode = jnp.where(enter_block, 1, jnp.where(exit_inner, 0, st["mode"]))
        res_f = jnp.where(enter_block, blk_res_f, jnp.where(exit_inner, 1.0, st["res_f"]))
        res_i = jnp.where(enter_block, blk_res, jnp.where(exit_inner, 1, st["res_i"]))
        ventry = jnp.where(enter_block, blk_ventry, st["ventry"])
        saved_cube = jnp.where(enter_block[..., None], new_cube, st["saved_cube"])
        saved_tmax = jnp.where(enter_block[..., None], new_tmax, st["saved_tmax"])
        block_cube = jnp.where(enter_block[..., None], new_cube, st["block_cube"])

        # --- hit recording ---------------------------------------------------
        got_hit = hit_atom | hit_vox
        next_t = jnp.min(new_tmax, axis=-1)
        hit_kind = jnp.where(
            hit_atom, HIT_ATOM, jnp.where(hit_vox, HIT_VOXEL, st["hit_kind"])
        )
        hit_idx = jnp.where(got_hit, pal_idx, st["hit_idx"])
        hit_vflat = jnp.where(hit_vox, flat_inner - n_space, st["hit_vflat"])
        hit_face = jnp.where(got_hit, face, st["hit_face"])
        hit_t = jnp.where(got_hit, t_hit, st["hit_t"])
        hit_next_t = jnp.where(got_hit, next_t, st["hit_next_t"])
        hit_cube = jnp.where(
            got_hit[..., None],
            jnp.where(inner[..., None], st["block_cube"], new_cube),
            st["hit_cube"],
        )

        walking = walking & ~got_hit & ~exit_outer
        exited = st["exited"] | exit_outer

        # dict(st, ...) preserves optional extra state (e.g. the
        # debug_pixel_cost step counter) through the loop.
        return dict(
            st,
            cube=cube,
            tmax=tmax,
            mode=mode,
            res_f=res_f,
            res_i=res_i,
            ventry=ventry,
            saved_cube=saved_cube,
            saved_tmax=saved_tmax,
            block_cube=block_cube,
            walking=walking,
            exited=exited,
            hit_kind=hit_kind,
            hit_idx=hit_idx,
            hit_vflat=hit_vflat,
            hit_face=hit_face,
            hit_t=hit_t,
            hit_next_t=hit_next_t,
            hit_cube=hit_cube,
        )

    def traversal_body(st, ctx):
        """One iteration: fetch the brick row each ray is about to enter
        (the ONE gather), then take up to `substeps` DDA steps inside it."""
        inner = st["mode"] == 1
        axis0 = _argmin_axis(st["tmax"])
        onehot0 = jax.nn.one_hot(axis0, 3, dtype=jnp.int32)
        probe_cube = st["cube"] + onehot0 * ctx["step"]
        bkey = _brick_key(probe_cube, inner, st["ventry"])
        row = jnp.take(cells_rows, jnp.clip(bkey, 0, total_bricks - 1), axis=0)
        for _ in range(substeps):
            st = sub_step(st, ctx, row, bkey)
        if "steps" in st:
            # Per-ray traversal cost (debug_pixel_cost): substeps per
            # iteration while the ray still walks.
            st = dict(
                st,
                steps=st["steps"] + st["walking"].astype(jnp.int32) * substeps,
            )
        return st

    iters_used = []  # per-phase loop iteration counts (for return_stats)

    def run_loop(st, ctx, fuel, collect=True):
        def body(carry):
            s, f = carry
            return traversal_body(s, ctx), f - 1

        def cond(carry):
            s, f = carry
            return (f > 0) & s["walking"].any()

        st, f_left = jax.lax.while_loop(cond, body, (st, jnp.int32(fuel)))
        if collect:
            iters_used.append(jnp.int32(fuel) - f_left)
        return st

    def _walking_first_index(walking, k):
        """First k slots of a stable walking-first partition. Cumsum-based:
        a full argsort here costs ~1.3 s at 2M rays (measured)."""
        w = walking.astype(jnp.int32)
        pos_w = jnp.cumsum(w) - 1  # destinations for walking rays
        n_walk = pos_w[-1] + 1
        pos_nw = n_walk + jnp.cumsum(1 - w) - 1  # then the rest, in order
        dest = jnp.where(walking, pos_w, pos_nw)
        idx = jnp.zeros(n_rays, jnp.int32).at[dest].set(
            jnp.arange(n_rays, dtype=jnp.int32)
        )
        return idx[:k]

    def run_with_compaction(st, ctx, stage1, frac=4):
        """Run `stage1` iterations full-width; if ≤1/frac of the rays are
        then still walking (the usual case — most rays hit or exit early),
        partition walking-first, finish on a narrow buffer, and scatter
        back. The loop tail is where rays hug surfaces and step
        cube-by-cube; shrinking the gather rows shrinks its cost
        proportionally."""
        st = run_loop(st, ctx, stage1)
        part = max(n_rays // frac, 1)

        def small(st):
            idx = _walking_first_index(st["walking"], part)
            take = lambda a: jnp.take(a, idx, axis=0)
            st_s = jax.tree.map(take, st)
            ctx_s = jax.tree.map(take, ctx)
            st_s = run_loop(st_s, ctx_s, max_steps, collect=False)
            return jax.tree.map(lambda full, sub: full.at[idx].set(sub), st, st_s)

        def full(st):
            return run_loop(st, ctx, max_steps, collect=False)

        n_walking = st["walking"].sum()
        return jax.lax.cond(
            n_walking == 0,
            lambda st: st,
            lambda st: jax.lax.cond(n_walking <= part, small, full, st),
            st,
        )

    light_acc = jnp.zeros((n_rays, 3), jnp.float32)
    trans_acc = jnp.ones(n_rays, jnp.float32)

    shade_fn = make_phase_shader(state, options, o, d, d_len, t_to_view, sky_rgb)

    def shade_phase(st, light_acc, trans_acc, phase_illum=None):
        return shade_fn(
            {k: st[k] for k in HIT_KEYS}, light_acc, trans_acc, phase_illum
        )

    st = init
    walkers = []
    all_hits = []  # per-phase hit buffers (return_hits)
    unfinished = jnp.asarray(False)
    for _phase in range(phases):
        if return_stats:
            walkers.append(st["walking"].sum())
        # Phase 1: most rays finish in the first dozen iterations; later
        # phases start with few walkers (transparent continuations).
        if compact:
            st = run_with_compaction(st, ctx0, stage1=12 if _phase == 0 else 1)
        else:
            st = run_loop(st, ctx0, max_steps)
        has_hit = st["hit_kind"] != HIT_NONE
        if return_stats:
            # Rays still walking after the loop ran out of fuel produce an
            # imperfect frame (Flaws::UNFINISHED analog).
            unfinished = unfinished | st["walking"].any()
        if return_hits:
            all_hits.append(
                {
                    k: st[k]
                    for k in (
                        "hit_kind",
                        "hit_face",
                        "hit_t",
                        "hit_cube",
                        "hit_idx",
                        "hit_vflat",
                    )
                }
            )
        phase_illum = illum_override if _phase == 0 else None
        # Skip the whole shading pass when no ray hit anything this phase
        # (later phases of opaque scenes cost nothing).
        light_acc, trans_acc = jax.lax.cond(
            has_hit.any(),
            lambda la, ta: shade_phase(st, la, ta, phase_illum),
            lambda la, ta: (la, ta),
            light_acc,
            trans_acc,
        )
        # Resume rays that still transmit (ColorBuf::opaque cutoff).
        resume = has_hit & (trans_acc >= 1.0 / 256.0)
        st = dict(st, walking=resume, hit_kind=jnp.zeros(n_rays, jnp.int32))

    if include_sky:
        light_acc = light_acc + sky_rgb * trans_acc[..., None]
        trans_acc = jnp.zeros_like(trans_acc)

    out = (light_acc.reshape(batch_shape + (3,)), trans_acc.reshape(batch_shape))
    if return_stats:
        out = out + (
            dict(
                iters=jnp.stack(iters_used),
                walkers=jnp.stack(walkers),
                unfinished=unfinished,
            ),
        )
    if return_hits:
        # First phase's buffer, with the full per-phase list attached for
        # custom accumulators (accum.rs Accumulate analog).
        first = dict(all_hits[0])
        first["phases"] = all_hits
        out = out + (first,)
    if count_steps:
        out = out + (st["steps"].reshape(batch_shape),)
    return out


def _sky_sample(state: SpaceState, d):
    """Sky::sample (sky.rs:35): octant by direction signs.

    Implemented as a 3-level select tree rather than a row gather: XLA
    gathers cost per ROW (~100 M rows/s — PERF.md), so `jnp.take` of 2M
    rays from the 8-row table was ~17 ms/frame on atrium 1080p; seven
    [n,3] selects are pure VPU work (<1 ms)."""
    oct = state.sky_octants  # [8, 3]
    sx = d[..., 0:1] >= 0
    sy = d[..., 1:2] >= 0
    sz = d[..., 2:3] >= 0
    s0 = jnp.where(sz, oct[1], oct[0])
    s1 = jnp.where(sz, oct[3], oct[2])
    s2 = jnp.where(sz, oct[5], oct[4])
    s3 = jnp.where(sz, oct[7], oct[6])
    return jnp.where(sx, jnp.where(sy, s3, s2), jnp.where(sy, s1, s0))


@functools.partial(
    jax.jit, static_argnames=("options", "include_sky", "phases")
)
def trace_rays_bounce(
    state: SpaceState,
    origins,
    directions,
    options: GraphicsOptions,
    key,
    include_sky: bool = True,
    phases: int = 4,
):
    """LightingOption::Bounce (surface.rs:113-163): primary hits are
    illuminated by `options.bounce_samples` Lambertian secondary rays
    (direction = face normal + uniform unit-sphere sample, origin nudged
    off the surface), each traced with stored-light Flat shading (the
    bounce budget is 1). Later transparency phases shade Flat.

    Returns (light, trans) like trace_rays. `key` is a jax PRNG key —
    bounce is pseudo-random and noisy by design (the reference excludes
    it from its golden suite for this reason)."""
    import dataclasses

    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3).astype(jnp.float32)
    d = directions.reshape(-1, 3).astype(jnp.float32)
    samples = max(int(options.bounce_samples), 1)

    _, _, hits = trace_rays(
        state, o, d, options, include_sky=include_sky, phases=1,
        return_hits=True, beam_tile=0,
    )
    has_hit = hits["hit_kind"] != HIT_NONE
    normals = jnp.asarray(faces.FACE_NORMALS, jnp.float32)
    n = jax.nn.one_hot(jnp.clip(hits["hit_face"], 0, 5), 6) @ normals
    point = o + d * hits["hit_t"][..., None] + n * 1e-4

    flat_opts = dataclasses.replace(options, lighting_display=LIGHT_FLAT)

    def sample_body(acc, key_i):
        sph = jax.random.normal(key_i, point.shape)
        sph = sph / jnp.maximum(
            jnp.linalg.norm(sph, axis=-1, keepdims=True), 1e-9
        )
        d2 = n + sph
        # Degenerate direction (sample ≈ -normal): fall back to the normal.
        tiny = jnp.linalg.norm(d2, axis=-1, keepdims=True) < 1e-3
        d2 = jnp.where(tiny, n, d2)
        li, _ = trace_rays(
            state, point, d2, flat_opts, include_sky=True, phases=2,
            beam_tile=0,
        )
        return acc + li, None

    keys = jax.random.split(key, samples)
    illum, _ = jax.lax.scan(sample_body, jnp.zeros_like(point), keys)
    illum = illum / float(samples)

    light, trans = trace_rays(
        state, o, d, options, include_sky=include_sky, phases=phases,
        illum_override=jnp.where(has_hit[..., None], illum, 0.0),
        beam_tile=0,
    )
    return light.reshape(batch_shape + (3,)), trans.reshape(batch_shape)
