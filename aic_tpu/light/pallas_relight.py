"""Pallas whole-volume relight: VMEM-resident Jacobi pass.

The XLA dense pass (light/dense.py) is HBM-bound: every (ray, step) pair
re-reads shifted volumes from HBM and round-trips the carry (~35 µs/pair
measured, PERF.md). This kernel keeps EVERYTHING in VMEM and exploits two
structural facts of the light chart:

1. **Octant symmetry.** The 602-ray chart is closed under the 8 axis
   mirrorings (verified bit-exactly vs build_chart): only ~91 canonical
   rays (direction components all >= 0) need step tables; the other 7
   mirrors reuse them with sign-flipped offsets and permuted face ids.
   The kernel grid is the 8 mirrors; pair count drops 8x.

2. **Lane-uniform offsets.** For a fixed (ray, step, mirror), the chart
   offset is the same for every cube, so the volume fetch is a *shift*,
   not a gather: an 8-aligned dynamic sublane slice + 8-way masked
   remainder sum (x component) and one `pltpu.roll` along lanes (y, z
   components). (A dynamic sublane roll composed with a dynamic lane
   roll miscompiles on Mosaic — scripts/probe_roll2.py — hence the
   slice+select form.) Wrap/bleed artifacts land only on cells masked
   out by the arithmetic inside-test.

3. **The behind-the-face light fetch is free.** A DDA path enters cube
   `off` through face f, so the previous cube is `off + normal(f)` — the
   cube fetched at the *previous step*. Carrying `prev_own` (3 planes)
   replaces the second shifted light fetch of the XLA pass.

Data layout: all volumes are f32 planes `[XP8, L]`: the pad-1 padded
volume flattened as rows = x (padded to a multiple of 8 for Mosaic
sublane alignment), lanes = y*Zp + z (padded to a multiple of 128).
Mosaic constraints honored: scalar loads use static lane indices (pair
tables are laid out one row per (mirror, pair)), dynamic slice starts are
provable multiples of 8.

Per-step semantics are identical to dense._run_pairs / LightBuffer::
traverse (updater.rs:755-880); results match the XLA pass to float
accumulation order (<= 1 packed-light step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..math import lightpack
from ..space.state import SpaceState
from .dense import RelightCtx, _finish, _pair_tables

# Face permutation under mirroring of one axis (NX<->PX etc.), composed
# per 3-bit mirror id.
_FACE_FLIP_AXIS = np.asarray(
    [[3, 1, 2, 0, 4, 5], [0, 4, 2, 3, 1, 5], [0, 1, 5, 3, 4, 2]], np.int32
)


def _face_perm(m: int) -> np.ndarray:
    perm = np.arange(6, dtype=np.int32)
    for a in range(3):
        if (m >> a) & 1:
            perm = _FACE_FLIP_AXIS[a][perm]
    return perm


@functools.lru_cache(maxsize=16)
def _canonical_tables(max_distance: int, size: tuple[int, int, int]):
    """Canonical-octant pair tables + mirror metadata (host numpy).

    Returns dict:
      tbl  i32[8*N, 8]: one row per (mirror, pair): dx, dy, dz (signs
           applied), flags (1=is_end, 2=ray_new, 4=mirror_valid),
           face (permuted), canon_ray_index, 0, 0
      cosm f32[8*C, 8]: per (mirror, canonical ray) face cosines in
           lanes 0..5 (mirror-permuted)
    """
    from .chart import generate_directions

    directions, cosines = generate_directions()
    n_rays = directions.shape[0]
    absdir = np.abs(directions)
    canon_mask = (directions >= -1e-12).all(axis=1)
    canon_ids = np.nonzero(canon_mask)[0]
    canon_index = {r: i for i, r in enumerate(canon_ids)}
    canon_lookup = {tuple(np.round(absdir[r], 12)) for r in canon_ids}
    for r in range(n_rays):
        assert tuple(np.round(absdir[r], 12)) in canon_lookup, (
            "chart not octant-closed"
        )

    ch = _pair_tables(max_distance, size)
    ray_id = ch["ray_id"]
    keep = np.isin(ray_id, canon_ids)
    off = ch["off"][keep].astype(np.int32)
    face = ch["face"][keep].astype(np.int32)
    is_end = ch["is_end"][keep]
    ray_new = ch["ray_new"][keep]
    rid = ray_id[keep]
    cray = np.asarray([canon_index[r] for r in rid], np.int32)
    zero_mask = ((np.abs(directions[rid]) < 1e-12) @ np.asarray([1, 2, 4])).astype(
        np.int32
    )

    n = off.shape[0]
    tbl = np.zeros((8, n, 8), np.int32)
    for m in range(8):
        sgn = np.asarray([1 - 2 * ((m >> a) & 1) for a in range(3)], np.int32)
        perm = _face_perm(m)
        mvalid = (m & zero_mask) == 0
        tbl[m, :, 0:3] = off * sgn
        tbl[m, :, 3] = (
            is_end.astype(np.int32)
            | (ray_new.astype(np.int32) << 1)
            | (mvalid.astype(np.int32) << 2)
        )
        tbl[m, :, 4] = perm[face]
        tbl[m, :, 5] = cray

    n_canon = len(canon_ids)
    cosm = np.zeros((8, n_canon, 8), np.float32)
    for i, r in enumerate(canon_ids):
        for m in range(8):
            cosm[m, i, :6] = cosines[r][_face_perm(m)]
    return dict(
        tbl=tbl.reshape(8 * n, 8),
        cosm=cosm.reshape(8 * n_canon, 8),
        n_pairs=n,
        n_canon=n_canon,
    )


def _plane_shape(size):
    """(Xp8, Yp, Zp, L): pad-1 plane layout, rows 8-aligned, lanes
    128-aligned."""
    xp, yp, zp = size[0] + 2, size[1] + 2, size[2] + 2
    xp8 = ((xp + 7) // 8) * 8
    lanes = ((yp * zp + 127) // 128) * 128
    return xp8, yp, zp, lanes


def vmem_estimate_bytes(size) -> int:
    """Rough VMEM need: input planes + scratch + one mirror's outputs."""
    xp8, yp, zp, lanes = _plane_shape(size)
    plane = xp8 * lanes * 4
    n_planes = 30 + 6 + 1 + 6 + 3 + 3  # face, em+light, alpha0, dw, light, coords
    return plane * (n_planes + 5 + 4 + 12)  # + scratch + out + headroom


def _pack_planes_static(state: SpaceState, ctx: RelightCtx):
    """Device prep for the LIGHT-INDEPENDENT kernel inputs (XLA).

    Hoisted out of the multi-pass convergence loop: only the light planes
    (_light_planes) change between Jacobi passes."""
    t = state.tables
    size = state.contents.shape
    x, y, z = size
    xp8, yp, zp, lanes = _plane_shape(size)

    idx = jnp.zeros((xp8, yp, zp), jnp.int32)
    idx = idx.at[1 : 1 + x, 1 : 1 + y, 1 : 1 + z].set(
        state.contents.astype(jnp.int32)
    )

    def to_plane(vol_xp8):  # [xp8,yp,zp] -> [xp8, lanes]
        flat = vol_xp8.reshape(xp8, yp * zp)
        return jnp.pad(flat, ((0, 0), (0, lanes - yp * zp)))

    rows = jnp.take(
        t.light_face_rows.reshape(t.padded_palette_size, 6, 8), idx, axis=0
    )  # [xp8,yp,zp,6,8]

    # Per-face stack: 6 faces x 5 channels (r,g,b,a,flags), with
    # (xp8+8)-row guard bands so the per-pair x-shift is an 8-aligned
    # dynamic slice (see kernel: Mosaic miscompiles composed dynamic
    # rolls, so the x-shift is slice + masked remainder instead).
    guard = jnp.zeros((xp8 + 8, lanes), jnp.float32)
    face_stack = jnp.concatenate(
        [guard]
        + [to_plane(rows[..., f, c]) for f in range(6) for c in range(5)]
        + [guard],
        axis=0,
    )  # [30*xp8 + 2*(xp8+8), lanes]

    emission = jnp.take(t.light_emission, idx, axis=0)  # [xp8,yp,zp,3]
    em_planes = jnp.concatenate(
        [to_plane(emission[..., c]) for c in range(3)], axis=0
    )  # [3*xp8, lanes]

    pad1 = lambda vol: jnp.pad(
        vol, ((1, xp8 - 1 - x), (1, 1), (1, 1))
    )  # [x,y,z] -> [xp8,yp,zp]
    alpha0 = to_plane(pad1(ctx.alpha0))
    dw = jnp.concatenate(
        [to_plane(pad1(ctx.dir_weights[..., f])) for f in range(6)], axis=0
    )

    cx = jnp.broadcast_to(
        jnp.arange(xp8, dtype=jnp.float32)[:, None] - 1.0, (xp8, yp * zp)
    )
    yz = jnp.arange(yp * zp, dtype=jnp.float32)
    cy = jnp.broadcast_to((yz // zp)[None, :] - 1.0, (xp8, yp * zp))
    cz = jnp.broadcast_to((yz % zp)[None, :] - 1.0, (xp8, yp * zp))
    pad_l = lambda a: jnp.pad(
        a, ((0, 0), (0, lanes - yp * zp)), constant_values=-1e9
    )
    coords = jnp.concatenate([pad_l(cx), pad_l(cy), pad_l(cz)], axis=0)

    return dict(
        face_stack=face_stack,
        em_planes=em_planes,
        guard=guard,
        alpha0=alpha0,
        dw=dw,
        coords=coords,
    )


def _light_planes(light_u8, sky_faces, size, xp8, yp, zp, lanes):
    """Decoded stored light planes with the sky one-ring
    (BlockSky::light_outside) — the per-pass kernel input."""
    x, y, z = size
    light = jnp.zeros((xp8, yp, zp, 3), jnp.float32)
    light = light.at[1 : 1 + x, 1 : 1 + y, 1 : 1 + z].set(
        lightpack.decode_rgb(light_u8)
    )
    inner = (slice(1, 1 + x), slice(1, 1 + y), slice(1, 1 + z))
    for a in range(3):
        lo = [inner[0], inner[1], inner[2]]
        hi = [inner[0], inner[1], inner[2]]
        lo[a] = 0
        hi[a] = 1 + size[a]
        light = light.at[lo[0], lo[1], lo[2]].set(sky_faces[a])
        light = light.at[hi[0], hi[1], hi[2]].set(sky_faces[a + 3])
    flat = light.reshape(xp8, yp * zp, 3)
    flat = jnp.pad(flat, ((0, 0), (0, lanes - yp * zp), (0, 0)))
    return jnp.concatenate([flat[..., c] for c in range(3)], axis=0)


def _pack_planes(state: SpaceState, ctx: RelightCtx):
    """Full per-call device prep (single-pass entry point)."""
    size = state.contents.shape
    xp8, yp, zp, lanes = _plane_shape(size)
    statics = _pack_planes_static(state, ctx)
    light_planes = _light_planes(
        state.light, state.sky_faces, size, xp8, yp, zp, lanes
    )
    em_light = jnp.concatenate(
        [statics["guard"], statics["em_planes"], light_planes, statics["guard"]],
        axis=0,
    )
    return dict(
        face_stack=statics["face_stack"],
        em_light=em_light,
        alpha0=statics["alpha0"],
        dw=statics["dw"],
        light_static=light_planes,
        coords=statics["coords"],
    )


def _kernel_factory(size, n_pairs, n_canon, xp8, lanes, zp_true):
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ablate = os.environ.get("AIC_PALLAS_ABLATE", "")  # debug bisection only

    x, y, z = size
    xf, yf, zf = float(x), float(y), float(z)

    def kernel(
        tbl_ref,  # i32[8*N, 8] rows (mirror, pair)
        cosm_ref,  # f32[8*C, 8] rows (mirror, canon ray), lanes 0..5
        skyray_ref,  # f32[8*C, 8] rows (mirror, canon ray), lanes 0..2
        face_ref,  # f32[30*xp8, L]
        emlight_ref,  # f32[6*xp8, L]
        alpha0_ref,  # f32[xp8, L]
        dw_ref,  # f32[6*xp8, L]
        light_ref,  # f32[3*xp8, L]
        coords_ref,  # f32[3*xp8, L]
        inc_ref,  # out f32[1, 3*xp8, L]
        tot_ref,  # out f32[1, xp8, L]
        alpha,  # scratch f32[xp8, L]
        rw,  # scratch f32[xp8, L]
        prev,  # scratch f32[3*xp8, L]
        incs,  # scratch f32[3*xp8, L] (accumulator)
        tots,  # scratch f32[xp8, L]
    ):
        m = pl.program_id(0)

        alpha[:] = jnp.zeros_like(alpha)
        rw[:] = jnp.zeros_like(rw)
        prev[:] = jnp.zeros_like(prev)
        incs[:] = jnp.zeros_like(incs)
        tots[:] = jnp.zeros_like(tots)

        cxp = coords_ref[0:xp8, :]
        cyp = coords_ref[xp8 : 2 * xp8, :]
        czp = coords_ref[2 * xp8 : 3 * xp8, :]

        def body(p, _):
            row = m * n_pairs + p
            dx = tbl_ref[row, 0]
            dy = tbl_ref[row, 1]
            dz = tbl_ref[row, 2]
            flags = tbl_ref[row, 3]
            fid = tbl_ref[row, 4]
            cray = tbl_ref[row, 5]
            is_end = (flags & 1) != 0
            ray_new = (flags & 2) != 0
            mvalid = (flags & 4) != 0
            crow = m * n_canon + cray

            if "nowhen" in ablate:
                alpha[:] = jnp.where(ray_new, alpha0_ref[:], alpha[:])
                acc = jnp.zeros((xp8, lanes), jnp.float32)
                for f in range(6):
                    acc = acc + dw_ref[f * xp8 : (f + 1) * xp8, :] * cosm_ref[crow, f]
                rw[:] = jnp.where(
                    ray_new, jnp.where(mvalid, acc, 0.0), rw[:]
                )
                prev[:] = jnp.where(ray_new, light_ref[:], prev[:])
            else:

                @pl.when(ray_new)
                def _():
                    alpha[:] = alpha0_ref[:]
                    acc = jnp.zeros((xp8, lanes), jnp.float32)
                    for f in range(6):
                        acc = acc + dw_ref[f * xp8 : (f + 1) * xp8, :] * cosm_ref[
                            crow, f
                        ]
                    rw[:] = jnp.where(mvalid, acc, 0.0)
                    prev[:] = light_ref[:]

            lane_shift = dy * zp_true + dz

            # Shifted fetches. Mosaic miscompiles a dynamic sublane roll
            # composed with a dynamic lane roll (verified on hardware, see
            # scripts/probe_roll2.py), so the x-shift is done as an
            # 8-aligned dynamic slice (floor(dx/8)) + ONE lane roll + an
            # 8-way masked sum for the remainder. Wraps/bleeds land only
            # on elements masked out by `inside` below.
            dx8 = (dx >> 3) << 3
            dxr = dx - dx8

            # pltpu.roll MISCOMPILES negative dynamic shifts when the lane
            # width is not a power of two (all-lanes-wrong at 1408, fine at
            # 1024 — scripts/probe_roll3.py, v5e); always roll by the
            # equivalent positive shift.
            roll_shift = jnp.where(
                lane_shift > 0, lanes - lane_shift, -lane_shift
            )

            def fetch(ref, base, nrows):
                start = pl.multiple_of(xp8 + 8 + base + dx8, 8)
                wide = ref[pl.ds(start, nrows + 8), :]
                wide = pltpu.roll(wide, roll_shift, axis=1)
                acc = jnp.zeros((nrows, lanes), jnp.float32)
                for k in range(8):
                    acc = acc + jnp.where(dxr == k, wide[k : k + nrows, :], 0.0)
                return acc

            a_blk = fetch(face_ref, fid * (5 * xp8), 5 * xp8)
            b_blk = fetch(emlight_ref, 0, 6 * xp8)

            fc_r = a_blk[0:xp8]
            fc_g = a_blk[xp8 : 2 * xp8]
            fc_b = a_blk[2 * xp8 : 3 * xp8]
            fc_a = a_blk[3 * xp8 : 4 * xp8]
            fl = a_blk[4 * xp8 : 5 * xp8]
            em = (b_blk[0:xp8], b_blk[xp8 : 2 * xp8], b_blk[2 * xp8 : 3 * xp8])
            own = (
                b_blk[3 * xp8 : 4 * xp8],
                b_blk[4 * xp8 : 5 * xp8],
                b_blk[5 * xp8 : 6 * xp8],
            )

            dxf = dx.astype(jnp.float32)
            dyf = dy.astype(jnp.float32)
            dzf = dz.astype(jnp.float32)
            inside = (
                (cxp + dxf >= 0.0)
                & (cxp + dxf < xf)
                & (cyp + dyf >= 0.0)
                & (cyp + dyf < yf)
                & (czp + dzf >= 0.0)
                & (czp + dzf < zf)
            )

            al = alpha[:]
            rwv = rw[:]
            live = (al > 0.0) & (rwv > 0.0)
            exits = live & (is_end | ~inside)
            hit_alpha = jnp.clip(fc_a, 0.0, 1.0)
            visible = fl >= 2.0
            opaque_f = (fl == 1.0) | (fl == 3.0)
            interacting = live & ~exits & visible

            struck = interacting & (hit_alpha > 0.0)
            hit_opaque = struck & opaque_f
            arw = al * rwv
            c0 = jnp.where(struck, (em[0] + fc_r * prev[0:xp8] * hit_alpha) * arw, 0.0)
            c1 = jnp.where(
                struck, (em[1] + fc_g * prev[xp8 : 2 * xp8] * hit_alpha) * arw, 0.0
            )
            c2 = jnp.where(
                struck,
                (em[2] + fc_b * prev[2 * xp8 : 3 * xp8] * hit_alpha) * arw,
                0.0,
            )
            al = jnp.where(struck & ~hit_opaque, al * (1.0 - hit_alpha), al)

            through = interacting & (hit_alpha < 1.0) & ~hit_opaque
            arw2 = al * rwv
            c0 = c0 + jnp.where(through, (em[0] + own[0] * hit_alpha) * arw2, 0.0)
            c1 = c1 + jnp.where(through, (em[1] + own[1] * hit_alpha) * arw2, 0.0)
            c2 = c2 + jnp.where(through, (em[2] + own[2] * hit_alpha) * arw2, 0.0)
            al = jnp.where(through, al * (1.0 - hit_alpha), al)

            al = jnp.where(hit_opaque, 0.0, al)
            ends_now = exits | hit_opaque | (live & (al <= 0.0) & ~exits)
            sky0 = skyray_ref[crow, 0]
            sky1 = skyray_ref[crow, 1]
            sky2 = skyray_ref[crow, 2]
            arw3 = al * rwv
            c0 = c0 + jnp.where(ends_now, sky0 * arw3, 0.0)
            c1 = c1 + jnp.where(ends_now, sky1 * arw3, 0.0)
            c2 = c2 + jnp.where(ends_now, sky2 * arw3, 0.0)
            tots[:] = tots[:] + jnp.where(ends_now, rwv, 0.0)
            al = jnp.where(ends_now, 0.0, al)

            alpha[:] = al
            incs[0:xp8, :] = incs[0:xp8, :] + c0
            incs[xp8 : 2 * xp8, :] = incs[xp8 : 2 * xp8, :] + c1
            incs[2 * xp8 : 3 * xp8, :] = incs[2 * xp8 : 3 * xp8, :] + c2
            prev[0:xp8, :] = own[0]
            prev[xp8 : 2 * xp8, :] = own[1]
            prev[2 * xp8 : 3 * xp8, :] = own[2]
            return 0

        jax.lax.fori_loop(0, n_pairs, body, 0)
        inc_ref[0] = incs[:]
        tot_ref[0] = tots[:]

    return kernel


def _kernel_pass(state: SpaceState, ctx: RelightCtx, planes, interpret=False):
    """Traced single-pass body: planes dict → new packed light u8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    size = state.contents.shape
    x, y, z = size
    xp8, yp, zp, lanes = _plane_shape(size)
    ct = _canonical_tables(state.light_max_distance, size)

    cosm = jnp.asarray(ct["cosm"])  # [8*C, 8], lanes 0..5 live
    cos6 = cosm[:, :6]
    skyray3 = (cos6 @ state.sky_faces) / cos6.sum(-1, keepdims=True)
    skyray = jnp.pad(skyray3, ((0, 0), (0, 5)))  # [8*C, 8]

    kernel = _kernel_factory(size, ct["n_pairs"], ct["n_canon"], xp8, lanes, zp)
    inc, tot = pl.pallas_call(
        kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(
                (1, 3 * xp8, lanes), lambda m: (m, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, xp8, lanes), lambda m: (m, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 3 * xp8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((8, xp8, lanes), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((xp8, lanes), jnp.float32),
            pltpu.VMEM((xp8, lanes), jnp.float32),
            pltpu.VMEM((3 * xp8, lanes), jnp.float32),
            pltpu.VMEM((3 * xp8, lanes), jnp.float32),
            pltpu.VMEM((xp8, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(ct["tbl"]),
        cosm,
        skyray,
        planes["face_stack"],
        planes["em_light"],
        planes["alpha0"],
        planes["dw"],
        planes["light_static"],
        planes["coords"],
    )

    inc = inc.sum(0)  # [3*xp8, lanes]
    tot = tot.sum(0)  # [xp8, lanes]

    def from_plane(pl2d):  # [xp8, lanes] -> [x, y, z] interior
        v = pl2d[:, : yp * zp].reshape(xp8, yp, zp)
        return v[1 : 1 + x, 1 : 1 + y, 1 : 1 + z]

    incoming = jnp.stack(
        [from_plane(inc[i * xp8 : (i + 1) * xp8]) for i in range(3)], axis=-1
    )
    total_w = from_plane(tot)
    return _finish(ctx, incoming + ctx.incoming0, total_w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def relight_all_pass_pallas(
    state: SpaceState, ctx: RelightCtx, interpret: bool = False
):
    """One Jacobi relight pass via the VMEM kernel. Same contract as
    dense.relight_all_pass (new packed light u8[X,Y,Z,4])."""
    return _kernel_pass(state, ctx, _pack_planes(state, ctx), interpret)


@functools.partial(jax.jit, static_argnames=("max_passes",))
def converge_pallas(state: SpaceState, ctx: RelightCtx, max_passes: int = 32):
    """Jacobi passes to convergence, ENTIRELY on device: one program, a
    `lax.while_loop` whose body runs the VMEM kernel pass and diffs in
    packed space. No host syncs between passes (VERDICT r3 weak #5); the
    light-independent planes are packed once (face rows, emission,
    direction weights), only the light planes rebuild per pass.

    Converged when no cube moves by more than 1 packed step (the
    reference's re-enqueue threshold, updater.rs:340). Returns
    (new packed light u8[X,Y,Z,4], passes_run i32)."""
    size = state.contents.shape
    xp8, yp, zp, lanes = _plane_shape(size)
    statics = _pack_planes_static(state, ctx)

    def body(carry):
        light, passes, _ = carry
        lp = _light_planes(light, state.sky_faces, size, xp8, yp, zp, lanes)
        planes = dict(
            face_stack=statics["face_stack"],
            em_light=jnp.concatenate(
                [statics["guard"], statics["em_planes"], lp, statics["guard"]],
                axis=0,
            ),
            alpha0=statics["alpha0"],
            dw=statics["dw"],
            light_static=lp,
            coords=statics["coords"],
        )
        # _kernel_pass reads light only through `planes` (state supplies
        # static shape/tables + sky), so the carry light threads via lp.
        new_light = _kernel_pass(state, ctx, planes)
        diff = lightpack.difference_priority(light, new_light).max()
        return new_light, passes + 1, diff

    def cond(carry):
        _, passes, diff = carry
        return (passes < max_passes) & ((passes == 0) | (diff > 1))

    light, passes, _ = jax.lax.while_loop(
        cond, body, (state.light, jnp.int32(0), jnp.int32(2**30))
    )
    return light, passes
