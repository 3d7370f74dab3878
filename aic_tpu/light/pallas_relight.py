"""Pallas whole-volume relight: VMEM-resident Jacobi pass.

The XLA dense pass (light/dense.py) is HBM-bound: every (ray, step) pair
re-reads shifted volumes from HBM and round-trips the carry (~35 µs/pair
measured, PERF.md). This kernel keeps EVERYTHING in VMEM and exploits
structural facts of the light chart:

1. **Octant symmetry.** The 602-ray chart is closed under the 8 axis
   mirrorings (verified bit-exactly vs build_chart): only ~91 canonical
   rays (direction components all >= 0) need step tables; the other 7
   mirrors reuse them with sign-flipped offsets and permuted face ids.

2. **Lane-uniform offsets.** For a fixed (ray, step, mirror), the chart
   offset is the same for every cube, so the volume fetch is a *shift*,
   not a gather: a 16-aligned dynamic sublane slice + a 4-stage static
   select shift for the row remainder (x component) and one
   `pltpu.roll` along lanes (y, z components). (A dynamic sublane roll
   composed with a dynamic lane roll miscompiles on Mosaic —
   scripts/probe_roll2.py — and `pltpu.roll` with a NEGATIVE dynamic
   shift miscompiles at non-power-of-two lane widths —
   scripts/probe_roll3.py — hence slice+select and positive-normalized
   rolls.) Wrap/bleed artifacts land only on cells masked out by the
   arithmetic inside-test.

3. **The behind-the-face light fetch is free.** A DDA path enters cube
   `off` through face f, so the previous cube is `off + normal(f)` — the
   cube fetched at the *previous step*. Carrying `prev` (3 planes)
   replaces a second shifted light fetch.

4. **All 8 mirrors advance in ONE `fori_loop` iteration.** A Mosaic
   `fori_loop` iteration has a fixed ~2.3 µs overhead regardless of body
   size (scripts/probe_floor_r4.py, measured v5e); processing the 8
   mirror streams per iteration amortizes it 8x and lets the mirrors
   share one pair-table row and the f32 incoming/total accumulators
   (their contributions are additive). Per-mirror state (alpha, ray
   weight, prev light) lives in row-partitioned scratch.

5. **bf16 data planes.** All fetched volumes are bf16 ((16, 128)
   native tiles — ops pack 2 elements/lane): the stored-light codec is
   logarithmic u8 with ~7.2%/step resolution (math/lightpack.py), so
   bf16's ~0.4% relative error is far below one packed step. The alpha
   transmittance chain and the incoming/total accumulators stay f32
   (long products / 602-term sums).

Data layout: all volumes are planes `[xp16, L]`: rows = x of the pad-1
padded volume (padded to a multiple of 16 for bf16 sublane alignment),
lanes = y*Zp + z (padded to a multiple of 128). Scalar pair tables are
laid out one row per pair with per-mirror face ids as columns (scalar
VMEM loads are free — probe_floor_r4.py).

Per-step semantics are identical to dense._run_pairs / LightBuffer::
traverse (all-is-cubes/src/space/light/updater.rs:755-880); results
match the XLA pass to float accumulation order (<= 1 packed-light step).
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
      tbl  i32[N, 16]: one row per canonical pair:
           0:3  dx, dy, dz (canonical, all >= 0 directions; steps may
                still have small negative components from DDA rounding)
           3    flags: 1 = is_end, 2 = ray_new
           4    mirror-valid bitmask (bit m = mirror m contributes;
                rays with a zero direction component are identical in
                the mirrors flipping that axis and counted once)
           5:13 face id entered per mirror (mirror-permuted)
           13   canonical ray index
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
    tbl = np.zeros((n, 16), np.int32)
    tbl[:, 0:3] = off
    tbl[:, 3] = is_end.astype(np.int32) | (ray_new.astype(np.int32) << 1)
    mvalid = np.zeros(n, np.int32)
    for m in range(8):
        mvalid |= ((m & zero_mask) == 0).astype(np.int32) << m
        tbl[:, 5 + m] = _face_perm(m)[face]
    tbl[:, 4] = mvalid
    tbl[:, 13] = cray

    n_canon = len(canon_ids)
    cosm = np.zeros((8, n_canon, 8), np.float32)
    for i, r in enumerate(canon_ids):
        for m in range(8):
            cosm[m, i, :6] = cosines[r][_face_perm(m)]
    return dict(
        tbl=tbl,
        cosm=cosm.reshape(8 * n_canon, 8),
        n_pairs=n,
        n_canon=n_canon,
    )


def _plane_shape(size):
    """(xp16, Yp, Zp, L): pad-1 plane layout, rows 16-aligned (bf16
    sublane tile), lanes 128-aligned."""
    xp, yp, zp = size[0] + 2, size[1] + 2, size[2] + 2
    xp16 = ((xp + 15) // 16) * 16
    lanes = ((yp * zp + 127) // 128) * 128
    return xp16, yp, zp, lanes


#: Guard rows at each end of a fetchable bf16 stack (>= 16 + max row
#: shift is not needed: row shifts are < xp16 by table truncation, and
#: one xp16+16 guard absorbs any in-range shift).
def _guard_rows(xp16):
    return xp16 + 16


def vmem_estimate_bytes(size, n_groups: int = 1) -> int:
    """Rough VMEM need of one pass-kernel program at a mirror-group
    split of `n_groups` (8/n_groups mirrors resident per program)."""
    xp16, yp, zp, lanes = _plane_shape(size)
    bf = xp16 * lanes * 2
    f32 = xp16 * lanes * 4
    inputs = (24 + 6 + 6) * bf + 2 * 2 * _guard_rows(xp16) * lanes * 2 + 4 * f32
    mirrors = 8 // max(n_groups, 1)
    scratch = mirrors * (f32 + bf + 3 * bf)  # alpha + rw + prev per mirror
    outs = 4 * f32
    temps = 12 * bf
    return inputs + scratch + outs + temps


def _to_bf16_plane(vol_xp16, xp16, yp, zp, lanes):
    """[xp16, yp, zp] -> bf16 [xp16, lanes]."""
    flat = vol_xp16.reshape(xp16, yp * zp)
    return jnp.pad(flat, ((0, 0), (0, lanes - yp * zp))).astype(jnp.bfloat16)


def _pack_planes_static(state: SpaceState, ctx: RelightCtx):
    """Device prep for the LIGHT-INDEPENDENT kernel inputs (XLA).

    Hoisted out of the multi-pass convergence loop: only the light planes
    (_light_planes) change between Jacobi passes."""
    t = state.tables
    size = state.contents.shape
    x, y, z = size
    xp16, yp, zp, lanes = _plane_shape(size)

    idx = jnp.zeros((xp16, yp, zp), jnp.int32)
    idx = idx.at[1 : 1 + x, 1 : 1 + y, 1 : 1 + z].set(
        state.contents.astype(jnp.int32)
    )

    to_plane = lambda v: _to_bf16_plane(v, xp16, yp, zp, lanes)

    rows = jnp.take(
        t.light_face_rows.reshape(t.padded_palette_size, 6, 8), idx, axis=0
    )  # [xp16,yp,zp,6,8]

    # Flags-folded alpha channel: the per-face flags plane (opaque +
    # 2*visible, space.py light_face_rows) folds into the alpha value —
    # 0 = invisible (ray passes untouched; emission is zeroed per cube
    # below so the pass-through pickup contributes exactly 0), 2.0 =
    # opaque face (ha clips to 1, opaqueness tested as a > 1.5),
    # else the hit alpha. One less plane to fetch per (pair, mirror)
    # and three fewer mask ops in the kernel, with per-step results
    # identical to the explicit-flags XLA pass (visibility is per-BLOCK,
    # space.py:399, so cube-level emission gating is exact).
    fl = rows[..., 4]
    vis = fl >= 2.0
    opq = (fl == 1.0) | (fl == 3.0)
    ha = jnp.clip(rows[..., 3], 0.0, 1.0)
    a_fold = jnp.where(vis, jnp.where(opq, 2.0, ha), 0.0)

    guard = jnp.zeros((_guard_rows(xp16), lanes), jnp.bfloat16)
    face_stack = jnp.concatenate(
        [guard]
        + [
            to_plane(rows[..., f, c] if c < 3 else a_fold[..., f])
            for f in range(6)
            for c in range(4)
        ]
        + [guard],
        axis=0,
    )  # bf16 [24*xp16 + 2*G, lanes]

    emission = jnp.take(t.light_emission, idx, axis=0)  # [xp16,yp,zp,3]
    vis_cube = vis[..., 0]  # per-block: identical across faces
    em_planes = jnp.concatenate(
        [to_plane(jnp.where(vis_cube, emission[..., c], 0.0)) for c in range(3)],
        axis=0,
    )  # bf16 [3*xp16, lanes]

    pad1 = lambda vol: jnp.pad(
        vol, ((1, xp16 - 1 - x), (1, 1), (1, 1))
    )  # [x,y,z] -> [xp16,yp,zp]
    alpha0 = jnp.pad(
        pad1(ctx.alpha0).reshape(xp16, yp * zp), ((0, 0), (0, lanes - yp * zp))
    )  # f32: seeds the f32 alpha chain
    dw = jnp.concatenate(
        [to_plane(pad1(ctx.dir_weights[..., f])) for f in range(6)], axis=0
    )

    # Coordinate planes for the arithmetic inside-test. f32, not bf16:
    # an i32-scalar->bf16 cast (for the offset comparand) crashes the
    # Mosaic compiler (scripts/probe_bf16_r4.py), and f32 scalar compares
    # are known-good from the round-3 kernel.
    cx = jnp.broadcast_to(
        jnp.arange(xp16, dtype=jnp.float32)[:, None] - 1.0, (xp16, yp * zp)
    )
    yz = jnp.arange(yp * zp, dtype=jnp.float32)
    cy = jnp.broadcast_to((yz // zp)[None, :] - 1.0, (xp16, yp * zp))
    cz = jnp.broadcast_to((yz % zp)[None, :] - 1.0, (xp16, yp * zp))
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


def _light_planes(
    light_u8, sky_faces, size, xp16, yp, zp, lanes, ring=True, interior=True
):
    """Decoded stored light planes (bf16) with the sky one-ring
    (BlockSky::light_outside) — the per-pass kernel input.

    `ring`/`interior` select the two LINEAR components: the constant sky
    one-ring and the iterated interior field. The static/dynamic pass
    split (see _kernel_pass_planes) feeds ring-only planes to the full
    kernel once and interior-only planes to the dyn kernel per pass;
    their contributions sum exactly (every kernel term is linear in the
    fetched light value)."""
    x, y, z = size
    light = jnp.zeros((xp16, yp, zp, 3), jnp.float32)
    if interior:
        light = light.at[1 : 1 + x, 1 : 1 + y, 1 : 1 + z].set(
            lightpack.decode_rgb(light_u8)
        )
    inner = (slice(1, 1 + x), slice(1, 1 + y), slice(1, 1 + z))
    for a in range(3):
        if not ring:
            break
        lo = [inner[0], inner[1], inner[2]]
        hi = [inner[0], inner[1], inner[2]]
        lo[a] = 0
        hi[a] = 1 + size[a]
        light = light.at[lo[0], lo[1], lo[2]].set(sky_faces[a])
        light = light.at[hi[0], hi[1], hi[2]].set(sky_faces[a + 3])
    flat = light.reshape(xp16, yp * zp, 3)
    flat = jnp.pad(flat, ((0, 0), (0, lanes - yp * zp), (0, 0)))
    return jnp.concatenate(
        [flat[..., c].astype(jnp.bfloat16) for c in range(3)], axis=0
    )


def _pack_planes(state: SpaceState, ctx: RelightCtx):
    """Full per-call device prep (single-pass entry point)."""
    size = state.contents.shape
    xp16, yp, zp, lanes = _plane_shape(size)
    statics = _pack_planes_static(state, ctx)
    light_planes = _light_planes(
        state.light, state.sky_faces, size, xp16, yp, zp, lanes
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
        coords=statics["coords"],
    )


#: Debug-only bisection switches for Mosaic compile failures (tokens:
#: nowhen, nofetchA, nofetchB, noroll, nosel, noshade). Not a user API.
_ABLATE: set = set()


def _kernel_factory(
    size, n_pairs, n_canon, xp16, lanes, zp_true, mirrors, interpret=False,
    dyn=False,
):
    """Build the pass kernel processing `mirrors` (a tuple of mirror ids)
    per fori_loop iteration. grid covers the mirror groups. `dyn` emits
    the light-only variant (see _kernel_pass_planes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ablate = frozenset(_ABLATE)

    def lane_roll(v, shift):
        """Dynamic lane roll of a bf16 block. pltpu.roll on bf16 CRASHES
        the Mosaic compiler (scripts/probe_bf16_r4.py, v5e) — bitcast to
        i32 (packs sublane pairs; lanes unchanged), roll, bitcast back.
        The interpreter lacks TPU bitcast packing semantics, so it keeps
        the direct bf16 roll (which the interpreter handles fine)."""
        if interpret:
            return pltpu.roll(v, shift, axis=1)
        w = pltpu.bitcast(v, jnp.int32)
        w = pltpu.roll(w, shift, axis=1)
        return pltpu.bitcast(w, jnp.bfloat16)

    x, y, z = size
    xf, yf, zf = float(x), float(y), float(z)
    n_m = len(mirrors)
    G = _guard_rows(xp16)

    def kernel(
        tbl_ref,  # i32[N, 16]
        cosm_ref,  # f32[8*C, 8] rows (mirror, canon ray), lanes 0..5
        skyray_ref,  # f32[8*C, 8] rows (mirror, canon ray), lanes 0..2
        face_ref,  # bf16[24*xp16 + 2G, L]
        emlight_ref,  # bf16[6*xp16 + 2G, L]
        alpha0_ref,  # f32[xp16, L]
        dw_ref,  # bf16[6*xp16, L]
        coords_ref,  # f32[3*xp16, L]
        inc_ref,  # out f32[3*xp16, L] (accumulated across grid steps)
        tot_ref,  # out f32[xp16, L]
        alpha,  # scratch f32[n_m*xp16, L]
        rw,  # scratch bf16[n_m*xp16, L]
        prev,  # scratch bf16[n_m*3*xp16, L]
    ):
        inc_ref[:] = jnp.zeros_like(inc_ref)
        tot_ref[:] = jnp.zeros_like(tot_ref)
        alpha[:] = jnp.zeros_like(alpha)
        rw[:] = jnp.zeros_like(rw)

        cxp = coords_ref[0:xp16, :]
        cyp = coords_ref[xp16 : 2 * xp16, :]
        czp = coords_ref[2 * xp16 : 3 * xp16, :]

        def body(p, _):
            dx = tbl_ref[p, 0]
            dy = tbl_ref[p, 1]
            dz = tbl_ref[p, 2]
            flags = tbl_ref[p, 3]
            mvalid = tbl_ref[p, 4]
            cray = tbl_ref[p, 13]
            is_end = (flags & 1) != 0
            ray_new = (flags & 2) != 0

            @pl.when(ray_new & ("nowhen" not in ablate))
            def _():
                for j, m in enumerate(mirrors):
                    crow = m * n_canon + cray
                    acc = jnp.zeros((xp16, lanes), jnp.float32)
                    for f in range(6):
                        acc = acc + dw_ref[f * xp16 : (f + 1) * xp16, :].astype(
                            jnp.float32
                        ) * cosm_ref[crow, f]
                    ok = ((mvalid >> m) & 1) != 0
                    rw[j * xp16 : (j + 1) * xp16, :] = jnp.where(
                        ok, acc, 0.0
                    ).astype(jnp.bfloat16)
                    alpha[j * xp16 : (j + 1) * xp16, :] = alpha0_ref[:]
                    prev[j * 3 * xp16 : (j + 1) * 3 * xp16, :] = emlight_ref[
                        G + 3 * xp16 : G + 6 * xp16, :
                    ]

            def fetch(ref, base, nrows, dx_s, roll_shift):
                """Rows [base+dx_s, base+dx_s+nrows) of `ref` (relative
                to its guard), lanes rolled.

                Compiled path: 16-aligned dynamic slice, then the row
                remainder as a dynamic SUBLANE roll on the i32-packed
                (bf16-pair) form composed with the lane roll — the
                bitcasts between the two dynamic rolls defeat the Mosaic
                roll-compose miscompile (probe_roll2), verified bit-exact
                and 44% faster than the 4-stage select at kernel shape
                (scripts/probe_fetch_r5.py). The packed roll moves even
                row counts; one select handles the odd row. Interpreter
                (and the `selfetch` ablate token) keeps the select-tree
                reference path: the interpreter lacks TPU bitcast packing
                semantics."""
                dx16 = (dx_s >> 4) << 4
                dxr = dx_s - dx16
                start = pl.multiple_of(G + base + dx16, 16)
                v = ref[pl.ds(start, nrows + 16), :]
                if interpret or "selfetch" in ablate:
                    if "noroll" not in ablate:
                        v = lane_roll(v, roll_shift)
                    if "nosel" in ablate:
                        return v[0:nrows, :]
                    v = jnp.where((dxr & 8) != 0, v[8 : nrows + 16, :], v[0 : nrows + 8, :])
                    v = jnp.where((dxr & 4) != 0, v[4 : nrows + 8, :], v[0 : nrows + 4, :])
                    v = jnp.where((dxr & 2) != 0, v[2 : nrows + 4, :], v[0 : nrows + 2, :])
                    v = jnp.where((dxr & 1) != 0, v[1 : nrows + 2, :], v[0 : nrows + 1, :])
                    return v[0:nrows, :]
                w = pltpu.bitcast(v, jnp.int32)  # [(nrows+16)/2, L] row pairs
                half = (nrows + 16) // 2
                w = pltpu.roll(w, (half - (dxr >> 1)) % half, axis=0)
                if "noroll" not in ablate:
                    w = pltpu.roll(w, roll_shift, axis=1)
                v = pltpu.bitcast(w, jnp.bfloat16)
                v = jnp.where((dxr & 1) != 0, v[1 : nrows + 1, :], v[0:nrows, :])
                return v

            # Dead-ray gate: alpha is monotone non-increasing along a
            # ray and every contribution is scaled by alpha*rw, so once
            # every mirror's alpha is zero EVERYWHERE the remaining
            # steps of this ray are pure no-ops (the next ray_new
            # reseeds alpha). On surface-rich scenes most rays terminate
            # in a fraction of their chart length, so the cheap
            # whole-scratch reduction buys skipping the fetch+shade body
            # for the majority of pairs.
            if "nogate" in ablate:
                alive = p >= 0
            else:
                alive = jnp.max(alpha[:]) > 0.0

            @pl.when(alive)
            def _shade():
              for j, m in enumerate(mirrors):
                sx = 1 - 2 * (m & 1)
                sy = 1 - 2 * ((m >> 1) & 1)
                sz = 1 - 2 * ((m >> 2) & 1)
                dx_m = dx * sx
                dy_m = dy * sy
                dz_m = dz * sz
                fid = tbl_ref[p, 5 + m]
                crow = m * n_canon + cray

                lane_shift = dy_m * zp_true + dz_m
                # pltpu.roll MISCOMPILES negative dynamic shifts at
                # non-power-of-two lane widths (probe_roll3.py) — always
                # roll by the equivalent positive shift.
                roll_shift = jnp.where(
                    lane_shift > 0, lanes - lane_shift, -lane_shift
                )

                if "nofetchA" in ablate:
                    a_blk = face_ref[G : G + 4 * xp16, :]
                else:
                    a_blk = fetch(
                        face_ref, fid * (4 * xp16), 4 * xp16, dx_m, roll_shift
                    )
                if "nofetchB" in ablate:
                    b_blk = emlight_ref[G : G + 6 * xp16, :]
                elif dyn:
                    # Light-only pass: the em planes are never read
                    # (their contribution lives in the static planes).
                    lb = fetch(emlight_ref, 3 * xp16, 3 * xp16, dx_m, roll_shift)
                    b_blk = jnp.concatenate([lb, lb], axis=0)
                else:
                    b_blk = fetch(emlight_ref, 0, 6 * xp16, dx_m, roll_shift)
                if "noshade" in ablate:
                    inc_ref[0:xp16, :] = inc_ref[0:xp16, :] + (
                        a_blk[0:xp16] * b_blk[0:xp16]
                    ).astype(jnp.float32)
                    continue

                fc_r = a_blk[0:xp16]
                fc_g = a_blk[xp16 : 2 * xp16]
                fc_b = a_blk[2 * xp16 : 3 * xp16]
                fc_a = a_blk[3 * xp16 : 4 * xp16]  # flags-folded (pack)
                em = (b_blk[0:xp16], b_blk[xp16 : 2 * xp16], b_blk[2 * xp16 : 3 * xp16])
                own = (
                    b_blk[3 * xp16 : 4 * xp16],
                    b_blk[4 * xp16 : 5 * xp16],
                    b_blk[5 * xp16 : 6 * xp16],
                )

                dxf = dx_m.astype(jnp.float32)
                dyf = dy_m.astype(jnp.float32)
                dzf = dz_m.astype(jnp.float32)
                inside = (
                    (cxp >= -dxf)
                    & (cxp < xf - dxf)
                    & (cyp >= -dyf)
                    & (cyp < yf - dyf)
                    & (czp >= -dzf)
                    & (czp < zf - dzf)
                )

                al = alpha[j * xp16 : (j + 1) * xp16, :]
                rwv = rw[j * xp16 : (j + 1) * xp16, :].astype(jnp.float32)
                pv = prev[j * 3 * xp16 : (j + 1) * 3 * xp16, :]
                live = (al > 0.0) & (rwv > 0.0)
                exits = live & (is_end | ~inside)
                af = fc_a.astype(jnp.float32)  # 0=invisible, 2=opaque
                ha_f = jnp.clip(af, 0.0, 1.0)
                ha = ha_f.astype(jnp.bfloat16)
                passing = live & ~exits

                struck = passing & (af > 0.0)
                hit_opaque = struck & (af > 1.5)
                arw = al * rwv
                # Struck-face branch: reflect the light stored *behind*
                # the face (carried in prev from the previous step).
                if dyn:
                    cs = [
                        (fc * pv[c * xp16 : (c + 1) * xp16, :] * ha).astype(
                            jnp.float32
                        )
                        for c, fc in enumerate((fc_r, fc_g, fc_b))
                    ]
                else:
                    cs = [
                        (em[c] + fc * pv[c * xp16 : (c + 1) * xp16, :] * ha).astype(
                            jnp.float32
                        )
                        for c, fc in enumerate((fc_r, fc_g, fc_b))
                    ]
                c012 = [jnp.where(struck, v * arw, 0.0) for v in cs]
                al = jnp.where(struck & ~hit_opaque, al * (1.0 - ha_f), al)
                if "shade1" in ablate:
                    for c in range(3):
                        inc_ref[c * xp16 : (c + 1) * xp16, :] = (
                            inc_ref[c * xp16 : (c + 1) * xp16, :] + c012[c]
                        )
                    alpha[j * xp16 : (j + 1) * xp16, :] = al
                    continue

                # Pass-through branch: pick up the cube's own stored light
                # (invisible cubes land here with em'=0, own*0: exact 0).
                through = passing & (ha_f < 1.0) & ~hit_opaque
                arw2 = al * rwv
                for c in range(3):
                    if dyn:
                        lt = (own[c] * ha).astype(jnp.float32)
                    else:
                        lt = (em[c] + own[c] * ha).astype(jnp.float32)
                    c012[c] = c012[c] + jnp.where(through, lt * arw2, 0.0)
                al = jnp.where(through, al * (1.0 - ha_f), al)
                if "shade2" in ablate:
                    for c in range(3):
                        inc_ref[c * xp16 : (c + 1) * xp16, :] = (
                            inc_ref[c * xp16 : (c + 1) * xp16, :] + c012[c]
                        )
                    alpha[j * xp16 : (j + 1) * xp16, :] = al
                    continue

                al = jnp.where(hit_opaque, 0.0, al)
                ends_now = exits | hit_opaque | (live & (al <= 0.0) & ~exits)
                if dyn:
                    for c in range(3):
                        inc_ref[c * xp16 : (c + 1) * xp16, :] = (
                            inc_ref[c * xp16 : (c + 1) * xp16, :] + c012[c]
                        )
                else:
                    arw3 = al * rwv
                    for c in range(3):
                        c012[c] = c012[c] + jnp.where(
                            ends_now, skyray_ref[crow, c] * arw3, 0.0
                        )
                        inc_ref[c * xp16 : (c + 1) * xp16, :] = (
                            inc_ref[c * xp16 : (c + 1) * xp16, :] + c012[c]
                        )
                    tot_ref[:] = tot_ref[:] + jnp.where(ends_now, rwv, 0.0)
                al = jnp.where(ends_now, 0.0, al)

                alpha[j * xp16 : (j + 1) * xp16, :] = al
                for c in range(3):
                    prev[(j * 3 + c) * xp16 : (j * 3 + c + 1) * xp16, :] = own[c]
            return 0

        jax.lax.fori_loop(0, n_pairs, body, 0)

    return kernel


#: Mirror groupings to try, in preference order: all 8 per iteration
#: (floor amortized 8x) down to 1 per kernel (least scratch VMEM /
#: register pressure — light_bench-sized volumes land at 2-4 on v5e).
_GROUPINGS = (1, 2, 4, 8)

#: Per-(shape, md) cache of the grid split that compiles (VMEM-bound).
_BEST_SPLIT: dict = {}


def _mirror_groups(n_groups: int):
    per = 8 // n_groups
    return tuple(tuple(range(g * per, (g + 1) * per)) for g in range(n_groups))


def _kernel_pass(
    state: SpaceState, ctx: RelightCtx, planes, interpret=False, n_groups=1
):
    """Traced single-pass body: planes dict → new packed light u8."""
    size = state.contents.shape
    x, y, z = size
    xp16, yp, zp, lanes = _plane_shape(size)
    inc, tot = _kernel_pass_planes(
        state, ctx, planes, interpret=interpret, n_groups=n_groups
    )

    def from_plane(pl2d):  # [xp16, lanes] -> [x, y, z] interior
        v = pl2d[:, : yp * zp].reshape(xp16, yp, zp)
        return v[1 : 1 + x, 1 : 1 + y, 1 : 1 + z]

    incoming = jnp.stack(
        [from_plane(inc[i * xp16 : (i + 1) * xp16]) for i in range(3)], axis=-1
    )
    total_w = from_plane(tot)
    return _finish(ctx, incoming + ctx.incoming0, total_w)


def _kernel_pass_planes(
    state: SpaceState,
    ctx: RelightCtx,
    planes,
    interpret=False,
    n_groups=1,
    dyn=False,
):
    """One kernel pass returning RAW accumulator planes (inc f32
    [3*xp16, lanes], tot f32 [xp16, lanes]).

    `dyn=True` emits the light-only kernel: emission, sky-termination
    and total-weight terms are omitted — those are light-INDEPENDENT
    (the alpha/weight chain reads geometry only), so a single full pass
    over ZERO light planes yields them once (`static_planes` in
    converge_pallas) and every Jacobi iteration runs the ~25% cheaper
    dyn kernel (measured 192 → 142 ms/pass on light_bench)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    size = state.contents.shape
    xp16, yp, zp, lanes = _plane_shape(size)
    ct = _canonical_tables(state.light_max_distance, size)

    cosm = jnp.asarray(ct["cosm"])  # [8*C, 8], lanes 0..5 live
    cos6 = cosm[:, :6]
    skyray3 = (cos6 @ state.sky_faces) / cos6.sum(-1, keepdims=True)
    skyray = jnp.pad(skyray3, ((0, 0), (0, 5)))  # [8*C, 8]

    groups = _mirror_groups(n_groups)
    n_m = len(groups[0])
    kernels = [
        _kernel_factory(
            size, ct["n_pairs"], ct["n_canon"], xp16, lanes, zp, g, interpret,
            dyn=dyn,
        )
        for g in groups
    ]

    # Mirror ids must be static inside a kernel (static sign flips and
    # scratch row offsets), so a VMEM-forced split runs one pallas_call
    # per mirror group and sums the (additive) outputs in XLA.
    inc = None
    tot = None
    for g_idx, kern in enumerate(kernels):
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((3 * xp16, lanes), jnp.float32),
                jax.ShapeDtypeStruct((xp16, lanes), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_m * xp16, lanes), jnp.float32),
                pltpu.VMEM((n_m * xp16, lanes), jnp.bfloat16),
                pltpu.VMEM((n_m * 3 * xp16, lanes), jnp.bfloat16),
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
            planes["coords"],
        )
        inc = out[0] if inc is None else inc + out[0]
        tot = out[1] if tot is None else tot + out[1]
    return inc, tot


def _resolve_split(state: SpaceState, ctx: RelightCtx) -> int:
    """Pick (and cache) the smallest mirror-group split that compiles
    within VMEM for this volume; 0 means none compiles."""
    key = (tuple(state.contents.shape), state.light_max_distance)
    split = _BEST_SPLIT.get(key)
    if split is not None:
        return split
    if jax.default_backend() != "tpu":
        _BEST_SPLIT[key] = 1
        return 1
    # Start at the first candidate whose VMEM estimate fits a generous
    # cap: a failed compile is only discovered AFTER the full (minutes-
    # long on the remote relay) Mosaic compile, so definitely-too-big
    # candidates are worth skipping up front. The estimate only ORDERS —
    # eligibility is still decided by an actual compile (the r3 lesson:
    # an estimate-based hard gate silently locked the kernel out).
    cap = 15 << 20  # ~16 MiB/core VMEM on v5e, minus headroom
    shape = tuple(state.contents.shape)
    candidates = [
        g for g in _GROUPINGS if vmem_estimate_bytes(shape, g) <= cap
    ] or [_GROUPINGS[-1]]
    for n_groups in candidates:
        try:
            jax.jit(
                functools.partial(relight_all_pass_pallas, n_groups=n_groups)
            ).lower(state, ctx).compile()
            _BEST_SPLIT[key] = n_groups
            return n_groups
        except Exception:
            continue
    _BEST_SPLIT[key] = 0
    return 0


@functools.partial(jax.jit, static_argnames=("interpret", "n_groups"))
def relight_all_pass_pallas(
    state: SpaceState,
    ctx: RelightCtx,
    interpret: bool = False,
    n_groups: int = 1,
):
    """One Jacobi relight pass via the VMEM kernel. Same contract as
    dense.relight_all_pass (new packed light u8[X,Y,Z,4])."""
    return _kernel_pass(
        state, ctx, _pack_planes(state, ctx), interpret, n_groups=n_groups
    )


@functools.partial(
    jax.jit, static_argnames=("max_passes", "n_groups", "overrelax")
)
def converge_pallas(
    state: SpaceState,
    ctx: RelightCtx,
    max_passes: int = 32,
    n_groups: int = 1,
    overrelax: float = 1.0,
):
    """Jacobi passes to convergence, ENTIRELY on device: one program, a
    `lax.while_loop` whose body runs the VMEM kernel pass and diffs in
    packed space. No host syncs between passes; the light-independent
    planes are packed once, only the light planes rebuild per pass.

    `overrelax` w > 1 extrapolates in decoded-light space
    (L <- (1-w)*L + w*F(L)): one pass of the updater is affine in the
    stored light field (every contribution in LightBuffer::traverse is
    linear in a fetched light value), so over-relaxed Richardson
    iteration converges to the SAME fixpoint, faster for the diffuse
    interreflection spectrum. Safeguard: once the packed diff of a PLAIN
    pass is <= the re-enqueue threshold (updater.rs:340), iteration
    stops — the threshold is always judged on un-extrapolated output, so
    the final field is within one packed step of the plain fixpoint.

    Converged when no cube moves by more than 1 packed step. Returns
    (new packed light u8[X,Y,Z,4], passes_run i32)."""
    size = state.contents.shape
    x, y, z = size
    xp16, yp, zp, lanes = _plane_shape(size)
    statics = _pack_planes_static(state, ctx)

    def planes_for(lp):
        return dict(
            face_stack=statics["face_stack"],
            em_light=jnp.concatenate(
                [statics["guard"], statics["em_planes"], lp, statics["guard"]],
                axis=0,
            ),
            alpha0=statics["alpha0"],
            dw=statics["dw"],
            coords=statics["coords"],
        )

    # Static (light-independent) contributions, computed ONCE: the FULL
    # kernel over ring-only planes yields emission, sky terminations,
    # the constant sky one-ring and the total ray weights; every
    # iteration then runs the cheaper light-only kernel (see
    # _kernel_pass_planes — the split is exact by linearity).
    ring_lp = _light_planes(
        state.light, state.sky_faces, size, xp16, yp, zp, lanes,
        ring=True, interior=False,
    )
    inc0, tot0 = _kernel_pass_planes(
        state, ctx, planes_for(ring_lp), n_groups=n_groups
    )

    def from_plane(pl2d):  # [xp16, lanes] -> [x, y, z] interior
        v = pl2d[:, : yp * zp].reshape(xp16, yp, zp)
        return v[1 : 1 + x, 1 : 1 + y, 1 : 1 + z]

    total_w = from_plane(tot0)

    def run_pass(light):
        lp = _light_planes(
            light, state.sky_faces, size, xp16, yp, zp, lanes,
            ring=False, interior=True,
        )
        # The dyn kernel reads light only through `planes` (state
        # supplies static shape/tables), so the carry light threads
        # via lp.
        inc_d, _ = _kernel_pass_planes(
            state, ctx, planes_for(lp), n_groups=n_groups, dyn=True
        )
        inc = inc_d + inc0
        incoming = jnp.stack(
            [from_plane(inc[i * xp16 : (i + 1) * xp16]) for i in range(3)],
            axis=-1,
        )
        return _finish(ctx, incoming + ctx.incoming0, total_w)

    def body(carry):
        light, passes, _ = carry
        new_light = run_pass(light)
        diff = lightpack.difference_priority(light, new_light).max()
        if overrelax != 1.0:
            # Extrapolate in decoded space while far from convergence;
            # near convergence (small plain-pass diff) emit the plain
            # pass output so the stop criterion stays reference-true.
            cur = lightpack.decode_rgb(light)
            new = lightpack.decode_rgb(new_light)
            extrap = jnp.maximum(new + (overrelax - 1.0) * (new - cur), 0.0)
            packed = lightpack.encode_scalar(extrap)
            status = new_light[..., 3:4]
            keep_plain = (diff <= 4) | (status != lightpack.STATUS_VISIBLE)
            rgb = jnp.where(keep_plain, new_light[..., :3], packed)
            new_light = jnp.concatenate([rgb, status], axis=-1)
        return new_light, passes + 1, diff

    def cond(carry):
        _, passes, diff = carry
        return (passes < max_passes) & ((passes == 0) | (diff > 1))

    light, passes, _ = jax.lax.while_loop(
        cond, body, (state.light, jnp.int32(0), jnp.int32(2**30))
    )
    return light, passes
