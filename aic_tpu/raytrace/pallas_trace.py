"""Pallas region-synchronous ray traversal kernel + orchestration.

The escape hatch from the XLA formulation's measured ~3-7 Mrays/s
ceiling (PERF.md "Ceiling analysis"): XLA traversal pays one gather-unit
row fetch (~10 ns/row, serialized per DDA iteration) for every brick a
ray crosses, and materializes every brick extract through memory. This
kernel keeps traversal state in vector registers and replaces the
per-ray gather with VMEM-resident occupancy bitmasks addressed through
the ONE dynamic-indexing primitive Mosaic supports: ``take_along_axis``
within a 128-lane row (PERF.md gather microbenchmarks).

Design (reproducing the traversal semantics of the reference's
all-is-cubes-render/src/raytracer/sr.rs:135 `trace_ray` and
all-is-cubes/src/raycast.rs:458 `recursive_raycast`):

- The space is split into 16³-cube REGIONS. A region's occupancy is
  4096 bits = 128 u32 = exactly one VMEM row; a ray tests "is the cube
  I just entered visible" with one take_along_axis + bit test — pure
  VPU work, zero gathers.
- Each voxel-block palette entry is one more 128-word domain row (R³
  bits at native resolution, R ≤ 16), so inner (recursive) traversal
  runs in the same kernel loop.
- A resident LEVEL-1 row (bit per region, ≤ 4096 regions) lets rays in
  EMPTY regions macro-step one whole region per iteration with no data
  load at all — the bitmask analog of the XLA path's chebyshev skip
  field.
- Rays run in groups of 8×128 = 1024. Rays in occupied regions step
  REGION-SYNCHRONOUSLY: each iteration picks the minimum occupied
  domain id among walking rays (a vector reduction), loads that ONE row
  by scalar dynamic slice, and advances every ray currently in that
  domain up to `substeps` cubes. Primary-ray coherence keeps distinct
  domains per group small; incoherent rays degrade to one domain per
  iteration but remain correct.
- The kernel only FINDS surfaces (cube, face, entry/exit t). Palette
  resolution, voxel-block entry setup, shading and transparency phases
  stay in XLA (`trace_rays_pallas`), which alternates with the kernel:
  an outer hit on a voxel-block cube → XLA computes the inner domain
  id + entry registers → the next kernel invocation traverses that
  voxel grid. Alternations are bounded by surface-event depth, not
  path length.

Validated in interpret mode against the XLA tracer
(tests/test_pallas_trace.py); compiled performance needs the real chip
(the Mosaic constraints in PERF.md were measured on TPU v5e).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..space.state import SpaceState
from .accel import BRICK, RES_SHIFT, VISIBLE_BIT, VOXEL_BIT, brick_dims
from .options import GraphicsOptions
from .tracer import (
    HIT_ATOM,
    HIT_NONE as TR_HIT_NONE,
    HIT_VOXEL,
    _sky_sample,
    make_phase_shader,
    ray_entry_setup,
)

REGION = 16
REGION_BITS = REGION**3  # 4096 bits = 128 u32 words
MAX_REGIONS = 4096  # L1 capacity: one 128-word row of region bits

_INF = np.float32(np.inf)
_BIG = np.int32(2**30)

GROUP = (8, 128)  # rays per kernel program
N_GROUP = GROUP[0] * GROUP[1]

HIT_NONE = 0
HIT_OUTER = 1  # entered a visible outer cube (atom OR voxel block)
HIT_INNER = 2  # entered a visible voxel within a block grid
INNER_EXIT = 3  # left a voxel grid without a hit (resume outer)


class BitmaskCtx(NamedTuple):
    rows: jax.Array  # u32[n_domains, 128]
    l1: jax.Array  # u32[1, 128] region-occupancy bits
    rdims: tuple
    size: tuple
    n_regions: int
    n_ventries: int


def _pack_bits_3d(vis: np.ndarray, edge: int) -> np.ndarray:
    """bool[≤edge]³ → u32[128], bit index (x*edge + y)*edge + z."""
    p = np.zeros((edge, edge, edge), bool)
    p[: vis.shape[0], : vis.shape[1], : vis.shape[2]] = vis
    flat = p.reshape(-1)
    words = np.zeros(128, np.uint32)
    idx = np.nonzero(flat)[0]
    np.bitwise_or.at(words, idx >> 5, np.uint32(1) << (idx & 31).astype(np.uint32))
    return words


def build_bitmask_ctx(state: SpaceState) -> BitmaskCtx:
    """Build the kernel's occupancy domains from a snapshot (host side,
    once per snapshot — the bitmask analog of accel.build_trace_cells)."""
    t = state.tables
    contents = np.asarray(state.contents)
    visible = np.asarray(t.visible)[contents]
    sx, sy, sz = contents.shape
    rd = (-(-sx // REGION), -(-sy // REGION), -(-sz // REGION))
    n_regions = rd[0] * rd[1] * rd[2]
    if n_regions > MAX_REGIONS:
        raise ValueError(
            f"{n_regions} regions > {MAX_REGIONS}: window the state or "
            "use the XLA tracer"
        )
    max_r = t.padded_voxel_resolution
    if max_r > REGION:
        raise ValueError(f"voxel resolution {max_r} > {REGION} unsupported")

    rows = np.empty((n_regions, 128), np.uint32)
    l1_bits = np.zeros(n_regions, bool)
    for rx in range(rd[0]):
        for ry in range(rd[1]):
            for rz in range(rd[2]):
                sub = visible[
                    rx * REGION : (rx + 1) * REGION,
                    ry * REGION : (ry + 1) * REGION,
                    rz * REGION : (rz + 1) * REGION,
                ]
                rid = (rx * rd[1] + ry) * rd[2] + rz
                rows[rid] = _pack_bits_3d(sub, REGION)
                l1_bits[rid] = sub.any()

    # Inner domains: per voxel-table entry, R³ bits at the entry's
    # NATIVE resolution (the kernel's bit index uses edge = 2^resl). A
    # voxel is visible if it has alpha or emission — the same predicate
    # the packed voxel cells use (space/space.py vvis).
    vr = np.asarray(t.vox_rows)
    vis_v = (vr[..., 3] > 0.0) | (vr[..., 4:7] != 0.0).any(-1)
    n_ventries = vis_v.shape[0]
    voxel_index = np.asarray(t.voxel_index)
    res_log2 = np.asarray(t.res_log2)
    ventry_res = np.zeros(n_ventries, np.int32)
    live = voxel_index >= 0
    ventry_res[voxel_index[live]] = 1 << res_log2[live]
    vrows = np.zeros((n_ventries, 128), np.uint32)
    for v in range(n_ventries):
        r = int(ventry_res[v]) or 1
        vrows[v] = _pack_bits_3d(vis_v[v][:r, :r, :r], r)

    l1_words = np.zeros(128, np.uint32)
    idx = np.nonzero(l1_bits)[0]
    np.bitwise_or.at(l1_words, idx >> 5, np.uint32(1) << (idx & 31).astype(np.uint32))
    return BitmaskCtx(
        rows=jnp.asarray(np.concatenate([rows, vrows], axis=0)),
        l1=jnp.asarray(l1_words[None, :]),
        rdims=rd,
        size=(sx, sy, sz),
        n_regions=n_regions,
        n_ventries=n_ventries,
    )


#: Small FIFO cache: snapshot identity → BitmaskCtx (one build per snapshot).
_CTX_CACHE: dict = {}


def get_bitmask_ctx(state: SpaceState) -> BitmaskCtx:
    key = id(state.cells)
    ctx = _CTX_CACHE.get(key)
    if ctx is None:
        ctx = build_bitmask_ctx(state)
        if len(_CTX_CACHE) >= 8:
            _CTX_CACHE.pop(next(iter(_CTX_CACHE)))
        _CTX_CACHE[key] = ctx
    return ctx


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _argmin3(tx, ty, tz):
    """DDA axis choice, reference tie-break: prefer Z, then Y, then X
    on equal t (raycast.rs:584)."""
    return jnp.where(tx < ty, jnp.where(tx < tz, 0, 2), jnp.where(ty < tz, 1, 2))


def _make_kernel(
    rdims, size, n_regions, n_domains, max_iters, substeps, domains_per_iter=1,
    macro_steps=1,
):
    rdy, rdz = rdims[1], rdims[2]
    sx, sy, sz = size

    def region_id(cx, cy, cz):
        return ((cx >> 4) * rdy + (cy >> 4)) * rdz + (cz >> 4)

    def kernel(
        ox_ref, oy_ref, oz_ref,
        dxr, dyr, dzr,
        ivxr, ivyr, ivzr,
        stxr, styr, stzr,
        dom_ref, cx_ref, cy_ref, cz_ref,
        tmx_ref, tmy_ref, tmz_ref,
        resl_ref, walking_ref,
        l1_ref, rows_ref,
        o_dom, o_cx, o_cy, o_cz, o_tmx, o_tmy, o_tmz,
        o_walk, o_hit, o_face, o_t, o_nt, o_hx, o_hy, o_hz,
    ):
        from jax.experimental import pallas as pl

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dxr[:], dyr[:], dzr[:]
        ivx, ivy, ivz = ivxr[:], ivyr[:], ivzr[:]
        stx, sty, stz = stxr[:], styr[:], stzr[:]
        spx = (stx > 0).astype(jnp.int32)
        spy = (sty > 0).astype(jnp.int32)
        spz = (stz > 0).astype(jnp.int32)
        resl = resl_ref[:]
        l1row = jnp.broadcast_to(l1_ref[0:1, :], GROUP)

        def body(carry):
            # `walking` rides the loop carry as i32: Mosaic fails to
            # legalize scf.yield with vector<8x128xi1> operands (measured
            # on v5e: "failed to legalize operation 'scf.yield'").
            (it, dom, cx, cy, cz, tmx, tmy, tmz, walking_i,
             hit, face, ht, hnt, hx, hy, hz) = carry
            walking = walking_i == 1

            def macro_once(dom, cx, cy, cz, tmx, tmy, tmz, walking):
                inner = dom >= n_regions
                # ---- L1 macro step through empty regions (outer rays) --
                dom_c = jnp.clip(dom, 0, MAX_REGIONS - 1)
                l1w = jnp.take_along_axis(l1row, dom_c >> 5, axis=-1)
                l1bit = (l1w >> (dom_c & 31).astype(jnp.uint32)) & jnp.uint32(1)
                inb = (
                    (cx >= 0) & (cx < sx) & (cy >= 0) & (cy < sy)
                    & (cz >= 0) & (cz < sz)
                )
                in_empty = walking & ~inner & (l1bit == 0) & inb

                rbx = ((cx >> 4) + spx) << 4
                rby = ((cy >> 4) + spy) << 4
                rbz = ((cz >> 4) + spz) << 4
                rtx = jnp.where(stx == 0, _INF, (rbx.astype(jnp.float32) - ox) * ivx)
                rty = jnp.where(sty == 0, _INF, (rby.astype(jnp.float32) - oy) * ivy)
                rtz = jnp.where(stz == 0, _INF, (rbz.astype(jnp.float32) - oz) * ivz)
                rax = _argmin3(rtx, rty, rtz)
                rt = jnp.minimum(rtx, jnp.minimum(rty, rtz))
                fx = jnp.floor(ox + dx * rt).astype(jnp.int32)
                fy = jnp.floor(oy + dy * rt).astype(jnp.int32)
                fz = jnp.floor(oz + dz * rt).astype(jnp.int32)
                # transverse axes stay within the current region
                fx = jnp.clip(fx, (cx >> 4) << 4, ((cx >> 4) << 4) + 15)
                fy = jnp.clip(fy, (cy >> 4) << 4, ((cy >> 4) << 4) + 15)
                fz = jnp.clip(fz, (cz >> 4) << 4, ((cz >> 4) << 4) + 15)
                bx = jnp.where(stx > 0, rbx, rbx - 1)
                by = jnp.where(sty > 0, rby, rby - 1)
                bz = jnp.where(stz > 0, rbz, rbz - 1)
                ecx = jnp.where(rax == 0, bx, fx)
                ecy = jnp.where(rax == 1, by, fy)
                ecz = jnp.where(rax == 2, bz, fz)
                exits = (
                    (ecx < 0) | (ecx >= sx) | (ecy < 0) | (ecy >= sy)
                    | (ecz < 0) | (ecz >= sz)
                )
                adv = in_empty & ~exits
                cx = jnp.where(adv, ecx, cx)
                cy = jnp.where(adv, ecy, cy)
                cz = jnp.where(adv, ecz, cz)
                ntx = jnp.where(stx == 0, _INF, ((cx + spx).astype(jnp.float32) - ox) * ivx)
                nty = jnp.where(sty == 0, _INF, ((cy + spy).astype(jnp.float32) - oy) * ivy)
                ntz = jnp.where(stz == 0, _INF, ((cz + spz).astype(jnp.float32) - oz) * ivz)
                tmx = jnp.where(adv, ntx, tmx)
                tmy = jnp.where(adv, nty, tmy)
                tmz = jnp.where(adv, ntz, tmz)
                dom = jnp.where(adv, region_id(cx, cy, cz), dom)
                walking = walking & ~(in_empty & exits)
                return dom, cx, cy, cz, tmx, tmy, tmz, walking, in_empty

            # Repeating the macro step lets sky/approach rays cross
            # `macro_steps` empty regions per loop iteration (pure VPU
            # work on the resident L1 row — no row loads).
            for _ in range(macro_steps):
                (dom, cx, cy, cz, tmx, tmy, tmz, walking, in_empty) = macro_once(
                    dom, cx, cy, cz, tmx, tmy, tmz, walking
                )

            # ---- min-domain synchronous fine stepping ------------------
            # `domains_per_iter` distinct domains advance per iteration:
            # one scalar row load each, rays select their word by domain
            # match (divergent groups serialize 1/K as often).
            cand = walking & ~in_empty
            dmins = []
            rows_loaded = []
            remaining = cand
            for _k in range(domains_per_iter):
                dk = jnp.min(jnp.where(remaining, dom, _BIG))
                safe_dk = jnp.maximum(jnp.minimum(dk, n_domains - 1), 0)
                rk = rows_ref[pl.dslice(safe_dk, 1), :]
                dmins.append(dk)
                rows_loaded.append(jnp.broadcast_to(rk, GROUP))
                remaining = remaining & (dom != dk)
            dmin = dmins[0]
            row = rows_loaded[0]

            def fine_step(st):
                (dom, cx, cy, cz, tmx, tmy, tmz, walking,
                 hit, face, ht, hnt, hx, hy, hz) = st
                inner = dom >= n_regions
                matches = dom == dmin
                for dk in dmins[1:]:
                    matches = matches | (dom == dk)
                act = walking & matches & ~in_empty
                redge = jnp.where(inner, jnp.int32(1) << resl, REGION)
                scale = jnp.where(
                    inner, (jnp.int32(1) << resl).astype(jnp.float32), 1.0
                )

                ax = _argmin3(tmx, tmy, tmz)
                t_hit = jnp.minimum(tmx, jnp.minimum(tmy, tmz))
                stax = jnp.where(ax == 0, stx, jnp.where(ax == 1, sty, stz))
                f = jnp.where(stax > 0, ax, ax + 3)
                ncx = cx + jnp.where(ax == 0, stx, 0)
                ncy = cy + jnp.where(ax == 1, sty, 0)
                ncz = cz + jnp.where(ax == 2, stz, 0)
                utx = tmx + jnp.where(ax == 0, jnp.abs(ivx) / scale, 0.0)
                uty = tmy + jnp.where(ax == 1, jnp.abs(ivy) / scale, 0.0)
                utz = tmz + jnp.where(ax == 2, jnp.abs(ivz) / scale, 0.0)

                out_exit = ~inner & (
                    (ncx < 0) | (ncx >= sx) | (ncy < 0) | (ncy >= sy)
                    | (ncz < 0) | (ncz >= sz)
                )
                region_change = ~inner & ~out_exit & (
                    region_id(ncx, ncy, ncz) != dom
                )
                in_exit = inner & (
                    (ncx < 0) | (ncx >= redge) | (ncy < 0) | (ncy >= redge)
                    | (ncz < 0) | (ncz >= redge)
                )

                lx = jnp.clip(jnp.where(inner, ncx, ncx & 15), 0, 15)
                ly = jnp.clip(jnp.where(inner, ncy, ncy & 15), 0, 15)
                lz = jnp.clip(jnp.where(inner, ncz, ncz & 15), 0, 15)
                edge_l2 = jnp.where(inner, resl, 4)
                local = (((lx << edge_l2) + ly) << edge_l2) + lz
                widx = jnp.clip(local >> 5, 0, 127)
                word = jnp.take_along_axis(row, widx, axis=-1)
                for dk, rk in zip(dmins[1:], rows_loaded[1:]):
                    word = jnp.where(
                        dom == dk, jnp.take_along_axis(rk, widx, axis=-1), word
                    )
                bit = (word >> (local & 31).astype(jnp.uint32)) & jnp.uint32(1)
                hit_now = (
                    act & ~out_exit & ~in_exit & ~region_change & (bit == 1)
                )

                # Region change: switch domain WITHOUT stepping — the
                # next iteration (row of the new domain loaded) repeats
                # this step and performs the bit test there.
                commit = act & ~region_change
                dom = jnp.where(
                    act & region_change, region_id(ncx, ncy, ncz), dom
                )
                cx2 = jnp.where(commit, ncx, cx)
                cy2 = jnp.where(commit, ncy, cy)
                cz2 = jnp.where(commit, ncz, cz)
                tmx2 = jnp.where(commit, utx, tmx)
                tmy2 = jnp.where(commit, uty, tmy)
                tmz2 = jnp.where(commit, utz, tmz)

                nt = jnp.minimum(utx, jnp.minimum(uty, utz))
                hitk = jnp.where(
                    hit_now, jnp.where(inner, HIT_INNER, HIT_OUTER),
                    jnp.where(act & in_exit, INNER_EXIT, 0),
                )
                record = hitk != 0
                hit = jnp.where(record, hitk, hit)
                face = jnp.where(hit_now, f, face)
                ht = jnp.where(hit_now, t_hit, ht)
                hnt = jnp.where(hit_now, nt, hnt)
                hx = jnp.where(hit_now, ncx, hx)
                hy = jnp.where(hit_now, ncy, hy)
                hz = jnp.where(hit_now, ncz, hz)
                walking = walking & ~record & ~(act & out_exit)
                return (dom, cx2, cy2, cz2, tmx2, tmy2, tmz2, walking,
                        hit, face, ht, hnt, hx, hy, hz)

            st = (dom, cx, cy, cz, tmx, tmy, tmz, walking,
                  hit, face, ht, hnt, hx, hy, hz)
            for _ in range(substeps):
                st = fine_step(st)
            (dom, cx, cy, cz, tmx, tmy, tmz, walking,
             hit, face, ht, hnt, hx, hy, hz) = st
            return (it + 1, dom, cx, cy, cz, tmx, tmy, tmz,
                    walking.astype(jnp.int32),
                    hit, face, ht, hnt, hx, hy, hz)

        def cond(carry):
            return (carry[0] < max_iters) & (carry[8] == 1).any()

        zi = jnp.zeros(GROUP, jnp.int32)
        zf = jnp.zeros(GROUP, jnp.float32)
        init = (
            jnp.int32(0),
            dom_ref[:], cx_ref[:], cy_ref[:], cz_ref[:],
            tmx_ref[:], tmy_ref[:], tmz_ref[:],
            walking_ref[:],
            zi, zi, zf, zf, zi, zi, zi,
        )
        (_, dom, cx, cy, cz, tmx, tmy, tmz, walking_i,
         hit, face, ht, hnt, hx, hy, hz) = jax.lax.while_loop(cond, body, init)
        walking = walking_i == 1
        o_dom[:] = dom
        o_cx[:] = cx
        o_cy[:] = cy
        o_cz[:] = cz
        o_tmx[:] = tmx
        o_tmy[:] = tmy
        o_tmz[:] = tmz
        o_walk[:] = walking.astype(jnp.int32)
        o_hit[:] = hit
        o_face[:] = face
        o_t[:] = ht
        o_nt[:] = hnt
        o_hx[:] = hx
        o_hy[:] = hy
        o_hz[:] = hz

    return kernel


#: Kernel input field order: 12 per-ray constants then 9 state fields.
_RAY_FIELDS = ("ox", "oy", "oz", "dx", "dy", "dz", "ivx", "ivy", "ivz",
               "stx", "sty", "stz")
_STATE_FIELDS = ("dom", "cx", "cy", "cz", "tmx", "tmy", "tmz", "resl",
                 "walking")
_OUT_FIELDS = ("dom", "cx", "cy", "cz", "tmx", "tmy", "tmz",
               "walking", "hit", "face", "t", "nt", "hx", "hy", "hz")


def _run_kernel(
    rays, state_in, l1, rows, rdims, size, n_regions, max_iters, substeps,
    interpret, domains=1, macro=1,
):
    """rays/state_in: dicts of flat per-ray arrays [m] (m % 1024 == 0).
    Returns dict of _OUT_FIELDS, each [m]."""
    from jax.experimental import pallas as pl

    m = rays["ox"].shape[0]
    g = m // N_GROUP
    n_domains = rows.shape[0]
    kern = _make_kernel(
        rdims, size, n_regions, n_domains, max_iters, substeps,
        domains_per_iter=domains, macro_steps=macro,
    )

    def shape2(a):
        return a.reshape(g * GROUP[0], GROUP[1])

    in_arrays = [shape2(rays[k]) for k in _RAY_FIELDS]
    in_arrays += [shape2(state_in[k]) for k in _STATE_FIELDS]
    in_arrays += [l1, rows]

    blk = pl.BlockSpec(GROUP, lambda i: (i, 0))
    in_specs = [blk] * (len(_RAY_FIELDS) + len(_STATE_FIELDS)) + [
        pl.BlockSpec(l1.shape, lambda i: (0, 0)),
        pl.BlockSpec(rows.shape, lambda i: (0, 0)),
    ]

    def sds(dt):
        return jax.ShapeDtypeStruct((g * GROUP[0], GROUP[1]), dt)

    out_dtypes = {
        "dom": jnp.int32, "cx": jnp.int32, "cy": jnp.int32, "cz": jnp.int32,
        "tmx": jnp.float32, "tmy": jnp.float32, "tmz": jnp.float32,
        "walking": jnp.int32, "hit": jnp.int32, "face": jnp.int32,
        "t": jnp.float32, "nt": jnp.float32,
        "hx": jnp.int32, "hy": jnp.int32, "hz": jnp.int32,
    }
    outs = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=in_specs,
        out_specs=[blk] * len(_OUT_FIELDS),
        out_shape=[sds(out_dtypes[k]) for k in _OUT_FIELDS],
        interpret=interpret,
    )(*in_arrays)
    return {k: v.reshape(m) for k, v in zip(_OUT_FIELDS, outs)}


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "rdims", "n_regions", "options", "include_sky", "phases",
        "kernel_iters", "substeps", "max_rounds", "interpret",
        "domains", "macro",
    ),
)
def _trace_pallas_impl(
    state: SpaceState, o, d, l1, rows, *, rdims, n_regions, options,
    include_sky, phases, kernel_iters, substeps, max_rounds, interpret,
    domains=1, macro=1,
):
    size = state.contents.shape
    size_i = jnp.asarray(size, jnp.int32)
    size_f = jnp.asarray(size, jnp.float32)
    m = o.shape[0]
    tables = state.tables
    max_r = tables.padded_voxel_resolution
    vox_r3 = max_r * max_r * max_r
    rdy, rdz = rdims[1], rdims[2]
    sbd = brick_dims(size)
    iota64 = jnp.arange(BRICK**3, dtype=jnp.int32)

    entry = ray_entry_setup(o, d, size_i, size_f)
    d_len = entry["d_len"]
    inv_d, step, step_pos = entry["inv_d"], entry["step"], entry["step_pos"]
    t_to_view = (d_len / jnp.float32(options.view_distance)).astype(jnp.float32)
    sky_rgb = _sky_sample(state, d)
    shade_fn = make_phase_shader(state, options, o, d, d_len, t_to_view, sky_rgb)

    cube0 = entry["cube0"]
    cc = jnp.clip(cube0, 0, size_i - 1)
    dom0 = ((cc[:, 0] >> 4) * rdy + (cc[:, 1] >> 4)) * rdz + (cc[:, 2] >> 4)

    rays = dict(
        ox=o[:, 0], oy=o[:, 1], oz=o[:, 2],
        dx=d[:, 0], dy=d[:, 1], dz=d[:, 2],
        ivx=inv_d[:, 0], ivy=inv_d[:, 1], ivz=inv_d[:, 2],
        stx=step[:, 0], sty=step[:, 1], stz=step[:, 2],
    )
    tmax0 = entry["tmax0"]
    st = dict(
        dom=dom0,
        cx=cube0[:, 0], cy=cube0[:, 1], cz=cube0[:, 2],
        tmx=tmax0[:, 0], tmy=tmax0[:, 1], tmz=tmax0[:, 2],
        resl=jnp.zeros(m, jnp.int32),
        walking=entry["hits_box"].astype(jnp.int32),
    )
    saved = dict(
        sdom=jnp.zeros(m, jnp.int32),
        scx=jnp.zeros(m, jnp.int32), scy=jnp.zeros(m, jnp.int32),
        scz=jnp.zeros(m, jnp.int32),
        stmx=jnp.zeros(m, jnp.float32), stmy=jnp.zeros(m, jnp.float32),
        stmz=jnp.zeros(m, jnp.float32),
        sbx=jnp.zeros(m, jnp.int32), sby=jnp.zeros(m, jnp.int32),
        sbz=jnp.zeros(m, jnp.int32),
    )
    hb = dict(
        hit_kind=jnp.zeros(m, jnp.int32),
        hit_idx=jnp.zeros(m, jnp.int32),
        hit_vflat=jnp.zeros(m, jnp.int32),
        hit_face=jnp.zeros(m, jnp.int32),
        hit_t=jnp.zeros(m, jnp.float32),
        hit_next_t=jnp.zeros(m, jnp.float32),
        hit_cube=jnp.zeros((m, 3), jnp.int32),
    )

    def fetch_cell(x, y, z):
        """Packed outer cell at (x,y,z) via the brick rows (one row gather
        per ROUND — classification, not traversal)."""
        xc = jnp.clip(x, 0, size[0] - 1)
        yc = jnp.clip(y, 0, size[1] - 1)
        zc = jnp.clip(z, 0, size[2] - 1)
        key = ((xc >> 2) * sbd[1] + (yc >> 2)) * sbd[2] + (zc >> 2)
        row = jnp.take(state.cells, key, axis=0)
        local = ((xc & 3) << 4) | ((yc & 3) << 2) | (zc & 3)
        return (row * (iota64 == local[:, None])).sum(-1)

    def round_body(carry):
        st, saved, hb, fuel = carry
        out = _run_kernel(
            rays, st, l1, rows, rdims, size, n_regions, kernel_iters,
            substeps, interpret, domains, macro,
        )
        hit = out["hit"]
        cell = fetch_cell(out["hx"], out["hy"], out["hz"])
        is_vox = (cell & VOXEL_BIT) != 0
        payload = cell & 0xFFFF
        res_log2 = (cell >> RES_SHIFT) & 7

        outer = hit == HIT_OUTER
        atom = outer & ~is_vox
        vox = outer & is_vox
        innerh = hit == HIT_INNER
        iexit = hit == INNER_EXIT
        final = atom | innerh

        # ---- record final hits (trace_rays-compatible buffer) -----------
        ventry = out["dom"] - n_regions
        vflat = (
            ventry * vox_r3
            + (out["hx"] * max_r + out["hy"]) * max_r + out["hz"]
        )
        block_cube = jnp.stack([saved["sbx"], saved["sby"], saved["sbz"]], -1)
        hit_cube = jnp.stack([out["hx"], out["hy"], out["hz"]], -1)
        hb = dict(
            hit_kind=jnp.where(
                atom, HIT_ATOM, jnp.where(innerh, HIT_VOXEL, hb["hit_kind"])
            ),
            hit_idx=jnp.where(atom, payload, hb["hit_idx"]),
            hit_vflat=jnp.where(innerh, vflat, hb["hit_vflat"]),
            hit_face=jnp.where(final, out["face"], hb["hit_face"]),
            hit_t=jnp.where(final, out["t"], hb["hit_t"]),
            hit_next_t=jnp.where(final, out["nt"], hb["hit_next_t"]),
            hit_cube=jnp.where(
                final[:, None],
                jnp.where(innerh[:, None], block_cube, hit_cube),
                hb["hit_cube"],
            ),
        )

        # ---- voxel-block entry registers (recursive_raycast semantics:
        # enter one virtual voxel early along the entry axis) -------------
        t = out["t"]
        axis = out["face"] % 3
        ohx = (axis == 0).astype(jnp.int32)
        ohy = (axis == 1).astype(jnp.int32)
        ohz = (axis == 2).astype(jnp.int32)
        blk_res = jnp.int32(1) << res_log2
        rf = blk_res.astype(jnp.float32)
        iox = (rays["ox"] - out["hx"].astype(jnp.float32)) * rf
        ioy = (rays["oy"] - out["hy"].astype(jnp.float32)) * rf
        ioz = (rays["oz"] - out["hz"].astype(jnp.float32)) * rf
        nud = 1e-4 / d_len
        epx = iox + rays["dx"] * rf * t + rays["dx"] * nud
        epy = ioy + rays["dy"] * rf * t + rays["dy"] * nud
        epz = ioz + rays["dz"] * rf * t + rays["dz"] * nud
        icx = jnp.clip(jnp.floor(epx).astype(jnp.int32), 0, blk_res - 1)
        icy = jnp.clip(jnp.floor(epy).astype(jnp.int32), 0, blk_res - 1)
        icz = jnp.clip(jnp.floor(epz).astype(jnp.int32), 0, blk_res - 1)
        stx, sty, stz = rays["stx"], rays["sty"], rays["stz"]
        itmx = ((icx + (stx > 0)).astype(jnp.float32) - iox) * rays["ivx"] / rf
        itmy = ((icy + (sty > 0)).astype(jnp.float32) - ioy) * rays["ivy"] / rf
        itmz = ((icz + (stz > 0)).astype(jnp.float32) - ioz) * rays["ivz"] / rf
        itmx = jnp.where(stx == 0, _INF, itmx)
        itmy = jnp.where(sty == 0, _INF, itmy)
        itmz = jnp.where(stz == 0, _INF, itmz)
        icx_pre = icx - ohx * stx
        icy_pre = icy - ohy * sty
        icz_pre = icz - ohz * stz
        itmx_pre = jnp.where(ohx == 1, t, itmx)
        itmy_pre = jnp.where(ohy == 1, t, itmy)
        itmz_pre = jnp.where(ohz == 1, t, itmz)

        # ---- state transitions -------------------------------------------
        def sel3(on_vox, on_exit, dflt):
            return jnp.where(vox, on_vox, jnp.where(iexit, on_exit, dflt))

        st2 = dict(
            dom=sel3(n_regions + payload, saved["sdom"], out["dom"]),
            cx=sel3(icx_pre, saved["scx"], out["cx"]),
            cy=sel3(icy_pre, saved["scy"], out["cy"]),
            cz=sel3(icz_pre, saved["scz"], out["cz"]),
            tmx=sel3(itmx_pre, saved["stmx"], out["tmx"]),
            tmy=sel3(itmy_pre, saved["stmy"], out["tmy"]),
            tmz=sel3(itmz_pre, saved["stmz"], out["tmz"]),
            resl=sel3(res_log2, jnp.zeros(m, jnp.int32), st["resl"]),
            walking=(vox | iexit | (out["walking"] == 1)).astype(jnp.int32),
        )
        saved2 = dict(
            sdom=jnp.where(vox, out["dom"], saved["sdom"]),
            scx=jnp.where(vox, out["cx"], saved["scx"]),
            scy=jnp.where(vox, out["cy"], saved["scy"]),
            scz=jnp.where(vox, out["cz"], saved["scz"]),
            stmx=jnp.where(vox, out["tmx"], saved["stmx"]),
            stmy=jnp.where(vox, out["tmy"], saved["stmy"]),
            stmz=jnp.where(vox, out["tmz"], saved["stmz"]),
            sbx=jnp.where(vox, out["hx"], saved["sbx"]),
            sby=jnp.where(vox, out["hy"], saved["sby"]),
            sbz=jnp.where(vox, out["hz"], saved["sbz"]),
        )
        return st2, saved2, hb, fuel - 1

    def round_cond(carry):
        st, _, _, fuel = carry
        return (fuel > 0) & (st["walking"] == 1).any()

    light_acc = jnp.zeros((m, 3), jnp.float32)
    trans_acc = jnp.ones(m, jnp.float32)
    unfinished = jnp.asarray(False)

    for _phase in range(phases):
        st, saved, hb, _fuel = jax.lax.while_loop(
            round_cond, round_body, (st, saved, hb, jnp.int32(max_rounds))
        )
        unfinished = unfinished | (st["walking"] == 1).any()
        has_hit = hb["hit_kind"] != TR_HIT_NONE
        light_acc, trans_acc = jax.lax.cond(
            has_hit.any(),
            lambda la, ta: shade_fn(hb, la, ta),
            lambda la, ta: (la, ta),
            light_acc, trans_acc,
        )
        resume = has_hit & (trans_acc >= 1.0 / 256.0)
        st = dict(st, walking=resume.astype(jnp.int32))
        hb = dict(hb, hit_kind=jnp.zeros(m, jnp.int32))

    if include_sky:
        light_acc = light_acc + sky_rgb * trans_acc[..., None]
        trans_acc = jnp.zeros_like(trans_acc)
    return light_acc, trans_acc, unfinished


def trace_rays_pallas(
    state: SpaceState,
    origins,
    directions,
    options: GraphicsOptions,
    include_sky: bool = True,
    phases: int = 4,
    kernel_iters: int = 48,
    substeps: int = 4,
    max_rounds: int = 48,
    interpret: bool = False,
    return_stats: bool = False,
    domains: int = 1,
    macro: int = 1,
):
    """trace_rays via the Pallas region-synchronous kernel. Same contract
    as tracer.trace_rays: (light f32[...,3] premultiplied HDR,
    transmittance f32[...]); with return_stats appends
    {"unfinished": bool} (Flaws::UNFINISHED analog).

    Raises ValueError for states the kernel can't hold (> 4096 regions or
    voxel resolution > 16) — callers fall back to the XLA tracer.
    """
    ctx = get_bitmask_ctx(state)
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3).astype(jnp.float32) - jnp.asarray(
        state.lower, jnp.float32
    )
    d = directions.reshape(-1, 3).astype(jnp.float32)
    # Tile-coherent grouping: the kernel advances one occupied domain per
    # iteration among a group's walking rays, so a group should share as
    # few domains as possible. For an image grid, a 32×32 pixel tile is
    # far more angularly compact than the raster-order 1×1024 strip —
    # rearrange so each GROUP is one tile (pure reshape/transpose; the
    # inverse is applied to the outputs below).
    tiled_hw = None
    T = int(np.sqrt(N_GROUP))
    assert T * T == N_GROUP, "GROUP must give a square pixel tile"
    if len(batch_shape) == 2 and batch_shape[0] * batch_shape[1] >= N_GROUP:
        H, W = batch_shape
        Hp, Wp = -(-H // T) * T, -(-W // T) * T
        # Thin 2D batches (e.g. 2×512) would pad per-dimension and trace
        # many times the requested rays for no coherence benefit — only
        # tile when the pad overhead stays small.
        if Hp * Wp <= 1.5 * H * W:
            tiled_hw = (H, W, Hp, Wp, T)

            def to_tiles(a):
                a = a.reshape(H, W, 3)
                a = jnp.pad(a, ((0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
                a = a.reshape(Hp // T, T, Wp // T, T, 3)
                return a.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

            o, d = to_tiles(o), to_tiles(d)
    n = o.shape[0]
    m = -(-n // N_GROUP) * N_GROUP
    if m != n:
        # Pad with rays that miss the volume (o on -X side, moving -X).
        o_pad = jnp.full((m - n, 3), -10.0, jnp.float32)
        d_pad = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32), (m - n, 1))
        o = jnp.concatenate([o, o_pad], axis=0)
        d = jnp.concatenate([d, d_pad], axis=0)

    light, trans, unfinished = _trace_pallas_impl(
        state, o, d, ctx.l1, ctx.rows,
        rdims=ctx.rdims, n_regions=ctx.n_regions, options=options,
        include_sky=include_sky, phases=phases, kernel_iters=kernel_iters,
        substeps=substeps, max_rounds=max_rounds, interpret=interpret,
        domains=domains, macro=macro,
    )
    if tiled_hw is not None:
        H, W, Hp, Wp, T = tiled_hw

        def from_tiles(a):
            a = a[:n].reshape(Hp // T, Wp // T, T, T, -1)
            a = a.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, -1)
            return a[:H, :W]

        light = from_tiles(light).reshape(batch_shape + (3,))
        trans = from_tiles(trans[:, None]).reshape(batch_shape)
    else:
        light = light[:n].reshape(batch_shape + (3,))
        trans = trans[:n].reshape(batch_shape)
    if return_stats:
        return light, trans, {"unfinished": unfinished}
    return light, trans
