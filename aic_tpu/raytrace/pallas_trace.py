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
import os
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

# Rays per kernel program. Grid programs run serially on the core, so
# per-frame cost ~= programs x iterations x per-iteration floor; larger
# groups amortize the floor over more rays (vector ops stay VREG-tiled)
# at the price of more domain divergence per group. (8,128) is one
# native VREG tile; AIC_TRACE_GROUP_ROWS overrides for probing.
GROUP = (int(os.environ.get("AIC_TRACE_GROUP_ROWS", "8")), 128)
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
    domains: int | None = None,
    macro: int = 1,
    megakernel: bool | None = None,
    group_rows: int | None = None,
):
    """trace_rays via the Pallas region-synchronous kernel. Same contract
    as tracer.trace_rays: (light f32[...,3] premultiplied HDR,
    transmittance f32[...]); with return_stats appends
    {"unfinished": bool} (Flaws::UNFINISHED analog).

    `megakernel` selects the v2 kernel (in-kernel voxel-block
    classification + entry; one launch per phase). None = auto: v2
    whenever its tables fit.

    `group_rows` sets the v2 kernel's rays-per-program tile height (x128
    lanes). None = auto: 32 rows (64x64-pixel tiles) at >=1M rays —
    grid programs run serially, so fewer/larger groups amortize the
    per-iteration loop floor (measured 105 -> 81 ms on atrium 1080p) —
    and 8 rows below that, where padding waste would dominate.

    Raises ValueError for states the kernel can't hold (> 4096 regions;
    voxel resolution > 32, v2 walks R32 grids as 8 octant rows;
    > 16 for the v1 kernel) — callers fall back to the XLA tracer.
    """
    if megakernel is None:
        megakernel = _megakernel_fits(state)
    if megakernel:
        ctx = get_bitmask_ctx2(state)
    else:
        ctx = get_bitmask_ctx(state)
    batch_shape = origins.shape[:-1]
    if megakernel and group_rows is None:
        n_req = int(np.prod(batch_shape)) if batch_shape else 1
        group_rows = 32 if n_req >= 1 << 20 else GROUP[0]
    n_group = (group_rows * 128) if megakernel else N_GROUP
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
    T = int(np.sqrt(n_group))
    if T * T != n_group:
        T = 0  # non-square group (probe override): raster-order strips
    if T and len(batch_shape) == 2 and batch_shape[0] * batch_shape[1] >= n_group:
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
    m = -(-n // n_group) * n_group
    if m != n:
        # Pad with rays that miss the volume (o on -X side, moving -X).
        o_pad = jnp.full((m - n, 3), -10.0, jnp.float32)
        d_pad = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32), (m - n, 1))
        o = jnp.concatenate([o, o_pad], axis=0)
        d = jnp.concatenate([d, d_pad], axis=0)

    if megakernel:
        # v2 defaults: one long launch per phase; 8 fine steps per
        # iteration (measured best on atrium 1080p). Relaunch fuel 32:
        # exhibit-dense scenes (demo-city) legitimately need up to ~8k
        # iterations for tiles whose rays serialize over many voxel-grid
        # domains; rounds only run while someone still walks, so frames
        # that finish early never pay for the budget.
        kit = 256 if kernel_iters == 48 else kernel_iters
        mr = 128 if max_rounds == 48 else max_rounds
        sub = 8 if substeps == 4 else substeps
        if domains is None:
            # Domain-diverse scenes (many voxel-grid rows — demo-city
            # has 648) serialize under min-domain stepping; advancing 4
            # domains per iteration measured 1544 -> 601 ms there while
            # costing ~3% on compact scenes (atrium, 36+ rows).
            domains = 4 if ctx.rows.shape[0] > 256 else 1
        light, trans, unfinished = _trace_pallas_impl2(
            state, o, d, ctx.l1, ctx.rows, ctx.page_idx, ctx.pages,
            rdims=ctx.rdims, n_regions=ctx.n_regions, options=options,
            include_sky=include_sky, phases=phases, kernel_iters=kit,
            substeps=sub, max_rounds=mr, interpret=interpret,
            domains=domains, macro=macro, has_vox=ctx.pages is not None,
            group_rows=group_rows, has_r32=ctx.has_r32,
            wide_pages=ctx.wide_pages,
        )
    else:
        light, trans, unfinished = _trace_pallas_impl(
            state, o, d, ctx.l1, ctx.rows,
            rdims=ctx.rdims, n_regions=ctx.n_regions, options=options,
            include_sky=include_sky, phases=phases, kernel_iters=kernel_iters,
            substeps=substeps, max_rounds=max_rounds, interpret=interpret,
            domains=domains or 1, macro=macro,
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


# ---------------------------------------------------------------------------
# Megakernel (v2): in-kernel voxel-block classification + entry
# ---------------------------------------------------------------------------
#
# The v1 kernel only FINDS surfaces; every voxel-block (Recur) surface
# event bounces through XLA (classify via packed cells, compute inner
# entry registers, relaunch). On atrium — whose architecture is R16
# blocks — that alternation dominates frame time. The megakernel keeps
# the whole surface cascade on the VPU:
#
# - A second bit row per region marks VOXEL-BLOCK cubes (`vox`), built
#   from the same predicate as the packed cells' VOXEL_BIT
#   (accel.py pack_cells).
# - Per region with >= 1 voxel-block cube, a 16-row VMEM "ventry page"
#   stores, per cube, u16 = ventry | res_log2 << 12 (2 per u32 word);
#   a scalar i32 table maps region -> page (-1 when the region has no
#   voxel blocks). Scalar VMEM reads by traced index are free on this
#   chip (light/pallas_relight.py tbl_ref pattern).
# - Ray modes replace the walking flag: 0 done, 1 walking, 2 awaiting
#   classification (outer surface recorded), 3 restoring (left a voxel
#   grid). Classification runs ONCE per outer loop iteration,
#   min-domain-synchronously like fine stepping: resolve atom -> final
#   hit, voxel block -> save outer DDA registers in the carry and enter
#   the inner domain (the recursive_raycast push, raycast.rs:458);
#   restore pops them (the pop).
#
# The XLA orchestration around it shrinks to: one kernel launch per
# phase (plus fuel-exhaustion relaunches), one packed-cell gather to
# resolve ATOM palette ids for final hits, then shading — no per-surface
# relaunch, no per-round classification glue.

MODE_DONE = 0
MODE_WALK = 1
MODE_CLASSIFY = 2
MODE_RESTORE = 3


class BitmaskCtx2(NamedTuple):
    rows: jax.Array  # u32[n_domains, 128] visibility bits (regions + vrows)
    l1: jax.Array  # u32[1, 128]
    page_idx: jax.Array | None  # i32[n_regions_pad, 8] region -> page or -1
    pages: jax.Array | None  # u32 classify codes (wide: 32 rows/page of
    #   u32 codes; narrow: 16 rows/page of u16 pairs)
    rdims: tuple
    size: tuple
    n_regions: int
    n_ventries: int
    has_r32: bool
    wide_pages: bool = False


#: Page geometry, WIDE format: one u32 code per cube of a region → 16³
#: words = 32 rows of 128 lanes. The narrow (u16-pair) format packs the
#: same region into 16 rows — half the classify select-ladder, used
#: whenever every code fits 16 bits (no R32, < 4096 ventries/palette).
PAGE_ROWS = 32
PAGE_ROWS_NARROW = 16


def build_bitmask_ctx2(state: SpaceState) -> BitmaskCtx2:
    """v2 context: occupancy rows + per-region classify pages.

    A page stores one u32 code per cube:
      bit 31      voxel-block flag
      bits 28-30  res_log2 (1..5 → R2..R32)
      bits 14-27  ventry (index into the voxel shading tables)
      bits 0-13   ventry ROW base (index into `rows`; R32 entries own 8
                  consecutive rows, one 16³ bit-plane per octant)
    Atoms carry their palette index (bit 31 clear) — everything the
    kernel needs to either finalize an atom hit or push into the
    block's voxel grid with no XLA round trip. R32 blocks walk at
    octant granularity: the carried domain hops between the entry's 8
    rows exactly like outer region transitions. Scenes with NO voxel
    blocks skip pages entirely (outer hits finalize in-kernel; palette
    ids resolve in one XLA gather per phase)."""
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
    if t.padded_voxel_resolution > 2 * REGION:
        raise ValueError(
            f"voxel resolution {t.padded_voxel_resolution} > "
            f"{2 * REGION} unsupported"
        )

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
    l1_words = np.zeros(128, np.uint32)
    idx = np.nonzero(l1_bits)[0]
    np.bitwise_or.at(
        l1_words, idx >> 5, np.uint32(1) << (idx & 31).astype(np.uint32)
    )

    # Ventry rows: R<=16 entries pack R³ bits at native edge in ONE row;
    # R32 entries own 8 rows (one 16³ octant each). A voxel is visible
    # if it has alpha or emission (the packed-cells predicate).
    vr = np.asarray(t.vox_rows)
    vis_v = (vr[..., 3] > 0.0) | (vr[..., 4:7] != 0.0).any(-1)
    n_ventries = vis_v.shape[0]
    voxel_index = np.asarray(t.voxel_index)
    res_log2 = np.asarray(t.res_log2)
    ventry_res = np.zeros(n_ventries, np.int32)
    live = voxel_index >= 0
    ventry_res[voxel_index[live]] = 1 << res_log2[live]
    vrow_base = np.zeros(n_ventries, np.int32)
    vrow_list = []
    has_r32 = False
    for v in range(n_ventries):
        r = int(ventry_res[v]) or 1
        vrow_base[v] = len(vrow_list)
        if r <= REGION:
            vrow_list.append(_pack_bits_3d(vis_v[v][:r, :r, :r], r))
        else:
            has_r32 = True
            for ox in range(2):
                for oy in range(2):
                    for oz in range(2):
                        sub = vis_v[v][
                            ox * 16 : ox * 16 + 16,
                            oy * 16 : oy * 16 + 16,
                            oz * 16 : oz * 16 + 16,
                        ]
                        vrow_list.append(_pack_bits_3d(sub, REGION))
    if len(vrow_list) >= 1 << 14 or n_ventries >= 1 << 14:
        raise ValueError(
            f"{len(vrow_list)} ventry rows / {n_ventries} entries exceed "
            "the 14-bit classify-code fields: use the XLA tracer"
        )
    vrows = (
        np.stack(vrow_list, axis=0)
        if vrow_list
        else np.zeros((0, 128), np.uint32)
    )
    all_rows = np.concatenate([rows, vrows], axis=0)

    ventry_cube = voxel_index[contents]  # -1 for atoms/air
    vox_cube = visible & (ventry_cube >= 0)
    if not vox_cube.any():
        return BitmaskCtx2(
            rows=jnp.asarray(all_rows), l1=jnp.asarray(l1_words[None, :]),
            page_idx=None, pages=None, rdims=rd, size=(sx, sy, sz),
            n_regions=n_regions, n_ventries=n_ventries, has_r32=False,
        )
    # Page format: narrow u16 pairs (16 rows/page, half the classify
    # select-ladder) whenever every code fits 16 bits; wide u32 codes
    # otherwise. In a no-R32 scene each ventry owns exactly one row, so
    # vrow_base[v] == v and the u16 code's single 12-bit field serves as
    # both ventry and row base.
    wide = (
        has_r32
        or n_ventries >= (1 << 12)
        or int(contents.max(initial=0)) >= 0x8000
    )
    res_cube = res_log2[contents].astype(np.int64)
    vent_safe = np.maximum(ventry_cube, 0)
    if wide:
        code = np.where(
            vox_cube,
            (1 << 31)
            | (res_cube << 28)
            | (vent_safe.astype(np.int64) << 14)
            | vrow_base[vent_safe].astype(np.int64),
            contents,
        ).astype(np.uint32)
        page_rows = PAGE_ROWS
    else:
        assert (vrow_base[: n_ventries] == np.arange(n_ventries)).all()
        code = np.where(
            vox_cube,
            0x8000 | (res_cube << 12) | vent_safe.astype(np.int64),
            contents,
        ).astype(np.uint32)
        page_rows = PAGE_ROWS_NARROW

    page_idx = np.full(n_regions, -1, np.int32)
    page_list = []
    for rx in range(rd[0]):
        for ry in range(rd[1]):
            for rz in range(rd[2]):
                rid = (rx * rd[1] + ry) * rd[2] + rz
                sl = np.s_[
                    rx * REGION : (rx + 1) * REGION,
                    ry * REGION : (ry + 1) * REGION,
                    rz * REGION : (rz + 1) * REGION,
                ]
                if not visible[sl].any():
                    continue  # never hit -> no page
                codes = np.zeros((REGION, REGION, REGION), np.uint32)
                s = code[sl]
                codes[: s.shape[0], : s.shape[1], : s.shape[2]] = s
                flat = codes.reshape(-1)
                if not wide:
                    flat = flat[0::2] | (flat[1::2] << 16)
                page_idx[rid] = len(page_list)
                page_list.append(
                    flat.reshape(page_rows, 128).astype(np.uint32)
                )
    # Pad the page count to a multiple of 8 so small occupancy changes
    # between animation frames keep the pages array shape (and thus the
    # jitted tracer program) stable.
    while len(page_list) % 8:
        page_list.append(np.zeros((page_rows, 128), np.uint32))
    pages = np.concatenate(page_list, axis=0)
    npad = -(-n_regions // 8) * 8
    pidx = np.zeros((npad, 8), np.int32)
    pidx[:n_regions, 0] = page_idx
    return BitmaskCtx2(
        rows=jnp.asarray(all_rows), l1=jnp.asarray(l1_words[None, :]),
        page_idx=jnp.asarray(pidx),
        pages=jnp.asarray(pages),
        rdims=rd, size=(sx, sy, sz),
        n_regions=n_regions, n_ventries=n_ventries, has_r32=has_r32,
        wide_pages=wide,
    )


_CTX2_CACHE: dict = {}


def get_bitmask_ctx2(state: SpaceState) -> BitmaskCtx2:
    key = id(state.cells)
    ctx = _CTX2_CACHE.get(key)
    if ctx is None:
        ctx = build_bitmask_ctx2(state)
        if len(_CTX2_CACHE) >= 8:
            _CTX2_CACHE.pop(next(iter(_CTX2_CACHE)))
        _CTX2_CACHE[key] = ctx
    return ctx


def _megakernel_fits(state: SpaceState) -> bool:
    """True when the v2 tables fit comfortably in VMEM for this state.
    Builds (and caches) the ctx; raises the same ValueErrors as v1 for
    states no pallas kernel can hold."""
    if state.tables.visible.shape[0] > 0x8000:
        return False  # atom palette id must fit the 15-bit classify code
    ctx2 = get_bitmask_ctx2(state)
    table_bytes = ctx2.rows.size * 4 + 512
    if ctx2.pages is not None:
        table_bytes += ctx2.page_idx.size * 4 + ctx2.pages.size * 4
    return table_bytes <= 10 << 20


#: v2 per-ray state threading through kernel launches (all [m]).
_STATE2_FIELDS = (
    "dom", "cx", "cy", "cz", "tmx", "tmy", "tmz",
    "tdx", "tdy", "tdz", "resl", "mode", "vbase",
    "hit", "pidx", "face", "t", "nt", "hx", "hy", "hz",
    "sdom", "scx", "scy", "scz", "stmx", "stmy", "stmz",
)
_STATE2_DTYPES = {
    "dom": jnp.int32, "cx": jnp.int32, "cy": jnp.int32, "cz": jnp.int32,
    "tmx": jnp.float32, "tmy": jnp.float32, "tmz": jnp.float32,
    "tdx": jnp.float32, "tdy": jnp.float32, "tdz": jnp.float32,
    "resl": jnp.int32, "mode": jnp.int32, "vbase": jnp.int32,
    "hit": jnp.int32, "pidx": jnp.int32, "face": jnp.int32,
    "t": jnp.float32, "nt": jnp.float32,
    "hx": jnp.int32, "hy": jnp.int32, "hz": jnp.int32,
    "sdom": jnp.int32, "scx": jnp.int32, "scy": jnp.int32, "scz": jnp.int32,
    "stmx": jnp.float32, "stmy": jnp.float32, "stmz": jnp.float32,
}


def _make_kernel2(
    rdims, size, n_regions, n_domains, max_iters, substeps, has_vox,
    macro_steps=1, domains_per_iter=1, grp=GROUP, has_r32=False,
    wide_pages=False,
):
    rdy, rdz = rdims[1], rdims[2]
    sx, sy, sz = size
    GROUP = grp  # shadows the module default for this kernel's tiles

    def region_id(cx, cy, cz):
        return ((cx >> 4) * rdy + (cy >> 4)) * rdz + (cz >> 4)

    def kernel(*refs):
        from jax.experimental import pallas as pl

        (ox_ref, oy_ref, oz_ref, dxr, dyr, dzr,
         ivxr, ivyr, ivzr, stxr, styr, stzr) = refs[:12]
        st_refs = refs[12 : 12 + len(_STATE2_FIELDS)]
        k = 12 + len(_STATE2_FIELDS)
        l1_ref = refs[k]
        rows_ref = refs[k + 1]
        if has_vox:
            pidx_ref = refs[k + 2]
            pages_ref = refs[k + 3]
            out_refs = refs[k + 4 :]
        else:
            out_refs = refs[k + 2 :]

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dxr[:], dyr[:], dzr[:]
        ivx, ivy, ivz = ivxr[:], ivyr[:], ivzr[:]
        stx, sty, stz = stxr[:], styr[:], stzr[:]
        spx = (stx > 0).astype(jnp.int32)
        spy = (sty > 0).astype(jnp.int32)
        spz = (stz > 0).astype(jnp.int32)
        l1row = jnp.broadcast_to(l1_ref[0:1, :], GROUP)
        # 1e-4/d_len entry nudge (round_body parity).
        nud = jnp.float32(1e-4) / jnp.sqrt(
            jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)
        )

        def body(carry):
            it = carry[0]
            s = dict(zip(_STATE2_FIELDS, carry[1:]))
            walking = s["mode"] == MODE_WALK
            dom, cx, cy, cz = s["dom"], s["cx"], s["cy"], s["cz"]
            tmx, tmy, tmz = s["tmx"], s["tmy"], s["tmz"]

            def macro_once(dom, cx, cy, cz, tmx, tmy, tmz, walking):
                inner = dom >= n_regions
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

            for _ in range(macro_steps):
                (dom, cx, cy, cz, tmx, tmy, tmz, walking, in_empty) = macro_once(
                    dom, cx, cy, cz, tmx, tmy, tmz, walking
                )
            s["mode"] = jnp.where(
                s["mode"] == MODE_WALK,
                jnp.where(walking, MODE_WALK, MODE_DONE),
                s["mode"],
            )
            s.update(dom=dom, cx=cx, cy=cy, cz=cz, tmx=tmx, tmy=tmy, tmz=tmz)

            # ---- min-domain synchronous fine stepping ------------------
            # `domains_per_iter` distinct domains advance per iteration
            # (one scalar row load each); divergent groups — e.g. a tile
            # whose rays entered voxel grids of several different block
            # types — serialize 1/K as often.
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

            def fine_step(s):
                dom, cx, cy, cz = s["dom"], s["cx"], s["cy"], s["cz"]
                tmx, tmy, tmz = s["tmx"], s["tmy"], s["tmz"]
                mode, resl = s["mode"], s["resl"]
                inner = dom >= n_regions
                matches = dom == dmins[0]
                for dk in dmins[1:]:
                    matches = matches | (dom == dk)
                act = (mode == MODE_WALK) & matches & ~in_empty
                # Per-axis t increments ride the carry (set at entry /
                # push / pop), replacing an abs+div per axis per substep.
                redge = jnp.where(inner, jnp.int32(1) << resl, REGION)

                ax = _argmin3(tmx, tmy, tmz)
                t_hit = jnp.minimum(tmx, jnp.minimum(tmy, tmz))
                stax = jnp.where(ax == 0, stx, jnp.where(ax == 1, sty, stz))
                f = jnp.where(stax > 0, ax, ax + 3)
                ncx = cx + jnp.where(ax == 0, stx, 0)
                ncy = cy + jnp.where(ax == 1, sty, 0)
                ncz = cz + jnp.where(ax == 2, stz, 0)
                utx = tmx + jnp.where(ax == 0, s["tdx"], 0.0)
                uty = tmy + jnp.where(ax == 1, s["tdy"], 0.0)
                utz = tmz + jnp.where(ax == 2, s["tdz"], 0.0)

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
                if has_r32:
                    # R32 voxel grids: 8 rows per entry, one 16³ octant
                    # each. Crossing an octant boundary inside the grid
                    # hops the carried domain to the neighbor row like
                    # an outer region transition (no commit this step;
                    # the ray re-steps under the new row next iteration).
                    in32 = inner & (resl == 5)

                    def octant(ax_, ay_, az_):
                        # Clip first: the one-early entry cube can sit
                        # just outside the grid; its octant must match
                        # the (clipped) octant chosen at push time.
                        ax_ = jnp.clip(ax_, 0, 31)
                        ay_ = jnp.clip(ay_, 0, 31)
                        az_ = jnp.clip(az_, 0, 31)
                        return (
                            ((ax_ >> 4) & 1) * 4
                            + ((ay_ >> 4) & 1) * 2
                            + ((az_ >> 4) & 1)
                        )

                    # ABSOLUTE target row (n_regions + carried base +
                    # octant): an incremental dom-oct(cx)+oct(nc) form
                    # corrupts dom when the hop re-evaluates before the
                    # ray commits into the new octant (cx still carries
                    # the old octant then).
                    dom_inner = n_regions + s["vbase"] + octant(
                        ncx, ncy, ncz
                    )
                    oct_change = in32 & ~in_exit & (dom_inner != dom)
                    region_change = region_change | oct_change

                lx = jnp.clip(ncx & 15, 0, 15)
                ly = jnp.clip(ncy & 15, 0, 15)
                lz = jnp.clip(ncz & 15, 0, 15)
                edge_l2 = jnp.where(inner, jnp.minimum(resl, 4), 4)
                local = (((lx << edge_l2) + ly) << edge_l2) + lz
                widx = jnp.clip(local >> 5, 0, 127)
                word = jnp.take_along_axis(rows_loaded[0], widx, axis=-1)
                for dk, rk in zip(dmins[1:], rows_loaded[1:]):
                    word = jnp.where(
                        dom == dk, jnp.take_along_axis(rk, widx, axis=-1), word
                    )
                bit = (word >> (local & 31).astype(jnp.uint32)) & jnp.uint32(1)
                hit_now = (
                    act & ~out_exit & ~in_exit & ~region_change & (bit == 1)
                )

                commit = act & ~region_change
                new_dom = region_id(ncx, ncy, ncz)
                if has_r32:
                    new_dom = jnp.where(oct_change, dom_inner, new_dom)
                dom = jnp.where(act & region_change, new_dom, dom)
                s2 = dict(s)
                s2["dom"] = dom
                s2["cx"] = jnp.where(commit, ncx, cx)
                s2["cy"] = jnp.where(commit, ncy, cy)
                s2["cz"] = jnp.where(commit, ncz, cz)
                s2["tmx"] = jnp.where(commit, utx, tmx)
                s2["tmy"] = jnp.where(commit, uty, tmy)
                s2["tmz"] = jnp.where(commit, utz, tmz)

                nt = jnp.minimum(utx, jnp.minimum(uty, utz))
                outer_hit = hit_now & ~inner
                inner_hit = hit_now & inner
                record = hit_now
                s2["hit"] = jnp.where(inner_hit, HIT_INNER, s["hit"])
                s2["face"] = jnp.where(record, f, s["face"])
                s2["t"] = jnp.where(record, t_hit, s["t"])
                s2["nt"] = jnp.where(record, nt, s["nt"])
                s2["hx"] = jnp.where(record, ncx, s["hx"])
                s2["hy"] = jnp.where(record, ncy, s["hy"])
                s2["hz"] = jnp.where(record, ncz, s["hz"])
                s2["mode"] = jnp.where(
                    outer_hit,
                    MODE_CLASSIFY,
                    jnp.where(
                        inner_hit | (act & out_exit),
                        MODE_DONE,
                        jnp.where(act & in_exit, MODE_RESTORE, mode),
                    ),
                )
                return s2

            for _ in range(substeps):
                s = fine_step(s)

            # ---- restore: pop the outer DDA registers ------------------
            restoring = s["mode"] == MODE_RESTORE
            s["dom"] = jnp.where(restoring, s["sdom"], s["dom"])
            s["cx"] = jnp.where(restoring, s["scx"], s["cx"])
            s["cy"] = jnp.where(restoring, s["scy"], s["cy"])
            s["cz"] = jnp.where(restoring, s["scz"], s["cz"])
            s["tmx"] = jnp.where(restoring, s["stmx"], s["tmx"])
            s["tmy"] = jnp.where(restoring, s["stmy"], s["tmy"])
            s["tmz"] = jnp.where(restoring, s["stmz"], s["tmz"])
            s["tdx"] = jnp.where(restoring, jnp.abs(ivx), s["tdx"])
            s["tdy"] = jnp.where(restoring, jnp.abs(ivy), s["tdy"])
            s["tdz"] = jnp.where(restoring, jnp.abs(ivz), s["tdz"])
            s["resl"] = jnp.where(restoring, 0, s["resl"])
            s["mode"] = jnp.where(restoring, MODE_WALK, s["mode"])

            # ---- classification: atom -> final, voxel block -> push ----
            pending = s["mode"] == MODE_CLASSIFY
            if not has_vox:
                # No voxel blocks in the scene: every outer hit is final;
                # palette ids resolve in XLA (one gather per phase).
                s["hit"] = jnp.where(pending, HIT_OUTER, s["hit"])
                s["mode"] = jnp.where(pending, MODE_DONE, s["mode"])
            else:
                def classify(s):
                    pend = s["mode"] == MODE_CLASSIFY
                    pdom = jnp.min(jnp.where(pend, s["dom"], _BIG))
                    safe_p = jnp.maximum(jnp.minimum(pdom, n_regions - 1), 0)
                    actp = pend & (s["dom"] == pdom)
                    hxc, hyc, hzc = s["hx"] & 15, s["hy"] & 15, s["hz"] & 15
                    local = (((hxc << 4) + hyc) << 4) + hzc
                    page = pidx_ref[safe_p, 0]
                    # Classify code fetch. Rays hit only visible cubes,
                    # whose regions always own a page. Wide: one u32 per
                    # cube, PAGE_ROWS rows/page. Narrow: u16 pairs in
                    # PAGE_ROWS_NARROW rows/page — half the select
                    # ladder, used whenever every code fits 16 bits.
                    n_prows = PAGE_ROWS if wide_pages else PAGE_ROWS_NARROW
                    prows = pages_ref[
                        pl.dslice(jnp.maximum(page, 0) * n_prows, n_prows),
                        :,
                    ]
                    if wide_pages:
                        lane = jnp.clip(local & 127, 0, 127)
                        rsel = local >> 7
                    else:
                        lane = jnp.clip((local >> 1) & 127, 0, 127)
                        rsel = local >> 8
                    val = jnp.zeros(GROUP, jnp.uint32)
                    for krow in range(n_prows):
                        wk = jnp.take_along_axis(
                            jnp.broadcast_to(prows[krow : krow + 1, :], GROUP),
                            lane, axis=-1,
                        )
                        val = jnp.where(rsel == krow, wk, val)
                    if wide_pages:
                        is_vox = (
                            actp & (val >= jnp.uint32(1 << 31)) & (page >= 0)
                        )
                        vent = (
                            (val >> 14) & jnp.uint32(0x3FFF)
                        ).astype(jnp.int32)
                        vrow = (val & jnp.uint32(0x3FFF)).astype(jnp.int32)
                        rl = ((val >> 28) & jnp.uint32(7)).astype(jnp.int32)
                        atom_pidx = (val & jnp.uint32(0xFFFF)).astype(jnp.int32)
                    else:
                        half = (local & 1).astype(jnp.uint32)
                        u16v = (val >> (16 * half)) & jnp.uint32(0xFFFF)
                        is_vox = (
                            actp & (u16v >= jnp.uint32(0x8000)) & (page >= 0)
                        )
                        vent = (u16v & jnp.uint32(0xFFF)).astype(jnp.int32)
                        vrow = vent  # one row per entry in no-R32 scenes
                        rl = ((u16v >> 12) & jnp.uint32(7)).astype(jnp.int32)
                        atom_pidx = (
                            u16v & jnp.uint32(0x7FFF)
                        ).astype(jnp.int32)
                    atom = actp & ~is_vox
                    s["hit"] = jnp.where(atom, HIT_OUTER, s["hit"])
                    s["pidx"] = jnp.where(atom, atom_pidx, s["pidx"])
                    s["mode"] = jnp.where(atom, MODE_DONE, s["mode"])

                    # push: save outer registers, enter the voxel grid one
                    # virtual voxel early along the entry face axis
                    # (round_body / recursive_raycast parity).
                    s["sdom"] = jnp.where(is_vox, s["dom"], s["sdom"])
                    s["scx"] = jnp.where(is_vox, s["cx"], s["scx"])
                    s["scy"] = jnp.where(is_vox, s["cy"], s["scy"])
                    s["scz"] = jnp.where(is_vox, s["cz"], s["scz"])
                    s["stmx"] = jnp.where(is_vox, s["tmx"], s["stmx"])
                    s["stmy"] = jnp.where(is_vox, s["tmy"], s["stmy"])
                    s["stmz"] = jnp.where(is_vox, s["tmz"], s["stmz"])

                    t = s["t"]
                    axis = s["face"] % 3
                    ohx = (axis == 0).astype(jnp.int32)
                    ohy = (axis == 1).astype(jnp.int32)
                    ohz = (axis == 2).astype(jnp.int32)
                    blk_res = jnp.int32(1) << rl
                    rf = blk_res.astype(jnp.float32)
                    iox = (ox - s["hx"].astype(jnp.float32)) * rf
                    ioy = (oy - s["hy"].astype(jnp.float32)) * rf
                    ioz = (oz - s["hz"].astype(jnp.float32)) * rf
                    epx = iox + dx * rf * t + dx * nud
                    epy = ioy + dy * rf * t + dy * nud
                    epz = ioz + dz * rf * t + dz * nud
                    icx = jnp.clip(jnp.floor(epx).astype(jnp.int32), 0, blk_res - 1)
                    icy = jnp.clip(jnp.floor(epy).astype(jnp.int32), 0, blk_res - 1)
                    icz = jnp.clip(jnp.floor(epz).astype(jnp.int32), 0, blk_res - 1)
                    itmx = ((icx + spx).astype(jnp.float32) - iox) * ivx / rf
                    itmy = ((icy + spy).astype(jnp.float32) - ioy) * ivy / rf
                    itmz = ((icz + spz).astype(jnp.float32) - ioz) * ivz / rf
                    itmx = jnp.where(stx == 0, _INF, itmx)
                    itmy = jnp.where(sty == 0, _INF, itmy)
                    itmz = jnp.where(stz == 0, _INF, itmz)
                    ecx = icx - ohx * stx
                    ecy = icy - ohy * sty
                    ecz = icz - ohz * stz
                    s["cx"] = jnp.where(is_vox, ecx, s["cx"])
                    s["cy"] = jnp.where(is_vox, ecy, s["cy"])
                    s["cz"] = jnp.where(is_vox, ecz, s["cz"])
                    s["tmx"] = jnp.where(
                        is_vox, jnp.where(ohx == 1, t, itmx), s["tmx"]
                    )
                    s["tmy"] = jnp.where(
                        is_vox, jnp.where(ohy == 1, t, itmy), s["tmy"]
                    )
                    s["tmz"] = jnp.where(
                        is_vox, jnp.where(ohz == 1, t, itmz), s["tmz"]
                    )
                    s["tdx"] = jnp.where(is_vox, jnp.abs(ivx) / rf, s["tdx"])
                    s["tdy"] = jnp.where(is_vox, jnp.abs(ivy) / rf, s["tdy"])
                    s["tdz"] = jnp.where(is_vox, jnp.abs(ivz) / rf, s["tdz"])
                    vdom = n_regions + vrow
                    if has_r32:
                        # R32 entries own 8 octant rows; start in the
                        # octant of the ENTRY cube. The entry cube may
                        # sit one virtual voxel outside the grid (the
                        # one-early convention) — clip for the octant
                        # only; the first step walks in.
                        kcx = jnp.clip(ecx, 0, 31)
                        kcy = jnp.clip(ecy, 0, 31)
                        kcz = jnp.clip(ecz, 0, 31)
                        oct0 = (
                            ((kcx >> 4) & 1) * 4
                            + ((kcy >> 4) & 1) * 2
                            + ((kcz >> 4) & 1)
                        )
                        vdom = vdom + jnp.where(rl == 5, oct0, 0)
                    s["dom"] = jnp.where(is_vox, vdom, s["dom"])
                    s["vbase"] = jnp.where(is_vox, vrow, s["vbase"])
                    s["pidx"] = jnp.where(is_vox, vent, s["pidx"])
                    s["resl"] = jnp.where(is_vox, rl, s["resl"])
                    s["mode"] = jnp.where(is_vox, MODE_WALK, s["mode"])
                    return s

                # Surface events are rare relative to steps: skip the
                # page machinery entirely on iterations with no pending
                # classification.
                s = jax.lax.cond(pending.any(), classify, lambda s: s, s)

            return (it + 1,) + tuple(s[k] for k in _STATE2_FIELDS)

        def cond(carry):
            it = carry[0]
            mode = carry[1 + _STATE2_FIELDS.index("mode")]
            return (it < max_iters) & (mode != MODE_DONE).any()

        init = (jnp.int32(0),) + tuple(r[:] for r in st_refs)
        final = jax.lax.while_loop(cond, body, init)
        for o_ref, v in zip(out_refs, final[1:]):
            o_ref[:] = v

    return kernel


def _run_kernel2(
    rays, state_in, ctx2, max_iters, substeps, interpret, macro=1, domains=1,
    group_rows=None,
):
    """rays: dict of 12 flat [m] ray constants; state_in: dict of
    _STATE2_FIELDS flat [m]. Returns dict of _STATE2_FIELDS."""
    from jax.experimental import pallas as pl

    GROUP = (group_rows or globals()["GROUP"][0], 128)
    N_GROUP = GROUP[0] * GROUP[1]
    m = rays["ox"].shape[0]
    g = m // N_GROUP
    has_vox = ctx2.pages is not None
    n_domains = ctx2.rows.shape[0]
    kern = _make_kernel2(
        ctx2.rdims, ctx2.size, ctx2.n_regions, n_domains, max_iters,
        substeps, has_vox, macro_steps=macro, domains_per_iter=domains,
        grp=GROUP, has_r32=ctx2.has_r32, wide_pages=ctx2.wide_pages,
    )

    def shape2(a):
        return a.reshape(g * GROUP[0], GROUP[1])

    in_arrays = [shape2(rays[k]) for k in _RAY_FIELDS]
    in_arrays += [shape2(state_in[k]) for k in _STATE2_FIELDS]
    in_arrays += [ctx2.l1, ctx2.rows]
    blk = pl.BlockSpec(GROUP, lambda i: (i, 0))
    in_specs = [blk] * (len(_RAY_FIELDS) + len(_STATE2_FIELDS)) + [
        pl.BlockSpec(ctx2.l1.shape, lambda i: (0, 0)),
        pl.BlockSpec(ctx2.rows.shape, lambda i: (0, 0)),
    ]
    if has_vox:
        in_arrays += [ctx2.page_idx, ctx2.pages]
        in_specs += [
            pl.BlockSpec(ctx2.page_idx.shape, lambda i: (0, 0)),
            pl.BlockSpec(ctx2.pages.shape, lambda i: (0, 0)),
        ]

    def sds(dt):
        return jax.ShapeDtypeStruct((g * GROUP[0], GROUP[1]), dt)

    outs = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=in_specs,
        out_specs=[blk] * len(_STATE2_FIELDS),
        out_shape=[sds(_STATE2_DTYPES[k]) for k in _STATE2_FIELDS],
        interpret=interpret,
    )(*in_arrays)
    return {k: v.reshape(m) for k, v in zip(_STATE2_FIELDS, outs)}


@functools.partial(
    jax.jit,
    static_argnames=(
        "rdims", "n_regions", "options", "include_sky", "phases",
        "kernel_iters", "substeps", "max_rounds", "interpret", "macro",
        "domains", "has_vox", "group_rows", "has_r32", "wide_pages",
    ),
)
def _trace_pallas_impl2(
    state: SpaceState, o, d, l1, rows, page_idx, pages, *, rdims,
    n_regions, options, include_sky, phases, kernel_iters, substeps,
    max_rounds, interpret, macro=1, domains=1, has_vox=True,
    group_rows=None, has_r32=False, wide_pages=False,
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
    ctx2 = BitmaskCtx2(
        rows=rows, l1=l1, page_idx=page_idx, pages=pages,
        rdims=rdims, size=size, n_regions=n_regions,
        n_ventries=0, has_r32=has_r32, wide_pages=wide_pages,
    )

    entry = ray_entry_setup(o, d, size_i, size_f)
    d_len = entry["d_len"]
    inv_d, step = entry["inv_d"], entry["step"]
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
    zi = jnp.zeros(m, jnp.int32)
    zf = jnp.zeros(m, jnp.float32)
    st = dict(
        dom=dom0,
        cx=cube0[:, 0], cy=cube0[:, 1], cz=cube0[:, 2],
        tmx=tmax0[:, 0], tmy=tmax0[:, 1], tmz=tmax0[:, 2],
        tdx=jnp.abs(inv_d[:, 0]), tdy=jnp.abs(inv_d[:, 1]),
        tdz=jnp.abs(inv_d[:, 2]),
        resl=zi, mode=entry["hits_box"].astype(jnp.int32), vbase=zi,
        hit=zi, pidx=zi, face=zi, t=zf, nt=zf, hx=zi, hy=zi, hz=zi,
        sdom=zi, scx=zi, scy=zi, scz=zi, stmx=zf, stmy=zf, stmz=zf,
    )

    def fetch_cell(x, y, z):
        xc = jnp.clip(x, 0, size[0] - 1)
        yc = jnp.clip(y, 0, size[1] - 1)
        zc = jnp.clip(z, 0, size[2] - 1)
        key = ((xc >> 2) * sbd[1] + (yc >> 2)) * sbd[2] + (zc >> 2)
        row = jnp.take(state.cells, key, axis=0)
        local = ((xc & 3) << 4) | ((yc & 3) << 2) | (zc & 3)
        return (row * (iota64 == local[:, None])).sum(-1)

    def round_body(carry):
        st, fuel = carry
        out = _run_kernel2(
            rays, st, ctx2, kernel_iters, substeps, interpret, macro,
            domains, group_rows,
        )
        return out, fuel - 1

    def round_cond(carry):
        st, fuel = carry
        return (fuel > 0) & (st["mode"] != MODE_DONE).any()

    light_acc = jnp.zeros((m, 3), jnp.float32)
    trans_acc = jnp.ones(m, jnp.float32)
    unfinished = jnp.asarray(False)

    for _phase in range(phases):
        st, _fuel = jax.lax.while_loop(
            round_cond, round_body, (st, jnp.int32(max_rounds))
        )
        unfinished = unfinished | (st["mode"] != MODE_DONE).any()
        has_hit = st["hit"] != 0

        def shade_phase(st, la, ta):
            # Resolve final hits into the shader's hit-buffer contract.
            # Atom palette ids come straight from the kernel (classify
            # pages) except in page-less scenes, where one gather per
            # phase resolves them.
            atomh = st["hit"] == HIT_OUTER
            innerh = st["hit"] == HIT_INNER
            if has_vox:
                payload = st["pidx"]
            else:
                payload = fetch_cell(st["hx"], st["hy"], st["hz"]) & 0xFFFF
            # Voxel hits carry their ventry in pidx (the classify code's
            # ventry field — the carried dom is a ROW index, offset by
            # the octant for R32 entries, so it no longer identifies the
            # entry by itself).
            vflat = (
                st["pidx"] * vox_r3
                + (st["hx"] * max_r + st["hy"]) * max_r + st["hz"]
            )
            block_cube = jnp.stack([st["scx"], st["scy"], st["scz"]], -1)
            hit_cube = jnp.stack([st["hx"], st["hy"], st["hz"]], -1)
            hb = dict(
                hit_kind=jnp.where(
                    atomh, HIT_ATOM, jnp.where(innerh, HIT_VOXEL, TR_HIT_NONE)
                ),
                hit_idx=jnp.where(atomh, payload, 0),
                hit_vflat=jnp.where(innerh, vflat, 0),
                hit_face=st["face"],
                hit_t=st["t"],
                hit_next_t=st["nt"],
                hit_cube=jnp.where(innerh[:, None], block_cube, hit_cube),
            )
            return shade_fn(hb, la, ta)

        light_acc, trans_acc = jax.lax.cond(
            has_hit.any(),
            lambda la, ta: shade_phase(st, la, ta),
            lambda la, ta: (la, ta),
            light_acc, trans_acc,
        )
        resume = has_hit & (trans_acc >= 1.0 / 256.0)
        st = dict(st, mode=resume.astype(jnp.int32), hit=jnp.zeros(m, jnp.int32))

    if include_sky:
        light_acc = light_acc + sky_rgb * trans_acc[..., None]
        trans_acc = jnp.zeros_like(trans_acc)
    return light_acc, trans_acc, unfinished
