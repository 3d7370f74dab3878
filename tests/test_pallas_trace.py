"""Pallas region-synchronous tracer: interpret-mode parity vs the XLA
tracer (raytrace/pallas_trace.py vs raytrace/tracer.py).

The two tracers share entry setup and the phase shader
(tracer.ray_entry_setup / make_phase_shader), so any image difference
isolates a traversal divergence. Traversal itself must find the same
surfaces with the same (t, face) — the XLA path's skip-field jumps
re-derive t from the origin while the kernel's t is incremental, so
comparisons allow small float tolerances.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aic_tpu import block
from aic_tpu.content.cornell import cornell_box
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace import GraphicsOptions
from aic_tpu.raytrace.pallas_trace import build_bitmask_ctx, trace_rays_pallas
from aic_tpu.raytrace.tracer import trace_rays
from aic_tpu.space import Sky, Space, SpacePhysics

OPTS_PLAIN = GraphicsOptions(
    lighting_display="none", fog="none", transparency="surface"
)


def compare(st, origins, directions, opts, atol=2e-3, **pallas_kw):
    l1, t1 = trace_rays(
        st, jnp.asarray(origins), jnp.asarray(directions), opts, beam_tile=0
    )
    l2, t2, stats = trace_rays_pallas(
        st, jnp.asarray(origins), jnp.asarray(directions), opts,
        interpret=True, return_stats=True, **pallas_kw,
    )
    assert not bool(np.asarray(stats["unfinished"]))
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=atol)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=atol)


def grid_rays(h, w, origin_x, y_range, z_range, direction):
    ys, zs = np.meshgrid(
        np.linspace(*y_range, h), np.linspace(*z_range, w), indexing="ij"
    )
    o = np.stack([np.full_like(ys, origin_x), ys, zs], -1).astype(np.float32)
    d = np.tile(np.asarray(direction, np.float32), (h, w, 1))
    return o, d


def scene_atoms(n=24):
    """Multi-region scene (24³ → 2×2×2 regions): opaque + transparent +
    emissive atoms scattered across region boundaries."""
    sp = Space(
        GridAab.cube(n), physics=SpacePhysics(sky=Sky.uniform((0.4, 0.5, 0.6)))
    )
    rng = np.random.RandomState(7)
    colors = [
        (1.0, 0.1, 0.1, 1.0),
        (0.1, 1.0, 0.1, 0.45),
        (0.2, 0.2, 1.0, 1.0),
    ]
    for i in range(40):
        c = tuple(int(v) for v in rng.randint(0, n, 3))
        sp.set(c, block.from_color(colors[i % 3]))
    sp.set(
        (15, 16, 15),  # straddling the region corner
        block.Block(block.Atom(color=(0, 0, 0, 1.0), emission=(2.0, 1.0, 0.5))),
    )
    return sp.snapshot()


def scene_voxels():
    """Voxel blocks (two resolutions) + atoms in one 20³ space."""
    inner8 = Space(GridAab.cube(8))
    inner8.fill(
        GridAab.from_lower_size((0, 0, 0), (8, 4, 8)),
        block.from_color((1.0, 1.0, 0.0, 1.0)),
    )
    inner8.set((3, 6, 3), block.from_color((1.0, 0.0, 1.0, 0.5)))
    inner4 = Space(GridAab.cube(4))
    for x in range(4):
        for z in range(4):
            if (x + z) % 2 == 0:
                inner4.set((x, 0, z), block.from_color((0.0, 0.8, 0.8, 1.0)))
    sp = Space(
        GridAab.cube(20), physics=SpacePhysics(sky=Sky.uniform((0.3, 0.3, 0.35)))
    )
    b8 = block.Block(block.Recur(space=inner8, resolution=8))
    b4 = block.Block(block.Recur(space=inner4, resolution=4))
    for c in [(2, 2, 2), (9, 2, 9), (17, 3, 5), (5, 10, 15)]:
        sp.set(c, b8)
    for c in [(4, 2, 7), (12, 5, 12), (16, 16, 16)]:
        sp.set(c, b4)
    sp.set((7, 2, 2), block.from_color((0.9, 0.2, 0.2, 1.0)))
    return sp.snapshot()


def scene_r32():
    """An R32 voxel block (v2 walks it as 8 octant rows) + an R8 block
    and atoms, with rays crossing octant boundaries inside the grid."""
    inner32 = Space(GridAab.cube(32))
    # Diagonal shelf crossing all 8 octants + a hollow interior.
    inner32.fill(
        GridAab.from_lower_size((0, 0, 0), (32, 6, 32)),
        block.from_color((0.9, 0.7, 0.2, 1.0)),
    )
    for i in range(32):
        inner32.set((i, min(i, 31), i), block.from_color((0.2, 0.4, 0.9, 1.0)))
    inner32.set((20, 20, 8), block.from_color((0.9, 0.1, 0.1, 0.5)))
    inner8 = Space(GridAab.cube(8))
    inner8.fill(
        GridAab.from_lower_size((0, 0, 0), (8, 8, 4)),
        block.from_color((0.1, 0.8, 0.4, 1.0)),
    )
    sp = Space(
        GridAab.cube(20), physics=SpacePhysics(sky=Sky.uniform((0.3, 0.32, 0.4)))
    )
    b32 = block.Block(block.Recur(space=inner32, resolution=32))
    b8 = block.Block(block.Recur(space=inner8, resolution=8))
    for c in [(3, 2, 3), (10, 2, 12), (16, 8, 6)]:
        sp.set(c, b32)
    sp.set((8, 2, 5), b8)
    sp.set((13, 2, 8), block.from_color((0.8, 0.2, 0.2, 1.0)))
    return sp.snapshot()


class TestKernelParity:
    @pytest.mark.parametrize("mega", [False, True])
    def test_atoms_plain(self, mega):
        st = scene_atoms()
        o, d = grid_rays(32, 32, -3.0, (0.1, 23.9), (0.1, 23.9), (1.0, 0.12, 0.07))
        compare(st, o, d, OPTS_PLAIN, megakernel=mega)

    def test_atoms_volumetric_smoothstep_fog(self):
        st = scene_atoms()
        opts = GraphicsOptions(
            lighting_display="smoothstep", fog="abrupt",
            transparency="volumetric",
        )
        o, d = grid_rays(32, 32, -3.0, (0.1, 23.9), (0.1, 23.9), (1.0, 0.12, 0.07))
        compare(st, o, d, opts)

    @pytest.mark.parametrize("mega", [False, True])
    def test_voxel_blocks(self, mega):
        st = scene_voxels()
        o, d = grid_rays(32, 32, -2.0, (0.05, 19.95), (0.05, 19.95), (1.0, 0.08, 0.05))
        compare(st, o, d, OPTS_PLAIN, megakernel=mega)

    def test_r32_blocks(self):
        """R32 grids walk as 8 octant rows with in-grid domain hops."""
        st = scene_r32()
        o, d = grid_rays(
            32, 32, -2.0, (0.05, 19.95), (0.05, 19.95), (1.0, 0.08, 0.05)
        )
        compare(st, o, d, OPTS_PLAIN, megakernel=True)

    def test_r32_incoherent(self):
        st = scene_r32()
        rng = np.random.RandomState(5)
        o = rng.uniform(-4, 24, (256, 3)).astype(np.float32)
        d = rng.normal(size=(256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        compare(st, o, d, OPTS_PLAIN, megakernel=True)

    def test_voxel_blocks_volumetric(self):
        st = scene_voxels()
        opts = GraphicsOptions(
            lighting_display="none", fog="none", transparency="volumetric"
        )
        o, d = grid_rays(32, 32, -2.0, (0.05, 19.95), (0.05, 19.95), (1.0, 0.08, 0.05))
        compare(st, o, d, opts)

    def test_incoherent_rays(self):
        """Random origins/directions: min-domain sync must still converge."""
        st = scene_voxels()
        rng = np.random.RandomState(3)
        o = rng.uniform(-4, 24, (512, 3)).astype(np.float32)
        d = rng.normal(size=(512, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        compare(st, o, d, OPTS_PLAIN, max_rounds=96)

    def test_rays_from_inside(self):
        st = scene_atoms()
        rng = np.random.RandomState(11)
        o = rng.uniform(1, 23, (256, 3)).astype(np.float32)
        d = rng.normal(size=(256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        compare(st, o, d, OPTS_PLAIN)

    def test_cornell_smoothstep(self):
        """Cornell-26 (28³ bounds → 2³ regions) with stored light as
        initialized + smooth lighting + volumetric — the bench config's
        semantics at test scale."""
        st = cornell_box(26).snapshot()
        opts = GraphicsOptions(
            lighting_display="smoothstep", fog="none",
            transparency="volumetric",
        )
        # From the open face looking in (the spawn side is +Z).
        o, d = grid_rays(32, 32, 40.0, (0.0, 26.0), (0.0, 26.0), (-1.0, -0.02, -0.03))
        o = o[..., [1, 2, 0]]  # x=40 plane → put the constant on Z
        d = d[..., [1, 2, 0]]
        compare(st, o, d, opts)

    def test_edge_pad_grid(self):
        """Non-multiple-of-32 2D grid (60×100 → padded 64×128) exercises
        the edge-mode pad + inverse-permutation path, which exact-32 grids
        never touch (round-3 advisor finding)."""
        st = scene_atoms()
        o, d = grid_rays(60, 100, -3.0, (0.1, 23.9), (0.1, 23.9), (1.0, 0.12, 0.07))
        assert 64 * 128 <= 1.5 * 60 * 100  # must take the tiled+pad path
        compare(st, o, d, OPTS_PLAIN)

    def test_thin_batch_avoids_tiling(self):
        """A 2×512 batch must NOT be tiled (would trace 16× the rays);
        the flat path handles it (round-3 advisor finding)."""
        st = scene_atoms()
        rng = np.random.RandomState(5)
        o = rng.uniform(-2, 25, (2, 512, 3)).astype(np.float32)
        d = rng.normal(size=(2, 512, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        compare(st, o, d, OPTS_PLAIN, max_rounds=96)

    def test_axis_aligned_grazing(self):
        """Axis-aligned rays along cube boundaries (tie-break paths)."""
        st = scene_atoms()
        ys = np.arange(0, 24, 1.0, np.float32)  # integer boundaries
        o = np.stack([np.full_like(ys, -2.0), ys, ys], -1)
        d = np.tile(np.asarray([1.0, 0.0, 0.0], np.float32), (len(ys), 1))
        compare(st, o, d, OPTS_PLAIN)


class TestBitmaskCtx:
    def test_rejects_oversized(self):
        # 66×66×16 regions = 69,696 > the 4096-region L1 capacity.
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1056, 1056, 16)))
        with pytest.raises(ValueError):
            build_bitmask_ctx(sp.snapshot())

    def test_region_rows_match_visibility(self):
        st = scene_atoms()
        ctx = build_bitmask_ctx(st)
        contents = np.asarray(st.contents)
        vis = np.asarray(st.tables.visible)[contents]
        # Check a handful of cubes against their packed bits.
        rng = np.random.RandomState(0)
        rd = ctx.rdims
        rows = np.asarray(ctx.rows)
        for _ in range(64):
            c = rng.randint(0, 24, 3)
            rid = ((c[0] >> 4) * rd[1] + (c[1] >> 4)) * rd[2] + (c[2] >> 4)
            local = (
                ((c[0] & 15) * 16 + (c[1] & 15)) * 16 + (c[2] & 15)
            )
            bit = (rows[rid, local >> 5] >> (local & 31)) & 1
            assert bool(bit) == bool(vis[c[0], c[1], c[2]])
