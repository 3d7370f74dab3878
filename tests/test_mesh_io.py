"""Mesh + save/load/export tests (mirrors reference test-mesh and
save/tests.rs round-trip intents)."""

import os

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.io import (
    export_gltf,
    export_stl,
    export_vox,
    import_vox,
    load_universe,
    save_universe,
)
from aic_tpu.math.grid import GridAab
from aic_tpu.mesh import SpaceMesh, mesh_space, visible_faces
from aic_tpu.space import Space
from aic_tpu.universe import Universe


def single_block_space():
    sp = Space(GridAab.cube(3))
    sp.set((1, 1, 1), block.from_color((1, 0, 0, 1)))
    return sp


class TestMesh:
    def test_single_cube_six_faces(self):
        vis = visible_faces(single_block_space())
        assert vis.sum() == 6

    def test_buried_cube_no_faces(self):
        sp = Space(GridAab.cube(3))
        sp.fill(sp.bounds, block.from_color((0, 1, 0, 1)))
        vis = visible_faces(sp)
        # Only the 6 outer boundary planes are visible: 9 faces each.
        assert vis.sum() == 6 * 9
        # Interior cube contributes nothing.
        assert not vis[:, 1, 1, 1].any()

    def test_mesh_geometry(self):
        m = mesh_space(single_block_space(), greedy=False)
        assert m.triangle_count == 12  # 6 faces × 2
        assert len(m.positions) == 24
        # All vertices on the unit cube at (1,1,1)..(2,2,2).
        assert m.positions.min() == 1.0 and m.positions.max() == 2.0
        # Opaque mesh, no transparent range.
        assert m.opaque_range[1] == len(m.indices)
        assert m.transparent_range[0] == m.transparent_range[1]

    def test_greedy_merges_slab(self):
        sp = Space(GridAab.cube(4))
        sp.fill(GridAab.from_lower_size((0, 0, 0), (4, 1, 4)), block.from_color((0, 0, 1, 1)))
        m_unit = mesh_space(sp, greedy=False)
        m_greedy = mesh_space(sp, greedy=True)
        assert m_greedy.triangle_count < m_unit.triangle_count
        # Top of the slab merges to one quad (2 triangles).
        assert m_greedy.triangle_count <= 6 * 2 + 2 * 8  # generous bound

    def test_transparent_sorted_last_and_depth_sort(self):
        sp = Space(GridAab.cube(4))
        sp.set((0, 0, 0), block.from_color((1, 0, 0, 1)))
        sp.set((2, 0, 0), block.Block(block.Atom(color=(0, 0, 1, 0.5))))
        m = mesh_space(sp)
        assert m.transparent_range[1] > m.transparent_range[0]
        m.depth_sort_for_view((10.0, 0.0, 0.0))
        # still valid indices
        assert m.indices.max() < len(m.positions)


class TestExport:
    def test_gltf(self, tmp_path):
        m = mesh_space(single_block_space())
        path = str(tmp_path / "out.gltf")
        export_gltf(m, path)
        import json

        doc = json.load(open(path))
        assert doc["asset"]["version"] == "2.0"
        assert doc["accessors"][0]["count"] == len(m.positions)

    def test_stl(self, tmp_path):
        m = mesh_space(single_block_space())
        path = str(tmp_path / "out.stl")
        export_stl(m, path)
        data = open(path, "rb").read()
        import struct

        (n,) = struct.unpack_from("<I", data, 80)
        assert n == m.triangle_count
        assert len(data) == 84 + 50 * n

    def test_vox_round_trip(self, tmp_path):
        sp = single_block_space()
        path = str(tmp_path / "out.vox")
        export_vox(sp, path)
        spaces = import_vox(path)
        assert len(spaces) == 1
        sp2 = spaces[0]
        assert sp2.bounds.size == (3, 3, 3)
        assert sp2.index_at((1, 1, 1)) != 0
        assert sp2.index_at((0, 0, 0)) == 0
        ev = sp2.evaluated_block_at((1, 1, 1))
        np.testing.assert_allclose(ev.color[:3], [1, 0, 0], atol=0.02)


class TestSaveLoad:
    def test_universe_round_trip(self, tmp_path):
        u = Universe()
        sp = Space(GridAab.cube(4))
        sp.set((1, 1, 1), block.from_color((1, 0, 0, 1), "red"))
        inner = Space(GridAab.cube(4))
        inner.fill(inner.bounds, block.from_color((0, 1, 0, 1)))
        sp.set((2, 1, 1), block.Block(block.Recur(space=inner, resolution=4)))
        u.insert_space("world", sp)
        path = str(tmp_path / "u.json")
        save_universe(u, path)

        u2 = load_universe(path)
        sp2 = u2.spaces["world"]
        assert sp2.bounds == sp.bounds
        np.testing.assert_array_equal(sp2.contents, sp.contents)
        np.testing.assert_array_equal(sp2.light, sp.light)
        assert sp2.block_at((1, 1, 1)).attributes.display_name == "red"
        ev = sp2.evaluated_block_at((2, 1, 1))
        assert ev.resolution == 4
        np.testing.assert_allclose(ev.color[:3], [0, 1, 0], atol=1e-5)

    def test_character_round_trip(self, tmp_path):
        """Characters and their body state survive save/load."""
        import dataclasses

        u = Universe()
        sp = Space(GridAab.cube(8))
        sp.fill(
            GridAab.from_lower_size((0, 0, 0), (8, 1, 8)),
            block.from_color((0.5, 0.5, 0.5, 1)),
        )
        u.insert_space("world", sp)
        ch = u.insert_character("player", "world", (4.0, 2.5, 4.0))
        u.bodies = dataclasses.replace(
            u.bodies,
            velocity=u.bodies.velocity.at[ch.body_index].set(
                np.asarray([1.0, 0.0, -2.0], np.float32)
            ),
            flying=u.bodies.flying.at[ch.body_index].set(True),
            yaw=u.bodies.yaw.at[ch.body_index].set(90.0),
        )
        path = str(tmp_path / "chars.json")
        save_universe(u, path)

        u2 = load_universe(path)
        assert "player" in u2.characters
        ch2 = u2.characters["player"]
        assert ch2.space_name == "world"
        i = ch2.body_index
        np.testing.assert_allclose(
            np.asarray(u2.bodies.position[i]), [4.0, 2.5, 4.0]
        )
        np.testing.assert_allclose(
            np.asarray(u2.bodies.velocity[i]), [1.0, 0.0, -2.0]
        )
        assert bool(np.asarray(u2.bodies.flying[i]))
        assert float(np.asarray(u2.bodies.yaw[i])) == 90.0

    def test_indirect_blockdef_round_trip(self, tmp_path):
        """Indirect primitives serialize as named block-def references;
        named defs land back in universe.block_defs."""
        bd = block.BlockDef(block.from_color((1, 0, 0, 1)), "reddef")
        u = Universe()
        sp = Space(GridAab.cube(4))
        sp.set((1, 1, 1), block.Block(block.Indirect(bd)))
        u.insert_space("world", sp)
        u.block_defs["reddef"] = bd
        path = str(tmp_path / "defs.json")
        save_universe(u, path)

        u2 = load_universe(path)
        assert "reddef" in u2.block_defs
        b2 = u2.spaces["world"].block_at((1, 1, 1))
        assert isinstance(b2.primitive, block.Indirect)
        assert b2.primitive.block_def is u2.block_defs["reddef"]
        ev = u2.spaces["world"].evaluated_block_at((1, 1, 1))
        np.testing.assert_allclose(ev.color[:3], [1, 0, 0], atol=1e-5)

    def test_cyclic_recur_space_round_trip(self, tmp_path):
        """A space whose palette Recur-references itself loads without
        infinite recursion (two-phase shell construction)."""
        u = Universe()
        sp = Space(GridAab.cube(4))
        sp.set((1, 1, 1), block.from_color((1, 0, 0, 1)))
        sp.set((2, 2, 2), block.Block(block.Recur(space=sp, resolution=4)))
        u.insert_space("ouroboros", sp)
        path = str(tmp_path / "cycle.json")
        save_universe(u, path)

        u2 = load_universe(path)
        sp2 = u2.spaces["ouroboros"]
        np.testing.assert_array_equal(sp2.contents, sp.contents)
        recur = sp2.block_at((2, 2, 2))
        assert recur.primitive.space is sp2  # the cycle is reconstructed

    def test_load_rejects_bad_format(self, tmp_path):
        path = str(tmp_path / "bad.json")
        open(path, "w").write('{"format": "nope"}')
        with pytest.raises(ValueError):
            load_universe(path)
