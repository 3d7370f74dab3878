"""Native C++ triangulator tests (no-T-junction contract, SURVEY §7
step 7 / reference planar/mod.rs:34-40)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.mesh import mesh_space
from aic_tpu.native import _triangulate_py, native_available, triangulate_plane
from aic_tpu.space import Space


def _tri_area(verts, tris):
    t = verts[tris]
    return float(
        np.abs(
            np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
        ).sum()
        / 2.0
    )


def _has_t_junction(verts, tris):
    """True iff any vertex lies strictly inside another triangle's edge —
    the conforming-mesh property the reference's planar triangulator
    guarantees (planar/mod.rs:34-40)."""
    uniq = np.unique(verts, axis=0)
    for a, b, c in tris:
        for i, j in ((a, b), (b, c), (c, a)):
            p, q = verts[i], verts[j]
            d = q - p
            L2 = float(d @ d)
            for v in uniq:
                if np.array_equal(v, p) or np.array_equal(v, q):
                    continue
                cross = d[0] * (v[1] - p[1]) - d[1] * (v[0] - p[0])
                if abs(cross) > 1e-9:
                    continue  # not collinear
                t = float((v - p) @ d) / L2
                if 1e-9 < t < 1 - 1e-9:
                    return True
    return False


class TestTriangulator:
    def _mask(self):
        # L-shape of id 1 + separate 2x2 of id 2.
        mask = np.zeros((8, 8), bool)
        ids = np.zeros((8, 8), np.uint16)
        mask[1:6, 1:3] = True
        ids[1:6, 1:3] = 1
        mask[1:3, 3:6] = True
        ids[1:3, 3:6] = 1
        mask[5:7, 5:7] = True
        ids[5:7, 5:7] = 2
        return mask, ids

    def test_native_builds(self):
        assert native_available(), "g++ build of triangulate.cpp failed"

    def test_area_and_ids(self):
        mask, ids = self._mask()
        verts, tris, tri_ids = triangulate_plane(mask, ids)
        assert _tri_area(verts, tris) == pytest.approx(float(mask.sum()))
        assert set(np.unique(tri_ids)) == {1, 2}

    def test_no_t_junctions(self):
        """The mesh is conforming: no vertex sits strictly inside another
        triangle's edge. A plain greedy-quad mesh of the same mask fails
        this (that is the reference's complaint about greedy meshing)."""
        mask, ids = self._mask()
        verts, tris, _ = triangulate_plane(mask, ids)
        assert not _has_t_junction(verts, tris)

    def test_greedy_quads_do_have_t_junctions(self):
        """Sanity: the checker catches greedy meshing's artifact (two
        stacked rects of different widths sharing a partial edge)."""
        verts = np.asarray(
            [[0, 0], [0, 2], [1, 2], [1, 0], [1, 1], [2, 1]], np.float32
        )
        tris = np.asarray([[0, 1, 2], [0, 2, 3], [3, 4, 5]], np.int32)
        assert _has_t_junction(verts, tris)

    def test_matches_python_fallback(self):
        mask, ids = self._mask()
        nv, nt, nid = triangulate_plane(mask, ids)
        pv, pt, pid = _triangulate_py(np.asarray(mask, np.uint8), ids)
        assert _tri_area(nv, nt) == pytest.approx(_tri_area(pv, pt))
        np.testing.assert_array_equal(np.sort(nid), np.sort(pid))

    def test_fewer_triangles_than_unit_quads(self):
        mask = np.ones((16, 16), bool)
        ids = np.ones((16, 16), np.uint16)
        verts, tris, _ = triangulate_plane(mask, ids)
        assert _tri_area(verts, tris) == pytest.approx(256.0)
        assert len(tris) == 64  # fan: 2(a+b) = 64 << 512 unit-quad tris


class TestMeshStyle:
    def test_no_t_junction_space_mesh(self):
        sp = Space(GridAab.cube(12))
        sp.fill(
            GridAab.from_lower_size((0, 0, 0), (12, 1, 12)),
            block.from_color((0.6, 0.6, 0.6, 1.0)),
        )
        m_unit = mesh_space(sp, style="unit")
        m_ntj = mesh_space(sp, style="no_t_junction")
        assert m_ntj.triangle_count < m_unit.triangle_count

        def area(m):
            t = m.positions[m.indices.reshape(-1, 3)]
            return float(
                np.linalg.norm(
                    np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1
                ).sum()
                / 2.0
            )

        assert area(m_ntj) == pytest.approx(area(m_unit))
        # Winding: normals point outward — top-face triangles (y == 1
        # plane) have +y normals.
        t = m_ntj.positions[m_ntj.indices.reshape(-1, 3)]
        top = np.all(t[..., 1] == 1.0, axis=1)
        n = np.cross(t[top, 1] - t[top, 0], t[top, 2] - t[top, 0])
        assert (n[:, 1] > 0).all()


class TestVoxelDetailMesh:
    def test_block_mesh_of_recursive_block(self):
        """block_mesh: voxel-granular geometry in [0,1]^3, merged by the
        native triangulator with per-color keying."""
        from aic_tpu.mesh import block_mesh

        inner = Space(GridAab.cube(4))
        red = block.from_color((0.9, 0.1, 0.1, 1.0))
        blue = block.from_color((0.1, 0.1, 0.9, 1.0))
        for x in range(4):
            for z in range(4):
                inner.set((x, 0, z), red if x < 2 else blue)
        vox = block.Block(block.Recur(inner, resolution=4), block.BlockAttributes())
        ev = block.evaluate(vox)
        m = block_mesh(ev)
        assert m.triangle_count > 0
        assert m.positions.min() >= 0.0 and m.positions.max() <= 1.0
        # Both colors appear among the vertices.
        cols = m.colors[m.indices]
        assert (cols[:, 0] > 0.5).any() and (cols[:, 2] > 0.5).any()

    def test_space_mesh_voxel_detail_finer_than_block_granular(self):
        from aic_tpu.mesh import mesh_space, mesh_space_voxel_detail

        inner = Space(GridAab.cube(4))
        solid = block.from_color((0.5, 0.8, 0.3, 1.0))
        for x in range(4):
            for y in range(4):
                for z in range(4):
                    if (x + y + z) % 2 == 0:
                        inner.set((x, y, z), solid)
        vox = block.Block(block.Recur(inner, resolution=4), block.BlockAttributes())
        sp = Space(GridAab.cube(4))
        sp.set((1, 1, 1), vox)
        sp.set((2, 1, 1), block.from_color((1, 1, 1, 1)))
        coarse = mesh_space(sp, style="unit")
        fine = mesh_space_voxel_detail(sp)
        assert fine.triangle_count > coarse.triangle_count
        # The checker voxels produce geometry strictly inside cube (1,1,1).
        inside = (
            (fine.positions[:, 0] > 1.01)
            & (fine.positions[:, 0] < 1.99)
            & (fine.positions[:, 1] > 1.01)
            & (fine.positions[:, 1] < 1.99)
        )
        assert inside.any()


class TestNativeSpaceMesher:
    """native/space_mesher.cpp: whole-space greedy face extraction."""

    def test_quads_match_python_path(self):
        import numpy as np

        from aic_tpu import block
        from aic_tpu.math.grid import GridAab
        from aic_tpu.mesh.mesher import _mesh_arrays, _mesh_arrays_native, visible_faces
        from aic_tpu.space import Space

        rng = np.random.default_rng(3)
        sp = Space(GridAab.cube(8))
        blocks = [
            block.from_color((1, 0, 0, 1)),
            block.from_color((0, 1, 0, 1)),
            block.from_color((0, 0.5, 1, 0.5)),
        ]
        for _ in range(60):
            c = tuple(int(v) for v in rng.integers(0, 8, 3))
            sp.set(c, blocks[int(rng.integers(0, 3))])
        ev_face_colors = np.stack(
            [sp.evaluated(i).face_colors for i in range(sp.palette_len())]
        )
        visible = np.array(
            [sp.evaluated(i).visible_or_animated() for i in range(sp.palette_len())],
            np.uint8,
        )
        opaque = np.stack(
            [sp.evaluated(i).opaque for i in range(sp.palette_len())]
        ).astype(np.uint8)
        lower = np.asarray(sp.bounds.lower, np.float32)

        native = _mesh_arrays_native(sp.contents, visible, opaque, ev_face_colors, lower)
        assert native is not None
        py = _mesh_arrays(sp.contents, visible_faces(sp), ev_face_colors, lower, True)
        # Same total face area and triangle counts per pass.
        assert native.triangle_count == py.triangle_count

        def area(m, lo, hi):
            tri = m.indices[lo:hi].reshape(-1, 3)
            v = m.positions[tri]
            return float(
                np.linalg.norm(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1).sum()
            )

        assert abs(area(native, *native.opaque_range) - area(py, *py.opaque_range)) < 1e-3
        assert (
            abs(area(native, *native.transparent_range) - area(py, *py.transparent_range))
            < 1e-3
        )
