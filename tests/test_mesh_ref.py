"""SpaceMesh tests ported from the reference
(all-is-cubes-mesh/src/space_mesh.rs tests): emptiness, face counts,
interior-face culling, and transparent/opaque separation."""

import numpy as np

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.mesh.mesher import SpaceMesh, mesh_space
from aic_tpu.space import Space


def tri_count(mesh: SpaceMesh) -> int:
    return len(mesh.indices) // 3


class TestBasicProperties:
    def test_default_is_empty(self):
        """space_mesh.rs:1336 — an empty space yields an empty mesh."""
        mesh = mesh_space(Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2))))
        assert len(mesh.indices) == 0
        assert len(mesh.positions) == 0

    def test_nonempty_properties(self):
        """space_mesh.rs:1352 — one full cube meshes to exactly 6 faces
        (12 triangles, 36 indices)."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
        sp.set((0, 0, 0), block.from_color((1, 1, 1, 1)))
        mesh = mesh_space(sp)
        assert len(mesh.indices) == 6 * 6

    def test_interior_faces_culled(self):
        """space_mesh.rs face culling — two adjacent opaque cubes share
        a hidden interior face pair: 10 exterior faces, not 12."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        w = block.from_color((1, 1, 1, 1))
        sp.set((0, 0, 0), w)
        sp.set((1, 0, 0), w)
        mesh = mesh_space(sp, greedy=False)
        assert len(mesh.indices) == 10 * 6

    def test_bounding_box_excludes_hidden_faces(self):
        """space_mesh.rs:1407 analog — a solid floor slab meshes only
        its exposed surfaces; no vertex lies strictly inside the
        solid."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
        sp.fill(
            GridAab.from_lower_size((0, 0, 0), (4, 2, 4)),
            block.from_color((1, 1, 1, 1)),
        )
        mesh = mesh_space(sp)
        pos = np.asarray(mesh.positions)
        # Exposed surfaces: top at y=2, sides, bottom at y=0. No vertex
        # has 0 < y < 2 except on the side walls (x or z at the
        # boundary).
        interior = (
            (pos[:, 1] > 0)
            & (pos[:, 1] < 2)
            & (pos[:, 0] > 0)
            & (pos[:, 0] < 4)
            & (pos[:, 2] > 0)
            & (pos[:, 2] < 4)
        )
        assert not interior.any()
        assert pos[:, 1].max() == 2.0  # top face plane


class TestTransparencySeparation:
    def test_opaque_transparent_split(self):
        """space_mesh.rs opaque/transparent ranges — a scene with one
        opaque and one transparent cube yields both partitions, and
        depth sorting leaves triangle count unchanged."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (3, 1, 1)))
        sp.set((0, 0, 0), block.from_color((1, 1, 1, 1)))
        sp.set((2, 0, 0), block.from_color((0.2, 0.4, 1.0, 0.5)))
        mesh = mesh_space(sp)
        olo, ohi = mesh.opaque_range
        tlo, thi = mesh.transparent_range
        assert ohi - olo > 0
        assert thi - tlo > 0
        total = len(mesh.indices)
        mesh.depth_sort_for_view((10.0, 5.0, 5.0))
        assert len(mesh.indices) == total
