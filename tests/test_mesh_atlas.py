"""Texture-atlas mesh path tests (texture.rs:38 role, gltf/texture.rs atlas)."""

import json

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import Block, Recur
from aic_tpu.math.grid import GridAab
from aic_tpu.mesh import mesh_space_textured, mesh_space_voxel_detail
from aic_tpu.mesh.atlas import PlaneAtlas, resolve_uvs
from aic_tpu.space import Space


def checker_block(r=4):
    vox = Space(GridAab.from_lower_size((0, 0, 0), (r, r, r)))
    red = block.from_color((1.0, 0.0, 0.0, 1.0))
    blue = block.from_color((0.0, 0.0, 1.0, 1.0))
    for x in range(r):
        for y in range(r):
            for z in range(r):
                vox.set((x, y, z), red if (x + y + z) % 2 == 0 else blue)
    return Block(Recur(space=vox, resolution=r))


def one_block_space(blk):
    sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
    sp.set((0, 0, 0), blk)
    return sp


class TestPlaneAtlas:
    def test_dedup(self):
        atlas = PlaneAtlas()
        p = np.full((4, 4, 4), 7, np.uint8)
        assert atlas.add_plane(p) == atlas.add_plane(p.copy())
        q = p.copy()
        q[0, 0, 0] = 9
        assert atlas.add_plane(q) != atlas.add_plane(p)

    def test_pack_places_all_planes(self):
        atlas = PlaneAtlas()
        rng = np.random.default_rng(0)
        pids = [
            atlas.add_plane(rng.integers(0, 255, (h, w, 4), dtype=np.uint8))
            for h, w in [(4, 4), (8, 8), (2, 2), (16, 16), (4, 8)]
        ]
        image, origins, white = atlas.pack()
        assert tuple(image[white]) == (255, 255, 255, 255)
        for pid in set(pids):
            p = atlas.planes[pid]
            r, c = origins[pid]
            assert (image[r : r + p.shape[0], c : c + p.shape[1]] == p).all()

    def test_uv_roundtrip(self):
        atlas = PlaneAtlas()
        plane = np.zeros((4, 4, 4), np.uint8)
        plane[2, 3] = (10, 20, 30, 255)
        pid = atlas.add_plane(plane)
        image, origins, _ = atlas.pack()
        # Texel center (2.5, 3.5) in plane space → image sample.
        uv = resolve_uvs(
            np.array([[2.5, 3.5]], np.float32), np.array([pid]), origins, image.shape
        )[0]
        h, w = image.shape[:2]
        assert tuple(image[int(uv[1] * h), int(uv[0] * w)]) == (10, 20, 30, 255)


class TestTexturedMesh:
    def test_fewer_vertices_than_color_path(self):
        sp = one_block_space(checker_block(8))
        color_mesh = mesh_space_voxel_detail(sp)
        tex_mesh = mesh_space_textured(sp)
        assert tex_mesh.texture is not None
        assert tex_mesh.uvs is not None and len(tex_mesh.uvs) == len(tex_mesh.positions)
        # The checkerboard forces the color path to emit per-voxel quads;
        # the texture path merges each full face into one rect.
        assert len(tex_mesh.positions) < len(color_mesh.positions) / 4

    def test_same_surface_area(self):
        sp = one_block_space(checker_block(4))
        for m in (mesh_space_voxel_detail(sp), mesh_space_textured(sp)):
            tri = m.indices.reshape(-1, 3)
            v = m.positions[tri]
            area = float(
                np.linalg.norm(
                    np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1
                ).sum()
                / 2.0
            )
            assert area == pytest.approx(6.0), area  # a full cube's surface

    def test_atlas_texels_match_voxels(self):
        sp = one_block_space(checker_block(4))
        m = mesh_space_textured(sp)
        # Every textured vertex UV lands on a non-empty texel.
        tex = m.texture
        h, w = tex.shape[:2]
        uvs = m.uvs
        px = np.clip((uvs * [w, h]).astype(int), 0, [w - 1, h - 1])
        # sample at rect corners can be on the texel boundary; just check
        # the atlas contains both colors.
        flat = tex.reshape(-1, 4)
        assert (flat[:, 0] > 200).any() and (flat[:, 2] > 200).any()


class TestGltfExport:
    def test_textured_gltf(self, tmp_path):
        from aic_tpu.io import export_gltf

        sp = one_block_space(checker_block(4))
        m = mesh_space_textured(sp)
        path = tmp_path / "tex.gltf"
        export_gltf(m, str(path))
        doc = json.loads(path.read_text())
        prim = doc["meshes"][0]["primitives"][0]
        assert "TEXCOORD_0" in prim["attributes"]
        assert "material" in prim
        assert doc["images"][0]["uri"].startswith("data:image/png")
        # index accessor is u16 (small mesh) or u32
        assert doc["accessors"][prim["indices"]]["componentType"] in (5123, 5125)

    def test_animation_gltf(self, tmp_path):
        from aic_tpu.io import export_gltf_animation

        frames = []
        for shift in range(3):
            sp = Space(GridAab.from_lower_size((0, 0, 0), (4, 1, 1)))
            sp.set((shift, 0, 0), block.from_color((1.0, 1.0, 0.0, 1.0)))
            frames.append(mesh_space_voxel_detail(sp))
        path = tmp_path / "anim.gltf"
        export_gltf_animation(
            frames, str(path), camera_positions=[[0, 0, 5], [1, 0, 5], [2, 0, 5]]
        )
        doc = json.loads(path.read_text())
        anim = doc["animations"][0]
        # one scale channel per frame + one camera translation channel
        assert len(anim["channels"]) == 4
        scale_targets = [
            c["target"] for c in anim["channels"] if c["target"]["path"] == "scale"
        ]
        assert len(scale_targets) == 3
        assert any(c["target"]["path"] == "translation" for c in anim["channels"])
        assert len(doc["nodes"]) == 4
