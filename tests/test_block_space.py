"""Block evaluation + Space tests (mirrors reference block/eval/tests.rs and
space/tests.rs intents)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import eval as block_eval
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space, SpacePhysics, Sky


class TestEvaluate:
    def test_air(self):
        ev = block.evaluate(block.AIR)
        assert not ev.visible
        assert not ev.opaque.any()
        assert ev.resolution == 1
        np.testing.assert_array_equal(ev.color, [0, 0, 0, 0])

    def test_opaque_atom(self):
        b = block.from_color((0.5, 0.25, 0.125, 1.0))
        ev = block.evaluate(b)
        assert ev.visible
        assert ev.opaque.all()
        assert ev.uniform_collision == block.COLLISION_HARD
        np.testing.assert_allclose(ev.color, [0.5, 0.25, 0.125, 1.0], atol=1e-6)
        for f in range(6):
            np.testing.assert_allclose(ev.face_colors[f], [0.5, 0.25, 0.125, 1.0], atol=1e-6)

    def test_transparent_atom(self):
        b = block.Block(block.Atom(color=(1.0, 0.0, 0.0, 0.5)))
        ev = block.evaluate(b)
        assert ev.visible
        assert not ev.opaque.any()
        assert ev.color[3] == pytest.approx(0.5, abs=1e-6)

    def test_emission_aggregation(self):
        b = block.Block(block.Atom(color=(0, 0, 0, 0), emission=(2.0, 1.0, 0.5)))
        ev = block.evaluate(b)
        assert ev.visible  # emissive ⇒ visible
        # Tracing a transparent emissive unit cube from any face yields the
        # full emission; averaged over faces it stays the same.
        np.testing.assert_allclose(ev.light_emission, [2.0, 1.0, 0.5], rtol=1e-5)

    def test_recur_block(self):
        # Half-filled voxel block: lower half red, upper half air.
        inner = Space(GridAab.cube(4))
        red = block.from_color((1.0, 0.0, 0.0, 1.0))
        inner.fill(GridAab.from_lower_size((0, 0, 0), (4, 2, 4)), red)
        b = block.Block(block.Recur(space=inner, resolution=4))
        ev = block.evaluate(b)
        assert ev.resolution == 4
        assert ev.visible
        # NY face is fully covered (opaque); PY face sees air (not opaque).
        from aic_tpu.math import faces

        assert ev.opaque[faces.NY]
        assert not ev.opaque[faces.PY]
        # Side faces are half-covered: alpha 0.5.
        assert ev.face_colors[faces.NX][3] == pytest.approx(0.5, abs=1e-6)
        # Mean color: NY and PY traces both reach red (alpha 1 each; the PY
        # rays pass through air then hit the slab); sides are half-covered.
        assert ev.color[3] == pytest.approx((1 + 1 + 4 * 0.5) / 6, abs=1e-5)
        np.testing.assert_allclose(ev.color[:3], [1, 0, 0], atol=1e-6)

    def test_rotate_modifier(self):
        inner = Space(GridAab.cube(2))
        red = block.from_color((1.0, 0.0, 0.0, 1.0))
        inner.set((0, 0, 0), red)
        b = block.Block(block.Recur(space=inner, resolution=2))
        ev = block.evaluate(b)
        from aic_tpu.math.grid import ROTATION_MATRICES

        # Find the rotation that maps x→x, y→z, z→-y (rotation about X).
        target = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]])
        rot_idx = next(
            i for i, m in enumerate(ROTATION_MATRICES) if (m == target).all()
        )
        ev_rot = block.evaluate(b.rotate(rot_idx))
        assert ev_rot.voxels.color[..., 3].sum() == ev.voxels.color[..., 3].sum()
        assert ev_rot.visible

    def test_composite_over(self):
        red = block.from_color((1.0, 0.0, 0.0, 1.0))
        clear = block.Block(block.Atom(color=(0, 0, 1, 0.0), collision=block.COLLISION_NONE))
        b = red.with_modifier(block.Composite(source=clear))
        ev = block.evaluate(b)
        np.testing.assert_allclose(ev.color, [1, 0, 0, 1], atol=1e-6)

    def test_budget_limit(self):
        # Self-referential indirection should hit the budget, not hang.
        bd = block.BlockDef(block.AIR)
        b = block.Block(block.Indirect(bd))
        bd.redefine(b)
        ev = block.evaluate(b)
        assert ev is not None  # error block, not crash


class TestSpace:
    def test_set_get(self):
        sp = Space(GridAab.cube(4))
        red = block.from_color((1, 0, 0, 1))
        assert sp.set((1, 2, 3), red)
        assert sp.block_at((1, 2, 3)) == red
        assert sp.index_at((1, 2, 3)) == 1
        assert not sp.set((1, 2, 3), red)  # no-op returns False
        assert sp.index_at((0, 0, 0)) == 0

    def test_palette_dedup(self):
        sp = Space(GridAab.cube(4))
        red = block.from_color((1, 0, 0, 1))
        sp.set((0, 0, 0), red)
        sp.set((1, 0, 0), block.from_color((1, 0, 0, 1)))
        assert sp.palette_len() == 2  # AIR + red, deduped

    def test_bounds_with_offset(self):
        sp = Space(GridAab.from_lower_size((-2, -2, -2), (4, 4, 4)))
        red = block.from_color((1, 0, 0, 1))
        sp.set((-2, -2, -2), red)
        assert sp.index_at((-2, -2, -2)) == 1
        with pytest.raises(IndexError):
            sp.set((5, 5, 5), red)

    def test_snapshot_shapes(self):
        sp = Space(GridAab.cube(4))
        inner = Space(GridAab.cube(8))
        inner.fill(inner.bounds, block.from_color((0, 1, 0, 1)))
        sp.set((0, 0, 0), block.Block(block.Recur(space=inner, resolution=8)))
        sp.set((1, 0, 0), block.from_color((1, 0, 0, 1)))
        st = sp.snapshot()
        assert st.contents.shape == (4, 4, 4)
        assert st.light.shape == (4, 4, 4, 4)
        assert st.tables.vox_rows.shape[1:] == (8, 8, 8, 8)
        assert int(st.tables.voxel_index[1]) == 0  # recur block is voxel entry 0
        assert int(st.tables.voxel_index[2]) == -1  # atom
        assert st.tables.padded_palette_size % 8 == 0

    def test_lookup_contents(self):
        import jax.numpy as jnp

        from aic_tpu.space.state import lookup_contents

        sp = Space(GridAab.cube(4))
        sp.set((1, 2, 3), block.from_color((1, 0, 0, 1)))
        st = sp.snapshot()
        idx = jnp.array([[1, 2, 3], [0, 0, 0], [-1, 0, 0]])
        vals, mask = lookup_contents(st, idx)
        np.testing.assert_array_equal(np.asarray(vals), [1, 0, 0])
        np.testing.assert_array_equal(np.asarray(mask), [True, True, False])

    def test_fast_evaluate_light(self):
        sp = Space(GridAab.cube(4))
        red = block.from_color((1, 0, 0, 1))
        sp.fill(GridAab.from_lower_size((0, 1, 0), (4, 1, 4)), red)  # slab at y=1
        sp.fast_evaluate_light()
        from aic_tpu.math import lightpack

        # Above the slab: sky-lit.
        assert sp.light[0, 2, 0, 3] == lightpack.STATUS_VISIBLE
        # The slab itself: opaque.
        assert sp.light[0, 1, 0, 3] == lightpack.STATUS_OPAQUE
        # Below the slab: dark (uninitialized black).
        assert sp.light[0, 0, 0, 3] == lightpack.STATUS_UNINITIALIZED


class TestSky:
    def test_uniform_faces(self):
        sky = Sky.uniform((1.0, 0.5, 0.25))
        faces_light = sky.block_sky_faces()
        # All faces equal (quantized).
        for f in range(6):
            np.testing.assert_allclose(faces_light[f], faces_light[0])
        # Quantization error bounded by the log step (~7%).
        np.testing.assert_allclose(faces_light[0], [1.0, 0.5, 0.25], rtol=0.04)

    def test_octant_sample(self):
        colors = np.zeros((8, 3), np.float32)
        colors[7] = [1, 1, 1]  # +x+y+z octant
        sky = Sky.from_octants(colors)
        np.testing.assert_allclose(sky.sample([1, 1, 1]), [1, 1, 1])
        np.testing.assert_allclose(sky.sample([-1, 1, 1]), [0, 0, 0])
        assert sky.mean()[0] == pytest.approx(1 / 8)


class TestInventoryModifier:
    """Modifier::Inventory + InvInBlock rendering (inv/inv_in_block.rs,
    block/modifier/mod.rs:748 render_inventory)."""

    def _chest(self):
        from aic_tpu.block import InvInBlock, from_color

        return from_color((0.5, 0.3, 0.1, 1.0), "chest").with_attributes(
            inventory=InvInBlock.default_for_size(4)
        )

    def test_icons_render_into_voxels(self):
        from aic_tpu.block import InventoryModifier, evaluate, from_color

        apple = from_color((1.0, 0.1, 0.1, 1.0), "apple")
        gem = from_color((0.2, 0.9, 1.0, 1.0), "gem")
        ev = evaluate(
            self._chest().with_modifier(InventoryModifier(icons=(apple, None, gem)))
        )
        assert ev.resolution == 16
        c = ev.voxels.color
        assert c[1, 1, 13][0] > 0.9  # slot 0: apple red
        assert c[9, 1, 13][2] > 0.9  # slot 2: gem blue
        assert abs(c[5, 1, 13][0] - 0.5) < 0.05  # slot 1 empty: chest body

    def test_empty_inventory_changes_nothing(self):
        from aic_tpu.block import InventoryModifier, evaluate

        plain = evaluate(self._chest())
        with_empty = evaluate(
            self._chest().with_modifier(InventoryModifier(icons=(None, None)))
        )
        import numpy as np

        np.testing.assert_array_equal(plain.voxels.color, with_empty.voxels.color)

    def test_icon_positions_clip_to_block(self):
        from aic_tpu.block import IconRow, InvInBlock

        cfg = InvInBlock(
            inventory_size=8,
            icon_scale=4,
            render_resolution=16,
            icon_rows=(IconRow(first_slot=0, count=8, origin=(0, 0, 12), stride=(4, 0, 0)),),
        )
        pos = list(cfg.icon_positions(8))
        # Only 4 icons fit across the block; the rest fall outside.
        assert len(pos) == 4
        assert pos[0] == (0, (0, 0, 12))

    def test_inventory_modifier_from_universe_inventory(self):
        from aic_tpu.block import InventoryModifier, from_color
        from aic_tpu.universe.cursor import Inventory, PlaceBlock, Stack, inventory_modifier

        blk = from_color((0, 1, 0, 1), "item")
        inv = Inventory(slots=[Stack(PlaceBlock(blk), 3), None])
        mod = inventory_modifier(inv)
        assert isinstance(mod, InventoryModifier)
        assert mod.icons[0] is blk
        assert mod.icons[1] is None
