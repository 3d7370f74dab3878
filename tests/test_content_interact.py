"""Content templates, cursor/tools, chunking, session tests."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.content import TEMPLATE_NAMES, TemplateParameters, build_template_space, build_universe
from aic_tpu.math.chunking import chunk_chart, chunks_near, cube_to_chunk
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space
from aic_tpu.universe import (
    Cursor,
    PlaceBlock,
    RemoveBlock,
    Universe,
    click,
    cursor_raycast,
)


class TestTemplates:
    @pytest.mark.parametrize(
        "name", [n for n in TEMPLATE_NAMES if n not in ("fail",)]
    )
    def test_builds_nonempty(self, name):
        sp = build_template_space(name, TemplateParameters(seed=1, size=32))
        assert sp.bounds.volume() > 0
        if name != "blank":
            assert (sp.contents != 0).sum() > 0
            assert sp.palette_len() > 1

    def test_fail_template(self):
        with pytest.raises(RuntimeError):
            build_template_space("fail")

    def test_seed_determinism(self):
        a = build_template_space("random", TemplateParameters(seed=7, size=16))
        b = build_template_space("random", TemplateParameters(seed=7, size=16))
        np.testing.assert_array_equal(a.contents, b.contents)

    def test_atrium_has_r16_blocks(self):
        sp = build_template_space("atrium", TemplateParameters())
        assert any(sp.evaluated(i).resolution == 16 for i in range(sp.palette_len()))

    def test_build_universe_spawns_character(self):
        u = build_universe("cornell-box", TemplateParameters(size=8))
        assert "player" in u.characters
        assert u.bodies is not None


class TestCursor:
    def space_with_block(self):
        sp = Space(GridAab.cube(8))
        sp.set((4, 2, 4), block.from_color((1, 0, 0, 1), "target"))
        return sp

    def test_cursor_hits_block(self):
        sp = self.space_with_block()
        cur = cursor_raycast(sp, (4.5, 2.5, 0.5), (0, 0, 1))
        assert cur is not None
        assert cur.cube == (4, 2, 4)
        from aic_tpu.math import faces

        assert cur.face == faces.NZ
        assert cur.preceding_cube == (4, 2, 3)

    def test_cursor_misses(self):
        sp = self.space_with_block()
        assert cursor_raycast(sp, (0.5, 7.5, 0.5), (0, 0, 1)) is None

    def test_cursor_respects_reach(self):
        sp = self.space_with_block()
        assert cursor_raycast(sp, (4.5, 2.5, 0.5), (0, 0, 1), max_distance=2.0) is None

    def test_click_remove_and_place(self):
        u = Universe()
        sp = self.space_with_block()
        u.insert_space("world", sp)
        ch = u.insert_character("player", "world", (4.0, 2.0, 1.0))

        cur = cursor_raycast(sp, (4.5, 2.5, 0.5), (0, 0, 1))
        ch.inventory_obj = None  # default inventory
        from aic_tpu.universe import free_editing_inventory

        ch.inventory_obj = free_editing_inventory()
        ch.inventory_obj.selected = 1  # RemoveBlock
        assert click(u, ch, cur, button=0)
        assert sp.block_at((4, 2, 4)) == block.AIR

        # Place a block back via PlaceBlock on the floor... place against
        # another block: re-add one.
        sp.set((4, 0, 4), block.from_color((0, 1, 0, 1), "floor"))
        cur = cursor_raycast(sp, (4.5, 3.5, 4.5), (0, -1, 0))
        assert cur.cube == (4, 0, 4)
        ch.inventory_obj.slots.append(PlaceBlock(block.from_color((0, 0, 1, 1), "placed")))
        ch.inventory_obj.selected = len(ch.inventory_obj.slots) - 1
        assert click(u, ch, cur, button=0)
        assert sp.block_at((4, 1, 4)).attributes.display_name == "placed"
        # Device state tracked it.
        st = u.get_state("world")
        assert int(np.asarray(st.contents)[4, 1, 4]) == sp.index_at((4, 1, 4))


class TestChunking:
    def test_chart_sorted_near_to_far(self):
        from aic_tpu.math.chunking import chunk_distance_squared_for_view

        chart = chunk_chart(3.0)
        nearest_sq, _ = chunk_distance_squared_for_view(chart)
        assert (np.diff(nearest_sq) >= 0).all()
        assert tuple(chart[0]) == (0, 0, 0)

    def test_chunks_near(self):
        out = list(chunks_near((2, 0, -1), 16.0))
        assert out[0] == (2, 0, -1)
        assert len(out) > 7

    def test_cube_to_chunk(self):
        assert cube_to_chunk((0, 0, 0)) == (0, 0, 0)
        assert cube_to_chunk((-1, 16, 31)) == (-1, 1, 1)


class TestSession:
    def test_session_frame(self):
        from aic_tpu.apps import Session
        from aic_tpu.raytrace import Viewport

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 0
        s = Session(u, viewport=Viewport(16, 16))
        s.input.keys.add("w")
        steps = s.maybe_step(now=100.0)
        assert steps >= 1
        r = s.render()
        assert r.data.shape == (16, 16, 4)


class TestExhibits:
    def test_all_exhibits_build_and_render(self):
        import numpy as np

        from aic_tpu.content.exhibits import EXHIBITS
        from aic_tpu.light import evaluate_light
        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport, render

        for e in EXHIBITS:
            sp = e.factory()
            assert (sp.contents != 0).any(), e.name
            st, _ = evaluate_light(sp.snapshot())
            opts = GraphicsOptions(lighting_display="flat", fog="none")
            cam = Camera(opts, Viewport(48, 32))
            lo = np.asarray(sp.bounds.lower, float)
            size = np.asarray(sp.bounds.size, float)
            if e.name == "Smallest":
                # The reference's SMALLEST exhibit is a single 1/128-block
                # voxel (exhibits/smallest.rs) — sub-pixel at the generic
                # framing, so frame it with a macro close-up instead.
                cam.look_at(lo + [0.5, 0.06, 0.62], lo + [0.5, 0.004, 0.5])
            else:
                cam.look_at(lo + size * [0.5, 1.2, 2.2], lo + size / 2)
            r = render(st, cam)
            assert r.data[..., :3].std() > 1.0, e.name  # not a blank frame

    def test_demo_city_contains_exhibits(self):
        from aic_tpu.content import demo_city

        sp = demo_city(seed=1, size=64)
        names = {
            getattr(sp.palette[i].primitive, "text", None)
            for i in range(sp.palette_len())
        }
        assert "Transparency" in names  # first exhibit's sign tiles exist


class TestBlockProvider:
    """linking.rs BlockProvider typed install/using."""

    def test_install_and_redefine_propagates(self):
        import numpy as np

        from aic_tpu.content.linking import BlockProvider
        from aic_tpu.math.grid import GridAab
        from aic_tpu.space import Space

        u = Universe()
        raw = BlockProvider(
            "demo",
            {
                "stone": block.from_color((0.5, 0.5, 0.5, 1.0), "stone"),
                "lamp": block.from_color((1.0, 1.0, 0.8, 1.0), "lamp"),
            },
        )
        installed = raw.install(u)
        sp = Space(GridAab.cube(4))
        sp.set((1, 1, 1), installed["stone"])
        u.insert_space("world", sp)
        ev = sp.evaluated_block_at((1, 1, 1))
        assert abs(float(ev.color[0]) - 0.5) < 1e-5

        # Redefinition through the BlockDef updates every placement.
        u.block_defs["demo/stone"].redefine(block.from_color((1.0, 0.0, 0.0, 1.0)))
        u.step()
        ev2 = u.spaces["world"].evaluated_block_at((1, 1, 1))
        assert float(ev2.color[0]) > 0.9

    def test_using_reports_missing(self):
        import pytest

        from aic_tpu.content.linking import BlockProvider, ProviderError

        u = Universe()
        BlockProvider("demo", {"a": block.from_color((1, 1, 1, 1))}).install(u)
        got = BlockProvider.using(u, "demo", ["a"])
        assert "a" in got
        with pytest.raises(ProviderError) as e:
            BlockProvider.using(u, "demo", ["a", "b", "c"])
        assert "demo/b" in str(e.value)


class TestContentHelpers:
    """alg.rs / clouds.rs / tree.rs helper library."""

    def test_voronoi_pattern(self):
        from aic_tpu.content.alg import voronoi_pattern

        pts = [((0.2, 0.2, 0.2), 1), ((0.8, 0.8, 0.8), 2)]
        ids = voronoi_pattern(8, pts)
        assert ids.shape == (8, 8, 8)
        assert ids[1, 1, 1] == 1 and ids[6, 6, 6] == 2
        assert set(np.unique(ids)) == {1, 2}
        # wrap: the corner across the torus is closer to the 0.8 seed
        assert voronoi_pattern(8, pts, wrap=True)[0, 0, 0] == 1

    def test_scale_color_quantizes(self):
        from aic_tpu.content.alg import scale_color

        b = block.from_color((0.5, 0.5, 0.5, 1.0))
        s1 = scale_color(b, 0.5001)
        s2 = scale_color(b, 0.5002)
        assert s1.primitive.color == s2.primitive.color
        assert abs(s1.primitive.color[0] - 0.25) < 0.01

    def test_clouds_fill_layer(self):
        from aic_tpu.content.alg import clouds

        sp = Space(GridAab.from_lower_size((0, 20, 0), (16, 2, 16)))
        clouds(sp, sp.bounds, density=0.3, seed=1)
        filled = (sp.contents != 0).sum()
        assert 0 < filled <= 16 * 16 * 2
        # semi-transparent blocks only
        for i in range(1, sp.palette_len()):
            assert sp.evaluated(i).color[3] < 1.0

    def test_make_tree(self):
        from aic_tpu.content.alg import make_tree

        sp = Space(GridAab.from_lower_size((0, 0, 0), (9, 12, 9)))
        make_tree(sp, (4, 0, 4), height=6)
        assert sp.index_at((4, 2, 4)) != 0  # trunk
        names = {
            sp.evaluated(i).attributes.display_name
            for i in range(1, sp.palette_len())
        }
        assert {"log", "leaves"} <= names

    def test_four_walls_cover_perimeter(self):
        from aic_tpu.content.alg import four_walls

        b = GridAab.from_lower_size((0, 0, 0), (5, 3, 7))
        walls = four_walls(b)
        assert len(walls) == 4
        cells = set()
        for origin, along, length, inward in walls:
            for i in range(length):
                c = tuple(np.asarray(origin) + np.asarray(along) * i)
                cells.add((c[0], c[2]))
        # Perimeter of a 5x7 footprint = 2*(5+7)-4 = 20 cells
        assert len(cells) == 20


def test_dungeon_has_inventory_chests():
    from aic_tpu.block import InventoryModifier

    sp = build_template_space("dungeon", TemplateParameters(seed=2, size=32))
    chests = [
        sp.palette[i]
        for i in range(sp.palette_len())
        if any(isinstance(m, InventoryModifier) for m in sp.palette[i].modifiers)
    ]
    assert chests, "dungeon should contain inventory chests"
    ev = sp.evaluated(sp.palette.index(chests[0]))
    assert ev.resolution == 16  # icons rendered the chest into voxels


class TestNewExhibits:
    """Semantics of the round-3 exhibits (city/exhibits/*.rs analogs)."""

    def test_animation_blocks_cycle_via_become(self):
        """animation.rs: the sweep/fire/blinker frames form CLOSED
        tick_action Become cycles (through BlockDef handles — evaluated
        attributes carry the actions, block_def.rs transparency)."""
        from aic_tpu.block import evaluate
        from aic_tpu.content.exhibits import animation_exhibit
        from aic_tpu.universe.op import Become

        sp = animation_exhibit()
        animated = [
            b
            for b in sp.palette
            if evaluate(b).attributes.tick_action is not None
        ]
        assert animated, "no animated blocks placed"
        for b in animated:
            # Follow the Become chain; it must return to the start
            # within a bounded number of hops (a closed cycle).
            cur = b
            for _ in range(16):
                act = evaluate(cur).attributes.tick_action
                assert isinstance(act, Become), (b, cur)
                nxt = act.block
                if nxt == b:
                    break
                cur = nxt
            else:
                raise AssertionError(f"Become chain of {b} never closes")

    def test_animation_cycle_steps_in_universe(self):
        """Placing the animated exhibit in a universe and stepping
        actually swaps frames (execute_tick_actions_system)."""
        import numpy as np

        from aic_tpu.content.exhibits import animation_exhibit
        from aic_tpu.universe import Universe

        sp = animation_exhibit()
        u = Universe()
        u.light_rounds_per_tick = 0
        u.insert_space("a", sp)
        seen = set()
        for _ in range(31):  # covers the blinker period (30)
            u.step()
            seen.add(sp.contents.tobytes())
        # SUSTAINED cycling: frames interned mid-run must keep ticking
        # (the action index covers palette entries added by commits).
        assert len(seen) > 2, f"animation stalled after {len(seen)} state(s)"

    def test_destruction_stages_chain_by_activation(self):
        from aic_tpu.content.exhibits import destruction_exhibit
        from aic_tpu.universe.op import Become

        sp = destruction_exhibit()
        staged = [b for b in sp.palette if b.attributes.activation_action]
        # width-1 stages carry an activation (the last has none).
        assert len(staged) == 6
        for b in staged:
            assert isinstance(b.attributes.activation_action, Become)

    def test_zoom_exhibit_magnifies_specimen(self):
        from aic_tpu.block import Zoom
        from aic_tpu.content.exhibits import zoom_exhibit

        sp = zoom_exhibit()
        zoomed = [
            b
            for b in sp.palette
            if any(isinstance(m, Zoom) for m in b.modifiers)
        ]
        assert zoomed
        # every placed cell's Zoom offset matches its grid position
        import numpy as np

        for cube in np.argwhere(sp.contents != 0):
            b = sp.palette[int(sp.contents[tuple(cube)])]
            (zm,) = [m for m in b.modifiers if isinstance(m, Zoom)]
            assert zm.offset == tuple(int(c) for c in cube)

    def test_knot_has_three_paints_and_solid_core(self):
        from aic_tpu.content.exhibits import knot_exhibit

        sp = knot_exhibit()
        # 3 stripe paints spread across many voxel blocks.
        assert sp.palette_len() > 10
        assert (sp.contents != 0).sum() >= 30

    def test_inventory_exhibit_renders_items_in_block(self):
        """inventory.rs: the filled tray's evaluated voxels contain the
        item icons (in-block inventory rendering)."""
        import numpy as np

        from aic_tpu.block import evaluate
        from aic_tpu.content.exhibits import inventory_exhibit

        sp = inventory_exhibit()
        filled = sp.block_at((1, 1, 1))
        empty = sp.block_at((3, 1, 1))
        ev_f = evaluate(filled)
        ev_e = evaluate(empty)
        # The filled tray shows strictly more non-air voxels (the icons).
        n_f = int((np.asarray(ev_f.voxels.color)[..., 3] > 0).sum())
        n_e = int((np.asarray(ev_e.voxels.color)[..., 3] > 0).sum())
        assert n_f > n_e

    def test_trees_and_elevator_and_glass_build(self):
        from aic_tpu.content.exhibits import (
            elevator_exhibit,
            transparency_structure_exhibit,
            trees_exhibit,
        )

        t = trees_exhibit()
        assert (t.contents != 0).sum() > 500  # grass + trunks + leaves
        e = elevator_exhibit()
        assert e.bounds.size[1] == 16
        g = transparency_structure_exhibit()
        # Glass exhibit holds semi-transparent palette entries.
        semi = [
            b
            for b in g.palette
            if getattr(b.primitive, "color", (0, 0, 0, 1))[3] not in (0.0, 1.0)
        ]
        assert semi


class TestRound3bExhibits:
    """Semantics of the second round-3 exhibit batch (chunking, collision,
    images, make_some_blocks, misc, smallest, ui — city/exhibits/*.rs)."""

    def test_chunking_exhibit_is_chart_shell(self):
        """chunking.rs: the visualization covers exactly the ChunkChart's
        offsets (shell only), symmetric about the origin chunk."""
        import numpy as np

        from aic_tpu.content.exhibits import chunking_exhibit
        from aic_tpu.math.chunking import ChunkChart

        sp = chunking_exhibit()
        offsets = ChunkChart(16.0 * 4.99, chunk_size=16).chunks()
        r = int(np.abs(offsets).max()) + 1
        filled = np.argwhere(np.asarray(sp.contents) != 0) - r
        chart_set = {tuple(o) for o in offsets.tolist()}
        for cube in filled:
            assert tuple(cube) in chart_set  # no block outside the chart
        # Mirror symmetry of the chart volume.
        for cube in filled:
            assert tuple(-cube) in chart_set

    def test_collision_exhibit_rotated_slabs(self):
        """collision.rs: the ring slots hold the same slab block under
        different rotations (distinct palette entries, same source)."""
        from aic_tpu.block.model import Rotate
        from aic_tpu.content.exhibits import collision_exhibit

        sp = collision_exhibit()
        rots = set()
        for i in range(sp.palette_len()):
            b = sp.palette[i]
            for m in b.modifiers:
                if isinstance(m, Rotate):
                    rots.add(m.rotation)
        assert len(rots) >= 4  # four facings + upside-down center

    def test_images_exhibit_rotations_differ(self):
        """images.rs: the four rotated image blocks evaluate to different
        voxel grids (rotation actually moved the image plane)."""
        import numpy as np

        from aic_tpu.block import evaluate
        from aic_tpu.content.exhibits import images_exhibit

        sp = images_exhibit()
        grids = []
        for cube in ((1, 1, 1), (3, 1, 1), (5, 1, 1), (7, 1, 1)):
            ev = sp.evaluated(int(sp.contents[tuple(np.subtract(cube, sp.bounds.lower))]))
            grids.append(np.asarray(ev.voxels.color[..., 3] > 0))
        for i in range(len(grids)):
            for j in range(i + 1, len(grids)):
                assert grids[i].shape == grids[j].shape
                assert (grids[i] != grids[j]).any(), (i, j)

    def test_images_transparent_pixels_are_air(self):
        """load_image.rs default_srgb: alpha-0 pixels become AIR."""
        import numpy as np

        from aic_tpu.content.alg import space_from_image
        from aic_tpu.math.grid import IDENTITY_ROTATION

        img = np.zeros((4, 4, 4), np.uint8)
        img[1:, :, :] = 255  # opaque white except the top row
        sp = space_from_image(img, IDENTITY_ROTATION)
        c = np.asarray(sp.contents)
        assert (c[:, 3, 0] == 0).all()  # top image row (y=3) → AIR
        assert (c[:, :3, 0] != 0).all()

    def test_make_some_blocks_distinct_and_labeled(self):
        """content.rs:46: n grayscale atoms named by index; voxel variant
        carries a drawn label (non-uniform voxel grid)."""
        import numpy as np

        from aic_tpu.block import evaluate
        from aic_tpu.content.testing import make_some_blocks, make_some_voxel_blocks

        atoms = make_some_blocks(5)
        assert len({a.primitive.color for a in atoms}) == 5
        assert [a.attributes.display_name for a in atoms] == list("01234")
        vb = make_some_voxel_blocks(2)
        ev = evaluate(vb[0])
        col = np.asarray(ev.voxels.color)
        assert col[..., 3].min() > 0  # fully opaque cube
        assert np.unique(col[..., 0]).size >= 2  # label drawn on body

    def test_smallest_exhibit_single_r128_voxel(self):
        """smallest.rs: exactly one solid voxel in an R128 grid."""
        import numpy as np

        from aic_tpu.block import evaluate
        from aic_tpu.content.exhibits import EXHIBITS, smallest_exhibit

        sp = smallest_exhibit()
        block = sp.palette[int(np.asarray(sp.contents).max())]
        ev = evaluate(block)
        assert ev.resolution == 128
        assert int((np.asarray(ev.voxels.color[..., 3]) > 0).sum()) == 1
        # Marked heavy: demo-city must skip it (Exhibit.heavy docstring).
        assert [e.heavy for e in EXHIBITS if e.name == "Smallest"] == [True]

    def test_ui_blocks_exhibit_has_icons_and_progress(self):
        """ui.rs: tool icons + widget furniture + progress bars landed."""
        import numpy as np

        from aic_tpu.content.exhibits import ui_blocks_exhibit

        sp = ui_blocks_exhibit()
        names = set()
        for i in range(sp.palette_len()):
            names.add(sp.palette[i].attributes.display_name)
        assert "progress" in names
        assert any("button" in (n or "") for n in names)
        assert (np.asarray(sp.contents) != 0).sum() > 10
