"""VUI framework + voxel text tests (reference: ui/src/vui, block/text.rs)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block.model import Block, BlockAttributes, TextPrimitive
from aic_tpu.text.font import measure_text, rasterize_text, text_tile_count
from aic_tpu.universe.cursor import free_editing_inventory
from aic_tpu.vui import (
    Button,
    Column,
    Label,
    Leaf,
    Row,
    build_hud,
    layout_size,
    main_menu_page,
    pause_page,
    realize,
    ui_camera,
)


class TestFont:
    def test_rasterize_nonempty(self):
        m = rasterize_text("Hi")
        assert m.any() and m.shape[0] >= 5

    def test_wider_text_wider_raster(self):
        _, w1 = measure_text("i")
        _, w2 = measure_text("mmmm")
        assert w2 > w1

    def test_tile_count_grows(self):
        assert text_tile_count("A", 16) <= text_tile_count("A long label", 16)


class TestTextBlock:
    def test_text_block_has_glyph_voxels(self):
        b = Block(
            TextPrimitive(text="A", resolution=16),
            BlockAttributes(display_name="A"),
        )
        ev = block.evaluate(b)
        solid = np.asarray(ev.voxels.color[..., 3] > 0)
        assert solid.any(), "glyph voxels present"
        assert not solid.all(), "glyph does not fill the block"
        # Glyphs live on the front (z=0) slab only (depth=1 default).
        assert not solid[:, :, 1:].any()

    def test_empty_text_is_invisible(self):
        b = Block(TextPrimitive(text="", resolution=16), BlockAttributes())
        ev = block.evaluate(b)
        assert not np.asarray(ev.voxels.color[..., 3] > 0).any()


class TestLayout:
    def test_row_and_column_sizes(self):
        a = Leaf(Label("ab"))
        b = Leaf(Label("c"))
        row = Row([a, b], gap=1)
        w, h = layout_size(row)
        assert w == layout_size(a)[0] + layout_size(b)[0] + 1
        assert h == 1
        col = Column([a, b], gap=2)
        assert layout_size(col) == (max(layout_size(a)[0], layout_size(b)[0]), 4)

    def test_realize_draws_disjoint(self):
        from aic_tpu.math.grid import GridAab
        from aic_tpu.space.space import Space

        sp = Space(GridAab.from_lower_size((0, 0, 0), (24, 8, 3)))
        tree = Column([Leaf(Button("Go")), Leaf(Button("Stop"))])
        realize(tree, sp, (1, 1, 0))
        assert int((np.asarray(sp.contents) != 0).sum()) > 4


class TestHud:
    def test_build_hud_draws_toolbar_and_crosshair(self):
        inv = free_editing_inventory()
        space, widgets = build_hud(inv)
        st = space.snapshot()
        contents = np.asarray(st.contents)
        assert (contents != 0).sum() >= 10  # slots + crosshair + tooltip

    def test_pause_and_menu_pages_build(self):
        assert np.asarray(pause_page().snapshot().contents).any()
        page = main_menu_page(["blank", "demo-city"])
        assert np.asarray(page.snapshot().contents).any()

    def test_ui_camera_frames_plane(self):
        from aic_tpu.raytrace import Viewport

        inv = free_editing_inventory()
        space, _ = build_hud(inv)
        cam = ui_camera(space, Viewport(64, 48))
        o, d = cam.pixel_rays()
        assert o.shape == (48, 64, 3)


class TestSessionUi:
    def test_render_with_ui_composites(self):
        from aic_tpu.apps.session import Session
        from aic_tpu.content.template import build_universe

        u = build_universe("blank")
        s = Session(u, viewport=__import__("aic_tpu.raytrace", fromlist=["Viewport"]).Viewport(64, 48))
        base = s.render().data.copy()
        s.enable_ui()
        with_ui = s.render_with_ui().data
        assert with_ui.shape == base.shape
        assert (with_ui != base).any(), "UI layer changes the frame"

    def test_menu_template_builds_universe(self):
        from aic_tpu.content.template import build_universe

        u = build_universe("menu")
        st = u.get_state("world")
        assert np.asarray(st.contents).any()


class TestUiClicks:
    def test_pause_page_buttons_clickable(self):
        """Clicking Resume on the pause page unpauses; the menu template's
        buttons swap the universe (vui_manager click dispatch)."""
        import numpy as np

        from aic_tpu.apps.session import Session
        from aic_tpu.content.template import build_universe
        from aic_tpu.raytrace import Viewport

        s = Session(build_universe("blank"), viewport=Viewport(96, 72))
        s.enable_ui()
        s.paused = True
        # Find the Resume button's pixel by scanning the pause page actions:
        # project each action region's center through the pause camera.
        space = s._pause_space
        cam = s._pause_camera
        actions = {a: r for r, a in getattr(space, "ui_actions", [])}
        assert "resume" in actions and "quit" in actions
        r = actions["resume"]
        center = np.array(
            [l + sz / 2.0 for l, sz in zip(r.lower, r.size)]
        )
        # Project world point to pixel: use the camera matrices inversely
        # by sampling pixel rays and picking the closest-direction pixel.
        o, d = cam.pixel_rays()
        o = np.asarray(o); d = np.asarray(d)
        to_c = center[None, None, :] - o
        to_c /= np.linalg.norm(to_c, axis=-1, keepdims=True)
        dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
        align = (to_c * dn).sum(-1)
        y, x = np.unravel_index(np.argmax(align), align.shape)
        action = s.click(x, y)
        assert action == "resume"
        assert not s.paused

    def test_world_click_fallthrough(self):
        """With no UI hit, clicks fall through to the world tool path."""
        from aic_tpu import block
        from aic_tpu.apps.session import Session
        from aic_tpu.content.template import build_universe
        from aic_tpu.raytrace import Viewport
        from aic_tpu.universe.cursor import Inventory, RemoveBlock

        import numpy as np

        u = build_universe("dungeon")
        s = Session(u, viewport=Viewport(96, 72))
        ch = s.character
        ch.inventory_obj = Inventory(slots=[RemoveBlock()])
        # Click the center pixel (no UI enabled → straight to world).
        result = s.click(48, 36)
        assert result in (True, False)  # dispatched without error


class TestNotifications:
    """Notification channel (ui_content/notification.rs) + HUD display."""

    def test_hub_lifecycle(self):
        import gc

        from aic_tpu.vui.notification import NotificationHub, ProgressContent

        hub = NotificationHub()
        n = hub.show(ProgressContent("Loading", 0.25))
        assert hub.count() == 1
        assert hub.primary().title == "Loading"
        n.set_content(ProgressContent("Loading", 0.9, "almost"))
        assert hub.primary().fraction == 0.9
        del n
        gc.collect()
        assert hub.count() == 0
        assert hub.primary() is None

    def test_dismiss_and_overflow(self):
        import pytest

        from aic_tpu.vui.notification import NotificationHub, ProgressContent

        hub = NotificationHub()
        keep = [hub.show(ProgressContent(f"n{i}", 0.0)) for i in range(hub.LIMIT)]
        with pytest.raises(OverflowError):
            hub.show(ProgressContent("extra", 0.0))
        keep[0].dismiss()
        replacement = hub.show(ProgressContent("replacement", 0.0))
        assert hub.count() == hub.LIMIT
        assert replacement.content.title == "replacement"

    def test_session_shows_notification_in_hud(self):
        import numpy as np

        from aic_tpu.apps import Session
        from aic_tpu.content import TemplateParameters, build_universe
        from aic_tpu.raytrace import Viewport

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 0
        s = Session(u, viewport=Viewport(16, 16))
        s.enable_ui()
        before = np.asarray(s.ui_state.contents).copy()
        note = s.show_notification("Saving", 0.5)
        s.refresh_ui()
        after = np.asarray(s.ui_state.contents)
        assert (before != after).any()  # progress bar + text appeared
        note.dismiss()
        s.refresh_ui()
        cleared = np.asarray(s.ui_state.contents)
        y = s.ui_space.bounds.size[1] - 2
        assert (cleared[:, y, 0] == 0).all()


class TestSessionCursorOverlay:
    def test_cursor_highlight_and_info_text(self):
        import numpy as np

        from aic_tpu.apps import Session
        from aic_tpu.content import TemplateParameters, build_universe
        from aic_tpu.raytrace import Viewport

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 0
        s = Session(u, viewport=Viewport(32, 32))
        s.debug_cursor = True
        cur = s.update_cursor()
        r = s.render()
        assert "fps" in s.info_text
        if cur is not None:
            white = (r.data[..., :3] == 255).all(-1)
            assert white.any()


class TestInputBindings:
    def test_default_and_rebind(self):
        import numpy as np

        from aic_tpu.apps.session import InputState

        inp = InputState()
        inp.keys = {"w"}
        assert tuple(inp.movement()) == (0, 0, -1)
        assert inp.command("p") == ("pause", None)
        assert inp.command("3") == ("slot", 2)
        # Rebind movement to arrow-style key.
        inp.rebind("i", "move", (0, 0, -1))
        inp.rebind("w", "pause")
        inp.keys = {"i"}
        assert tuple(inp.movement()) == (0, 0, -1)
        inp.keys = {"w"}
        assert np.linalg.norm(inp.movement()) == 0
        assert inp.command("w") == ("pause", None)


def test_session_renders_without_character():
    """error_character_gone (cases lib.rs:434): after the character and
    its space are deleted, draw succeeds with no data + a flaw."""
    from aic_tpu.apps import Session
    from aic_tpu.content import TemplateParameters, build_universe
    from aic_tpu.raytrace import Viewport

    u = build_universe("cornell-box", TemplateParameters(size=8))
    u.light_rounds_per_tick = 0
    s = Session(u, viewport=Viewport(8, 8))
    r1 = s.render()
    assert r1.data.any()
    del u.characters["player"]
    r2 = s.render()
    assert r2.data.shape == (8, 8, 4)
    assert not r2.data.any()
    assert "NO_CHARACTER" in r2.flaws


class TestWidgetControllers:
    """Incremental VUI updates (widget_trait.rs:58-89 WidgetController,
    vui_manager.rs step loop): changes commit per-cell transactions to
    the existing device state instead of redrawing/re-snapshotting."""

    def _session(self):
        from aic_tpu.apps import Session
        from aic_tpu.content import TemplateParameters, build_universe
        from aic_tpu.raytrace import Viewport

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 0
        s = Session(u, viewport=Viewport(16, 16))
        s.enable_ui()
        return s

    def test_step_without_changes_is_noop(self):
        s = self._session()
        state_before = s.hud.state
        assert s.hud.step(s) is False
        # The device state object is untouched (no commit, no snapshot).
        assert s.hud.state is state_before

    def test_slot_selection_updates_only_toolbar_cells(self):
        s = self._session()
        before = np.asarray(s.ui_state.contents).copy()
        state_before = s.hud.state
        s.select_slot(3)
        after = np.asarray(s.ui_state.contents)
        changed = np.argwhere(before != after)
        assert len(changed) > 0  # highlight moved
        # Only toolbar-row cells (y in {0,1} band at the toolbar origin)
        # changed — not the whole UI space.
        assert len(changed) <= 8, changed
        assert set(int(c[1]) for c in changed) <= {0, 1}
        # And the state advanced by transaction commit, not re-snapshot:
        # untouched planes are byte-identical.
        assert s.hud.state is not state_before

    def test_second_step_same_fingerprint_noop(self):
        s = self._session()
        s.select_slot(2)
        assert s.hud.step(s) is False

    def test_notification_row_via_controller(self):
        s = self._session()
        note = s.show_notification("Build", 0.25)
        assert s.hud.step(s) is True
        y = s.ui_space.bounds.size[1] - 2
        row = np.asarray(s.ui_state.contents)[:, y, 0]
        assert (row != 0).any()
        # Progress advance changes the row again (fingerprint includes
        # fraction; notification.rs:111 set_content).
        from aic_tpu.vui.notification import ProgressContent

        note.set_content(ProgressContent("Build", 0.75))
        assert s.hud.step(s) is True
        note.dismiss()
        assert s.hud.step(s) is True
        row = np.asarray(s.ui_state.contents)[:, y, 0]
        assert (row == 0).all()

    def test_hud_steps_with_universe(self):
        """maybe_step drives controllers (vui_manager steps per frame)."""
        s = self._session()
        note = s.show_notification("Tick", 0.1)  # held: hub refs are weak
        s.maybe_step(now=1e9)
        y = s.ui_space.bounds.size[1] - 2
        assert (np.asarray(s.ui_state.contents)[:, y, 0] != 0).any()

    def test_custom_animated_controller(self):
        """An animated widget: fingerprint includes a clock phase, so the
        widget re-renders on schedule (widget_trait step(Tick) analog)."""
        from aic_tpu.vui.controller import WidgetController
        from aic_tpu.vui.widgets import ProgressBar

        s = self._session()

        class Pulse:
            phase = 0

            def draw(self, space, lower):
                ProgressBar(fraction=(self.phase % 4) / 4.0, width=4).draw(
                    space, lower
                )

        pulse = Pulse()
        ctl = s.hud.add_controller(
            pulse, (0, 2, 0), lambda _s: pulse.phase
        )
        assert s.hud.step(s) is True  # initial draw
        assert s.hud.step(s) is False  # same phase: no-op
        pulse.phase = 1
        assert s.hud.step(s) is True  # re-rendered on phase change


class TestInputProcessorRichness:
    """input.rs InputProcessor semantics beyond the binding table."""

    def test_momentary_key_decays(self):
        from aic_tpu.apps.session import MOMENTARY_HOLD_S, InputState

        inp = InputState()
        inp.key_momentary("w")
        assert "w" in inp.keys
        inp.step(MOMENTARY_HOLD_S / 2)
        assert "w" in inp.keys  # still virtually held
        inp.step(MOMENTARY_HOLD_S)
        assert "w" not in inp.keys  # released by timeout (input.rs:154)

    def test_focus_loss_clears_state(self):
        from aic_tpu.apps.session import InputState

        inp = InputState()
        inp.key_down("w")
        inp.mouselook_delta(10, 0)
        inp.key_focus(False)
        assert not inp.keys and inp.turn_buffer == [0.0, 0.0]
        inp.key_down("a")  # ignored while unfocused
        assert not inp.keys
        inp.key_focus(True)
        inp.key_down("a")
        assert "a" in inp.keys

    def test_arrow_turning_rate(self):
        from aic_tpu.apps.session import TURN_RATE_DEG_S, InputState

        inp = InputState()
        inp.key_down("left")
        dyaw, dpitch = inp.take_turning(1 / 60)
        assert dyaw == pytest.approx(TURN_RATE_DEG_S / 60)
        assert dpitch == 0.0

    def test_mouselook_buffer_consumed_once(self):
        from aic_tpu.apps.session import MOUSELOOK_SCALE, InputState

        inp = InputState()
        inp.mouselook_delta(50, -20)
        dyaw, dpitch = inp.take_turning(1 / 60)
        assert dyaw == pytest.approx(-50 * MOUSELOOK_SCALE)
        assert dpitch == pytest.approx(20 * MOUSELOOK_SCALE)
        assert inp.take_turning(1 / 60) == (0.0, 0.0)  # drained
