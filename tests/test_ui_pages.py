"""UI pages + page navigation (reference: all-is-cubes-ui/src/vui/page.rs,
ui_content/pages.rs:26-235, ui_content/settings.rs).

Covers the page set the reference ships (paused, settings, about,
progress, message), the VuiPageState navigation stack semantics, the
settings-page binding to the Settings store, and session-level click /
escape / render integration.
"""

import numpy as np
import pytest

from aic_tpu.apps.session import Session
from aic_tpu.apps.settings import Settings
from aic_tpu.content.template import build_universe
from aic_tpu.raytrace import Viewport
from aic_tpu.vui.notification import NotificationHub, ProgressContent
from aic_tpu.vui.page import (
    SETTING_CYCLES,
    PageStack,
    build_about_page,
    build_message_page,
    build_paused_page,
    build_progress_page,
    build_settings_page,
    cycle_setting,
)


def _actions(space):
    return {a: r for r, a in getattr(space, "ui_actions", [])}


def _pixel_for(cam, region):
    """Pixel whose ray points closest at the region center (same
    projection trick as test_vui.TestUiClicks)."""
    center = np.array([l + sz / 2.0 for l, sz in zip(region.lower, region.size)])
    o, d = cam.pixel_rays()
    o = np.asarray(o)
    d = np.asarray(d)
    to_c = center[None, None, :] - o
    to_c /= np.linalg.norm(to_c, axis=-1, keepdims=True)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    y, x = np.unravel_index(np.argmax((to_c * dn).sum(-1)), d.shape[:2])
    return x, y


class TestPageBuilders:
    def test_paused_page_has_reference_buttons(self):
        """pages.rs:26 new_paused_page carries About/Settings open-page
        buttons plus resume and quit."""
        acts = _actions(build_paused_page().space)
        assert {"resume", "quit", ("open", "about"), ("open", "settings")} <= set(
            acts
        )

    def test_settings_page_lists_every_cycle(self):
        acts = _actions(build_settings_page(Settings()).space)
        for name in SETTING_CYCLES:
            assert ("setting", name) in acts
        assert "back" in acts

    def test_about_page_builds_nonempty(self):
        page = build_about_page()
        assert np.asarray(page.snapshot().contents).any()
        assert "back" in _actions(page.space)

    def test_progress_page_shows_primary(self):
        hub = NotificationHub()
        hub.show(ProgressContent("Baking", 0.5, "city"))
        page = build_progress_page(hub)
        assert np.asarray(page.snapshot().contents).any()

    def test_message_page_builds(self):
        page = build_message_page("Saved.\nAll good")
        assert np.asarray(page.snapshot().contents).any()
        assert "back" in _actions(page.space)


class TestSettingCycle:
    def test_cycle_advances_and_wraps(self):
        s = Settings()
        seen = [s.graphics_options().fog]
        for _ in range(len(SETTING_CYCLES["fog"])):
            cycle_setting(s, "fog")
            seen.append(s.graphics_options().fog)
        assert seen[-1] == seen[0]  # full cycle wraps
        assert len(set(seen[:-1])) == len(SETTING_CYCLES["fog"])

    def test_cycle_bool_toggle(self):
        s = Settings()
        before = s.graphics_options().antialiasing
        cycle_setting(s, "antialiasing")
        assert s.graphics_options().antialiasing is not before


class TestPageStack:
    def test_open_back_depth(self):
        st = PageStack(settings=Settings(), notifications=NotificationHub())
        assert st.current() is None
        st.open("paused")
        st.open("settings")
        assert st.depth == 2 and st.current().id == "settings"
        assert st.back() and st.current().id == "paused"
        assert st.back() and st.current() is None
        assert not st.back()

    def test_reopen_moves_to_top(self):
        st = PageStack(settings=Settings(), notifications=NotificationHub())
        st.open("paused")
        st.open("about")
        st.open("paused")
        assert st.depth == 2 and st.current().id == "paused"

    def test_invalidate_rebuilds(self):
        settings = Settings()
        st = PageStack(settings=settings, notifications=NotificationHub())
        p1 = st.page("settings")
        cycle_setting(settings, "fog")
        st.invalidate("settings")
        assert st.page("settings") is not p1


class TestSessionPages:
    def _session(self):
        s = Session(build_universe("blank"), viewport=Viewport(96, 72))
        s.enable_ui()
        return s

    def test_pause_opens_page_resume_clears(self):
        s = self._session()
        s.paused = True
        assert s.pages.current().id == "paused"
        s.paused = False
        assert s.pages.current() is None

    def test_escape_back_unpauses_at_bottom(self):
        s = self._session()
        s.paused = True
        s.pages.open("about")
        s.back()
        assert s.paused and s.pages.current().id == "paused"
        s.back()
        assert not s.paused and s.pages.current() is None

    def test_click_open_settings_then_cycle(self):
        """Full navigation: click Settings on the pause page, then click a
        setting toggle — the stored option changes and the page rebuilds
        with the new label."""
        s = self._session()
        s.paused = True
        page = s.pages.current()
        x, y = _pixel_for(
            page.camera(s.camera.viewport), _actions(page.space)[("open", "settings")]
        )
        assert s.click(x, y) == ("open", "settings")
        page = s.pages.current()
        assert page.id == "settings"
        before = s.options.fog
        x, y = _pixel_for(
            page.camera(s.camera.viewport), _actions(page.space)[("setting", "fog")]
        )
        assert s.click(x, y) == ("setting", "fog")
        assert s.options.fog != before
        assert s.settings.graphics_options().fog == s.options.fog
        # The rebuilt page shows the new value in its label blocks.
        assert s.pages.current() is not page

    def test_message_page_via_show_message(self):
        s = self._session()
        s.show_message("hello world")
        assert s.pages.current().id == "message"
        s.back()
        assert s.pages.current() is None

    def test_render_with_ui_shows_top_page(self):
        """The composited frame differs between HUD and an open page."""
        s = self._session()
        hud_frame = np.asarray(s.render_with_ui().data, np.int32)
        s.paused = True
        page_frame = np.asarray(s.render_with_ui().data, np.int32)
        assert np.abs(hud_frame - page_frame).max() > 0

    def test_settings_survive_via_store_roundtrip(self, tmp_path):
        """Settings mutated through the page persist through the store
        (settings/serialize.rs save/load path)."""
        path = str(tmp_path / "settings.json")
        s = self._session()
        s.settings.path = path
        cycle_setting(s.settings, "fog")
        loaded = Settings.load(path)
        assert loaded.graphics_options().fog == s.settings.graphics_options().fog
