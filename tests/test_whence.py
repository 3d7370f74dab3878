"""WhenceUniverse provenance: document identity, save-back, drag-drop.

Reference: all-is-cubes/src/save/whence.rs:20 (trait + the `()` impl for
fresh universes), all-is-cubes-desktop/src/startup.rs:177 (load/save to
origin), winit.rs:506 (DroppedFile -> open).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from aic_tpu.block import from_color
from aic_tpu.io.whence import FileWhence, NoWhence, load_universe_file
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space
from aic_tpu.universe import Universe


def _mini_universe() -> Universe:
    u = Universe()
    sp = Space(GridAab.from_lower_size((0, 0, 0), (4, 3, 4)))
    sp.fill(
        GridAab.from_lower_size((0, 0, 0), (4, 1, 4)),
        from_color((0.5, 0.4, 0.3, 1.0), "ground"),
    )
    u.insert_space("world", sp)
    return u


class TestWhence:
    def test_fresh_universe_has_no_whence(self):
        u = Universe()
        assert isinstance(u.whence, NoWhence)
        assert u.whence.document_name() is None
        assert not u.whence.can_save() and not u.whence.can_load()
        with pytest.raises(ValueError):
            u.whence.save(u)
        with pytest.raises(ValueError):
            u.whence.load()

    def test_save_back_roundtrip_native(self, tmp_path):
        path = str(tmp_path / "doc.json")
        u = _mini_universe()
        u.whence = FileWhence(path)
        assert u.whence.document_name() == "doc.json"
        u.whence.save(u)
        assert os.path.exists(path)

        u2 = load_universe_file(path)
        assert isinstance(u2.whence, FileWhence)
        assert u2.whence.document_name() == "doc.json"
        assert set(u2.spaces) == {"world"}
        np.testing.assert_array_equal(
            np.asarray(u2.spaces["world"].contents),
            np.asarray(u.spaces["world"].contents),
        )
        # Edit + save back to the SAME origin, reload reflects the edit.
        u2.spaces["world"].set((1, 1, 1), from_color((1, 0, 0, 1), "red"))
        u2.whence.save(u2)
        u3 = load_universe_file(path)
        assert (
            u3.spaces["world"].palette[
                int(np.asarray(u3.spaces["world"].contents)[1, 1, 1])
            ].attributes.display_name
            == "red"
        )

    def test_load_alliscubesjson_sets_whence(self, tmp_path):
        from aic_tpu.io.import_ref import save_alliscubesjson

        path = str(tmp_path / "doc.alliscubesjson")
        save_alliscubesjson(_mini_universe(), path)
        u = load_universe_file(path)
        assert u.whence.can_save()
        u.whence.save(u)  # exercises format dispatch on save-back

    def test_session_save_and_open(self, tmp_path):
        from aic_tpu.apps.session import Session
        from aic_tpu.raytrace import Viewport

        path = str(tmp_path / "doc.json")
        u = _mini_universe()
        u.insert_character("player", "world", (2.0, 2.0, 2.0))
        s = Session(u, viewport=Viewport(32, 24))
        assert s.document_name() is None
        with pytest.raises(ValueError):
            s.save_universe()  # NoWhence -> error, not crash

        u.whence = FileWhence(path)
        assert s.save_universe() == "doc.json"

        s2 = Session(_mini_universe(), viewport=Viewport(32, 24))
        s2.open_universe_file(path)
        assert s2.document_name() == "doc.json"
        assert "world" in s2.universe.spaces


class TestWindowIntegration:
    def test_drop_file_opens_and_titles(self, tmp_path):
        pytest.importorskip("pygame")
        from aic_tpu.apps.session import Session
        from aic_tpu.apps.window import WindowMain
        from aic_tpu.raytrace import Viewport

        path = str(tmp_path / "dropped.json")
        u = _mini_universe()
        u.whence = FileWhence(path)
        u.whence.save(u)

        s = Session(_mini_universe(), viewport=Viewport(32, 24))
        s.enable_ui()
        with WindowMain(s) as wm:
            pg = wm.pg
            pg.event.post(pg.event.Event(pg.DROPFILE, file=path))
            wm.handle_events()
            assert s.document_name() == "dropped.json"
            assert "dropped.json" in pg.display.get_caption()[0]

    def test_ctrl_s_saves(self, tmp_path):
        pytest.importorskip("pygame")
        from aic_tpu.apps.session import Session
        from aic_tpu.apps.window import WindowMain
        from aic_tpu.raytrace import Viewport

        path = str(tmp_path / "save_target.json")
        u = _mini_universe()
        u.insert_character("player", "world", (2.0, 2.0, 2.0))
        u.whence = FileWhence(path)
        s = Session(u, viewport=Viewport(32, 24))
        s.enable_ui()
        with WindowMain(s) as wm:
            pg = wm.pg
            pg.event.post(
                pg.event.Event(
                    pg.KEYDOWN, key=pg.K_s, mod=pg.KMOD_CTRL, unicode="s"
                )
            )
            wm.handle_events()
        assert os.path.exists(path)
