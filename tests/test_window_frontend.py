"""Window frontend (apps/window.py) driven headlessly through SDL's dummy
video driver: the same event loop a real window runs (winit.rs:334-440
analog), fed synthetic pygame events."""

import os
import time

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

from aic_tpu.apps.session import Session
from aic_tpu.apps.window import WindowMain
from aic_tpu.content import cornell_box
from aic_tpu.raytrace import GraphicsOptions, Viewport
from aic_tpu.universe import Universe


def make_session(w=64, h=48):
    sp = cornell_box(16)
    u = Universe()
    u.insert_space("world", sp)
    u.states["world"] = sp.snapshot()
    # Free space: (8, 8, 8) is inside the cornell box's inner block and
    # collision push-out would masquerade as key movement.
    u.insert_character("player", "world", (14.0, 8.0, 8.0))
    opts = GraphicsOptions(lighting_display="none", fog="none", transparency="surface")
    s = Session(u, viewport=Viewport(w, h), options=opts)
    s.enable_ui()
    return s


@pytest.fixture
def window():
    s = make_session()
    wm = WindowMain(s, title="test")
    with wm:
        yield wm


def post_key(code, down=True, unicode=""):
    pygame.event.post(
        pygame.event.Event(
            pygame.KEYDOWN if down else pygame.KEYUP, key=code, unicode=unicode
        )
    )


def test_frame_renders_and_presents(window):
    frame = window.frame(time.monotonic())
    assert frame.shape == (48, 64, 4)
    assert frame[..., :3].std() > 1.0  # not flat
    assert window.frames == 1


def test_key_state_moves_character(window):
    s = window.session
    i = s.character.body_index
    # Fly so gravity doesn't dominate; settle one frame (so collision
    # push-out can't masquerade as movement), then hold "w".
    now = time.monotonic()
    post_key(pygame.K_f)
    window.frame(now)
    start = np.asarray(s.universe.bodies.position)[i].copy()
    post_key(pygame.K_w)
    for k in range(8):
        window.frame(now + (k + 1) * (1 / 30.0))
    assert "w" in s.input.keys
    moved = np.asarray(s.universe.bodies.position)[i] - start
    assert abs(moved[2]) > 0.05  # forward is along -z at yaw 0
    post_key(pygame.K_w, down=False)
    window.frame(now + 10 * (1 / 30.0))
    assert "w" not in s.input.keys


def test_capture_and_mouselook(window):
    s = window.session
    i = s.character.body_index
    yaw0 = float(np.asarray(s.universe.bodies.yaw)[i])
    # A click on the sky captures the pointer (no UI, no world hit action).
    pygame.event.post(
        pygame.event.Event(pygame.MOUSEBUTTONDOWN, pos=(2, 2), button=1)
    )
    window.frame(time.monotonic())
    assert window.captured
    pygame.event.post(
        pygame.event.Event(pygame.MOUSEMOTION, pos=(32, 24), rel=(50, -20))
    )
    window.frame(time.monotonic())
    yaw1 = float(np.asarray(s.universe.bodies.yaw)[i])
    pitch1 = float(np.asarray(s.universe.bodies.pitch)[i])
    # Yaw wraps into [0, 360) (input.rs apply_input rem_euclid).
    assert yaw1 == pytest.approx((yaw0 - 50 * 0.2) % 360.0, abs=1e-6)
    assert pitch1 == pytest.approx(20 * 0.2, abs=1e-6)
    # Esc releases capture without pausing.
    post_key(pygame.K_ESCAPE)
    window.frame(time.monotonic())
    assert not window.captured
    assert not s.paused


def test_escape_pauses_then_quit(window):
    s = window.session
    post_key(pygame.K_ESCAPE)
    window.frame(time.monotonic())
    assert s.paused
    post_key(pygame.K_q, unicode="q")
    window.frame(time.monotonic())
    assert s.quit_requested


def test_captured_click_edits_world(window):
    """While captured, a click dispatches the selected tool at the
    crosshair (character.rs:307 Character::click)."""
    s = window.session
    window._set_capture(True)
    s.select_slot(1)  # RemoveBlock in the free-editing starter inventory
    s.set_look(0.0, -85.0)  # aim nearly straight down at the cornell floor
    world = s.universe.spaces["world"]
    before = np.asarray(world.snapshot().contents).copy()
    pygame.event.post(
        pygame.event.Event(pygame.MOUSEBUTTONDOWN, pos=(32, 24), button=1)
    )
    window.frame(time.monotonic())
    after = np.asarray(world.snapshot().contents)
    assert (before != after).any()  # removed (or placed) a block


def test_quit_event_ends_loop(window):
    pygame.event.post(pygame.event.Event(pygame.QUIT))
    window.frame(time.monotonic())
    assert window.session.quit_requested
