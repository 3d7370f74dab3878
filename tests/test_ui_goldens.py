"""Session/UI renderer conformance vs the reference's golden images.

Ports the session-half of test-renderers/cases/src/lib.rs: cursor overlay
(cursor_basic), layer compositing (layers_*), info-text raster
(info_text), renderer follow/error semantics (follow_*, error_*,
no_update, viewport_zero). The scene-half lives in
test_reference_goldens.py; comparison helpers are shared from there.

These cases exercise `aic_tpu.raytrace.renderer` (StandardCameras /
RtRenderer / Overlays) — the analog of the reference's stdcam.rs +
renderer.rs + headless.rs stack.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace import GraphicsOptions, Viewport
from aic_tpu.raytrace.renderer import (
    CharacterSource,
    RenderError,
    RtRenderer,
    StandardCameras,
    UiViewState,
)
from aic_tpu.space import Sky, Space, SpacePhysics
from aic_tpu.universe import Universe

from test_reference_goldens import VIEWPORT, compare, lin, unaltered


def one_cube_space(fill=None) -> Space:
    """cases lib.rs:1239 one_cube_space + looking_at_one_cube_spawn."""
    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
        physics=SpacePhysics(sky=Sky.uniform((0.5, 0.5, 0.5))),
    )
    sp.set((0, 0, 0), fill or block.from_color(lin(0, 1, 0)))
    sp.spawn_eye_position = (0.5, 0.5, 2.0)
    sp.spawn_look_direction = (0.0, 0.0, -1.0)
    # The reference's Space::builder initializes the light field at build
    # time (initialize_light, updater.rs:631); fast path for our Space:
    sp.fast_evaluate_light()
    return sp


def finish_universe_from_space(sp: Space) -> Universe:
    """cases lib.rs finish_universe_from_space: insert as "space" plus a
    default character."""
    u = Universe()
    u.insert_space("space", sp)
    center = tuple(l + s / 2 for l, s in zip(sp.bounds.lower, sp.bounds.size))
    u.insert_character("player", "space", sp.spawn_position or center)
    return u


def ui_space_state():
    """cases lib.rs:1260 ui_space: single green cube at (-3,-3,-4),
    light physics None, deliberately-wrong sky."""
    sp = Space(
        GridAab.from_lower_size((-3, -3, -4), (1, 1, 1)),
        physics=SpacePhysics(
            sky=Sky.uniform((1.0, 1.0, 0.5)), light_enabled=False
        ),
    )
    sp.set((-3, -3, -4), block.from_color(lin(0, 1, 0)))
    return sp.snapshot(), sp


# --- cursor -------------------------------------------------------------------


def test_cursor_basic():
    """cases lib.rs:255 cursor_basic: project_cursor at NDC origin, draw
    the cursor wireframe (the goldens pin the wgpu line drawing; the
    reference's own CPU raytracer only reports Flaws::NO_CURSOR)."""
    sp = one_cube_space()
    u = finish_universe_from_space(sp)
    opts = dataclasses.replace(unaltered(), lighting_display="linear")
    cameras = StandardCameras.from_constant_for_test(opts, VIEWPORT, u)
    cursor = cameras.project_cursor((0.0, 0.0))
    assert cursor is not None, "project_cursor() unexpectedly missed"
    assert cursor.cube == (0, 0, 0)

    renderer = RtRenderer(cameras)
    renderer.update(cursor=cursor)
    r = renderer.draw("")
    compare("cursor_basic", r, [(3, 0)])


# --- layers -------------------------------------------------------------------


def _layers_all_render(show_ui: bool):
    sp = one_cube_space()
    u = finish_universe_from_space(sp)
    opts = dataclasses.replace(
        unaltered(), lighting_display="flat", show_ui=show_ui
    )
    ui_state, _ = ui_space_state()
    cameras = StandardCameras(
        opts,
        VIEWPORT,
        CharacterSource(u, "player"),
        UiViewState(state=ui_state, graphics_options=opts),
    )
    renderer = RtRenderer(cameras)
    renderer.update()
    return renderer.draw("hello world")


def test_layers_all():
    compare("layers_all", _layers_all_render(show_ui=True), [(3, 0)])


def test_layers_hidden_ui():
    compare("layers_hidden_ui", _layers_all_render(show_ui=False), [(3, 0)])


def test_layers_none_but_text():
    """No world, no UI, but info text (threshold 0 in the reference)."""
    cameras = StandardCameras(unaltered(), VIEWPORT, None, None)
    renderer = RtRenderer(cameras)
    renderer.update()
    compare("layers_none_but_text", renderer.draw("hello world"), [(1, 0)])


def test_layers_ui_only():
    ui_state, _ = ui_space_state()
    cameras = StandardCameras(
        unaltered(), VIEWPORT, None, UiViewState(state=ui_state)
    )
    renderer = RtRenderer(cameras)
    renderer.update()
    compare("layers_ui_only", renderer.draw("hello world"), [(1, 0)])


# --- info text ----------------------------------------------------------------

INFO_TEXT = (
    "/\\/\\/\\/\\/\\/\\/\\/\\\n"
    "| Hello·world. |\n"
    "| Info text    |\n"
    "| test Nº 1.   |\n"
    "+--------------+--------\n"
    "¦\n¦\n¦\n¦\n¦\n"
)


@pytest.mark.parametrize("scale", [1.0, 1.5, 2.0])
def test_info_text(scale):
    """cases lib.rs:667 info_text: empty space with orange sky; the text
    is drawn at framebuffer scale (the reference does not scale glyphs)."""
    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
        physics=SpacePhysics(sky=Sky.uniform((1.0, 0.5, 0.0))),
    )
    u = finish_universe_from_space(sp)
    viewport = Viewport(int(128 * scale), int(96 * scale))
    cameras = StandardCameras.from_constant_for_test(unaltered(), viewport, u)
    renderer = RtRenderer(cameras)
    renderer.update()
    name = {1.0: "info_text-1.0", 1.5: "info_text-1.5", 2.0: "info_text-2.0"}[scale]
    compare(name, renderer.draw(INFO_TEXT), [(3, 0)])


# --- renderer error / robustness ---------------------------------------------


def test_no_update():
    """cases lib.rs:988 no_update: draw() before update() produces the
    NO_WORLD fill and an INVOCATION flaw; a later update recovers."""
    sp = one_cube_space()
    u = finish_universe_from_space(sp)
    cameras = StandardCameras.from_constant_for_test(unaltered(), VIEWPORT, u)
    renderer = RtRenderer(cameras)
    r1 = renderer.draw("")
    assert "INVOCATION" in r1.flaws
    compare("no_update", r1, [(6, 0)])
    renderer.update()
    compare("no_update-2", renderer.draw(""), [(6, 0)])


def test_error_character_gone():
    """cases lib.rs:434: delete the character + space after a first
    frame; update() may fail with a gone error, draw() still succeeds."""
    sp = one_cube_space()
    u = finish_universe_from_space(sp)
    cameras = StandardCameras.from_constant_for_test(unaltered(), VIEWPORT, u)
    renderer = RtRenderer(cameras)
    renderer.update()
    first = renderer.draw("")
    assert first.data.shape == (96, 128, 4)

    del u.characters["player"]
    u.delete("space")
    with pytest.raises(RenderError):
        renderer.update()
    r = renderer.draw("")  # draws from the last snapshot
    assert r.data.shape == (96, 128, 4)


def test_error_character_unavailable():
    """cases lib.rs:471: members gone before the FIRST frame."""
    sp = one_cube_space()
    u = finish_universe_from_space(sp)
    cameras = StandardCameras.from_constant_for_test(unaltered(), VIEWPORT, u)
    renderer = RtRenderer(cameras)
    del u.characters["player"]
    u.delete("space")
    with pytest.raises(RenderError):
        renderer.update()
    r = renderer.draw("")
    assert r.data.shape == (96, 128, 4)


def test_viewport_zero():
    """cases lib.rs:1167: zero-sized viewport renders an empty image and
    the renderer recovers when resized."""
    sp = one_cube_space()
    u = finish_universe_from_space(sp)
    vp = {"v": Viewport(0, 0)}
    cameras = StandardCameras(
        unaltered(), lambda: vp["v"], CharacterSource(u, "player"), None
    )
    renderer = RtRenderer(cameras)
    renderer.update()
    zero_image = renderer.draw("hello world")
    assert zero_image.data.shape == (0, 0, 4)

    vp["v"] = VIEWPORT
    renderer.update()
    compare("viewport_zero", renderer.draw("hello world"), [(3, 0)])

    vp["v"] = Viewport(0, 0)
    renderer.update()
    assert renderer.draw("x").data.shape == (0, 0, 4)
    vp["v"] = VIEWPORT
    renderer.update()
    compare("viewport_zero-2", renderer.draw("hello world"), [(3, 0)])


# --- follow -------------------------------------------------------------------


def test_follow_character_change():
    """cases lib.rs:514: switching the character source switches the
    rendered scene (sky colors prove which space is drawn)."""
    u = Universe()
    for name, color in (("c1", (1.0, 0.0, 0.0)), ("c2", (0.0, 1.0, 0.0))):
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
            physics=SpacePhysics(sky=Sky.uniform(color)),
        )
        u.insert_space(f"space_{name}", sp)
        u.insert_character(name, f"space_{name}", (0.5, 0.5, 0.5))

    cell = {"name": "c1"}
    cameras = StandardCameras(
        unaltered(),
        VIEWPORT,
        lambda: CharacterSource(u, cell["name"]),
        None,
    )
    renderer = RtRenderer(cameras)
    renderer.update()
    image1 = renderer.draw("")
    assert tuple(image1.data[0, 0]) == (255, 0, 0, 255), "should see c1 (red)"

    cell["name"] = "c2"
    renderer.update()
    image2 = renderer.draw("")
    assert tuple(image2.data[0, 0]) == (0, 255, 0, 255), "should see c2 (green)"


def test_follow_options_change():
    """cases lib.rs:560: graphics-options changes (fov, exposure,
    transparency) take effect on the next update."""
    sp = Space(
        GridAab.from_lower_size((-1, 0, 0), (3, 1, 1)),
        physics=SpacePhysics(sky=Sky.uniform((0.5, 0.5, 0.5))),
    )
    sp.set((0, 0, 0), block.from_color(lin(0, 1, 0)))
    sp.set((1, 0, 0), block.from_color(lin(0, 0, 1, 0.5)))
    sp.spawn_eye_position = (0.5, 0.5, 2.0)
    sp.spawn_look_direction = (0.0, 0.0, -1.0)
    sp.fast_evaluate_light()
    u = finish_universe_from_space(sp)

    options_1 = dataclasses.replace(
        unaltered(), lighting_display="linear", fov_y=90.0
    )
    options_2 = dataclasses.replace(
        options_1,
        fov_y=70.0,
        exposure=1.5,
        transparency="threshold",
        transparency_threshold=0.1,
    )
    cell = {"opts": options_1}
    cameras = StandardCameras(
        lambda: cell["opts"], VIEWPORT, CharacterSource(u, "player"), None
    )
    renderer = RtRenderer(cameras)
    renderer.update()
    compare("follow_options_change", renderer.draw(""), [(3, 0)])

    cell["opts"] = options_2
    renderer.update()
    compare("follow_options_change-2", renderer.draw(""), [(3, 0)])
