"""Renderer conformance via golden images (test-renderers analog).

Scene cases modeled on the shared suite (test-renderers/cases/src/lib.rs):
each renders a small frame and compares against a checked-in golden with a
perceptual threshold. Re-record with AIC_RECORD_GOLDENS=1.
"""

import os

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.content import cornell_box
from aic_tpu.light import evaluate_light
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport, render
from aic_tpu.space import Sky, Space, SpacePhysics
from aic_tpu.testing import Threshold, compare_to_golden

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _render_case(state, eye, target, opts, size=48):
    cam = Camera(opts, Viewport(size, size))
    cam.look_at(eye, target)
    return render(state, cam).data


def _case(name, image, threshold=Threshold(max_differing_fraction=0.02, delta=6)):
    ok, msg = compare_to_golden(image, os.path.join(GOLDENS, f"{name}.png"), threshold)
    assert ok, f"{name}: {msg}"


def test_golden_cornell_flat():
    sp = cornell_box(16)
    st = sp.snapshot()
    opts = GraphicsOptions(lighting_display="none", fog="none", transparency="surface")
    img = _render_case(st, np.array([0.5, 0.5, 1.6]) * 16, (8, 8, 8), opts)
    _case("cornell_flat", img)


def test_golden_cornell_lit_smoothstep():
    sp = cornell_box(16)
    st = sp.snapshot()
    st, _ = evaluate_light(st, batch_size=512, max_rounds=400)
    opts = GraphicsOptions(lighting_display="smoothstep", fog="none", transparency="surface")
    img = _render_case(st, np.array([0.5, 0.5, 1.6]) * 16, (8, 8, 8), opts)
    _case("cornell_lit_smoothstep", img)


def test_golden_transparency_volumetric():
    sp = Space(GridAab.cube(6), physics=SpacePhysics(sky=Sky.uniform((0.8, 0.85, 1.0))))
    sp.fill(GridAab.from_lower_size((0, 0, 0), (6, 1, 6)), block.from_color((0.4, 0.4, 0.4, 1)))
    sp.set((2, 1, 2), block.Block(block.Atom(color=(1.0, 0.2, 0.2, 0.4))))
    sp.set((3, 1, 3), block.from_color((0.2, 0.2, 1.0, 1.0)))
    sp.fast_evaluate_light()
    st = sp.snapshot()
    opts = GraphicsOptions(lighting_display="flat", fog="none", transparency="volumetric")
    img = _render_case(st, (3.0, 4.0, 8.0), (3.0, 1.0, 3.0), opts)
    _case("transparency_volumetric", img)


def test_golden_recursive_fog():
    from aic_tpu.content import menger_sponge

    sp = menger_sponge(world_levels=2, block_levels=2)
    st = sp.snapshot()
    opts = GraphicsOptions(lighting_display="none", fog="physical", transparency="surface")
    img = _render_case(st, (14.0, 12.0, 20.0), (4.5, 4.5, 4.5), opts)
    _case("recursive_fog", img)


def test_golden_atrium_overview():
    """Self-golden pinning the flagship atrium scene (bench north-star
    geometry) against regressions."""
    from aic_tpu.content import atrium

    sp = atrium(width=30, depth=20, floors=2)
    st = sp.snapshot()
    opts = GraphicsOptions(lighting_display="flat", fog="none")
    eye = np.array([15.0, 4.0, 6.0])
    img = _render_case(st, eye, (15.0, 5.0, 10.0), opts, size=64)
    _case("atrium_overview", img)


def test_golden_demo_city_overview():
    """Self-golden for demo-city (exhibits visible along the +Z road)."""
    from aic_tpu.content import demo_city

    sp = demo_city(seed=1, size=48)
    st = sp.snapshot()
    opts = GraphicsOptions(lighting_display="flat", fog="none")
    img = _render_case(st, np.array([0.0, 14.0, 30.0]), (0.0, 2.0, 0.0), opts, size=64)
    _case("demo_city_overview", img)
