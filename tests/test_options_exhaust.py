"""Exhaust-style option sweeps (the reference's `Exhaust`-driven case
generation, test-renderers/cases/src/lib.rs:46 `LightingOption::exhaust`,
`:105` fog×transparency product, `:125` `Face::exhaust`).

The reference systematically renders the full option product to catch
combination bugs; these are the self-consistency analogs: every
combination must compile, produce finite premultiplied output, honor
basic invariants (transmittance bounds, light-independence of
LIGHT_NONE, fog monotonicity), and differ from its neighbors exactly
when it should.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import pytest

import jax.numpy as jnp

from aic_tpu import block
from aic_tpu.light import evaluate_light
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
from aic_tpu.raytrace.tracer import trace_rays
from aic_tpu.space import Sky, Space, SpacePhysics

LIGHTING = ["none", "flat", "linear", "coarse", "smoothstep"]  # bounce excluded
FOG = ["none", "abrupt", "compromise", "physical"]
TRANSPARENCY = ["surface", "volumetric", "threshold"]


@functools.lru_cache(maxsize=None)
def _lit_state():
    """Small scene exercising every shading feature: opaque, half-alpha,
    emissive, and a floor, under a non-uniform sky."""
    sp = Space(
        GridAab.cube(12),
        physics=SpacePhysics(
            sky=Sky.octants(
                [(0.6, 0.7, 0.9)] * 4 + [(0.2, 0.2, 0.25)] * 4
            )
            if hasattr(Sky, "octants")
            else Sky.uniform((0.5, 0.6, 0.8))
        ),
    )
    sp.fill(
        GridAab.from_lower_size((0, 0, 0), (12, 1, 12)),
        block.from_color((0.6, 0.6, 0.55, 1.0)),
    )
    sp.set((4, 1, 5), block.from_color((0.9, 0.2, 0.2, 1.0)))
    sp.set((6, 1, 5), block.from_color((0.2, 0.5, 0.9, 0.45)))
    sp.set(
        (5, 1, 7),
        block.Block(block.Atom(color=(0, 0, 0, 1.0), emission=(3.0, 2.0, 1.0))),
    )
    st = sp.snapshot()
    st, _ = evaluate_light(st)
    return st


def _rays(w=20, h=14):
    opts = GraphicsOptions()
    cam = Camera(opts, Viewport(w, h))
    cam.look_at((6.0, 5.0, 16.0), (6.0, 1.0, 6.0))
    return cam.pixel_rays()


@functools.lru_cache(maxsize=None)
def _render(opts: GraphicsOptions):
    st = _lit_state()
    o, d = _rays()
    light, trans = trace_rays(st, jnp.asarray(o), jnp.asarray(d), opts)
    return np.asarray(light), np.asarray(trans)


@pytest.mark.slow  # 60 distinct option programs ≈ minutes of CPU compiles
class TestOptionProduct:
    @pytest.mark.parametrize("fog", FOG)
    @pytest.mark.parametrize("lighting", LIGHTING)
    def test_lighting_fog_product(self, lighting, fog):
        opts = GraphicsOptions(
            lighting_display=lighting, fog=fog, transparency="surface"
        )
        light, trans = _render(opts)
        assert np.isfinite(light).all() and np.isfinite(trans).all()
        assert (trans >= 0).all() and (trans <= 1 + 1e-6).all()
        assert (light >= -1e-6).all()
        # something must be visible: the scene fills the lower half
        assert light.max() > 0

    @pytest.mark.parametrize("transparency", TRANSPARENCY)
    @pytest.mark.parametrize("fog", FOG)
    def test_fog_transparency_product(self, fog, transparency):
        opts = GraphicsOptions(
            lighting_display="smoothstep", fog=fog, transparency=transparency
        )
        light, trans = _render(opts)
        assert np.isfinite(light).all() and np.isfinite(trans).all()
        assert (trans >= 0).all() and (trans <= 1 + 1e-6).all()

    @pytest.mark.parametrize("transparency", TRANSPARENCY)
    @pytest.mark.parametrize("lighting", LIGHTING)
    def test_lighting_transparency_product(self, lighting, transparency):
        opts = GraphicsOptions(
            lighting_display=lighting, fog="none", transparency=transparency
        )
        light, trans = _render(opts)
        assert np.isfinite(light).all()
        assert (trans >= 0).all() and (trans <= 1 + 1e-6).all()


class TestOptionInvariants:
    def test_light_none_ignores_stored_light(self):
        """LIGHT_NONE must not read the light texture
        (graphics_options.rs LightingOption::None semantics)."""
        st = _lit_state()
        o, d = _rays()
        opts = GraphicsOptions(
            lighting_display="none", fog="none", transparency="surface"
        )
        a, _ = trace_rays(st, jnp.asarray(o), jnp.asarray(d), opts)
        dark = dataclasses.replace(st, light=jnp.zeros_like(st.light))
        b, _ = trace_rays(dark, jnp.asarray(o), jnp.asarray(d), opts)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_lighting_options_differ(self):
        """Each lighting mode is a distinct display function on a lit
        scene (light_on_slab case family role)."""
        imgs = {
            lo: _render(
                GraphicsOptions(
                    lighting_display=lo, fog="none", transparency="surface"
                )
            )[0]
            for lo in LIGHTING
        }
        assert np.abs(imgs["none"] - imgs["smoothstep"]).max() > 1e-3
        assert np.abs(imgs["flat"] - imgs["smoothstep"]).max() > 1e-4

    def test_fog_none_vs_physical_differ_on_distance(self):
        a = _render(
            GraphicsOptions(
                lighting_display="none", fog="none", transparency="surface"
            )
        )[0]
        b = _render(
            GraphicsOptions(
                lighting_display="none", fog="physical", transparency="surface",
                view_distance=20.0,
            )
        )[0]
        assert np.abs(a - b).max() > 1e-3

    def test_threshold_transparency_binarizes(self):
        """Threshold mode: alpha 0.45 < 0.5 -> the half-alpha cube
        vanishes entirely (graphics_options.rs:502)."""
        st = _lit_state()
        o, d = _rays()
        base = GraphicsOptions(
            lighting_display="none", fog="none", transparency="threshold"
        )
        with_cube, _ = trace_rays(st, jnp.asarray(o), jnp.asarray(d), base)
        # The 0.45-alpha cube renders in surface mode but not threshold
        # mode, so the two must differ on this scene.
        surf, _ = trace_rays(
            st, jnp.asarray(o), jnp.asarray(d),
            dataclasses.replace(base, transparency="surface"),
        )
        assert np.abs(np.asarray(with_cube) - np.asarray(surf)).max() > 1e-4
