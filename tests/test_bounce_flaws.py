"""Bounce lighting + Flaws reporting (VERDICT round-2 items 9/weak-4/5)."""

import numpy as np

from aic_tpu import block
from aic_tpu.block import Atom, Block
from aic_tpu.light import evaluate_light
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport, render
from aic_tpu.space import Sky, Space, SpacePhysics


def _lit_box():
    """Small room with an emissive panel: indirect light is the only
    illumination, so bounce output must be clearly nonzero off-panel."""
    sp = Space(
        GridAab.cube(8),
        physics=SpacePhysics(sky=Sky.uniform((0.0, 0.0, 0.0))),
    )
    grey = block.from_color((0.8, 0.8, 0.8, 1.0))
    sp.fill(GridAab.from_lower_size((0, 0, 0), (8, 1, 8)), grey)
    sp.fill(GridAab.from_lower_size((0, 0, 0), (1, 8, 8)), grey)
    lamp = Block(Atom(color=(1, 1, 1, 1), emission=(8.0, 8.0, 8.0)))
    sp.fill(GridAab.from_lower_size((3, 7, 3), (2, 1, 2)), lamp)
    st = sp.snapshot()
    st, _ = evaluate_light(st)
    return st


class TestBounce:
    def test_bounce_renders_distinctly(self):
        """LightingOption::Bounce must produce its own image (not silently
        fall through to smoothstep — round-1 weak #4) and be deterministic
        for a fixed key."""
        st = _lit_box()

        def frame(lighting):
            opts = GraphicsOptions(
                lighting_display=lighting, fog="none", transparency="surface",
                bounce_samples=4,
            )
            cam = Camera(opts, Viewport(32, 32))
            cam.look_at((4.0, 4.0, 14.0), (4.0, 2.0, 4.0))
            return render(st, cam).data

        b1 = frame("bounce")
        b2 = frame("bounce")
        smooth = frame("smoothstep")
        np.testing.assert_array_equal(b1, b2)  # fixed key → deterministic
        assert (b1[..., :3].astype(int) - smooth[..., :3].astype(int)).any()
        # The floor (lit only indirectly) must be visibly lit.
        assert b1[..., :3].max() > 16

    def test_bounce_flat_fallback_inside_trace(self):
        """Within trace_rays itself (budget spent), bounce shades Flat."""
        import jax.numpy as jnp

        from aic_tpu.raytrace.tracer import trace_rays

        st = _lit_box()
        o = jnp.asarray([[4.0, 4.0, 14.0]], jnp.float32)
        d = jnp.asarray([[0.0, -0.25, -1.0]], jnp.float32)
        ob = GraphicsOptions(lighting_display="bounce", fog="none")
        of = GraphicsOptions(lighting_display="flat", fog="none")
        lb, _ = trace_rays(st, o, d, ob)
        lf, _ = trace_rays(st, o, d, of)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(lf), rtol=1e-6)


class TestFlaws:
    def test_unfinished_flaw_reported(self):
        """A step budget too small for the scene flags UNFINISHED instead
        of silently producing a wrong frame (flaws.rs contract)."""
        from aic_tpu.raytrace.tracer import trace_rays

        sp = Space(
            GridAab.cube(16), physics=SpacePhysics(sky=Sky.uniform((1, 1, 1)))
        )
        sp.set((0, 0, 0), block.from_color((1, 0, 0, 1)))
        st = sp.snapshot()
        opts = GraphicsOptions(lighting_display="none", fog="none")
        cam = Camera(opts, Viewport(16, 16))
        cam.look_at((24.0, 18.0, 24.0), (0.0, 0.0, 0.0))
        o, d = cam.pixel_rays()
        _, _, stats = trace_rays(
            st, o, d, opts, max_steps=1, return_stats=True, beam_tile=0
        )
        assert bool(np.asarray(stats["unfinished"]))

    def test_clean_render_has_no_flaws(self):
        st = _lit_box()
        opts = GraphicsOptions(lighting_display="flat", fog="none")
        cam = Camera(opts, Viewport(16, 16))
        cam.look_at((4.0, 4.0, 14.0), (4.0, 2.0, 4.0))
        r = render(st, cam)
        assert r.flaws == ()
