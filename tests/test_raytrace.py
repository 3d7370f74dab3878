"""Raytracer tests (mirrors reference raytracer unit tests and the
image-comparison suite's scene-property checks)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport, render, render_hdr
from aic_tpu.raytrace.tracer import trace_rays
from aic_tpu.space import Sky, Space, SpacePhysics


def simple_space(sky=(0.5, 0.5, 0.5)):
    sp = Space(
        GridAab.cube(4),
        physics=SpacePhysics(sky=Sky.uniform(sky)),
    )
    return sp


OPTS = GraphicsOptions(lighting_display="none", fog="none", transparency="surface")


def trace_one(state, origin, direction, opts=OPTS, include_sky=True):
    import jax.numpy as jnp

    light, trans = trace_rays(
        state,
        jnp.asarray([origin], jnp.float32),
        jnp.asarray([direction], jnp.float32),
        opts,
        include_sky=include_sky,
    )
    return np.asarray(light)[0], float(np.asarray(trans)[0])


class TestTraceBasics:
    def test_miss_gives_sky(self):
        st = simple_space().snapshot()
        light, trans = trace_one(st, (10.0, 10.0, 10.0), (1.0, 0.0, 0.0))
        np.testing.assert_allclose(light, [0.5, 0.5, 0.5], atol=1e-5)
        assert trans == 0.0

    def test_hit_opaque_block(self):
        sp = simple_space()
        sp.set((2, 2, 2), block.from_color((1.0, 0.0, 0.0, 1.0)))
        st = sp.snapshot()
        # Ray straight at the block: lighting none → color exactly.
        light, _ = trace_one(st, (-2.0, 2.5, 2.5), (1.0, 0.0, 0.0))
        np.testing.assert_allclose(light, [1.0, 0.0, 0.0], atol=1e-5)

    def test_ray_from_inside_bounds(self):
        sp = simple_space()
        sp.set((3, 1, 1), block.from_color((0.0, 1.0, 0.0, 1.0)))
        st = sp.snapshot()
        light, _ = trace_one(st, (0.5, 1.5, 1.5), (1.0, 0.0, 0.0))
        np.testing.assert_allclose(light, [0.0, 1.0, 0.0], atol=1e-5)

    def test_entry_cube_is_shaded(self):
        """A block on the boundary must be hit by rays entering the bounds."""
        sp = simple_space()
        sp.set((0, 1, 1), block.from_color((0.0, 0.0, 1.0, 1.0)))
        st = sp.snapshot()
        light, _ = trace_one(st, (-3.0, 1.5, 1.5), (1.0, 0.0, 0.0))
        np.testing.assert_allclose(light, [0.0, 0.0, 1.0], atol=1e-5)

    def test_transparent_composites_with_sky(self):
        sp = simple_space(sky=(1.0, 1.0, 1.0))
        sp.set((2, 2, 2), block.Block(block.Atom(color=(1.0, 0.0, 0.0, 0.5))))
        st = sp.snapshot()
        light, trans = trace_one(st, (-2.0, 2.5, 2.5), (1.0, 0.0, 0.0))
        # Surface mode: 0.5 red over white sky: 0.5*red*illum(1) + 0.5*sky.
        np.testing.assert_allclose(light, [0.5 * 1.0 + 0.5, 0.5, 0.5], atol=1e-4)

    def test_emission_unlit(self):
        sp = simple_space(sky=(0, 0, 0))
        sp.set(
            (2, 2, 2),
            block.Block(block.Atom(color=(0, 0, 0, 1.0), emission=(3.0, 2.0, 1.0))),
        )
        st = sp.snapshot()
        light, _ = trace_one(st, (-2.0, 2.5, 2.5), (1.0, 0.0, 0.0))
        np.testing.assert_allclose(light, [3.0, 2.0, 1.0], atol=1e-4)

    def test_recursive_block_surface(self):
        """Two-level DDA: a half-height voxel slab only blocks lower rays."""
        inner = Space(GridAab.cube(8))
        inner.fill(
            GridAab.from_lower_size((0, 0, 0), (8, 4, 8)),
            block.from_color((1.0, 1.0, 0.0, 1.0)),
        )
        sp = simple_space(sky=(0, 0, 1))
        sp.set((2, 2, 2), block.Block(block.Recur(space=inner, resolution=8)))
        st = sp.snapshot()
        # Lower half: hits the slab.
        light, _ = trace_one(st, (-2.0, 2.25, 2.5), (1.0, 0.0, 0.0))
        np.testing.assert_allclose(light, [1.0, 1.0, 0.0], atol=1e-4)
        # Upper half: passes through air voxels to the sky.
        light, trans = trace_one(st, (-2.0, 2.75, 2.5), (1.0, 0.0, 0.0))
        np.testing.assert_allclose(light, [0.0, 0.0, 1.0], atol=1e-4)

    def test_flat_lighting_uses_stored_light(self):
        from aic_tpu.math import lightpack

        sp = simple_space(sky=(0, 0, 0))
        sp.set((2, 2, 2), block.from_color((1.0, 1.0, 1.0, 1.0)))
        st = sp.snapshot()
        # Manually set the light in the cube in front (NX side) to 0.5 grey.
        import jax.numpy as jnp

        texel = np.zeros(4, np.uint8)
        texel[:3] = np.asarray(lightpack.np_encode_scalar(np.array([0.5] * 3)))
        texel[3] = lightpack.STATUS_VISIBLE
        light_field = np.asarray(st.light).copy()
        light_field[1, 2, 2] = texel
        import dataclasses

        st = dataclasses.replace(st, light=jnp.asarray(light_field))
        opts = GraphicsOptions(lighting_display="flat", fog="none", transparency="surface")
        light, _ = trace_one(st, (-2.0, 2.5, 2.5), (1.0, 0.0, 0.0), opts=opts)
        stored = lightpack.np_decode_scalar(texel[0])
        np.testing.assert_allclose(light, [stored] * 3, atol=1e-4)


class TestRenderer:
    def test_render_image(self):
        sp = simple_space()
        sp.set((2, 1, 2), block.from_color((1.0, 0.0, 0.0, 1.0)))
        st = sp.snapshot()
        cam = Camera(OPTS, Viewport(32, 32))
        cam.look_at((2.0, 6.0, 8.0), (2.0, 1.5, 2.0))
        r = render(st, cam)
        assert r.data.shape == (32, 32, 4)
        # Red block appears somewhere near center.
        center = r.data[12:20, 12:20, :3].astype(float)
        assert center[..., 0].max() > 100

    def test_antialiasing_shape(self):
        sp = simple_space()
        st = sp.snapshot()
        import dataclasses

        cam = Camera(dataclasses.replace(OPTS, antialiasing=True), Viewport(8, 8))
        cam.look_at((2.0, 6.0, 8.0), (2.0, 1.5, 2.0))
        light, trans = render_hdr(st, cam)
        assert light.shape == (8, 8, 3)

    def test_camera_ray_through_center(self):
        cam = Camera(OPTS, Viewport(9, 9))
        cam.look_at((0.0, 0.0, 10.0), (0.0, 0.0, 0.0))
        o, d = cam.pixel_rays()
        o = np.asarray(o)
        d = np.asarray(d)
        center_dir = d[4, 4] / np.linalg.norm(d[4, 4])
        np.testing.assert_allclose(center_dir, [0, 0, -1], atol=1e-6)
        # Origin on the near plane.
        np.testing.assert_allclose(o[4, 4], [0, 0, 10 - 1 / 32], atol=1e-4)


class TestAccumulators:
    """Depth + custom accumulators (render/src/raytracer/accum.rs:108,254)."""

    def _scene(self):
        from aic_tpu import block
        from aic_tpu.math.grid import GridAab
        from aic_tpu.space import Sky, Space, SpacePhysics

        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (4, 4, 8)),
            physics=SpacePhysics(sky=Sky.uniform((0.5, 0.5, 0.5))),
        )
        sp.set((1, 1, 2), block.from_color((1, 0, 0, 1)))
        sp.set((1, 1, 5), block.from_color((0, 0, 1, 0.5)))
        return sp.snapshot()

    def test_render_depth(self):
        import numpy as np

        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
        from aic_tpu.raytrace.render import render_depth

        st = self._scene()
        opts = GraphicsOptions(lighting_display="flat", fog="none")
        cam = Camera(opts, Viewport(16, 16))
        cam.look_at((1.5, 1.5, 7.5), (1.5, 1.5, 0.0))
        d = np.asarray(render_depth(st, cam))
        center = d[8, 8]
        assert np.isfinite(center)
        # The transparent block at z=5 is nearer but depth records the
        # FIRST surface, which is that transparent pane.
        assert 0.0 < center < 1.0
        assert np.isinf(d[0, 0])  # sky pixel

    def test_custom_accumulator_counts_surfaces(self):
        import numpy as np

        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
        from aic_tpu.raytrace.render import accumulate_hits
        from aic_tpu.raytrace.tracer import HIT_NONE

        st = self._scene()
        opts = GraphicsOptions(
            lighting_display="flat", fog="none", transparency="surface"
        )
        cam = Camera(opts, Viewport(16, 16))
        cam.look_at((1.5, 1.5, 7.5), (1.5, 1.5, 0.0))

        def fold(acc, hits):
            return acc + (np.asarray(hits["hit_kind"]) != HIT_NONE).astype(int)

        counts = accumulate_hits(st, cam, fold, np.zeros(16 * 16, int)).reshape(16, 16)
        # The center ray passes the semi-transparent pane then hits the
        # opaque block: 2 surfaces.
        assert counts[8, 8] == 2
        assert counts[0, 0] == 0


class TestDebugLines:
    """Debug line overlays (gpu lines pipeline role; raytrace/lines.py)."""

    def test_cursor_wireframe_overlay(self):
        import numpy as np

        from aic_tpu import block
        from aic_tpu.math.grid import GridAab
        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport, render
        from aic_tpu.raytrace.lines import cursor_wireframe, overlay_wireframes
        from aic_tpu.space import Space

        sp = Space(GridAab.cube(8))
        sp.set((4, 4, 4), block.from_color((0.2, 0.4, 0.8, 1.0)))
        st = sp.snapshot()
        opts = GraphicsOptions(lighting_display="flat", fog="none")
        cam = Camera(opts, Viewport(64, 48))
        cam.look_at((4.5, 4.5, 8.0), (4.5, 4.5, 4.5))
        r = render(st, cam)
        out = overlay_wireframes(
            r.data, cam, [(cursor_wireframe((4, 4, 4)), (255, 0, 255))]
        )
        assert out.shape == r.data.shape
        # Magenta pixels appeared where there were none.
        magenta = (out[..., 0] == 255) & (out[..., 1] == 0) & (out[..., 2] == 255)
        assert magenta.sum() > 10
        before = (r.data[..., 0] == 255) & (r.data[..., 1] == 0) & (r.data[..., 2] == 255)
        assert before.sum() == 0

    def test_behind_camera_segments_clipped(self):
        import numpy as np

        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
        from aic_tpu.raytrace.lines import project_segments

        cam = Camera(GraphicsOptions(), Viewport(32, 32))
        cam.look_at((0.0, 0.0, 0.0), (0.0, 0.0, -1.0))
        behind = np.array([[[0.0, 0.0, 5.0], [0.0, 1.0, 5.0]]])
        assert len(project_segments(cam, behind)) == 0


class TestGridgid:
    def test_u16_indices(self):
        from aic_tpu import block
        from aic_tpu.math.grid import GridAab
        from aic_tpu.mesh import mesh_space
        from aic_tpu.space import Space
        import numpy as np

        sp = Space(GridAab.cube(4))
        sp.set((1, 1, 1), block.from_color((1, 0, 0, 1)))
        m = mesh_space(sp)
        assert m.indices.dtype == np.uint16  # IndexVec u16 path


class TestResampling:
    def test_render_scaled(self):
        import numpy as np

        from aic_tpu import block
        from aic_tpu.math.grid import GridAab
        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
        from aic_tpu.raytrace.render import render, render_scaled
        from aic_tpu.space import Space

        sp = Space(GridAab.cube(8))
        sp.set((4, 4, 4), block.from_color((0.9, 0.2, 0.2, 1.0)))
        st = sp.snapshot()
        opts = GraphicsOptions(lighting_display="flat", fog="none")
        cam = Camera(opts, Viewport(64, 48))
        cam.look_at((4.5, 4.5, 8.5), (4.5, 4.5, 4.5))
        full = render(st, cam)
        half = render_scaled(st, cam, 0.5)
        assert half.data.shape == full.data.shape
        # The scene structure survives resampling (block visible, sky around).
        d = np.abs(full.data[..., :3].astype(int) - half.data[..., :3].astype(int))
        assert d.mean() < 20
        red_full = (full.data[..., 0] > 150).sum()
        red_half = (half.data[..., 0] > 150).sum()
        assert abs(red_full - red_half) < red_full * 0.5 + 16


def test_viewport_zero_renders_empty():
    """viewport_zero (cases lib.rs:154): a 0-size viewport must not crash."""
    import numpy as np

    from aic_tpu import block
    from aic_tpu.math.grid import GridAab
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport, render
    from aic_tpu.space import Space

    sp = Space(GridAab.cube(2))
    sp.set((0, 0, 0), block.from_color((1, 0, 0, 1)))
    st = sp.snapshot()
    for w, h in [(0, 0), (0, 8), (8, 0)]:
        cam = Camera(GraphicsOptions(), Viewport(w, h))
        cam.look_at((1.0, 1.0, 4.0), (1.0, 1.0, 1.0))
        r = render(st, cam)
        assert r.data.shape == (h, w, 4)
