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
