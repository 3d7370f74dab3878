"""Additional light tests ported from the reference
(all-is-cubes/src/space/light/tests.rs): initial values, out-of-bounds
sky resolution, transparent self-illumination, animation visibility,
and disabled light physics."""

import jax.numpy as jnp
import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import Atom, Block
from aic_tpu.light import evaluate_light, relight_batch
from aic_tpu.math import lightpack
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Sky, Space, SpacePhysics


class TestInitialValues:
    def test_initial_value_in_empty_space(self):
        """tests.rs:19 — a 1-cube empty space initializes to NO_RAYS."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
        sp.fast_evaluate_light()
        assert sp.light[0, 0, 0, 3] == lightpack.STATUS_NO_RAYS

    def test_initial_value_in_filled_space(self):
        """tests.rs:26 — a filled cube initializes to OPAQUE."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
        sp.set((0, 0, 0), block.from_color((1, 1, 1, 1)))
        sp.fast_evaluate_light()
        assert sp.light[0, 0, 0, 3] == lightpack.STATUS_OPAQUE

    def test_fast_evaluate_light_sky_above_obstacle(self):
        """tests.rs:34 — fast seed: sky above the obstacle, uninit
        below."""
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (3, 3, 3)),
            physics=SpacePhysics(sky=Sky.uniform((0.8, 0.9, 1.0))),
        )
        sp.set((1, 1, 1), block.from_color((1, 0, 0, 1)))
        sp.fast_evaluate_light()
        assert sp.light[1, 2, 1, 3] == lightpack.STATUS_VISIBLE
        assert sp.light[1, 0, 1, 3] == lightpack.STATUS_UNINITIALIZED


class TestOutOfBoundsSky:
    def test_out_of_bounds_light_is_sky(self):
        """tests.rs:75 — face-adjacent OOB texels resolve to the block
        sky for that face (valid); edge/corner/far OOB are invalid
        (NO_RAYS analog)."""
        from aic_tpu.raytrace.tracer import _fetch_light_texel

        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
            physics=SpacePhysics(
                sky=Sky(
                    octants=np.array(
                        [[o] * 3 for o in (2.0, 3.0, 5.0, 7.0, 11.0, 13.0, 17.0, 19.0)],
                        np.float32,
                    )
                )
            ),
        )
        sp.set((0, 0, 0), block.from_color((1, 0, 0, 1)))
        st = sp.snapshot()
        sky_faces = np.asarray(st.sky_faces)

        for dx in (-2, -1, 0, 1, 2):
            for dy in (-2, -1, 0, 1, 2):
                for dz in (-2, -1, 0, 1, 2):
                    if (dx, dy, dz) == (0, 0, 0):
                        continue
                    cube = jnp.array([[dx, dy, dz]])
                    val, valid = _fetch_light_texel(st, cube)
                    val = np.asarray(val)[0]
                    valid = bool(np.asarray(valid)[0])
                    n_off = sum(1 for d in (dx, dy, dz) if d not in (0,))
                    adjacent = sorted(map(abs, (dx, dy, dz))) == [0, 0, 1]
                    if adjacent:
                        # Which face: the axis with |d|==1, sign decides.
                        if dx == -1:
                            face = 0
                        elif dx == 1:
                            face = 3
                        elif dy == -1:
                            face = 1
                        elif dy == 1:
                            face = 4
                        elif dz == -1:
                            face = 2
                        else:
                            face = 5
                        assert valid, (dx, dy, dz)
                        np.testing.assert_allclose(
                            val[:3], sky_faces[face], rtol=1e-6,
                            err_msg=str((dx, dy, dz)),
                        )
                    else:
                        assert not valid, (dx, dy, dz)
                        np.testing.assert_array_equal(val[:3], 0.0)


class TestSelfIllumination:
    def test_light_source_self_illumination_transparent(self):
        """tests.rs:220 — an emissive transparent block's own cube light
        equals its emission."""
        light = (0.5, 1.0, 2.0)
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (3, 3, 3)),
            physics=SpacePhysics(sky=Sky.uniform((0.0, 0.0, 0.0))),
        )
        sp.set((1, 1, 1), Block(Atom(color=(1.0, 0.0, 0.0, 0.125), emission=light)))
        st, _ = evaluate_light(sp.snapshot())
        L = np.asarray(st.light)
        assert L[1, 1, 1, 3] == lightpack.STATUS_VISIBLE
        got = [float(lightpack.np_decode_scalar(np.array(v))) for v in L[1, 1, 1][:3]]
        np.testing.assert_allclose(got, light, rtol=2e-2)


class TestAnimationVisibility:
    def _statuses(self, blk):
        sp = Space(GridAab.from_lower_size((0, 0, 0), (3, 3, 3)))
        if blk is not None:
            sp.set((1, 1, 1), blk)
        sp.fast_evaluate_light()
        st, _ = evaluate_light(sp.snapshot())
        L = np.asarray(st.light)
        return [int(L[1, 1, 1, 3]), int(L[0, 1, 1, 3])]

    def test_animation_treated_as_visible(self):
        """tests.rs:266 — an invisible but animated block (and its
        neighbors) is lit as if visible, to be ready for changes."""
        no_block = self._statuses(None)
        visible = self._statuses(block.from_color((1.0, 1.0, 1.0, 0.5)))
        animated = self._statuses(
            Block(Atom(color=(0.0, 0.0, 0.0, 0.0))).with_attributes(animated=True)
        )
        assert no_block == [lightpack.STATUS_NO_RAYS, lightpack.STATUS_NO_RAYS]
        assert visible == [lightpack.STATUS_VISIBLE, lightpack.STATUS_VISIBLE]
        assert animated == [lightpack.STATUS_VISIBLE, lightpack.STATUS_VISIBLE]


class TestDisabledLight:
    def test_disabled_light_returns_one_always(self):
        """tests.rs:332 — LightPhysics::None → unit light everywhere."""
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
            physics=SpacePhysics(light_enabled=False),
        )
        sp.set((0, 0, 0), block.from_color((0.5, 0.25, 1.0, 1.0)))
        st = sp.snapshot()
        assert not st.light_enabled
        # Rendering with disabled light equals rendering the same scene
        # with LightingOption::None: surfaces show unit illumination.
        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
        from aic_tpu.raytrace.render import render

        cam = Camera(GraphicsOptions(), Viewport(16, 16))
        cam.look_at((0.5, 0.5, 4.0), (0.5, 0.5, 0.5))
        img = np.asarray(render(st, cam).data)[..., :3]
        st2 = Space(
            GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
        )
        st2.set((0, 0, 0), block.from_color((0.5, 0.25, 1.0, 1.0)))
        from aic_tpu.raytrace.options import LIGHT_NONE
        import dataclasses

        cam2 = Camera(
            dataclasses.replace(GraphicsOptions(), lighting_display=LIGHT_NONE),
            Viewport(16, 16),
        )
        cam2.look_at((0.5, 0.5, 4.0), (0.5, 0.5, 0.5))
        img2 = np.asarray(render(st2.snapshot(), cam2).data)[..., :3]
        np.testing.assert_array_equal(img, img2)

    def test_disabled_light_does_not_update(self):
        """tests.rs:340 — evaluate_light performs no updates when light
        physics is disabled."""
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (2, 2, 2)),
            physics=SpacePhysics(light_enabled=False),
        )
        sp.set((0, 0, 0), block.from_color((1, 1, 1, 1)))
        st, n = evaluate_light(sp.snapshot())
        assert n == 0
