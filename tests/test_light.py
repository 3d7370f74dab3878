"""Light engine tests (mirrors reference space/light/tests.rs intents)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aic_tpu import block
from aic_tpu.light import build_chart, evaluate_light, generate_directions, relight_batch
from aic_tpu.math import lightpack
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Sky, Space, SpacePhysics


class TestChart:
    def test_602_rays(self):
        """generator.rs:53: one ray per surface cell of the 11³ lattice."""
        d, c = generate_directions()
        assert len(d) == 602
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-12)

    def test_cosines(self):
        d, c = generate_directions()
        # A ray along +Y has cosine 1 on PY, 0 elsewhere.
        iy = int(np.argmax(d[:, 1]))
        np.testing.assert_allclose(d[iy], [0, 1, 0], atol=1e-12)
        from aic_tpu.math import faces

        assert c[iy, faces.PY] == pytest.approx(1.0)
        assert c[iy, faces.NY] == 0.0

    def test_every_ray_ends(self):
        ch = build_chart(30)
        from aic_tpu.light.chart import STEP_END

        assert (ch["kinds"] == STEP_END).sum(axis=1).min() == 1

    def test_steps_adjacent(self):
        ch = build_chart(30)
        offs = ch["offsets"].astype(int)
        kinds = ch["kinds"]
        for r in range(0, 602, 97):
            prev = np.zeros(3, int)
            for s in range(ch["max_steps"]):
                if kinds[r, s] == 2:
                    break
                if kinds[r, s] == 1:
                    continue
                diff = np.abs(offs[r, s] - prev).sum()
                assert diff == 1, (r, s, offs[r, s], prev)
                prev = offs[r, s]


def lit_box_space(size=6, emission=4.0):
    """Closed box with a single emissive block in the ceiling center."""
    sp = Space(
        GridAab.cube(size),
        physics=SpacePhysics(sky=Sky.uniform((0, 0, 0)), light_max_distance=size * 2),
    )
    white = block.from_color((1.0, 1.0, 1.0, 1.0))
    for face_fill in [
        GridAab.from_lower_size((0, 0, 0), (size, 1, size)),
        GridAab.from_lower_size((0, size - 1, 0), (size, 1, size)),
        GridAab.from_lower_size((0, 0, 0), (1, size, size)),
        GridAab.from_lower_size((size - 1, 0, 0), (1, size, size)),
        GridAab.from_lower_size((0, 0, 0), (size, size, 1)),
        GridAab.from_lower_size((0, 0, size - 1), (size, size, 1)),
    ]:
        sp.fill(face_fill, white)
    lamp = block.Block(
        block.Atom(color=(1, 1, 1, 1), emission=(emission,) * 3),
        block.BlockAttributes(display_name="lamp"),
    )
    c = size // 2
    sp.set((c, size - 1, c), lamp)
    sp.fast_evaluate_light()
    return sp


class TestRelight:
    def test_opaque_cube_is_opaque(self):
        sp = lit_box_space()
        st = sp.snapshot()
        out = relight_batch(st, jnp.array([[0, 0, 0]]), jnp.array([True]))
        assert int(np.asarray(out)[0, 3]) == lightpack.STATUS_OPAQUE

    def test_emissive_opaque_cube(self):
        sp = lit_box_space()
        st = sp.snapshot()
        c = 3
        out = relight_batch(st, jnp.array([[c, 5, c]]), jnp.array([True]))
        out = np.asarray(out)[0]
        # compute_light:378: opaque emissive → Visible with its emission.
        assert out[3] == lightpack.STATUS_VISIBLE
        np.testing.assert_allclose(
            lightpack.np_decode_scalar(out[:3]), [4.0] * 3, rtol=0.05
        )

    def test_no_rays_in_isolated_air(self):
        sp = Space(GridAab.cube(8), physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))))
        st = sp.snapshot()
        out = relight_batch(st, jnp.array([[4, 4, 4]]), jnp.array([True]))
        assert int(np.asarray(out)[0, 3]) == lightpack.STATUS_NO_RAYS

    def test_sky_lit_above_floor(self):
        sky = (0.8, 0.9, 1.0)
        sp = Space(GridAab.cube(6), physics=SpacePhysics(sky=Sky.uniform(sky)))
        sp.fill(GridAab.from_lower_size((0, 0, 0), (6, 1, 6)), block.from_color((1, 1, 1, 1)))
        st = sp.snapshot()
        out = relight_batch(st, jnp.array([[3, 1, 3]]), jnp.array([True]))
        out = np.asarray(out)[0]
        assert out[3] == lightpack.STATUS_VISIBLE
        val = lightpack.np_decode_scalar(out[:3])
        # Mostly sky in all open directions; floor reflects more sky.
        # Expect close to the sky value (within the coarse GI tolerance).
        np.testing.assert_allclose(val, sky, rtol=0.35)

    def test_evaluate_light_converges_and_spreads(self):
        sp = lit_box_space(size=6, emission=6.0)
        st = sp.snapshot()
        st, n = evaluate_light(st, batch_size=128)
        assert n > 0
        assert int((np.asarray(st.light_dirty) > 0).sum()) == 0
        light = np.asarray(st.light)
        # Air mid-box has no adjacent surfaces → NO_RAYS (updater.rs:373).
        assert light[3, 3, 3, 3] == lightpack.STATUS_NO_RAYS
        # Air directly below the lamp should be lit.
        below = light[3, 4, 3]
        assert below[3] == lightpack.STATUS_VISIBLE
        assert lightpack.np_decode_scalar(below[:3]).max() > 0.001
        # Walls' interior faces adjacent to air: air next to a wall is lit
        # dimmer than directly below the lamp.
        corner = light[1, 1, 1]
        assert corner[3] == lightpack.STATUS_VISIBLE
        assert (
            lightpack.np_decode_scalar(corner[:3]).mean()
            <= lightpack.np_decode_scalar(below[:3]).mean() + 1e-6
        )

    def test_edit_requeues_light(self):
        sp = lit_box_space(size=6)
        st = sp.snapshot()
        st, _ = evaluate_light(st, batch_size=128)
        from aic_tpu.space.state import scatter_set_cubes

        st2 = scatter_set_cubes(st, jnp.array([[3, 3, 3]]), jnp.array([1]))
        assert int((np.asarray(st2.light_dirty) > 0).sum()) >= 7
        st2, n = evaluate_light(st2, batch_size=128)
        assert n > 0
        # The now-solid cube becomes opaque.
        assert int(np.asarray(st2.light)[3, 3, 3, 3]) == lightpack.STATUS_OPAQUE


class TestDenseRelight:
    """Whole-volume Jacobi relight (light/dense.py) vs the batch kernel."""

    def _all_cubes(self, shape):
        g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
        return jnp.asarray(g.reshape(-1, 3), jnp.int32)

    def test_pass_matches_batch_kernel(self):
        """relight_all_pass must equal relight_batch over every cube."""
        from aic_tpu.light import relight_all_pass, build_relight_ctx

        sp = lit_box_space(size=6, emission=6.0)
        st = sp.snapshot()
        dense = np.asarray(relight_all_pass(st, build_relight_ctx(st)))
        cubes = self._all_cubes(st.contents.shape)
        batch = np.asarray(
            relight_batch(st, cubes, jnp.ones(cubes.shape[0], bool))
        ).reshape(dense.shape)
        np.testing.assert_array_equal(dense, batch)

    def test_pass_matches_batch_after_convergence_step(self):
        """Also bit-equal on a partially-converged light field."""
        from aic_tpu.light import relight_all, relight_all_pass, build_relight_ctx

        sp = lit_box_space(size=6, emission=6.0)
        st = sp.snapshot()
        ctx = build_relight_ctx(st)
        st, _ = relight_all(st, ctx)  # one pass in
        dense = np.asarray(relight_all_pass(st, ctx))
        cubes = self._all_cubes(st.contents.shape)
        batch = np.asarray(
            relight_batch(st, cubes, jnp.ones(cubes.shape[0], bool))
        ).reshape(dense.shape)
        np.testing.assert_array_equal(dense, batch)

    def _grey_box(self, size=6, emission=6.0, albedo=0.5):
        sp = Space(
            GridAab.cube(size),
            physics=SpacePhysics(sky=Sky.uniform((0, 0, 0)), light_max_distance=size * 2),
        )
        grey = block.from_color((albedo, albedo, albedo, 1.0))
        for ff in [
            GridAab.from_lower_size((0, 0, 0), (size, 1, size)),
            GridAab.from_lower_size((0, size - 1, 0), (size, 1, size)),
            GridAab.from_lower_size((0, 0, 0), (1, size, size)),
            GridAab.from_lower_size((size - 1, 0, 0), (1, size, size)),
            GridAab.from_lower_size((0, 0, 0), (size, size, 1)),
            GridAab.from_lower_size((0, 0, size - 1), (size, size, 1)),
        ]:
            sp.fill(ff, grey)
        lamp = block.Block(
            block.Atom(color=(1, 1, 1, 1), emission=(emission,) * 3),
            block.BlockAttributes(display_name="lamp"),
        )
        c = size // 2
        sp.set((c, size - 1, c), lamp)
        sp.fast_evaluate_light()
        return sp

    def test_dense_evaluate_converges_to_queue_fixpoint(self):
        """Dense and queue drivers settle within 1 packed step everywhere
        (albedo 0.5; at albedo 1.0 both iterations stop inside a slow
        geometric tail and may legitimately differ by a few steps)."""
        from aic_tpu.light import evaluate_light_dense

        st_q, _ = evaluate_light(
            self._grey_box().snapshot(), batch_size=128, dense_threshold=2.0
        )
        st_d, passes = evaluate_light_dense(self._grey_box().snapshot())
        assert passes >= 1
        lq = np.asarray(st_q.light).astype(np.int32)
        ld = np.asarray(st_d.light).astype(np.int32)
        assert np.array_equal(lq[..., 3], ld[..., 3])  # statuses identical
        assert np.abs(lq[..., :3] - ld[..., :3]).max() <= 1

    def test_truncated_chart_matches_inside_exit(self):
        """Space smaller than light_max_distance: truncation = bounds exit."""
        from aic_tpu.light import relight_all_pass, build_relight_ctx

        sky = (0.6, 0.7, 0.8)
        sp = Space(
            GridAab.cube(5),
            physics=SpacePhysics(sky=Sky.uniform(sky), light_max_distance=40),
        )
        sp.fill(GridAab.from_lower_size((0, 0, 0), (5, 1, 5)), block.from_color((1, 1, 1, 1)))
        st = sp.snapshot()
        dense = np.asarray(relight_all_pass(st, build_relight_ctx(st)))
        cubes = self._all_cubes(st.contents.shape)
        batch = np.asarray(
            relight_batch(st, cubes, jnp.ones(cubes.shape[0], bool))
        ).reshape(dense.shape)
        np.testing.assert_array_equal(dense, batch)

    def test_sharded_pass_matches_single_device(self):
        """Ray-sharded multi-chip pass (psum over ICI) == single-device
        pass, on the 8-virtual-device CPU mesh."""
        from aic_tpu.light import (
            build_relight_ctx,
            relight_all_pass,
            relight_all_pass_sharded,
        )
        from aic_tpu.parallel import make_mesh

        sp = self._grey_box()
        st = sp.snapshot()
        ctx = build_relight_ctx(st)
        single = np.asarray(relight_all_pass(st, ctx))
        mesh = make_mesh(8)  # raises if the platform has fewer than 8 devices
        sharded = np.asarray(relight_all_pass_sharded(st, ctx, mesh))
        assert np.array_equal(single[..., 3], sharded[..., 3])
        # f32 summation order differs across shards; allow 1 packed step.
        assert np.abs(single[..., :3].astype(int) - sharded[..., :3].astype(int)).max() <= 1


def test_reflectance_is_clamped():
    """light/tests.rs:303 reflectance_is_clamped: a cube between two
    over-unity-red reflectors must not exceed the sky's red level."""
    import numpy as np

    from aic_tpu import block
    from aic_tpu.light import evaluate_light
    from aic_tpu.math import lightpack
    from aic_tpu.math.grid import GridAab
    from aic_tpu.space import Sky, Space, SpacePhysics

    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (5, 3, 3)),
        physics=SpacePhysics(sky=Sky.uniform((0.5, 0.5, 0.5))),
    )
    over_unity = block.from_color((16.0, 1.0, 0.0, 1.0))
    sp.set((1, 1, 1), over_unity)
    sp.set((3, 1, 1), over_unity)
    st, _ = evaluate_light(sp.snapshot())
    texel = np.asarray(st.light)[2, 1, 1]
    red = float(lightpack.np_decode_scalar(np.array(texel[0])))
    assert red <= 0.5 + 1e-3, red


class TestReferenceProcedure:
    """light/refproc.py: fast_evaluate_light seed + queue-procedure
    emulation (updater.rs:531 fast_evaluate_light, space.rs:1494
    evaluate_light(1))."""

    def _scene(self):
        import numpy as np

        from aic_tpu import block
        from aic_tpu.math.grid import GridAab
        from aic_tpu.space import Sky, Space, SpacePhysics

        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (6, 6, 6)),
            physics=SpacePhysics(sky=Sky.uniform((0.8, 0.8, 0.9))),
        )
        sp.fill(
            GridAab.from_lower_size((0, 0, 0), (6, 1, 6)),
            block.from_color((0.5, 0.5, 0.5, 1.0)),
        )
        sp.set((2, 1, 2), block.from_color((0.9, 0.2, 0.2, 1.0)))
        return sp

    def test_fast_seed_classification(self):
        import numpy as np

        from aic_tpu.light.refproc import PRIORITY_ESTIMATED, fast_evaluate_seed
        from aic_tpu.math import lightpack

        st, prio = fast_evaluate_seed(self._scene().snapshot())
        L = np.asarray(st.light)
        # Opaque floor interior cube → OPAQUE status, not queued.
        assert L[3, 0, 3, 3] == lightpack.STATUS_OPAQUE
        assert prio[3, 0, 3] == 0
        # Air directly above the floor (visible-adjacent, uncovered) →
        # sky +Y seed, queued at ESTIMATED.
        assert L[4, 1, 4, 3] == lightpack.STATUS_VISIBLE
        assert prio[4, 1, 4] == PRIORITY_ESTIMATED
        sky_py = lightpack.np_encode_scalar(np.asarray(st.sky_faces)[4])
        assert (L[4, 1, 4, :3] == sky_py).all()
        # Air far from any visible block → NO_RAYS, not queued
        # (updater.rs:569-571).
        assert L[4, 3, 4, 3] == lightpack.STATUS_NO_RAYS
        assert prio[4, 3, 4] == 0

    def test_procedure_converges_close_to_fixed_point(self):
        import numpy as np

        from aic_tpu.light import evaluate_light
        from aic_tpu.light.refproc import evaluate_light_reference
        from aic_tpu.math import lightpack

        st0 = self._scene().snapshot()
        ref = evaluate_light_reference(st0)
        fixed, _ = evaluate_light(st0)
        a = np.asarray(ref.light).astype(int)
        b = np.asarray(fixed.light).astype(int)
        vis = (np.asarray(fixed.light)[..., 3] == lightpack.STATUS_VISIBLE) & (
            np.asarray(ref.light)[..., 3] == lightpack.STATUS_VISIBLE
        )
        diff = np.abs(a[..., :3] - b[..., :3]).max(-1)[vis]
        # The stalled field sits within a few packed steps of the fixed
        # point (the updater's ≤1-difference cutoff per source).
        assert np.median(diff) <= 1
        assert diff.max() <= 6, diff.max()


def test_light_source_self_illumination_opaque_exact():
    """light/tests.rs:233 light_source_self_illumination_opaque: the
    reference's exact adjacent-cube light values for an emissive opaque
    block in a black-sky 3³ space (bit-exact at the packed level)."""
    import numpy as np

    from aic_tpu.block import Atom, Block
    from aic_tpu.light import evaluate_light
    from aic_tpu.math import lightpack
    from aic_tpu.math.grid import GridAab
    from aic_tpu.space import Sky, Space, SpacePhysics

    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (3, 3, 3)),
        physics=SpacePhysics(sky=Sky.uniform((0.0, 0.0, 0.0))),
    )
    sp.set((1, 1, 1), Block(Atom(color=(1, 1, 1, 1), emission=(0.5, 1.0, 2.0))))
    st, _ = evaluate_light(sp.snapshot())
    L = np.asarray(st.light)

    def decoded(c):
        return [float(lightpack.np_decode_scalar(np.array(v))) for v in L[c][:3]]

    np.testing.assert_allclose(decoded((1, 1, 1)), [0.5, 1.0, 2.0], rtol=1e-5)
    expected = {
        (0, 1, 1): [0.13397168, 0.26794338, 0.53588676],
        (1, 0, 1): [0.1649385, 0.32987696, 0.6597539],
        (1, 1, 0): [0.21763763, 0.43527526, 0.8705506],
        (2, 1, 1): [0.13397168, 0.26794338, 0.53588676],
        (1, 2, 1): [0.1649385, 0.32987696, 0.6597539],
        (1, 1, 2): [0.21763763, 0.43527526, 0.8705506],
    }
    for cube, vals in expected.items():
        np.testing.assert_allclose(decoded(cube), vals, rtol=2e-3, err_msg=str(cube))
        # Packed-level equality with the reference's values.
        packed_expected = lightpack.np_encode_scalar(np.asarray(vals))
        np.testing.assert_array_equal(L[cube][:3], packed_expected, err_msg=str(cube))
