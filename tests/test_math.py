"""Layer-0 math tests (mirrors reference unit-test intent:
all-is-cubes-base/src/{raycast/tests.rs, math/*} test modules)."""

import numpy as np
import pytest

from aic_tpu.math import GridAab, color, faces, lightpack, raycast


class TestLightPack:
    def test_round_trip_all_u8(self):
        """data.rs:397: encode(decode(v)) == v for all u8."""
        import jax.numpy as jnp

        u = np.arange(256, dtype=np.uint8)
        decoded = lightpack.np_decode_scalar(u)
        re = lightpack.np_encode_scalar(decoded)
        np.testing.assert_array_equal(re, u)

    def test_zero_and_one(self):
        assert lightpack.np_decode_scalar(0) == 0.0
        assert lightpack.np_encode_scalar(0.0) == 0
        # data.rs:75: ONE encodes to LOG_OFFSET = 144.
        assert lightpack.np_encode_scalar(1.0) == 144
        assert lightpack.np_decode_scalar(144) == pytest.approx(1.0)

    def test_jax_matches_numpy(self):
        vals = np.array([0.0, 1e-6, 0.01, 0.5, 1.0, 2.0, 100.0, 1e6], np.float32)
        np.testing.assert_array_equal(
            np.asarray(lightpack.encode_scalar(vals)), lightpack.np_encode_scalar(vals)
        )

    def test_decode_with_ao(self):
        texels = np.array(
            [
                [144, 144, 144, 255],
                [0, 0, 0, 128],
                [0, 0, 0, 1],
                [0, 0, 0, 0],
            ],
            np.uint8,
        )
        out = np.asarray(lightpack.decode_with_ao(texels))
        np.testing.assert_allclose(out[0], [1, 1, 1, 1], rtol=1e-6)
        assert out[1, 3] == pytest.approx(0.25)
        assert out[2, 3] == 0.0
        assert out[3, 3] == 0.0


class TestFaces:
    def test_opposite(self):
        assert faces.opposite(faces.NX) == faces.PX
        assert faces.opposite(faces.PY) == faces.NY
        assert faces.opposite(faces.WITHIN) == faces.WITHIN

    def test_face_from_step(self):
        # Moving +x enters the new cube through its -x (NX) face.
        assert faces.face_from_step(0, True) == faces.NX
        assert faces.face_from_step(1, False) == faces.PY

    def test_normals(self):
        np.testing.assert_array_equal(faces.FACE_NORMALS[faces.PX], [1, 0, 0])
        np.testing.assert_array_equal(faces.FACE_NORMALS[faces.NZ], [0, 0, -1])


class TestGridAab:
    def test_basic(self):
        b = GridAab.from_lower_upper((-1, -2, -3), (4, 5, 6))
        assert b.size == (5, 7, 9)
        assert b.volume() == 5 * 7 * 9
        assert b.contains_cube((0, 0, 0))
        assert not b.contains_cube((4, 0, 0))

    def test_intersection_union(self):
        a = GridAab.cube(4)
        b = GridAab.from_lower_size((2, 2, 2), (4, 4, 4))
        i = a.intersection(b)
        assert i.lower == (2, 2, 2) and i.size == (2, 2, 2)
        u = a.union(b)
        assert u.lower == (0, 0, 0) and u.upper == (6, 6, 6)

    def test_rotation_matrices(self):
        from aic_tpu.math.grid import IDENTITY_ROTATION, ROTATION_MATRICES

        assert ROTATION_MATRICES.shape == (48, 3, 3)
        dets = np.round(np.linalg.det(ROTATION_MATRICES)).astype(int)
        assert (np.abs(dets) == 1).all()
        assert (dets[:24] == 1).all()  # rotations first
        np.testing.assert_array_equal(ROTATION_MATRICES[IDENTITY_ROTATION], np.eye(3))


class TestRaycast:
    def test_simple_axis(self):
        steps = list(raycast.raycast([0.5, 0.5, 0.5], [1, 0, 0], t_max=3.0))
        assert steps[0].cube == (0, 0, 0) and steps[0].face == faces.WITHIN
        assert steps[1].cube == (1, 0, 0) and steps[1].face == faces.NX
        assert steps[1].t_distance == pytest.approx(0.5)
        assert steps[2].cube == (2, 0, 0)

    def test_negative_direction(self):
        steps = list(raycast.raycast([0.5, 0.5, 0.5], [0, -2, 0], t_max=1.0))
        assert steps[1].cube == (0, -1, 0) and steps[1].face == faces.PY
        assert steps[1].t_distance == pytest.approx(0.25)

    def test_t_ordering_and_adjacency(self):
        """raycast/tests.rs consistency properties: t monotonic, cubes
        face-adjacent, each step's face matches the move direction."""
        rng = np.random.default_rng(42)
        for _ in range(50):
            origin = rng.uniform(-3, 3, 3)
            direction = rng.uniform(-1, 1, 3)
            if np.all(np.abs(direction) < 1e-3):
                continue
            steps = list(raycast.raycast(origin, direction, t_max=10.0))
            for a, b in zip(steps, steps[1:]):
                assert b.t_distance >= a.t_distance
                diff = np.subtract(b.cube, a.cube)
                assert np.abs(diff).sum() == 1
                axis = int(np.nonzero(diff)[0][0])
                assert b.face == faces.face_from_step(axis, diff[axis] > 0)

    def test_within_bounds(self):
        bounds = GridAab.cube(2)
        steps = list(raycast.raycast([-2.5, 0.5, 0.5], [1, 0, 0], bounds=bounds))
        cubes = [s.cube for s in steps]
        assert cubes == [(0, 0, 0), (1, 0, 0)]
        # Entering step's face is NX (came from -x).
        assert steps[0].face == faces.NX

    def test_intersection_point(self):
        steps = list(raycast.raycast([0.25, 0.5, 0.5], [1, 0, 0], t_max=2.0))
        p = steps[1].intersection_point([0.25, 0.5, 0.5], [1, 0, 0])
        np.testing.assert_allclose(p, [1.0, 0.5, 0.5])

    def test_tie_break_prefers_z(self):
        """Diagonal ray from a cube corner: reference steps Z first
        (raycast.rs:584 comparison chain)."""
        steps = list(raycast.raycast([0.5, 0.5, 0.5], [1, 1, 1], t_max=0.9))
        assert steps[1].cube == (0, 0, 1)


class TestColor:
    def test_srgb_round_trip(self):
        v = np.linspace(0, 1, 64, dtype=np.float32)
        out = np.asarray(color.srgb_decode(color.srgb_encode(v)))
        np.testing.assert_allclose(out, v, atol=1e-5)

    def test_composite_over(self):
        light, trans = color.composite_over(
            np.zeros(3), 1.0, np.array([0.5, 0.0, 0.0]), 0.5
        )
        np.testing.assert_allclose(light, [0.5, 0, 0])
        light, trans = color.composite_over(light, trans, np.array([0.0, 1.0, 0.0]), 0.0)
        np.testing.assert_allclose(light, [0.5, 0.5, 0])
        assert trans == 0.0
