"""Raycaster tests ported from the reference
(all-is-cubes-base/src/raycast/tests.rs). The host raycaster is the
semantic oracle for the device DDA, so these pin its step sequence,
faces, and t-distances to the reference's published expectations."""

import numpy as np
import pytest

from aic_tpu.math import faces
from aic_tpu.math.grid import GridAab
from aic_tpu.math.raycast import (
    RaycastStep,
    raycast,
    recursive_raycast_ray,
    scale_to_integer_step,
)

NX, NY, NZ, PX, PY, PZ = faces.NX, faces.NY, faces.NZ, faces.PX, faces.PY, faces.PZ
WITHIN = faces.WITHIN
I32_MAX = 2**31 - 1
I32_MIN = -(2**31)


def assert_prefix(steps, expected):
    """Each expected item is (cube, face, t) — compared exactly like
    tests.rs assert_steps_have_prefix (t approximate at 1e-12 rel since
    we don't chase bit-identical fast-forward arithmetic)."""
    it = iter(steps)
    for i, (cube, face, t) in enumerate(expected):
        s = next(it, None)
        assert s is not None, f"step {i}: expected {cube}, got end"
        assert s.cube == cube, f"step {i}: expected cube {cube}, got {s.cube}"
        assert s.face == face, f"step {i}: expected face {face}, got {s.face}"
        assert s.t_distance == pytest.approx(t, rel=1e-12, abs=1e-12), (
            f"step {i}: expected t {t}, got {s.t_distance}"
        )


def assert_exact(steps, expected):
    """assert_steps_option analog: the full finite sequence must match."""
    got = list(steps)
    assert len(got) == len(expected), f"expected {len(expected)} steps, got {got}"
    assert_prefix(got, expected)


class TestBasicTraversal:
    def test_simple_almost_1d(self):
        """tests.rs:97 — all six dominant directions."""
        o = (10.5, 20.5, 30.5)
        cases = [
            ((0.01, 0.0001, 0.0001), [(11, 20, 30), (12, 20, 30)], NX),
            ((-0.01, 0.0001, 0.0001), [(9, 20, 30), (8, 20, 30)], PX),
            ((0.0001, 0.01, 0.0001), [(10, 21, 30), (10, 22, 30)], NY),
            ((0.0001, -0.01, 0.0001), [(10, 19, 30), (10, 18, 30)], PY),
            ((0.0001, 0.0001, 0.01), [(10, 20, 31), (10, 20, 32)], NZ),
            ((0.0001, 0.0001, -0.01), [(10, 20, 29), (10, 20, 28)], PZ),
        ]
        for d, cubes, face in cases:
            assert_prefix(
                raycast(o, d),
                [((10, 20, 30), WITHIN, 0.0)]
                + [(c, face, t) for c, t in zip(cubes, (50.0, 150.0))],
            )

    def test_simple_exactly_1d(self):
        """tests.rs:152 — exactly axis-aligned directions."""
        o = (10.5, 20.5, 30.5)
        assert_prefix(
            raycast(o, (0.01, 0.0, 0.0)),
            [
                ((10, 20, 30), WITHIN, 0.0),
                ((11, 20, 30), NX, 50.0),
                ((12, 20, 30), NX, 150.0),
            ],
        )
        assert_prefix(
            raycast(o, (-0.01, 0.0, 0.0)),
            [
                ((10, 20, 30), WITHIN, 0.0),
                ((9, 20, 30), PX, 50.0),
                ((8, 20, 30), PX, 150.0),
            ],
        )

    def test_direction_zero_produces_origin_cube_only(self):
        """tests.rs:169."""
        assert_exact(
            raycast((10.5, 20.5, 30.5), (0.0, 0.0, 0.0)),
            [((10, 20, 30), WITHIN, 0.0)],
        )

    def test_direction_nan_produces_origin_cube_only(self):
        """tests.rs:185 — a NaN component invalidates the direction."""
        assert_exact(
            raycast((10.5, 20.5, 30.5), (1.0, 2.0, float("nan"))),
            [((10, 20, 30), WITHIN, 0.0)],
        )

    def test_start_on_cube_edge_parallel(self):
        """tests.rs:199 — origin exactly on a boundary, ray along it."""
        cases = [
            ((10.0, 20.5, 30.5), (2.0, 0.1, 0.1), [(10, 20, 30), (11, 20, 30), (12, 20, 30)], NX),
            ((10.0, 20.5, 30.5), (-2.0, 0.1, 0.1), [(10, 20, 30), (9, 20, 30), (8, 20, 30)], PX),
            ((-10.0, 20.5, 30.5), (2.0, 0.1, 0.1), [(-10, 20, 30), (-9, 20, 30), (-8, 20, 30)], NX),
            ((-10.0, 20.5, 30.5), (-2.0, 0.1, 0.1), [(-10, 20, 30), (-11, 20, 30), (-12, 20, 30)], PX),
        ]
        for o, d, cubes, face in cases:
            assert_prefix(
                raycast(o, d),
                [(cubes[0], WITHIN, 0.0), (cubes[1], face, 0.5), (cubes[2], face, 1.0)],
            )

    def test_start_on_cube_edge_perpendicular(self):
        """tests.rs:241 — origin exactly on a boundary, ray across it."""
        assert_prefix(
            raycast((10.0, 20.5, 30.5), (0.125, 1.0, 0.0)),
            [
                ((10, 20, 30), WITHIN, 0.0),
                ((10, 21, 30), NY, 0.5),
                ((10, 22, 30), NY, 1.5),
            ],
        )
        assert_prefix(
            raycast((-10.0, -20.5, 30.5), (-0.125, -1.0, 0.0)),
            [
                ((-10, -21, 30), WITHIN, 0.0),
                ((-10, -22, 30), PY, 0.5),
                ((-10, -23, 30), PY, 1.5),
            ],
        )

    def test_regression_1(self):
        """tests.rs:385 — an axis-aligned ray that wasn't working."""
        assert_prefix(
            raycast((4.833333333333334, 4.666666666666666, -3.0), (0.0, 0.0, 10.0)),
            [
                ((4, 4, -3), WITHIN, 0.0),
                ((4, 4, -2), NZ, 0.1),
                ((4, 4, -1), NZ, 0.2),
            ],
        )


class TestIntegerLimits:
    def test_start_outside_of_integer_range(self):
        """tests.rs:290 — origin cube unrepresentable → no steps."""
        for o, d in [
            ((0.5, 0.5, I32_MAX + 1.5), (0.0, 0.0, -1.0)),
            ((0.5, 0.5, I32_MAX + 2.5), (0.0, 0.0, -1.0)),
            ((0.5, 0.5, I32_MIN - 0.5), (0.0, 0.0, 1.0)),
            ((0.5, 0.5, I32_MIN - 1.5), (0.0, 0.0, 1.0)),
        ]:
            assert list(raycast(o, d)) == []

    @pytest.mark.parametrize("include_exit", [False, True])
    def test_start_outside_of_integer_range_with_bounds(self, include_exit):
        """tests.rs:309 fuzz regression."""
        bounds = GridAab.from_lower_size((0, 0, 0), (10, 10, 10))
        assert (
            list(
                raycast(
                    (0.0, 1e303, 0.0),
                    (0.0, -1e303, 0.0),
                    bounds=bounds,
                    include_exit=include_exit,
                )
            )
            == []
        )

    def test_exiting_integer_limit_positive(self):
        """tests.rs:318 — never report a cube at i32::MAX."""
        highest = I32_MAX - 1
        assert_exact(
            raycast((0.5, 0.5, float(highest) - 0.5), (0.0, 0.0, 1.0), max_steps=10),
            [
                ((0, 0, highest - 1), WITHIN, 0.0),
                ((0, 0, highest), NZ, 0.5),
            ],
        )

    def test_exiting_integer_limit_negative(self):
        """tests.rs:337."""
        lowest = I32_MIN
        assert_exact(
            raycast((0.5, 0.5, float(lowest) + 1.5), (0.0, 0.0, -1.0), max_steps=10),
            [
                ((0, 0, lowest + 1), WITHIN, 0.0),
                ((0, 0, lowest), PZ, 0.5),
            ],
        )


class TestWithinBounds:
    @pytest.mark.parametrize("include_exit", [False, True])
    def test_start_just_past_bounds(self, include_exit):
        """tests.rs:283 — moving away, never inside → nothing."""
        assert (
            list(
                raycast(
                    (1.5, 0.5, 0.5),
                    (1.0, 0.0, 0.0),
                    bounds=GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
                    include_exit=include_exit,
                )
            )
            == []
        )

    @pytest.mark.parametrize("include_exit", [False, True])
    def test_within_bounds(self, include_exit):
        """tests.rs:353 — diagonal ray through thin bounds; the exit step
        (cube out of bounds) appears iff include_exit."""
        bounds = GridAab.from_lower_size((2, -10, -10), (2, 20, 20))
        expected = [
            ((2, 1, 1), NX, 2.0),
            ((2, 2, 1), NY, 2.25),
            ((2, 2, 2), NZ, 2.5),
            ((3, 2, 2), NX, 3.0),
            ((3, 3, 2), NY, 3.25),
            ((3, 3, 3), NZ, 3.5),
        ]
        if include_exit:
            expected.append(((4, 3, 3), NX, 4.0))
        assert_exact(
            raycast(
                (0.0, -0.25, -0.5),
                (1.0, 1.0, 1.0),
                bounds=bounds,
                include_exit=include_exit,
            ),
            expected,
        )

    @pytest.mark.parametrize("include_exit", [False, True])
    def test_regression_2(self, include_exit):
        """tests.rs:400 — axis-aligned ray missing the bounds → nothing."""
        bounds = GridAab.from_lower_size((0, 0, 0), (10, 10, 10))
        assert (
            list(
                raycast(
                    (18.166666666666668, 4.666666666666666, -3.0),
                    (0.0, 0.0, 16.0),
                    bounds=bounds,
                    include_exit=include_exit,
                )
            )
            == []
        )

    def test_regression_long_distance_fast_forward(self):
        """tests.rs:417 — ~86M cubes of empty distance must be skipped by
        fast-forward, landing on the same entry step."""
        steps = list(
            raycast(
                (6.749300603672869e-67, 6.750109954921438e-67, -85891558.96000093),
                (1.1036366354256313e-305, 0.0, 8589152896.000092),
                bounds=GridAab.from_lower_size((-10, -20, -30), (20, 40, 60)),
                include_exit=True,
                max_steps=200,
            )
        )
        assert steps, "fast-forward failed to reach the bounds"
        s = steps[0]
        assert s.cube == (0, 0, -30) and s.face == NZ
        assert s.t_distance == pytest.approx(0.01, rel=1e-9)

    def test_regression_invalid_position_from_beginning(self):
        """tests.rs:436 fuzz — subnormal direction, origin on the closed
        upper bound → no steps (and no hang)."""
        assert (
            list(
                raycast(
                    (10.0, 1.1319598848574732e-72, 2.848094540588472e-306),
                    (-3.39850991e-315, 3.53100099615357e-310, 0.0),
                    bounds=GridAab.from_lower_upper((-10, -20, -30), (10, 20, 30)),
                    max_steps=1000,
                )
            )
            == []
        )


class TestIntersectionPoint:
    def test_intersection_point_positive_face(self):
        """tests.rs:452."""
        o, d = (0.5, 0.5, 0.5), (-1.0, 0.0, 0.0)
        it = raycast(o, d)
        np.testing.assert_array_equal(next(it).intersection_point(o, d), (0.5, 0.5, 0.5))
        np.testing.assert_array_equal(next(it).intersection_point(o, d), (0.0, 0.5, 0.5))
        np.testing.assert_array_equal(next(it).intersection_point(o, d), (-1.0, 0.5, 0.5))

    def test_intersection_point_random(self):
        """tests.rs:465 — every bounded cast through the origin cube makes
        0 or 2 steps (entry+exit), with intersection points on the surface
        (or the origin, for WITHIN steps)."""
        bounds = GridAab.from_lower_size((0, 0, 0), (1, 1, 1))
        rng = np.random.default_rng(0)
        for case in range(1000):
            o = rng.uniform(-1.0, 2.0, 3)
            d = rng.uniform(-1.0, 1.0, 3)
            steps = list(raycast(o, d, bounds=bounds, include_exit=True, max_steps=500))
            assert len(steps) in (0, 2), f"case {case}: {steps}"
            for s in steps:
                p = s.intersection_point(o, d)
                surfaces = sum(1 for a in range(3) if p[a] == 0.0 or p[a] == 1.0)
                interiors = sum(1 for a in range(3) if 0.0 < p[a] < 1.0)
                assert surfaces + interiors == 3 and (
                    surfaces > 0 or s.face == WITHIN
                ), f"case {case}: invalid point {p} from {s}"


class TestRecursive:
    def test_recursive_simple(self):
        """tests.rs:508 — rescaling into an R4 block's voxel grid."""
        o, d = (-1.0, 10.125, 0.125), (1.0, 0.0, 0.0)
        outer = list(raycast(o, d, max_steps=3))[1]
        assert outer.cube == (0, 10, 0)
        io, idir = recursive_raycast_ray(o, d, outer.cube, 4)
        np.testing.assert_array_equal(io, (-4.0, 0.5, 0.5))
        np.testing.assert_array_equal(idir, (1.0, 0.0, 0.0))
        assert_exact(
            raycast(io, idir, bounds=GridAab.from_lower_size((0, 0, 0), (4, 4, 4)), include_exit=True),
            [
                ((0, 0, 0), NX, 4.0),
                ((1, 0, 0), NX, 5.0),
                ((2, 0, 0), NX, 6.0),
                ((3, 0, 0), NX, 7.0),
                ((4, 0, 0), NX, 8.0),
            ],
        )


class TestScaleToIntegerStep:
    def test_basics(self):
        """tests.rs:537."""
        assert scale_to_integer_step(1.25, 0.25) == 3.0
        assert scale_to_integer_step(1.25, -0.25) == 1.0
        assert scale_to_integer_step(-1.25, 0.25) == 1.0
        assert scale_to_integer_step(-1.25, -0.25) == 3.0

    def test_positive_and_negative_zero(self):
        """tests.rs:545."""
        inf = float("inf")
        assert scale_to_integer_step(1.5, 0.0) == inf
        assert scale_to_integer_step(1.5, -0.0) == inf
        assert scale_to_integer_step(0.0, 0.0) == inf
        assert scale_to_integer_step(0.0, -0.0) == inf
        assert scale_to_integer_step(-0.0, 0.0) == inf

    def test_starting_on_integer(self):
        """tests.rs:554."""
        assert scale_to_integer_step(3.0, 0.5) == 2.0
        assert scale_to_integer_step(3.0, -0.5) == 2.0
        assert scale_to_integer_step(-3.0, 0.5) == 2.0
        assert scale_to_integer_step(-3.0, -0.5) == 2.0

    def test_nan_propagation(self):
        """tests.rs:562."""
        nan = float("nan")
        assert np.isnan(scale_to_integer_step(1.5, nan))
        assert np.isnan(scale_to_integer_step(nan, 1.0))
        assert np.isnan(scale_to_integer_step(nan, 0.0))

    def test_small_offset(self):
        """tests.rs:569 fuzz edge case — subnormal s with zero ds."""
        assert scale_to_integer_step(-1.9656826074480345e-262, 0.0) == float("inf")
