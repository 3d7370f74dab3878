"""GridAab tests ported from the reference
(all-is-cubes-base/src/math/grid_aab.rs tests)."""

import pytest

from aic_tpu.math.grid import GridAab, Gridgid, rotation_from_name

I32_MAX = 2**31 - 1
I32_MIN = -(2**31)


class TestConstruction:
    def test_zero_is_valid(self):
        """grid_aab.rs zero_is_valid."""
        a = GridAab.from_lower_size((1, 2, 3), (0, 1, 1))
        b = GridAab.from_lower_upper((1, 2, 3), (1, 3, 4))
        assert a == b
        assert a.volume() == 0

    def test_for_block(self):
        """grid_aab.rs for_block."""
        for r in (1, 16, 128):
            assert GridAab.for_block(r) == GridAab.from_lower_size(
                (0, 0, 0), (r, r, r)
            )

    def test_negative_size_rejected(self):
        with pytest.raises(ValueError):
            GridAab((0, 0, 0), (-1, 1, 1))


class TestDivide:
    def test_divide_to_one_cube(self):
        """grid_aab.rs divide_to_one_cube — rounds outward."""
        assert GridAab.from_lower_size((11, 22, 33), (1, 1, 1)).divide(
            10
        ) == GridAab.from_lower_size((1, 2, 3), (1, 1, 1))

    def test_divide_by_zero(self):
        with pytest.raises(ValueError):
            GridAab.from_lower_size((-10, -10, -10), (20, 20, 20)).divide(0)

    def test_divide_by_negative(self):
        with pytest.raises(ValueError):
            GridAab.from_lower_size((-10, -10, -10), (20, 20, 20)).divide(-10)

    def test_divide_negative_rounds_down(self):
        """Floor semantics on the negative side."""
        assert GridAab.from_lower_size((-10, -10, -10), (20, 20, 20)).divide(
            10
        ) == GridAab.from_lower_size((-1, -1, -1), (2, 2, 2))


class TestTransform:
    def test_transform_general(self):
        """grid_aab.rs transform_general."""
        rot = rotation_from_name("RYXz")
        got = GridAab.from_lower_size((1, 2, 3), (10, 20, 30)).transform(
            Gridgid(rot, (100, 100, 100))
        )
        assert got == GridAab.from_lower_size((102, 101, 67), (20, 10, 30))


class TestTranslateOverflow:
    def test_translate_overflow_partial(self):
        """grid_aab.rs translate_overflow_partial — clipped to range."""
        assert GridAab.from_lower_size((0, 0, 0), (100, 20, 30)).translate(
            (I32_MAX - 50, 0, 0)
        ) == GridAab.from_lower_size((I32_MAX - 50, 0, 0), (50, 20, 30))
        assert GridAab.from_lower_size((-100, 0, 0), (100, 20, 30)).translate(
            (I32_MIN + 50, 0, 0)
        ) == GridAab.from_lower_size((I32_MIN, 0, 0), (50, 20, 30))

    def test_translate_overflow_total(self):
        """grid_aab.rs translate_overflow_total — squashed to zero."""
        assert GridAab.from_lower_size((100, 0, 0), (100, 20, 30)).translate(
            (I32_MAX - 50, 0, 0)
        ) == GridAab.from_lower_size((I32_MAX, 0, 0), (0, 20, 30))
        assert GridAab.from_lower_size((-200, 0, 0), (100, 20, 30)).translate(
            (I32_MIN + 50, 0, 0)
        ) == GridAab.from_lower_size((I32_MIN, 0, 0), (0, 20, 30))

    def test_translate_normal(self):
        assert GridAab.from_lower_size((1, 2, 3), (4, 5, 6)).translate(
            (10, -10, 0)
        ) == GridAab.from_lower_size((11, -8, 3), (4, 5, 6))


class TestMultiply:
    def test_multiply_roundtrip_divide(self):
        b = GridAab.from_lower_size((-2, 0, 3), (4, 5, 6))
        assert b.multiply(4).divide(4) == b
