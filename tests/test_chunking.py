"""ChunkChart + octant mask tests, ported from the reference's own
table-driven suite (all-is-cubes/src/chunking.rs:612-780 and
all-is-cubes-base/src/math/octant.rs doctests)."""

import numpy as np

from aic_tpu.math import octant as oct
from aic_tpu.math.chunking import (
    ChunkChart,
    chunk_distance_squared_for_view,
    cube_to_chunk,
    point_to_chunk,
)


def rows(a):
    return [tuple(int(v) for v in r) for r in np.asarray(a)]


class TestOctant:
    def test_from_vector(self):
        assert oct.octant_from_vector((1.0, 1.0, 1.0)) == oct.PPP
        assert oct.octant_from_vector((-1.0, 1.0, -1.0)) == oct.NPN
        # >= 0 counts as positive (octant.rs:114)
        assert oct.octant_from_vector((0.0, 0.0, 0.0)) == oct.PPP

    def test_opposite(self):
        # octant.rs doctest: Pnp.opposite() == Npn
        assert oct.octant_opposite(oct.PNP) == oct.NPN

    def test_reflect(self):
        assert tuple(oct.octant_reflect(oct.NNN, (1, 2, 3))) == (-1, -2, -3)
        assert tuple(oct.octant_reflect(oct.PNP, (1, 2, 3))) == (1, -2, 3)

    def test_mask_from_face(self):
        from aic_tpu.math import faces

        # +X side = octants with bit 2 set = flags 0xF0.
        assert oct.mask_from_face(faces.PX) == 0xF0
        assert oct.mask_from_face(faces.NX) == 0x0F

    def test_collapse_to_negative(self):
        # collapsing all axes of ALL leaves only octant 0
        m = oct.mask_collapse_to_negative(oct.ALL_MASK, True, True, True)
        assert list(oct.mask_octants(m)) == [oct.NNN]


class TestDistance:
    def test_nearest_approach_cases(self):
        """chunking.rs:577-600 min_distance_squared_cases (in chunk units)."""
        def d(pos):
            n, _ = chunk_distance_squared_for_view(np.asarray([pos]))
            return int(n[0])

        assert d([0, 0, 0]) == 0
        assert d([1, 0, 0]) == 0
        assert d([-1, 0, 0]) == 0
        assert d([1, 1, 1]) == 0
        assert d([2, 0, 0]) == 1
        assert d([2, 2, 2]) == 3
        assert d([-2, 2, 2]) == 3
        assert d([-2, -2, 2]) == 3


class TestChunkChart:
    def test_zero_size(self):
        """chunking.rs:615 chunk_chart_zero_size: nothing, not even the
        origin chunk."""
        chart = ChunkChart(0.0, chunk_size=16)
        assert len(chart.chunks((1, 2, 3))) == 0
        assert chart.count_all() == 0

    def test_epsilon_size(self):
        """chunking.rs:624 chunk_chart_epsilon_size: exact 27-chunk order."""
        chart = ChunkChart(0.00001, chunk_size=16)
        got = rows(chart.chunks((0, 0, 0)))
        assert got == [
            (0, 0, 0),
            # Face meetings.
            (0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (-1, 0, 0), (1, 0, 0),
            # Edge meetings.
            (0, -1, -1), (0, -1, 1), (0, 1, -1), (0, 1, 1),
            (-1, 0, -1), (-1, 0, 1), (1, 0, -1), (1, 0, 1),
            (-1, -1, 0), (-1, 1, 0), (1, -1, 0), (1, 1, 0),
            # Corner meetings.
            (-1, -1, -1), (-1, -1, 1), (-1, 1, -1), (-1, 1, 1),
            (1, -1, -1), (1, -1, 1), (1, 1, -1), (1, 1, 1),
        ]

    def test_masked(self):
        """chunking.rs:663 chunk_chart_masked: Ppp|Ppn|Pnn octants only."""
        chart = ChunkChart(0.00001, chunk_size=16)
        mask = (1 << oct.PPP) | (1 << oct.PPN) | (1 << oct.PNN)
        got = rows(chart.chunks((0, 0, 0), mask=mask))
        assert got == [
            (0, 0, 0),
            # Face meetings. No -X for this mask.
            (0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (1, 0, 0),
            # Edge meetings.
            (0, -1, -1), (0, 1, -1), (0, 1, 1),
            (1, 0, -1), (1, 0, 1),
            (1, -1, 0), (1, 1, 0),
            # Corner meetings: only the chosen octants.
            (1, -1, -1), (1, 1, -1), (1, 1, 1),
        ]

    def test_radius_break_even(self):
        """A chart of radius one chunk: all chunks touching the origin
        chunk sphere; sorted near-to-far by nearest approach."""
        chart = ChunkChart(17.0, chunk_size=16)
        got = chart.chunks()
        nearest_sq, _ = chunk_distance_squared_for_view(got)
        assert (np.diff(nearest_sq) >= 0).all()
        assert tuple(got[0]) == (0, 0, 0)
        # strict `<`: (2,0,0) has nearest 1 < (17/16)² ceil = 2 → included
        assert (2, 0, 0) in rows(got)

    def test_no_duplicates_and_symmetric(self):
        chart = ChunkChart(100.0, chunk_size=16)
        got = rows(chart.chunks())
        assert len(got) == len(set(got))
        s = set(got)
        for c in got:
            assert (-c[0], c[1], c[2]) in s
            assert (c[0], -c[1], c[2]) in s
            assert (c[0], c[1], -c[2]) in s

    def test_resize(self):
        chart = ChunkChart(100.0, chunk_size=16)
        n_big = chart.count_all()
        chart.resize_if_needed(30.0)
        assert chart.count_all() < n_big

    def test_view_direction_mask_culls(self):
        chart = ChunkChart(64.0, chunk_size=16)
        # Looking straight toward +X: frustum corner dirs all +X-ish.
        mask = oct.view_direction_mask(
            [[1.0, -0.5, -0.5], [1.0, 0.5, -0.5], [1.0, -0.5, 0.5], [1.0, 0.5, 0.5]]
        )
        full = chart.chunks()
        masked = chart.chunks(mask=mask)
        assert len(masked) < len(full)
        # Nothing strictly on the -X side survives.
        assert (masked[:, 0] >= -0x0).all() or (masked[masked[:, 0] < 0] == 0).all()
        assert not (masked[:, 0] < 0).any()


class TestConversions:
    def test_cube_to_chunk(self):
        assert cube_to_chunk((0, 0, 0)) == (0, 0, 0)
        assert cube_to_chunk((-1, 16, 31)) == (-1, 1, 1)
        assert cube_to_chunk((-17, -16, 15)) == (-2, -1, 0)

    def test_point_to_chunk(self):
        assert point_to_chunk((0.5, -0.5, 16.0)) == (0, -1, 1)
