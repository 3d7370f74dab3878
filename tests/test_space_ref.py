"""Space semantics tests ported from the reference
(all-is-cubes/src/space/tests.rs): set/fill contracts, palette
forgetting, extraction, change journal, and light-dirty marking."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import AIR
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space, SpacePhysics

I32_MAX = 2**31 - 1
I32_MIN = -(2**31)


def make_some_blocks(n):
    """content/testing make_some_blocks analog: n distinct opaque blocks."""
    return [
        block.from_color((0.1 + 0.8 * i / max(n - 1, 1), 0.2, 0.3, 1.0), f"b{i}")
        for i in range(n)
    ]


class TestInitialState:
    def test_initial_state_consistency(self):
        """tests.rs:36 — various shapes construct and snapshot cleanly."""
        for size in [(0, 0, 0), (1, 0, 0), (1, 1, 1), (10, 20, 30)]:
            sp = Space(GridAab.from_lower_size((0, 0, 0), size))
            assert sp.contents.shape == size
            sp.snapshot()
        sp = Space(GridAab.from_lower_size((1, 2, 3), (10, 20, 30)))
        assert sp.bounds.lower == (1, 2, 3)
        sp.snapshot()


class TestSet:
    def test_set_success(self):
        """tests.rs:53 — set returns True on change, False when the cube
        already holds the block."""
        first, second = make_some_blocks(2)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
        assert sp.set((0, 0, 0), first) is True
        assert sp.block_at((0, 0, 0)) == first
        assert sp.set((0, 0, 0), first) is False
        assert sp.block_at((0, 0, 0)) == first
        assert sp.set((0, 0, 0), second) is True
        assert sp.block_at((0, 0, 0)) == second

    def test_set_failure_out_of_bounds(self):
        """tests.rs:125 — both block and AIR sets fail out of bounds."""
        [b] = make_some_blocks(1)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
        with pytest.raises(IndexError):
            sp.set((1, 0, 0), b)
        with pytest.raises(IndexError):
            sp.set((1, 0, 0), AIR)

    def test_set_updates_evaluated_on_added_block(self):
        """tests.rs:179 — index allocation and evaluated-data wiring."""
        from aic_tpu.block import evaluate

        [b] = make_some_blocks(1)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        sp.set((0, 0, 0), b)
        assert sp.index_at((0, 0, 0)) == 1
        assert sp.index_at((1, 0, 0)) == 0
        ev = sp.evaluated_block_at((0, 0, 0))
        np.testing.assert_array_equal(ev.color, evaluate(b).color)

    def test_set_no_neighbor_overflow_high(self):
        """tests.rs:231 — no arithmetic overflow at the i32 top corner."""
        [b] = make_some_blocks(1)
        corner = (I32_MAX - 1,) * 3
        sp = Space(GridAab.from_lower_size(corner, (1, 1, 1)))
        sp.set(corner, b)
        assert sp.block_at(corner) == b

    def test_set_no_neighbor_overflow_low(self):
        """tests.rs:240."""
        [b] = make_some_blocks(1)
        corner = (I32_MIN,) * 3
        sp = Space(GridAab.from_lower_size(corner, (1, 1, 1)))
        sp.set(corner, b)
        assert sp.block_at(corner) == b


class TestPaletteForgetting:
    def test_removed_blocks_are_forgotten(self):
        """tests.rs:248 — distinct_blocks drops blocks no longer present
        (we compare as sets: our palette keeps AIR pinned at index 0, so
        index order differs from the reference's recycling order)."""
        b0, b1, b2 = make_some_blocks(3)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        assert set(sp.distinct_blocks()) == {AIR}
        sp.set((0, 0, 0), b0)
        assert set(sp.distinct_blocks()) == {AIR, b0}
        sp.set((1, 0, 0), b1)
        assert set(sp.distinct_blocks()) == {b0, b1}
        sp.set((0, 0, 0), b2)
        assert set(sp.distinct_blocks()) == {b1, b2}
        # Reinserting an old block after GC allocates a fresh slot.
        sp._collect_garbage()
        sp.set((1, 0, 0), b0)
        assert set(sp.distinct_blocks()) == {b0, b2}

    def test_gc_recycles_slots(self):
        """Palette slots freed by GC are reused rather than growing."""
        blocks = make_some_blocks(12)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
        for b in blocks:
            sp.set((0, 0, 0), b)
        before = sp.palette_len()
        freed = sp._collect_garbage()
        assert freed == len(blocks) - 1
        sp.set((0, 0, 0), block.from_color((0, 0, 1, 1), "fresh"))
        assert sp.palette_len() == before  # reused a slot, did not grow

    def test_replace_last_block_regression(self):
        """tests.rs:440 — replacing the last instance of a block with an
        already-present block stays consistent."""
        [b] = make_some_blocks(1)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (3, 1, 1)))
        for i in range(3):
            sp.set((i, 0, 0), b)
            counts = np.bincount(
                sp.contents.ravel(), minlength=sp.palette_len()
            )
            assert counts[sp.index_at((i, 0, 0))] == i + 1


class TestFill:
    def test_fill_out_of_bounds_strict(self):
        """tests.rs:375 — clip=False matches the reference error."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        with pytest.raises(IndexError):
            sp.fill(GridAab.from_lower_size((1, 0, 0), (1, 2, 1)), AIR, clip=False)

    def test_fill_entire_space_marks_light_dirty(self):
        """tests.rs:392 — every filled cube enters the light-update
        queue (our dirty mask)."""
        b = block.from_color((0.0, 0.0, 0.0, 0.5))
        bounds = GridAab.from_lower_size((0, 3, 0), (40, 16, 2))
        sp = Space(bounds)
        sp.fill(bounds, b)
        for cube in [(0, 3, 0), (39, 18, 1), (20, 10, 0)]:
            assert sp.block_at(cube) == b
        assert (sp.light_dirty > 0).all()

    def test_fill_uniform_entire_space_journal(self):
        """tests.rs:413 — bulk fill reports an every-block change."""
        [b] = make_some_blocks(1)
        bounds = GridAab.from_lower_size((0, 3, 0), (40, 16, 2))
        sp = Space(bounds)
        sp.drain_edits()
        sp.fill(bounds, b)
        assert sp.drain_edits() == "all"


class TestExtract:
    def test_extract(self):
        """tests.rs:341 — sub-region copy preserves blocks and bounds."""
        b0, b1 = make_some_blocks(2)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        sp.set((0, 0, 0), b0)
        sp.set((1, 0, 0), b1)
        region = GridAab.from_lower_size((1, 0, 0), (1, 1, 1))
        out = sp.extract(region)
        assert out.bounds == region
        assert out.block_at((1, 0, 0)) == b1

    def test_extract_out_of_bounds(self):
        """tests.rs:368."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        with pytest.raises(IndexError):
            sp.extract(GridAab.from_lower_size((1, 0, 0), (1, 2, 1)))


class TestChangeJournal:
    def test_change_listener_simple(self):
        """tests.rs:288 — an edit is journaled; a no-op set is not."""
        [b] = make_some_blocks(1)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        sp.drain_edits()
        assert sp.set((0, 0, 0), b) is True
        assert sp.drain_edits() == {(0, 0, 0)}
        assert sp.set((0, 0, 0), b) is False
        assert sp.drain_edits() == set()
