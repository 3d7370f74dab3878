"""SpaceTransaction tests ported from the reference
(all-is-cubes/src/space/space_txn.rs tests): out-of-bounds rules and
the merge compatibility table."""

import pytest

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space
from aic_tpu.universe import (
    PreconditionFailed,
    SpaceTransaction,
    TransactionConflict,
)


def one_cube_space():
    return Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))


B1 = block.from_color((1, 0, 0, 1), "b1")
B2 = block.from_color((0, 1, 0, 1), "b2")


class TestOutOfBounds:
    def test_set_out_of_bounds_conserved_fails(self):
        """space_txn.rs:801 — fails at check, not commit."""
        txn = SpaceTransaction.set_cube((1, 0, 0), new=B1)
        with pytest.raises(PreconditionFailed):
            txn.check(one_cube_space())

    def test_set_out_of_bounds_nonconserved_succeeds(self):
        """space_txn.rs:810 — non-conserved writes outside bounds are
        silently skipped."""
        sp = one_cube_space()
        txn = SpaceTransaction.set_cube((1, 0, 0), new=B1, conserved=False)
        txn.check(sp)
        txn.commit(sp)
        assert sp.index_at((0, 0, 0)) == 0  # nothing changed

    def test_compare_out_of_bounds_conserved_fails(self):
        """space_txn.rs:823."""
        txn = SpaceTransaction.set_cube((1, 0, 0), old=B1)
        with pytest.raises(PreconditionFailed):
            txn.check(one_cube_space())

    def test_compare_out_of_bounds_nonconserved_fails(self):
        """space_txn.rs:831 — compares always fail out of bounds."""
        txn = SpaceTransaction.set_cube((1, 0, 0), old=B1, conserved=False)
        with pytest.raises(PreconditionFailed):
            txn.check(one_cube_space())


class TestMergeTable:
    """space_txn.rs:881-962 merge compatibility."""

    def test_merge_allows_independent(self):
        a = SpaceTransaction.set_cube((0, 0, 0), old=None, new=B1)
        b = SpaceTransaction.set_cube((1, 0, 0), old=None, new=B2)
        m = a.merge(b)
        assert set(m.cubes) == {(0, 0, 0), (1, 0, 0)}

    def test_merge_rejects_same_new_conserved(self):
        a = SpaceTransaction.set_cube((0, 0, 0), new=B1)
        b = SpaceTransaction.set_cube((0, 0, 0), new=B1)
        with pytest.raises(TransactionConflict):
            a.merge(b)

    def test_merge_allows_same_new_nonconserved(self):
        a = SpaceTransaction.set_cube((0, 0, 0), new=B1, conserved=False)
        b = SpaceTransaction.set_cube((0, 0, 0), new=B1, conserved=False)
        m = a.merge(b)
        assert m.cubes[(0, 0, 0)].new == B1

    def test_merge_rejects_different_new_conserved(self):
        a = SpaceTransaction.set_cube((0, 0, 0), new=B1)
        b = SpaceTransaction.set_cube((0, 0, 0), new=B2)
        with pytest.raises(TransactionConflict):
            a.merge(b)

    def test_merge_rejects_different_new_nonconserved(self):
        a = SpaceTransaction.set_cube((0, 0, 0), new=B1, conserved=False)
        b = SpaceTransaction.set_cube((0, 0, 0), new=B2, conserved=False)
        with pytest.raises(TransactionConflict):
            a.merge(b)

    def test_merge_rejects_different_old(self):
        a = SpaceTransaction.set_cube((0, 0, 0), old=B1)
        b = SpaceTransaction.set_cube((0, 0, 0), old=B2)
        with pytest.raises(TransactionConflict):
            a.merge(b)

    def test_merge_allows_same_old(self):
        a = SpaceTransaction.set_cube((0, 0, 0), old=B1)
        b = SpaceTransaction.set_cube((0, 0, 0), old=B1)
        m = a.merge(b)
        assert m.cubes[(0, 0, 0)].old == B1
