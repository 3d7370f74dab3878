"""Transaction laws, checked systematically across transaction types
(reference: all-is-cubes/src/transaction/tester.rs TransactionTester and
its uses in space_txn.rs / universe_txn.rs / inv/inventory.rs tests).

Each suite declares example transactions with effect predicates and
example targets; the tester exercises every transaction AND every
successful pairwise merge against every target, enforcing:
check-passes => commit-succeeds, and merged transactions keep all the
effects of both constituents."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space
from aic_tpu.testing.txn_tester import TransactionTester
from aic_tpu.universe import Universe
from aic_tpu.universe.cursor import (
    Inventory,
    InventoryConflict,
    InventoryTransaction,
    PlaceBlock,
    RemoveBlock,
    Stack,
)
from aic_tpu.universe.transaction import (
    SpaceTransaction,
    TransactionConflict,
    UniverseTransaction,
)

RED = block.from_color((0.9, 0.1, 0.1, 1.0), display_name="red")
GREEN = block.from_color((0.1, 0.9, 0.1, 1.0), display_name="green")
BLUE = block.from_color((0.1, 0.1, 0.9, 1.0), display_name="blue")


def _space_with_red():
    sp = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
    sp.set((0, 0, 0), RED)
    return sp


def _empty_space():
    return Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))


class TestSpaceTransactionLaws:
    def test_laws(self):
        def expects(cube, blk):
            def pred(before, after):
                assert after.block_at(cube) == blk, (
                    f"expected {blk.attributes.display_name} at {cube}"
                )

            return pred

        (
            TransactionTester()
            .transaction(
                SpaceTransaction.set_cube((1, 1, 1), new=GREEN),
                expects((1, 1, 1), GREEN),
            )
            .transaction(
                SpaceTransaction.set_cube((2, 2, 2), new=BLUE, conserved=False),
                expects((2, 2, 2), BLUE),
            )
            # CAS with precondition: applies only on the red target.
            .transaction(
                SpaceTransaction.set_cube((0, 0, 0), old=RED, new=GREEN),
                expects((0, 0, 0), GREEN),
            )
            # Conflicting write to (1,1,1): merge with the first must fail,
            # standalone must work.
            .transaction(
                SpaceTransaction.set_cube((1, 1, 1), new=BLUE),
                expects((1, 1, 1), BLUE),
            )
            .transaction(
                SpaceTransaction.emitting_fluff((3, 3, 3), "happened"),
                lambda before, after: None,
            )
            .target(_space_with_red)
            .target(_empty_space)
            .test()
        )

    def test_conserved_conflict_rules(self):
        """space_txn.rs:680: same-cube writes conflict unless BOTH are
        non-conserved and equal."""
        a = SpaceTransaction.set_cube((0, 0, 0), new=GREEN)
        b = SpaceTransaction.set_cube((0, 0, 0), new=GREEN)
        with pytest.raises(TransactionConflict):
            a.merge(b)  # conserved duplicates conflict
        c = SpaceTransaction.set_cube((0, 0, 0), new=GREEN, conserved=False)
        d = SpaceTransaction.set_cube((0, 0, 0), new=GREEN, conserved=False)
        merged = c.merge(d)
        assert merged.cubes[(0, 0, 0)].new == GREEN
        e = SpaceTransaction.set_cube((0, 0, 0), new=BLUE, conserved=False)
        with pytest.raises(TransactionConflict):
            c.merge(e)  # unequal writes conflict even when non-conserved

    def test_commit_never_errors_when_check_passed(self):
        """Out-of-bounds non-conserved writes pass check and commit as a
        silent skip (space_txn.rs:801-838)."""
        t = SpaceTransaction.set_cube((99, 0, 0), new=GREEN, conserved=False)
        sp = _empty_space()
        t.check(sp)
        t.commit(sp, None)  # must not raise
        assert sp.block_at((0, 0, 0)) == block.AIR


class TestUniverseTransactionLaws:
    def test_laws(self):
        def make_universe():
            u = Universe()
            u.insert_space("w", _space_with_red())
            return u

        def world_has(cube, blk):
            def pred(before, after):
                assert after.spaces["w"].block_at(cube) == blk

            return pred

        def member_exists(name):
            def pred(before, after):
                assert name in after.spaces

            return pred

        (
            TransactionTester()
            .transaction(
                UniverseTransaction(
                    spaces={"w": SpaceTransaction.set_cube((1, 0, 0), new=GREEN)}
                ),
                world_has((1, 0, 0), GREEN),
            )
            .transaction(
                UniverseTransaction.inserting("annex", _empty_space()),
                member_exists("annex"),
            )
            .transaction(
                UniverseTransaction(
                    spaces={"w": SpaceTransaction.set_cube((0, 0, 0), old=RED, new=BLUE)}
                ),
                world_has((0, 0, 0), BLUE),
            )
            .target(make_universe)
            .test()
        )

    def test_insert_conflict(self):
        sp1, sp2 = _empty_space(), _empty_space()
        a = UniverseTransaction.inserting("x", sp1)
        b = UniverseTransaction.inserting("x", sp2)
        with pytest.raises(TransactionConflict):
            a.merge(b)
        # Same object is mergeable (idempotent insert).
        assert a.merge(UniverseTransaction.inserting("x", sp1)).inserts["x"] is sp1


class TestInventoryTransactionLaws:
    def test_laws(self):
        def fresh_inventory():
            return Inventory(slots=[Stack(RemoveBlock(), 1), None, None])

        def has_tool(kind):
            def pred(before, after):
                assert any(
                    isinstance(getattr(s, "tool", s), kind)
                    for s in after.slots
                    if s is not None
                ), f"no {kind.__name__} in {after.slots}"

            return pred

        (
            TransactionTester(conflict_types=(InventoryConflict,))
            .transaction(
                InventoryTransaction.insert_items([PlaceBlock(GREEN)]),
                has_tool(PlaceBlock),
            )
            .transaction(
                InventoryTransaction.insert_items([RemoveBlock()]),
                has_tool(RemoveBlock),
            )
            .transaction(
                InventoryTransaction.replace_slot(
                    0, Stack(RemoveBlock(), 1), Stack(PlaceBlock(BLUE), 1)
                ),
                has_tool(PlaceBlock),
            )
            .target(fresh_inventory)
            .test()
        )

    def test_same_slot_replace_conflicts(self):
        a = InventoryTransaction.replace_slot(0, None, Stack(RemoveBlock(), 1))
        b = InventoryTransaction.replace_slot(0, None, Stack(RemoveBlock(), 1))
        with pytest.raises(InventoryConflict):
            a.merge(b)
