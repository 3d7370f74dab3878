"""Inventory-transaction tests ported from the reference
(all-is-cubes/src/inv/inventory.rs tests): insert slot selection,
stacking, fullness failure, replace preconditions, and merge conflicts."""

import pytest

from aic_tpu import block
from aic_tpu.universe import (
    CopyFromSpace,
    Inventory,
    InventoryConflict,
    InventoryTransaction,
    PlaceBlock,
    Stack,
    stack_limit,
)


def infinite(color, name):
    """Tool::InfiniteBlocks analog (stack limit 1)."""
    return PlaceBlock(block.from_color(color, name), infinite=True)


def finite(color, name):
    """Tool::Block analog (standard stack limit)."""
    return PlaceBlock(block.from_color(color, name), infinite=False)


class TestInsert:
    def test_txn_identity_no_notification(self):
        """inventory.rs txn_identity_no_notification."""
        inv = Inventory(slots=[None], fixed=True)
        changed = InventoryTransaction().execute(inv)
        assert changed == []
        assert inv.slots == [None]

    def test_txn_insert_empty_list(self):
        """inventory.rs txn_insert_empty_list."""
        assert InventoryTransaction.insert_items([]).is_empty()

    def test_txn_insert_filtered_empty(self):
        """inventory.rs txn_insert_filtered_empty — empty slots dropped."""
        assert InventoryTransaction.insert_items([None, None]).is_empty()

    def test_txn_insert_success(self):
        """inventory.rs txn_insert_success — lands in the FIRST empty
        slot (index 2) and reports it."""
        occupied = CopyFromSpace()
        inv = Inventory(
            slots=[occupied, occupied, None, occupied, None], fixed=True
        )
        new_item = infinite((1, 1, 1, 1), "white")
        changed = InventoryTransaction.insert_items([new_item]).execute(inv)
        assert changed == [2]
        assert inv.slots[2] == Stack(new_item, 1)
        assert inv.slots[4] is None

    def test_txn_insert_no_space(self):
        """inventory.rs txn_insert_no_space — check fails, inventory
        unchanged."""
        occupied = CopyFromSpace()
        inv = Inventory(slots=[occupied, occupied], fixed=True)
        before = list(inv.slots)
        with pytest.raises(InventoryConflict):
            InventoryTransaction.insert_items(
                [infinite((1, 1, 1, 1), "white")]
            ).execute(inv)
        assert inv.slots == before

    def test_txn_insert_into_existing_stack(self):
        """inventory.rs txn_insert_into_existing_stack — the FIRST
        matching stack gains the item; later matching stacks and empty
        slots untouched."""
        this = finite((1, 0, 0, 1), "this")
        other = finite((0, 1, 0, 1), "other")
        inv = Inventory(
            slots=[
                Stack(other, 10),
                Stack(this, 10),
                Stack(other, 10),
                Stack(this, 10),
                None,
            ],
            fixed=True,
        )
        InventoryTransaction.insert_items([this]).execute(inv)
        assert inv.slots == [
            Stack(other, 10),
            Stack(this, 11),
            Stack(other, 10),
            Stack(this, 10),
            None,
        ]

    def test_stack_limit_respected(self):
        """inventory.rs unload_to max_stack — a full standard stack
        (100) overflows into the next empty slot."""
        t = finite((1, 0, 0, 1), "b")
        assert stack_limit(t) == 100
        inv = Inventory(slots=[Stack(t, 99), None], fixed=True)
        InventoryTransaction.insert_items([Stack(t, 3)]).execute(inv)
        assert inv.slots == [Stack(t, 100), Stack(t, 2)]

    def test_one_limit_tools_do_not_stack(self):
        """tool.rs stack_limit One — infinite blocks occupy one slot
        each."""
        t = infinite((1, 1, 1, 1), "w")
        inv = Inventory(slots=[Stack(t, 1), None], fixed=True)
        InventoryTransaction.insert_items([t]).execute(inv)
        assert inv.slots == [Stack(t, 1), Stack(t, 1)]


class TestReplace:
    def test_replace_success(self):
        """inventory.rs txn_systematic replace leg."""
        old = infinite((1, 0, 0, 1), "old")
        new = infinite((0, 1, 0, 1), "new")
        inv = Inventory(slots=[Stack(old, 1)], fixed=True)
        changed = InventoryTransaction.replace_slot(
            0, Stack(old, 1), Stack(new, 1)
        ).execute(inv)
        assert changed == [0]
        assert inv.slots == [Stack(new, 1)]

    def test_replace_unexpected_slot(self):
        old = infinite((1, 0, 0, 1), "old")
        wrong = infinite((0, 0, 1, 1), "wrong")
        inv = Inventory(slots=[Stack(wrong, 1)], fixed=True)
        with pytest.raises(InventoryConflict):
            InventoryTransaction.replace_slot(0, Stack(old, 1), None).execute(inv)

    def test_replace_out_of_bounds(self):
        inv = Inventory(slots=[None], fixed=True)
        with pytest.raises(InventoryConflict):
            InventoryTransaction.replace_slot(3, None, None).execute(inv)


class TestMerge:
    def test_merge_conflicting_replaces(self):
        """Two replaces of the same slot cannot merge (txn_systematic
        conflict leg)."""
        a = InventoryTransaction.replace_slot(0, None, Stack(CopyFromSpace(), 1))
        b = InventoryTransaction.replace_slot(0, None, None)
        with pytest.raises(InventoryConflict):
            a.merge(b)

    def test_merge_inserts_concatenate(self):
        t1 = infinite((1, 0, 0, 1), "a")
        t2 = infinite((0, 1, 0, 1), "b")
        m = InventoryTransaction.insert_items([t1]).merge(
            InventoryTransaction.insert_items([t2])
        )
        inv = Inventory(slots=[None, None], fixed=True)
        m.execute(inv)
        assert inv.slots == [Stack(t1, 1), Stack(t2, 1)]


class TestCountOf:
    def test_count_of(self):
        t = finite((1, 0, 0, 1), "c")
        inv = Inventory(slots=[Stack(t, 10), None, Stack(t, 5), CopyFromSpace()])
        assert inv.count_of(t) == 15
        assert inv.count_of(CopyFromSpace()) == 1
