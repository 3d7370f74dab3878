"""Operation tests ported from the reference (all-is-cubes/src/op.rs
tests): Alt fallthrough, StartMove pairing, AddModifiers symmetry
rules, and TakeInventory."""

import pytest

from aic_tpu import block
from aic_tpu.block import AIR, Block, InventoryModifier, Move, Quote, Recur, Rotate
from aic_tpu.math import faces
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space
from aic_tpu.universe import (
    AddModifiers,
    Alt,
    Become,
    DestroyTo,
    OperationFailed,
    Stack,
    StartMove,
    TakeInventory,
)
from aic_tpu.universe.cursor import Activate


def empty_space(x, y, z):
    return Space(GridAab.from_lower_size((0, 0, 0), (x, y, z)))


def voxel_block(color=(0.5, 0.3, 0.2, 1.0)):
    """make_some_voxel_blocks analog: an asymmetric R4 Recur block."""
    sp = Space(GridAab.cube(4))
    for x in range(4):
        sp.set((x, 0, 0), block.from_color(color))
    sp.set((0, 1, 0), block.from_color(color))
    return Block(Recur(space=sp, resolution=4))


def clockwise_y():
    """GridRotation::CLOCKWISE about +Y (Face::PY.clockwise())."""
    import numpy as np
    from aic_tpu.math.grid import ROTATION_MATRICES

    # x -> -z, z -> x, y -> y  (clockwise seen from +Y, right-handed)
    m = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]])
    idx = np.nonzero((ROTATION_MATRICES == m).all(axis=(1, 2)))[0]
    return int(idx[0])


class TestAlt:
    def test_alt(self):
        """op.rs alt — the space size controls which StartMove fits; the
        first applicable alternative is used."""
        move_x = StartMove(Move(face=faces.PX, distance=128, velocity=1))
        move_y = StartMove(Move(face=faces.PY, distance=128, velocity=1))
        move_z = StartMove(Move(face=faces.PZ, distance=128, velocity=1))
        alt = Alt((move_x, move_y, move_z))
        b = block.from_color((1, 0, 0, 1), "mover")

        def apply_to_size(op, x, y, z):
            sp = empty_space(x, y, z)
            sp.set((0, 0, 0), b)
            return op.apply(sp, (0, 0, 0))

        with pytest.raises(OperationFailed):
            apply_to_size(alt, 1, 1, 1)
        for size, single in [
            ((2, 1, 1), move_x),
            ((1, 2, 1), move_y),
            ((1, 1, 2), move_z),
        ]:
            got = apply_to_size(alt, *size)
            want = apply_to_size(single, *size)
            assert got.cubes.keys() == want.cubes.keys()
            for c in got.cubes:
                assert got.cubes[c].new == want.cubes[c].new


class TestStartMove:
    def test_start_move_pairing(self):
        """op.rs:251 — target gets the Move, destination air gets the
        complement (opposite face, 256-distance, negated velocity)."""
        b = block.from_color((1, 0, 0, 1), "mover")
        sp = empty_space(2, 1, 1)
        sp.set((0, 0, 0), b)
        mv = Move(face=faces.PX, distance=128, velocity=3)
        txn = StartMove(mv).apply(sp, (0, 0, 0))
        new_target = txn.cubes[(0, 0, 0)].new
        new_adjacent = txn.cubes[(1, 0, 0)].new
        assert new_target.modifiers[-1] == mv
        comp = new_adjacent.modifiers[-1]
        assert isinstance(comp, Move)
        assert comp.face == faces.NX
        assert comp.distance == 128  # 256 - 128
        assert comp.velocity == -3

    def test_start_move_requires_air(self):
        b = block.from_color((1, 0, 0, 1), "mover")
        sp = empty_space(2, 1, 1)
        sp.set((0, 0, 0), b)
        sp.set((1, 0, 0), block.from_color((0, 1, 0, 1), "wall"))
        with pytest.raises(OperationFailed):
            StartMove(Move(face=faces.PX, distance=128)).apply(sp, (0, 0, 0))


class TestBecomeDestroy:
    def test_become_txn(self):
        """op.rs become_txn — CAS from AIR to the block."""
        b = block.from_color((1, 0, 0, 1), "b")
        sp = empty_space(2, 2, 2)
        txn = Become(b).apply(sp, (0, 0, 0))
        edit = txn.cubes[(0, 0, 0)]
        assert edit.old == AIR and edit.new == b and edit.conserved

    def test_destroy_to_txn(self):
        """op.rs destroy_to_txn — nonconserved write without old
        precondition."""
        b = block.from_color((1, 0, 0, 1), "b")
        sp = empty_space(2, 2, 2)
        txn = DestroyTo(b).apply(sp, (0, 0, 0))
        edit = txn.cubes[(0, 0, 0)]
        assert edit.new == b and not edit.conserved


class TestAddModifiers:
    def test_add_modifier_rotate_txn(self):
        """op.rs add_modifier_rotate_txn — a voxel block gains Rotate;
        applying to symmetric AIR produces an empty transaction."""
        vb = voxel_block()
        rot = clockwise_y()
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 1, 1)))
        sp.set((0, 0, 0), vb)
        op = AddModifiers((Rotate(rot),))
        txn = op.apply(sp, (0, 0, 0))
        assert txn.cubes[(0, 0, 0)].new == vb.rotate(rot)
        # On AIR: nothing happens (rotationally symmetric).
        txn2 = op.apply(sp, (1, 0, 0))
        assert txn2.cubes == {}

    def test_add_modifier_not_rotate_txn(self):
        """op.rs add_modifier_not_rotate_txn — non-Rotate modifiers are
        appended verbatim."""
        b = block.from_color((1, 0, 0, 1), "b").with_modifier(Quote())
        sp = empty_space(1, 1, 1)
        sp.set((0, 0, 0), b)
        mv = Move(face=faces.PX, distance=64, velocity=0)
        txn = AddModifiers((mv,)).apply(sp, (0, 0, 0))
        assert txn.cubes[(0, 0, 0)].new == b.with_modifier(mv)

    def test_rotated_become_atom(self):
        """op.rs rotated_become_atom — atoms are rotationally symmetric,
        so rotation leaves Become's block unchanged."""
        atom = block.from_color((1, 0, 0, 1), "atom")
        assert atom.rotate(clockwise_y()) == atom


class TestTakeInventory:
    def _chest(self, slots):
        b = block.from_color((0.4, 0.3, 0.2, 1.0), "chest")
        return b.with_modifier(InventoryModifier(icons=(), slots=tuple(slots)))

    def test_take_inventory_and_destroy(self):
        """op.rs take_inventory_and_destroy_success."""
        stack = Stack(Activate(), 3)
        chest = self._chest([stack])
        sp = empty_space(1, 1, 1)
        sp.set((0, 0, 0), chest)
        txn = TakeInventory(destroy_if_empty=True).apply(sp, (0, 0, 0))
        edit = txn.cubes[(0, 0, 0)]
        assert edit.old == chest and edit.new == AIR
        assert txn.inventory_insert == [stack]

    def test_take_inventory_and_keep(self):
        """op.rs take_inventory_and_keep_success — the emptied block
        keeps an empty inventory modifier."""
        stack = Stack(Activate(), 3)
        chest = self._chest([stack])
        sp = empty_space(1, 1, 1)
        sp.set((0, 0, 0), chest)
        txn = TakeInventory(destroy_if_empty=False).apply(sp, (0, 0, 0))
        new = txn.cubes[(0, 0, 0)].new
        mods = [m for m in new.modifiers if isinstance(m, InventoryModifier)]
        assert len(mods) == 1 and all(s is None for s in mods[0].slots)
        assert txn.inventory_insert == [stack]

    def test_take_inventory_empty_fails(self):
        chest = self._chest([None])
        sp = empty_space(1, 1, 1)
        sp.set((0, 0, 0), chest)
        with pytest.raises(OperationFailed):
            TakeInventory().apply(sp, (0, 0, 0))
