"""Operations: declarative world-edit templates.

Equivalent of the reference `Operation` (all-is-cubes/src/op.rs:39-120):
relative-coordinate edit recipes used by block tick_actions, activation
actions, and tools. An operation applied at a cube yields a
SpaceTransaction (or raises OperationFailed).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from ..block import AIR
from .transaction import SpaceTransaction


class OperationFailed(Exception):
    pass


class Operation:
    def apply(self, space, cube) -> SpaceTransaction:
        raise NotImplementedError


@dataclass(frozen=True)
class Become(Operation):
    """op.rs Operation::Become: replace this cube with `block`
    (preconditioned on the current block, making it a CAS)."""

    block: object

    def apply(self, space, cube):
        current = space.block_at(cube)
        if current == self.block:
            raise OperationFailed("already that block")
        return SpaceTransaction.set_cube(cube, old=current, new=self.block)


@dataclass(frozen=True)
class DestroyTo(Operation):
    """op.rs Operation::DestroyTo: like Become but without precondition
    (used by destruction tools)."""

    block: object = AIR

    def apply(self, space, cube):
        return SpaceTransaction.set_cube(cube, new=self.block)


@dataclass(frozen=True)
class Alt(Operation):
    """op.rs Operation::Alt: first applicable alternative wins."""

    ops: tuple

    def apply(self, space, cube):
        for op in self.ops:
            try:
                return op.apply(space, cube)
            except OperationFailed:
                continue
        raise OperationFailed("no alternative applicable")


@dataclass(frozen=True)
class Neighbors(Operation):
    """op.rs Operation::Neighbors: apply sub-operations at relative
    offsets; all must succeed and merge conflict-free."""

    ops: tuple  # of (offset (3,), Operation)

    def apply(self, space, cube):
        txn = SpaceTransaction()
        for offset, op in self.ops:
            target = tuple(c + o for c, o in zip(cube, offset))
            if not space.bounds.contains_cube(target):
                raise OperationFailed(f"neighbor {target} out of bounds")
            txn = txn.merge(op.apply(space, target))
        return txn


@dataclass(frozen=True)
class MoveInwards(Operation):
    """op.rs Operation::MoveInwards: start this block moving (round 1:
    moves the block one cube along `face`, preserving the source as AIR —
    the sub-cube Move-modifier animation lands with animated blocks)."""

    face: int

    def apply(self, space, cube):
        from ..math import faces

        n = faces.FACE_NORMALS[self.face]
        target = tuple(c + int(d) for c, d in zip(cube, n))
        if not space.bounds.contains_cube(target):
            raise OperationFailed("move target out of bounds")
        if space.block_at(target) != AIR:
            raise OperationFailed("move target occupied")
        block = space.block_at(cube)
        return SpaceTransaction.set_cube(cube, old=block, new=AIR).merge(
            SpaceTransaction.set_cube(target, old=AIR, new=block)
        )
