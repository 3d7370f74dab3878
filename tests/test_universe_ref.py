"""Universe membership tests ported from the reference
(all-is-cubes/src/universe/tests.rs): name uniqueness, anonymous
members, delete semantics, and garbage collection."""

import pytest

from aic_tpu import block
from aic_tpu.block import AIR, Block, BlockDef, Indirect
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space
from aic_tpu.universe import Universe


def blockdef(color=(1, 0, 0, 1)):
    return BlockDef(block.from_color(color))


class TestInsert:
    def test_insert_anonymous_makes_distinct_names(self):
        """tests.rs:163."""
        u = Universe()
        n1 = u.insert_anonymous(blockdef())
        n2 = u.insert_anonymous(blockdef())
        assert n1 != n2

    def test_insert_duplicate_name_same_type(self):
        """tests.rs:179."""
        u = Universe()
        u.insert_block_def("thing", blockdef())
        with pytest.raises(ValueError):
            u.insert_block_def("thing", blockdef())

    def test_insert_duplicate_name_different_type(self):
        """tests.rs:192 — names are global across member types."""
        u = Universe()
        u.insert_block_def("thing", blockdef())
        with pytest.raises(ValueError):
            u.insert_space("thing", Space(GridAab.cube(1)))

    def test_insert_anonym_prohibited_direct(self):
        """tests.rs:261 — the anonymous name format is reserved."""
        u = Universe()
        with pytest.raises(ValueError):
            u.insert_block_def("[anonymous #0]", blockdef())


class TestDelete:
    def test_delete_success(self):
        """tests.rs:311 — delete removes; reinsert under the same name
        is a fresh member."""
        u = Universe()
        u.insert_block_def("test_thing", blockdef((1, 0, 0, 1)))
        u.delete("test_thing")
        assert "test_thing" not in u.block_defs
        u.insert_block_def("test_thing", blockdef((0, 1, 0, 1)))
        assert "test_thing" in u.block_defs

    def test_delete_twice_fails(self):
        """tests.rs:366."""
        u = Universe()
        u.insert_block_def("test_thing", blockdef())
        u.delete("test_thing")
        with pytest.raises(KeyError):
            u.delete("test_thing")

    def test_delete_anonymous_fails(self):
        """tests.rs:359 — anonymous members are strictly GC'd."""
        u = Universe()
        name = u.insert_anonymous(blockdef())
        with pytest.raises(ValueError):
            u.delete(name)


class TestGc:
    def test_gc_explicit(self):
        """tests.rs:421."""
        u = Universe()
        u.insert_anonymous(BlockDef(AIR))
        assert len(u.block_defs) == 1
        u.gc()
        assert len(u.block_defs) == 0

    def test_gc_implicit(self):
        """tests.rs:430 — step() collects."""
        u = Universe()
        u.insert_anonymous(BlockDef(AIR))
        assert len(u.block_defs) == 1
        u.step()
        assert len(u.block_defs) == 0

    def test_gc_preserves_named(self):
        """tests.rs:441."""
        u = Universe()
        u.insert_block_def("foo", BlockDef(AIR))
        u.gc()
        assert "foo" in u.block_defs

    def test_gc_preserves_referenced_anonymous(self):
        """gc.rs reachability — an anonymous BlockDef used by a named
        space's palette survives."""
        u = Universe()
        bd = BlockDef(block.from_color((1, 0, 0, 1)))
        u.insert_anonymous(bd)
        sp = Space(GridAab.cube(2))
        sp.set((0, 0, 0), Block(Indirect(block_def=bd)))
        u.insert_space("world", sp)
        u.gc()
        assert bd in u.block_defs.values()

    def test_gc_preserves_character_space(self):
        """An anonymous space holding a character's body survives."""
        u = Universe()
        sp = Space(GridAab.cube(4))
        name = u.insert_anonymous(sp)
        u.insert_character("player", name, (1.0, 2.0, 1.0))
        u.gc()
        assert name in u.spaces
