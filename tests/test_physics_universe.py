"""Physics + Universe step-loop tests (mirrors reference physics/step.rs
tests and universe stepping behavior)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.physics import Body, step_bodies
from aic_tpu.space import Sky, Space, SpacePhysics
from aic_tpu.universe import (
    Become,
    Behavior,
    DestroyTo,
    SpaceTransaction,
    Universe,
    UniverseTransaction,
)


def floor_space(size=8):
    sp = Space(GridAab.cube(size), physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))))
    sp.fill(
        GridAab.from_lower_size((0, 0, 0), (size, 1, size)),
        block.from_color((0.5, 0.5, 0.5, 1.0)),
    )
    return sp


class TestBodyStep:
    def test_fall_and_land(self):
        st = floor_space().snapshot()
        b = Body.stack([Body.make(position=(4.0, 4.0, 4.0))])
        for _ in range(180):
            b, info = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        pos = np.asarray(b.position)[0]
        assert pos[1] == pytest.approx(1.0, abs=0.01)  # floor top at y=1
        assert bool(np.asarray(info["on_ground"])[0])

    def test_slide_into_wall(self):
        sp = floor_space()
        sp.fill(GridAab.from_lower_size((6, 1, 0), (1, 7, 8)), block.from_color((1, 0, 0, 1)))
        st = sp.snapshot()
        b = Body.stack([Body.make(position=(2.0, 1.0, 4.0), velocity=(4.0, 0.0, 0.0))])
        for _ in range(120):
            b, info = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        pos = np.asarray(b.position)[0]
        # Stopped with box_hi.x = 0.3 against the wall at x=6.
        assert pos[0] == pytest.approx(5.7, abs=0.01)
        assert np.asarray(b.velocity)[0][0] == 0.0

    def test_flying_ignores_gravity(self):
        st = floor_space().snapshot()
        b = Body.stack([Body.make(position=(4.0, 4.0, 4.0), flying=True)])
        b, _ = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        assert np.asarray(b.position)[0][1] == 4.0

    def test_noclip_passes_through(self):
        st = floor_space().snapshot()
        b = Body.stack(
            [Body.make(position=(4.0, 2.0, 4.0), velocity=(0.0, -8.0, 0.0),
                       noclip=True, flying=True)]
        )
        for _ in range(60):
            b, _ = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        assert np.asarray(b.position)[0][1] < 0.0  # fell through the floor

    def test_velocity_clamp(self):
        st = floor_space().snapshot()
        b = Body.stack([Body.make(position=(4.0, 6.0, 4.0), velocity=(0.0, 0.0, 3e4),
                                  flying=True)])
        b, _ = step_bodies(st, b, 1 / 60, (0.0, 0.0, 0.0))
        v = np.linalg.norm(np.asarray(b.velocity)[0])
        assert v <= 1e4 + 1.0


class TestTransactions:
    def test_set_cube_with_precondition(self):
        sp = floor_space()
        red = block.from_color((1, 0, 0, 1))
        txn = SpaceTransaction.set_cube((4, 3, 4), old=block.AIR, new=red)
        txn.check(sp)
        txn.commit(sp)
        assert sp.block_at((4, 3, 4)) == red

    def test_precondition_failure(self):
        from aic_tpu.universe import PreconditionFailed

        sp = floor_space()
        red = block.from_color((1, 0, 0, 1))
        sp.set((4, 3, 4), red)
        txn = SpaceTransaction.set_cube((4, 3, 4), old=block.AIR, new=block.AIR)
        with pytest.raises(PreconditionFailed):
            txn.check(sp)

    def test_merge_conflict(self):
        from aic_tpu.universe import TransactionConflict

        red = block.from_color((1, 0, 0, 1))
        green = block.from_color((0, 1, 0, 1))
        a = SpaceTransaction.set_cube((1, 1, 1), new=red)
        b = SpaceTransaction.set_cube((1, 1, 1), new=green)
        with pytest.raises(TransactionConflict):
            a.merge(b)

    def test_merge_conserved_equal_news_conflict(self):
        """space_txn.rs CubeTransaction conserved=true (default): two
        writes of the SAME block to one cube still conflict — merging two
        moved-in blocks would destroy one."""
        from aic_tpu.universe import TransactionConflict

        red = block.from_color((1, 0, 0, 1))
        a = SpaceTransaction.set_cube((1, 1, 1), new=red)
        b = SpaceTransaction.set_cube((1, 1, 1), new=red)
        with pytest.raises(TransactionConflict):
            a.merge(b)

    def test_merge_nonconserved_equal_news_merge(self):
        red = block.from_color((1, 0, 0, 1))
        a = SpaceTransaction.set_cube((1, 1, 1), new=red, conserved=False)
        b = SpaceTransaction.set_cube((1, 1, 1), new=red, conserved=False)
        merged = a.merge(b)
        assert merged.cubes[(1, 1, 1)].new == red

    def test_merge_conflicting_old_preconditions(self):
        from aic_tpu.universe import TransactionConflict

        red = block.from_color((1, 0, 0, 1))
        green = block.from_color((0, 1, 0, 1))
        a = SpaceTransaction.set_cube((1, 1, 1), old=red)
        b = SpaceTransaction.set_cube((1, 1, 1), old=green)
        with pytest.raises(TransactionConflict):
            a.merge(b)

    def test_device_commit(self):
        sp = floor_space()
        st = sp.snapshot()
        red = block.from_color((1, 0, 0, 1))
        sp.ensure_block(red)  # pre-intern so tables are fresh
        st = sp.snapshot()
        txn = SpaceTransaction.set_cube((4, 3, 4), new=red)
        st2 = txn.execute(sp, st)
        assert st2 is not None
        idx = sp.index_at((4, 3, 4))
        assert int(np.asarray(st2.contents)[4, 3, 4]) == idx


class TestUniverse:
    def test_step_ticks(self):
        u = Universe()
        u.insert_space("world", floor_space())
        u.light_rounds_per_tick = 1
        u.light_batch_size = 64
        info = u.step()
        assert info.tick == 0
        info = u.step()
        assert info.tick == 1

    def test_tick_action_become(self):
        """A block whose tick_action turns it into another block
        (space/step.rs:114 execute_tick_actions_system)."""
        u = Universe()
        sp = floor_space()
        red = block.from_color((1, 0, 0, 1))
        green = block.from_color((0, 1, 0, 1), "green")
        ticking = red.with_attributes(tick_action=Become(green), display_name="ticking")
        sp.set((4, 2, 4), ticking)
        u.insert_space("world", sp)
        u.light_rounds_per_tick = 0
        info = u.step()
        assert info.space_edits >= 1
        assert sp.block_at((4, 2, 4)) == green
        # Device state tracked the edit (or was re-snapshotted).
        st = u.get_state("world")
        assert int(np.asarray(st.contents)[4, 2, 4]) == sp.index_at((4, 2, 4))

    def test_behavior_transaction(self):
        class Builder(Behavior):
            def step(self, universe, host, tick):
                txn = UniverseTransaction()
                txn.spaces["world"] = SpaceTransaction.set_cube(
                    (2, 2 + tick.ticks, 2), new=block.from_color((0, 0, 1, 1))
                )
                return txn, "step"

        u = Universe()
        u.insert_space("world", floor_space())
        u.light_rounds_per_tick = 0
        u.add_behavior("world", Builder())
        u.step()
        u.step()
        sp = u.spaces["world"]
        assert sp.block_at((2, 2, 2)) != block.AIR
        assert sp.block_at((2, 3, 2)) != block.AIR

    def test_stale_blockdef_reevaluates_every_space(self):
        """A redefined BlockDef must refresh ALL spaces, not just the
        first one stepped (the first reevaluate marks the cache fresh)."""
        bd = block.BlockDef(block.from_color((1, 0, 0, 1)))
        indirect = block.Block(block.Indirect(bd))
        u = Universe()
        u.light_rounds_per_tick = 0
        for name in ("a", "b"):
            sp = Space(GridAab.cube(4))
            sp.set((1, 1, 1), indirect)
            u.insert_space(name, sp)
        u.block_defs["bd"] = bd
        u.step()
        bd.redefine(block.from_color((0, 1, 0, 1)))
        u.step()
        for name in ("a", "b"):
            ev = u.spaces[name].evaluated_block_at((1, 1, 1))
            np.testing.assert_allclose(
                ev.color[:3], [0, 1, 0], atol=1e-5,
                err_msg=f"space {name!r} kept a stale palette",
            )

    def test_character_body_falls(self):
        u = Universe()
        u.insert_space("world", floor_space())
        u.light_rounds_per_tick = 0
        ch = u.insert_character("player", "world", (4.0, 5.0, 4.0))
        y0 = float(np.asarray(u.bodies.position)[ch.body_index][1])
        for _ in range(120):
            u.step()
        y1 = float(np.asarray(u.bodies.position)[ch.body_index][1])
        assert y1 == pytest.approx(1.0, abs=0.01)
        assert y1 < y0


class TestJumping:
    """character/tests.rs jumping + character/step.rs:59 jump gating."""

    def _session_on_floor(self):
        from aic_tpu import block
        from aic_tpu.apps.session import Session
        from aic_tpu.math.grid import GridAab
        from aic_tpu.raytrace import Viewport
        from aic_tpu.space import Space
        from aic_tpu.universe import Universe

        sp = Space(GridAab.from_lower_size((-2, 0, -2), (5, 4, 5)))
        sp.fill(
            GridAab.from_lower_size((-2, 0, -2), (5, 1, 5)),
            block.from_color((1, 1, 1, 1)),
        )
        u = Universe()
        u.light_rounds_per_tick = 0
        u.insert_space("w", sp)
        u.insert_character("player", "w", (0.5, 1.6, 0.5))
        s = Session(u, viewport=Viewport(8, 8))
        # settle onto the floor
        for _ in range(20):
            u.step()
        return s, u

    def test_jump_only_from_ground(self):
        import numpy as np

        s, u = self._session_on_floor()
        i = s.character.body_index
        assert bool(np.asarray(u.on_ground)[i]), "should be standing"
        s.input.key_down(" ")
        s.apply_input()
        u.step()
        v1 = float(np.asarray(u.bodies.velocity)[i][1])
        assert v1 > 0.0, "jump should launch upward"
        # Second jump input mid-air must NOT add velocity
        # (character/tests.rs jumping: second input is a no-op).
        s.apply_input()
        u.step()
        v2 = float(np.asarray(u.bodies.velocity)[i][1])
        assert v2 < v1, "no mid-air thrust; gravity decelerates"

    def test_landing_allows_rejump(self):
        import numpy as np

        s, u = self._session_on_floor()
        i = s.character.body_index
        s.input.key_down(" ")
        s.apply_input()
        u.step()
        s.input.key_up(" ")
        # Fall back to the floor.
        for _ in range(120):
            u.step()
            if bool(np.asarray(u.on_ground)[i]):
                break
        assert bool(np.asarray(u.on_ground)[i]), "should land again"
        s.input.key_down(" ")
        s.apply_input()
        assert float(np.asarray(u.bodies.velocity)[i][1]) > 0.0


class TestBehaviorScheduling:
    """behavior.rs sleep_and_wake / dropped_when_requested, on our
    Behavior protocol (step -> (txn, then) with int sleep / 'drop')."""

    def _universe(self):
        from aic_tpu import block
        from aic_tpu.math.grid import GridAab
        from aic_tpu.space import Space
        from aic_tpu.universe import Universe

        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2)))
        u = Universe()
        u.light_rounds_per_tick = 0
        u.insert_space("w", sp)
        return u

    def test_sleep_and_wake(self):
        from aic_tpu.universe.universe import Behavior

        runs = []

        class Sleeper(Behavior):
            def step(self, universe, host, tick):
                runs.append(tick.ticks)
                return None, 5  # sleep 5 ticks (Then::Sleep + waker)

        u = self._universe()
        u.add_behavior("w", Sleeper())
        for _ in range(12):
            u.step()
        # Ran at tick 0, then not again until wake at tick >= 5.
        assert runs[0] == 0
        assert len(runs) >= 2
        assert runs[1] >= 5, f"woke early: {runs}"

    def test_dropped_when_requested(self):
        from aic_tpu.universe.universe import Behavior

        runs = []

        class Once(Behavior):
            def step(self, universe, host, tick):
                runs.append(tick.ticks)
                return None, "drop"

        u = self._universe()
        u.add_behavior("w", Once())
        for _ in range(4):
            u.step()
        assert runs == [0], "behavior must run once then detach"

    def test_self_modifying_behavior_edits_space(self):
        """behavior.rs self_transaction analog: a behavior that emits a
        space transaction each step and mutates its own state."""
        import numpy as np

        from aic_tpu import block
        from aic_tpu.universe.transaction import (
            SpaceTransaction,
            UniverseTransaction,
        )
        from aic_tpu.universe.universe import Behavior

        class Painter(Behavior):
            def __init__(self):
                self.x = 0

            def step(self, universe, host, tick):
                if self.x >= 2:
                    return None, "drop"
                txn = UniverseTransaction()
                txn.spaces[host] = SpaceTransaction.set_cube(
                    (self.x, 0, 0),
                    new=block.from_color((0.2, 0.4, 0.8, 1.0)),
                    conserved=False,
                )
                self.x += 1
                return txn, "step"

        u = self._universe()
        u.add_behavior("w", Painter())
        for _ in range(4):
            u.step()
        sp = u.spaces["w"]
        assert (np.asarray(sp.contents)[0:2, 0, 0] != 0).all()
        assert len(u.behaviors) == 0  # dropped after finishing
