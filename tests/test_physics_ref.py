"""Body-physics tests ported from the reference
(all-is-cubes/src/physics/tests.rs). These pin the step order
(gravity → clamp → sweep), collision resting positions, push-out, the
NaN-ignoring setters, and the no-tunneling invariant to the reference's
published expectations."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import AIR, Block, Recur
from aic_tpu.math.grid import GridAab
from aic_tpu.physics import Body, step_bodies
from aic_tpu.physics.body import POSITION_EPSILON, VELOCITY_MAGNITUDE_LIMIT, push_out
from aic_tpu.space import Sky, Space, SpacePhysics

GRAVITY = (0.0, -20.0, 0.0)


def mk_body(**kw):
    """tests.rs:85 test_body: radius-0.5 cube at (0, 2, 0)."""
    kw.setdefault("position", (0.0, 2.0, 0.0))
    kw.setdefault("box_lo", (-0.5, -0.5, -0.5))
    kw.setdefault("box_hi", (0.5, 0.5, 0.5))
    return Body.stack([Body.make(**kw)])


def empty_space(size=(1, 1, 1)):
    return Space(
        GridAab.from_lower_size((0, 0, 0), size),
        physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
    ).snapshot()


def solid_space():
    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
        physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
    )
    sp.set((0, 0, 0), block.from_color((0.5, 0.5, 0.5, 1.0)))
    return sp.snapshot()


def slab_block(resolution, height):
    vox = Space(GridAab.cube(resolution))
    stone = block.from_color((0.6, 0.6, 0.6, 1.0))
    for x in range(resolution):
        for y in range(height):
            for z in range(resolution):
                vox.set((x, y, z), stone)
    return Block(Recur(space=vox, resolution=resolution))


def pos(bodies):
    return np.asarray(bodies.position)[0]


def vel(bodies):
    return np.asarray(bodies.velocity)[0]


class TestFreefall:
    @pytest.mark.parametrize("gravity_on", [False, True])
    def test_freefall(self, gravity_on):
        """tests.rs:88 — gravity integrates velocity before position;
        flying skips it. Tick = 1/4 s, gravity (0,-20,0)."""
        st = empty_space()
        b = mk_body(velocity=(2.0, 0.0, 0.0), flying=not gravity_on)
        b, _ = step_bodies(st, b, 0.25, GRAVITY)
        p1 = pos(b)
        b, _ = step_bodies(st, b, 0.25, GRAVITY)
        p2 = pos(b)
        if gravity_on:
            np.testing.assert_allclose(p1, (0.5, 0.75, 0.0), atol=1e-5)
            np.testing.assert_allclose(p2, (1.0, -1.75, 0.0), atol=1e-5)
        else:
            np.testing.assert_allclose(p1, (0.5, 2.0, 0.0), atol=1e-5)
            np.testing.assert_allclose(p2, (1.0, 2.0, 0.0), atol=1e-5)


class TestFallingCollision:
    def test_falling_collision(self):
        """tests.rs:139 — body falls one 1-second tick onto a solid cube
        and rests at y=1.5 with an NY (below) contact, x motion intact."""
        st = solid_space()
        b = mk_body(velocity=(2.0, 0.0, 0.0))
        b, info = step_bodies(st, b, 1.0, GRAVITY)
        p = pos(b)
        assert p[0] == pytest.approx(2.0, abs=1e-5)
        assert p[2] == pytest.approx(0.0, abs=1e-6)
        assert p[1] == pytest.approx(1.5, abs=2e-4)  # our f32 nudge gap is 1e-4
        contacts = np.asarray(info["contacts"])[0]
        assert contacts[1], "expected a contact on the NY face (standing)"
        assert bool(np.asarray(info["on_ground"])[0])

    def test_falling_collision_partial_block(self):
        """tests.rs:172 — an R4 half slab stops the body at y=1.0 (slab
        surface 0.5 + body half-height 0.5), and it stays resting there
        over subsequent steps (no fall-through)."""
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
            physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
        )
        sp.set((0, 0, 0), slab_block(4, 2))
        st = sp.snapshot()
        b = mk_body(velocity=(0.2, 0.0, 0.0))
        b, _ = step_bodies(st, b, 1.0, GRAVITY)
        p = pos(b)
        assert p[0] == pytest.approx(0.2, abs=1e-5)
        assert p[1] == pytest.approx(1.0, abs=2e-4)
        b = b.set_velocity(np.array([[0.0, vel(b)[1], vel(b)[2]]]))
        for t in range(50):
            b, _ = step_bodies(st, b, 1.0, GRAVITY)
            assert pos(b)[1] == pytest.approx(1.0, abs=3e-4), f"sank at step {t}"


class TestPushOut:
    def test_push_out_simple(self):
        """tests.rs:239 — a body overlapping a solid cube by 0.25 on +X
        is pushed out to x = 1.5 + ε with zero velocity."""
        st = solid_space()
        b = mk_body(position=(1.25, 0.5, 0.5), flying=True)
        b = push_out(st, b)
        p = pos(b)
        assert p[0] == pytest.approx(1.5 + POSITION_EPSILON, abs=1e-3)
        np.testing.assert_allclose(p[1:], (0.5, 0.5), atol=1e-6)
        np.testing.assert_array_equal(vel(b), (0.0, 0.0, 0.0))


class TestNaNRules:
    def test_position_nan_ignored(self):
        """tests.rs:392."""
        b = mk_body()
        b = b.set_position(np.array([[float("nan"), 0.0, 0.0]]))
        np.testing.assert_array_equal(pos(b), (0.0, 2.0, 0.0))

    def test_velocity_nan_ignored(self):
        """tests.rs:398."""
        b = mk_body()
        b = b.set_velocity(np.array([[1.0, float("nan"), 0.0]]))
        np.testing.assert_array_equal(vel(b), (0.0, 0.0, 0.0))


class TestVelocityLimit:
    def test_velocity_limit(self):
        """tests.rs:405 — velocity is capped at 1e4 and then applied:
        tick 1/2 s from the origin lands at x = 5000."""
        st = empty_space()
        b = mk_body(position=(0.0, 0.0, 0.0), velocity=(1e7, 0.0, 0.0), flying=True)
        b, _ = step_bodies(st, b, 0.5, GRAVITY)
        np.testing.assert_allclose(
            vel(b), (VELOCITY_MAGNITUDE_LIMIT, 0.0, 0.0), rtol=1e-6
        )
        assert pos(b)[0] == pytest.approx(0.5 * VELOCITY_MAGNITUDE_LIMIT, rel=1e-6)


class TestNoTunneling:
    """tests.rs:298 no_passing_through_blocks — a body sealed inside a
    1-cube hollow box must never escape regardless of velocity."""

    @pytest.mark.parametrize(
        "velocity",
        [
            (1.0, 1.0, 1.0),
            (-1.0, -1.0, -1.0),
            (1.0, 0.1, 0.1),
            (-1.0, -0.1, -0.1),
            (0.1, -0.1, -0.047),
            (-0.1, 0.1, 0.047),
        ],
    )
    def test_no_passing_through_blocks(self, velocity):
        sp = Space(
            GridAab.from_lower_size((-1, -1, -1), (3, 3, 3)),
            physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
        )
        wall = block.from_color((0.4, 0.4, 0.4, 1.0))
        sp.fill(sp.bounds, wall)
        sp.set((0, 0, 0), AIR)
        st = sp.snapshot()
        start = np.array([0.5, 0.5, 0.5])
        b = Body.stack(
            [
                Body.make(
                    position=start,
                    box_lo=(-0.375, -0.375, -0.375),
                    box_hi=(0.375, 0.375, 0.375),
                    flying=True,
                )
            ]
        )
        vset = np.array([velocity], np.float32)
        for t in range(240):
            b = b.set_velocity(vset)
            b, _ = step_bodies(st, b, 1.0 / 60.0, GRAVITY)
            d = np.abs(pos(b) - start).max()
            assert d < 0.5, f"escaped to {pos(b)} at step {t}"
        # It must also have actually moved toward the wall, not frozen.
        assert np.abs(pos(b) - start).max() > 0.09
