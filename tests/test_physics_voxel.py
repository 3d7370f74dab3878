"""Voxel-resolution collision + push_out/crush/uncrush tests.

Mirrors the reference's table-driven physics unit tests
(all-is-cubes/src/physics/step.rs:986-1061 crush/uncrush; collision.rs
voxel recursion semantics)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import Block, Recur
from aic_tpu.math.grid import GridAab
from aic_tpu.physics import Body, step_bodies
from aic_tpu.physics.body import crush_if_colliding, push_out, uncrush
from aic_tpu.space import Sky, Space, SpacePhysics


def solid_space(bounds=None):
    """1-cube space filled with a solid block at [0,0,0]."""
    sp = Space(
        bounds or GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
        physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
    )
    sp.set((0, 0, 0), block.from_color((0.5, 0.5, 0.5, 1.0)))
    return sp


def slab_space(height_frac=0.5, resolution=4):
    """Space with one voxel-resolution bottom slab block at [0,0,0]."""
    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (3, 3, 3)),
        physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
    )
    r = resolution
    h = int(r * height_frac)
    vox = Space(GridAab.cube(r))
    stone = block.from_color((0.6, 0.6, 0.6, 1.0))
    for x in range(r):
        for y in range(h):
            for z in range(r):
                vox.set((x, y, z), stone)
    slab = Block(Recur(space=vox, resolution=r))
    for x in range(3):
        for z in range(3):
            sp.set((x, 0, z), slab)
    return sp


def one_body(**kw):
    return Body.stack([Body.make(**kw)])


class TestVoxelCollision:
    def test_body_rests_on_half_slab(self):
        """A falling body lands on the voxel surface at y=0.5, not the
        cube top at y=1 (collision.rs voxel recursion)."""
        st = slab_space(0.5, 4).snapshot()
        b = one_body(position=(1.5, 2.5, 1.5))
        for _ in range(180):
            b, info = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        pos = np.asarray(b.position)[0]
        assert pos[1] == pytest.approx(0.5, abs=0.01)
        assert bool(np.asarray(info["on_ground"])[0])

    def test_quarter_slab_r8(self):
        st = slab_space(0.25, 8).snapshot()
        b = one_body(position=(1.5, 2.0, 1.5))
        for _ in range(180):
            b, _ = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        assert np.asarray(b.position)[0][1] == pytest.approx(0.25, abs=0.01)

    def test_side_collision_against_voxel_column(self):
        """Moving sideways into a thin voxel column stops at the voxel
        face, not the cube face."""
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (5, 3, 3)),
            physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
        )
        floor = block.from_color((0.4, 0.4, 0.4, 1.0))
        for x in range(5):
            for z in range(3):
                sp.set((x, 0, z), floor)
        # Column occupying the x in [0.5, 0.75) quarter of cube (3, 1, 1).
        r = 4
        vox = Space(GridAab.cube(r))
        stone = block.from_color((0.6, 0.2, 0.2, 1.0))
        for y in range(r):
            for z in range(r):
                vox.set((2, y, z), stone)
        for y in (1, 2):
            sp.set((3, y, 1), Block(Recur(space=vox, resolution=r)))
        st = sp.snapshot()
        b = one_body(position=(1.5, 1.0, 1.5), velocity=(3.0, 0.0, 0.0))
        for _ in range(120):
            b, _ = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        pos = np.asarray(b.position)[0]
        # Body half-width 0.3 stops against voxel plane x = 3.5.
        assert pos[0] == pytest.approx(3.2, abs=0.01)


class TestCrush:
    def test_crush(self):
        """step.rs:985 `crush`: occupying shrinks up off the block."""
        st = solid_space().snapshot()
        b = one_body(
            position=(0.0, 1.25, 0.0),
            box_lo=(-0.5, -0.5, -0.5),
            box_hi=(0.5, 0.5, 0.5),
        )
        b2 = crush_if_colliding(st, b)
        occ_lo = np.asarray(b2.occ_lo)[0] + np.asarray(b2.position)[0]
        occ_hi = np.asarray(b2.occ_hi)[0] + np.asarray(b2.position)[0]
        np.testing.assert_allclose(occ_lo, [-0.5, 1.0, -0.5], atol=1e-5)
        np.testing.assert_allclose(occ_hi, [0.5, 1.75, 0.5], atol=1e-5)


class TestUncrush:
    def _run(self, body, space, occ_lo, occ_hi):
        import dataclasses

        b = dataclasses.replace(
            body,
            occ_lo=np.asarray(occ_lo, np.float32)[None] - np.asarray(body.position),
            occ_hi=np.asarray(occ_hi, np.float32)[None] - np.asarray(body.position),
        )
        out = uncrush(space.snapshot(), b)
        lo = np.asarray(out.occ_lo)[0] + np.asarray(out.position)[0]
        hi = np.asarray(out.occ_hi)[0] + np.asarray(out.position)[0]
        return lo, hi

    def test_uncrush_not_needed(self):
        b = one_body(
            position=(0.0, 1.25, 0.0),
            box_lo=(-0.5, -0.5, -0.5),
            box_hi=(0.5, 0.5, 0.5),
        )
        sp = Space(GridAab.cube(1), physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))))
        lo, hi = self._run(b, sp, [-0.5, 0.75, -0.5], [0.5, 1.75, 0.5])
        np.testing.assert_allclose(lo, [-0.5, 0.75, -0.5], atol=1e-5)
        np.testing.assert_allclose(hi, [0.5, 1.75, 0.5], atol=1e-5)

    def test_uncrush_unobstructed(self):
        """step.rs uncrush_unobstructed: shrunk box regrows fully."""
        b = one_body(
            position=(0.0, 1.25, 0.0),
            box_lo=(-0.5, -0.5, -0.5),
            box_hi=(0.5, 0.5, 0.5),
        )
        sp = Space(GridAab.cube(1), physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))))
        lo, hi = self._run(
            b, sp, [-0.4, 0.85, -0.4], [0.4, 1.65, 0.4]
        )
        np.testing.assert_allclose(lo, [-0.5, 0.75, -0.5], atol=1e-5)
        np.testing.assert_allclose(hi, [0.5, 1.75, 0.5], atol=1e-5)

    def test_uncrush_impossible_intersecting(self):
        """Fully inside a block: occupying must not change."""
        b = one_body(
            position=(0.5, 0.5, 0.5),
            box_lo=(-0.5, -0.5, -0.5),
            box_hi=(0.5, 0.5, 0.5),
        )
        lo, hi = self._run(
            b, solid_space(), [0.25, 0.25, 0.25], [0.75, 0.75, 0.75]
        )
        np.testing.assert_allclose(lo, [0.25, 0.25, 0.25], atol=1e-5)
        np.testing.assert_allclose(hi, [0.75, 0.75, 0.75], atol=1e-5)

    def test_uncrush_partial_success(self):
        """step.rs uncrush_partial_success: X/Z regrow fully, Y stops at
        the block top (y=1)."""
        b = one_body(
            position=(0.5, 1.25, 0.5),
            box_lo=(-0.5, -0.5, -0.5),
            box_hi=(0.5, 0.5, 0.5),
        )
        lo, hi = self._run(
            b, solid_space(), [0.25, 1.125, 0.25], [0.75, 1.75, 0.75]
        )
        np.testing.assert_allclose(lo, [0.0, 1.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(hi, [1.0, 1.75, 1.0], atol=1e-5)


class TestPushOut:
    def test_push_out_of_floor(self):
        """A body embedded in the floor pops out above it."""
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (5, 3, 5)),
            physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
        )
        floor = block.from_color((0.4, 0.4, 0.4, 1.0))
        for x in range(5):
            for z in range(5):
                sp.set((x, 0, z), floor)
        st = sp.snapshot()
        b = one_body(position=(2.5, 0.5, 2.5))  # feet 0.5 deep in floor
        b2 = push_out(st, b)
        pos = np.asarray(b2.position)[0]
        assert pos[1] >= 1.0 - 1e-3
        assert pos[1] == pytest.approx(1.0, abs=0.01)

    def test_push_out_not_needed(self):
        st = solid_space().snapshot()
        b = one_body(position=(0.5, 2.5, 0.5))
        b2 = push_out(st, b)
        np.testing.assert_allclose(
            np.asarray(b2.position), np.asarray(b.position), atol=1e-6
        )

    def test_step_recovers_embedded_body(self):
        """step_bodies integrates recovery: an embedded body ends up
        resting on the surface after a few steps."""
        sp = Space(
            GridAab.from_lower_size((0, 0, 0), (5, 3, 5)),
            physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))),
        )
        floor = block.from_color((0.4, 0.4, 0.4, 1.0))
        for x in range(5):
            for z in range(5):
                sp.set((x, 0, z), floor)
        st = sp.snapshot()
        b = one_body(position=(2.5, 0.6, 2.5))
        for _ in range(30):
            b, _ = step_bodies(st, b, 1 / 60, (0.0, -20.0, 0.0))
        assert np.asarray(b.position)[0][1] == pytest.approx(1.0, abs=0.01)
