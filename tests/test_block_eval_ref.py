"""Block-evaluation exact-value tests ported from the reference
(all-is-cubes/src/block/eval/tests.rs). These pin the derived-color
mathematics (orthographic face traces, transmittance weighting) to the
reference's own published expectations."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import Block, Recur, evaluate
from aic_tpu.math import faces
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Space


def voxels_fn(resolution, fn):
    sp = Space(GridAab.from_lower_size((0, 0, 0), (resolution,) * 3))
    for x in range(resolution):
        for y in range(resolution):
            for z in range(resolution):
                b = fn((x, y, z))
                if b is not None:
                    sp.set((x, y, z), b)
    return Block(Recur(space=sp, resolution=resolution))


class TestTransparentVoxels:
    def test_transparent_voxels_simple(self):
        """eval/tests.rs:296 transparent_voxels_simple: exact overall and
        per-face colors/opacity of an R4 block with one semi-transparent
        column."""
        r = 4
        voxel_color = (1.0, 0.5, 0.0)
        alpha = 0.5
        blk = voxels_fn(
            r,
            lambda p: block.from_color(
                voxel_color + ((alpha,) if (p[0] == 0 and p[2] == 0) else (1.0,))
            ),
        )
        e = evaluate(blk)
        expect_alpha = 1.0 - alpha / (r * r * 3.0)
        np.testing.assert_allclose(
            e.color, voxel_color + (expect_alpha,), atol=1e-6
        )
        one_face = voxel_color + (1.0 - alpha / (r * r),)
        fc = e.face_colors
        for f, expected in [
            (faces.NX, voxel_color + (1.0,)),
            (faces.NY, one_face),
            (faces.NZ, voxel_color + (1.0,)),
            (faces.PX, voxel_color + (1.0,)),
            (faces.PY, one_face),
            (faces.PZ, voxel_color + (1.0,)),
        ]:
            np.testing.assert_allclose(fc[f], expected, atol=1e-6, err_msg=str(f))
        np.testing.assert_array_equal(
            e.opaque, [False, False, False, True, False, True]
        )
        assert e.visible

    def test_voxels_full_but_transparent(self):
        """eval/tests.rs:389: a block that is air except one opaque voxel
        has overall alpha 1/R²."""
        r = 4
        blk = voxels_fn(
            r,
            lambda p: block.from_color(
                (0.0, 0.0, 0.0, 1.0 if p == (1, 1, 1) else 0.0)
            ),
        )
        e = evaluate(blk)
        np.testing.assert_allclose(e.color[3], 1.0 / (r * r), atol=1e-6)
        assert e.resolution == r
        assert not e.opaque.any()
        assert e.visible

    def test_voxels_partial_not_filling(self):
        """eval/tests.rs:417: a 2x4x4 space under R4 → alpha 8/12, opaque
        only on NX."""
        r = 4
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 4, 4)))
        sp.fill(sp.bounds, block.from_color((1.0, 1.0, 1.0, 1.0)))
        e = evaluate(Block(Recur(space=sp, resolution=r)))
        np.testing.assert_allclose(e.color, (1.0, 1.0, 1.0, 8.0 / 12.0), atol=1e-6)
        assert e.resolution == r
        np.testing.assert_array_equal(
            e.opaque, [True, False, False, False, False, False]
        )
        assert e.visible

    def test_overall_color_ignores_interior(self):
        """eval/tests.rs:73: hidden interior voxels do not affect the
        derived color."""
        r = 8
        outer = (1.0, 0.0, 0.0, 1.0)
        inner = (0.0, 1.0, 0.0, 1.0)
        blk = voxels_fn(
            r,
            lambda p: block.from_color(
                inner if all(0 < c < r - 1 for c in p) else outer
            ),
        )
        e = evaluate(blk)
        np.testing.assert_allclose(e.color, outer, atol=1e-6)


class TestRecurOffset:
    def test_recur_with_offset(self):
        """eval/tests.rs:500: Recur with a nonzero offset reads the
        shifted region of the space."""
        r = 4
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2 * r, r, r)))
        for x in range(2 * r):
            for y in range(r):
                for z in range(r):
                    sp.set(
                        (x, y, z),
                        block.from_color(
                            (min(x / 8.0, 1.0), min(y / 8.0, 1.0), min(z / 8.0, 1.0), 1.0)
                        ),
                    )
        e = evaluate(Block(Recur(space=sp, resolution=r, offset=(r, 0, 0))))
        # voxel (0,0,0) should carry the color of space cube (4,0,0).
        np.testing.assert_allclose(
            e.voxels.color[0, 0, 0], (0.5, 0.0, 0.0, 1.0), atol=1e-6
        )
        np.testing.assert_allclose(
            e.voxels.color[3, 2, 1], (7 / 8, 2 / 8, 1 / 8, 1.0), atol=1e-6
        )

    def test_recur_offset_out_of_bounds_is_invisible(self):
        """eval/tests.rs:537 overflow regression shape: an offset that
        misses the space entirely yields an invisible block, not a crash."""
        sp = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
        sp.fill(sp.bounds, block.from_color((1, 1, 1, 1)))
        e = evaluate(Block(Recur(space=sp, resolution=4, offset=(10_000, -10_000, 0))))
        assert not e.visible_or_animated()


class TestColorRegressions:
    def test_huge_color_with_move_does_not_crash(self):
        """eval/tests.rs:681 color_evaluation_regression_1."""
        from aic_tpu.block import Move

        blk = block.from_color((1e28, 1e28, 1e28, 1.0)).with_modifier(
            Move(face=faces.NX, distance=0)
        )
        ev = evaluate(blk)
        assert np.isfinite(ev.face_colors).all()

    def test_nan_emission_composite_does_not_crash(self):
        """eval/tests.rs:700 color_evaluation_regression_2: composite of
        AIR with an infinite-emission near-zero-color block stays finite."""
        from aic_tpu.block import AIR, Atom, Composite

        src = Block(
            Atom(color=(0.0, 0.0, 9.1835e-41, 0.0), emission=(float("inf"), 1.5783e-41, 0.0))
        )
        ev = evaluate(AIR.with_modifier(Composite(source=src, operator="over")))
        # No NaNs in the derived colors (consistency_check analog).
        assert not np.isnan(ev.face_colors).any()
        assert not np.isnan(ev.color).any()


class TestCompositeBlend:
    """Per-voxel blend contracts (composite.rs tests :985-1080: over/in
    emission + collision tables)."""

    def _blend(self, op, src, dst):
        from aic_tpu.block.eval import Evoxels, _composite

        def mk(color, emission=(0, 0, 0), collision=1):
            v = Evoxels.uniform(color, emission=emission, resolution=1)
            v.collision[:] = collision
            return v

        out = _composite(mk(*src), mk(*dst), op)
        return (
            tuple(np.round(out.color[0, 0, 0], 6)),
            tuple(np.round(out.emission[0, 0, 0], 6)),
            int(out.collision[0, 0, 0]),
        )

    def _emit(self, emission, alpha):
        return ((0, 0, 0, alpha), emission)

    def test_over_emission(self):
        red_1 = self._emit((1, 0, 0), 1.0)
        green_05 = self._emit((0, 1, 0), 0.5)
        none_1 = self._emit((0, 0, 0), 1.0)
        none_0 = self._emit((0, 0, 0), 0.0)
        cases = [
            (red_1, none_1, (1, 0, 0)),
            (none_1, red_1, (0, 0, 0)),
            (red_1, red_1, (1, 0, 0)),
            (red_1, none_0, (1, 0, 0)),
            (none_0, red_1, (1, 0, 0)),
            (red_1, green_05, (1, 0, 0)),
            (green_05, red_1, (0.5, 0.5, 0)),
            (green_05, green_05, (0, 0.75, 0)),
        ]
        for src, dst, want in cases:
            _, em, _ = self._blend("over", src, dst)
            np.testing.assert_allclose(em, want, atol=1e-6, err_msg=f"{src} over {dst}")

    def test_in_emission(self):
        red_1 = self._emit((1, 0, 0), 1.0)
        green_05 = self._emit((0, 1, 0), 0.5)
        none_0 = self._emit((0, 0, 0), 0.0)
        cases = [
            (red_1, green_05, (0.5, 0, 0)),
            (green_05, red_1, (0, 0.5, 0)),
            (green_05, green_05, (0, 0.25, 0)),
            (red_1, none_0, (0, 0, 0)),
        ]
        for src, dst, want in cases:
            _, em, _ = self._blend("in", src, dst)
            np.testing.assert_allclose(em, want, atol=1e-6, err_msg=f"{src} in {dst}")

    def test_collision_tables(self):
        from aic_tpu.block import COLLISION_HARD, COLLISION_NONE

        H, N = COLLISION_HARD, COLLISION_NONE
        w = (1, 1, 1, 1.0)

        def coll(op, s, d):
            from aic_tpu.block.eval import Evoxels, _composite

            sv = Evoxels.uniform(w, resolution=1)
            sv.collision[:] = s
            dv = Evoxels.uniform(w, resolution=1)
            dv.collision[:] = d
            return int(_composite(sv, dv, op).collision[0, 0, 0])

        # over: H|H→H  N|N→N  H|N→H  N|H→H (composite.rs over_collision)
        assert coll("over", H, H) == H
        assert coll("over", N, N) == N
        assert coll("over", H, N) == H
        assert coll("over", N, H) == H
        # in: H&H→H else N (in_collision)
        assert coll("in", H, H) == H
        assert coll("in", N, N) == N
        assert coll("in", H, N) == N
        assert coll("in", N, H) == N

    def test_over_silly_floats_no_crash(self):
        c = (2e25, 2e25, 2e25, 1.0)
        rgba, em, _ = self._blend("over", (c, (0, 0, 0)), (c, (0, 0, 0)))
        assert all(np.isfinite(rgba))


class TestMoveEval:
    """move.rs:252 move_atom_block_evaluation / :309
    move_voxel_block_evaluation_same_resolution: a red block displaced
    PY by half a cube (reference R2 distance 1 == our 128/256ths)."""

    def _check_half_py(self, blk):
        from aic_tpu.block import Move

        moved = blk.with_modifier(Move(face=faces.PY, distance=128))
        e = evaluate(moved)
        assert e.resolution == 2
        color = np.asarray(e.voxels.color)
        # Occupied slab is y == 1 (bounds [0,1,0] size [2,1,2]).
        np.testing.assert_allclose(color[:, 1, :, 3], 1.0)
        np.testing.assert_allclose(color[:, 0, :, 3], 0.0)
        np.testing.assert_allclose(e.color, (1, 0, 0, 2 / 3), atol=1e-6)
        half = (1, 0, 0, 0.5)
        full = (1, 0, 0, 1.0)
        for f, want in [
            (faces.NX, half),
            (faces.NY, full),
            (faces.NZ, half),
            (faces.PX, half),
            (faces.PY, full),
            (faces.PZ, half),
        ]:
            np.testing.assert_allclose(
                e.face_colors[f], want, atol=1e-6, err_msg=str(f)
            )
        want_opaque = np.zeros(6, bool)
        want_opaque[faces.PY] = True
        np.testing.assert_array_equal(e.opaque, want_opaque)
        assert e.visible

    def test_move_atom_block_evaluation(self):
        self._check_half_py(block.from_color((1.0, 0.0, 0.0, 1.0)))

    def test_move_voxel_block_evaluation_same_resolution(self):
        self._check_half_py(
            voxels_fn(2, lambda p: block.from_color((1.0, 0.0, 0.0, 1.0)))
        )

    def test_move_full_cube_is_invisible(self):
        """Displacement ≥ one cube leaves nothing (move.rs displaced
        bounds intersection empty → air)."""
        from aic_tpu.block import Move

        e = evaluate(
            block.from_color((1, 0, 0, 1)).with_modifier(
                Move(face=faces.PX, distance=256)
            )
        )
        assert not e.visible


class TestZoomEval:
    """zoom.rs tests: offset validation and sub-cube extraction at the
    divided resolution."""

    def test_construction_out_of_range_high(self):
        from aic_tpu.block import Zoom

        with pytest.raises(ValueError):
            Zoom(scale=2, offset=(2, 1, 1))

    def test_construction_out_of_range_low(self):
        from aic_tpu.block import Zoom

        with pytest.raises(ValueError):
            Zoom(scale=2, offset=(-1, 1, 1))

    def test_evaluation_extracts_offset_region(self):
        """zoom.rs:evaluation — zooming an R4 gradient block by 2 yields
        R2 voxels equal to the corresponding source region."""
        from aic_tpu.block import Zoom

        r = 4
        blk = voxels_fn(
            r,
            lambda p: block.from_color((p[0] / 8, p[1] / 8, p[2] / 8, 1.0)),
        )
        base = evaluate(blk)
        for ox in range(2):
            zoomed = evaluate(blk.with_modifier(Zoom(scale=2, offset=(ox, 0, 0))))
            assert zoomed.resolution == 2
            np.testing.assert_allclose(
                zoomed.voxels.color,
                np.asarray(base.voxels.color)[2 * ox : 2 * ox + 2, 0:2, 0:2],
                atol=1e-7,
            )

    def test_zoom_of_atom_is_atom(self):
        from aic_tpu.block import Zoom

        blk = block.from_color((0.3, 0.6, 0.9, 1.0))
        e = evaluate(blk.with_modifier(Zoom(scale=2, offset=(1, 1, 0))))
        assert e.resolution == 1
        np.testing.assert_allclose(e.color, (0.3, 0.6, 0.9, 1.0), atol=1e-7)


class TestCompositeAtop(TestCompositeBlend):
    """composite.rs:1082-1148 Atop blend tables."""

    def test_atop_color(self):
        opaque1 = ((1, 0, 0, 1.0), (0, 0, 0))
        opaque2 = ((0, 1, 0, 1.0), (0, 0, 0))
        half_red = ((1, 0, 0, 0.5), (0, 0, 0))
        clear = ((0, 0, 0, 0.0), (0, 0, 0))
        cases = [
            (opaque1, opaque2, (1, 0, 0, 1)),
            (half_red, opaque2, (0.5, 0.5, 0, 1)),
            (opaque1, clear, (0, 0, 0, 0)),
            (clear, opaque2, (0, 1, 0, 1)),
            (clear, clear, (0, 0, 0, 0)),
        ]
        for src, dst, want in cases:
            rgba, _, _ = self._blend("atop", src, dst)
            np.testing.assert_allclose(
                rgba, want, atol=1e-6, err_msg=f"{src} atop {dst}"
            )

    def test_atop_emission(self):
        red_1 = self._emit((1, 0, 0), 1.0)
        green_1 = self._emit((0, 1, 0), 1.0)
        green_0 = self._emit((0, 1, 0), 0.0)
        green_05 = self._emit((0, 1, 0), 0.5)
        none_1 = self._emit((0, 0, 0), 1.0)
        none_0 = self._emit((0, 0, 0), 0.0)
        cases = [
            (red_1, none_1, (1, 0, 0)),
            (red_1, red_1, (1, 0, 0)),
            (red_1, green_1, (1, 0, 0)),
            (red_1, none_0, (0, 0, 0)),
            (none_1, red_1, (0, 0, 0)),
            (none_0, red_1, (1, 0, 0)),
            (none_1, none_1, (0, 0, 0)),
            (none_0, none_1, (0, 0, 0)),
            (red_1, green_05, (0.5, 0, 0)),
            (green_05, red_1, (0.5, 0.5, 0)),
            (green_05, green_05, (0, 0.5, 0)),
            (green_05, none_0, (0, 0, 0)),
            (green_0, none_1, (0, 0, 0)),
            (green_0, none_0, (0, 0, 0)),
            (none_1, green_0, (0, 0, 0)),
            (green_0, green_0, (0, 0, 0)),
        ]
        for src, dst, want in cases:
            _, em, _ = self._blend("atop", src, dst)
            np.testing.assert_allclose(
                em, want, atol=1e-6, err_msg=f"{src} atop {dst}"
            )

    def test_atop_collision(self):
        from aic_tpu.block import COLLISION_HARD, COLLISION_NONE
        from aic_tpu.block.eval import Evoxels, _composite

        H, N = COLLISION_HARD, COLLISION_NONE
        w = (1, 1, 1, 1.0)

        def coll(s, d):
            sv = Evoxels.uniform(w, resolution=1)
            sv.collision[:] = s
            dv = Evoxels.uniform(w, resolution=1)
            dv.collision[:] = d
            return int(_composite(sv, dv, "atop").collision[0, 0, 0])

        # atop takes the destination's collision (composite.rs:1138).
        assert coll(H, H) == H
        assert coll(N, N) == N
        assert coll(H, N) == N
        assert coll(N, H) == H


class TestCompositeAttributes:
    """composite.rs:1151-1268 attribute composition."""

    def _compose(self, src, dst, reverse=False):
        from aic_tpu.block import Composite

        return evaluate(dst.with_modifier(Composite(source=src, operator="over", reverse=reverse)))

    def test_display_name(self):
        """composite.rs:1151 — destination name wins when both named;
        a reversed composition makes the source play destination."""
        no_name = block.from_color((1, 1, 1, 1))
        n1 = block.from_color((1, 1, 1, 1), "has_name_1")
        n2 = block.from_color((1, 1, 1, 1), "has_name_2")
        assert self._compose(n1, no_name).attributes.display_name == "has_name_1"
        assert self._compose(no_name, n1).attributes.display_name == "has_name_1"
        assert self._compose(n1, n2).attributes.display_name == "has_name_2"
        assert (
            self._compose(n1, n2, reverse=True).attributes.display_name
            == "has_name_1"
        )

    def test_selectable_if_either_is_selectable(self):
        """composite.rs:1197."""
        sel = block.from_color((1, 1, 1, 1))
        unsel = block.from_color((1, 1, 1, 1)).with_attributes(selectable=False)
        assert self._compose(sel, unsel).attributes.selectable
        assert self._compose(unsel, sel).attributes.selectable
        assert not self._compose(unsel, unsel).attributes.selectable

    def test_activation_action_is_composed(self):
        """composite.rs:1216 — two Become actions compose into Become of
        the composite of their targets."""
        from aic_tpu.block import Composite
        from aic_tpu.universe import Become

        r1 = block.from_color((1, 0, 0, 1), "r1")
        r2 = block.from_color((0, 1, 0, 1), "r2")
        b1 = block.from_color((1, 1, 1, 1)).with_attributes(
            activation_action=Become(r1)
        )
        b2 = block.from_color((1, 1, 1, 1)).with_attributes(
            activation_action=Become(r2)
        )
        got = self._compose(b1, b2).attributes.activation_action
        want = Become(r2.with_modifier(Composite(source=r1, operator="over")))
        assert isinstance(got, Become)
        assert got.block == want.block

    def test_tick_action_is_composed(self):
        """composite.rs:1239."""
        from aic_tpu.block import Composite
        from aic_tpu.universe import Become

        r1 = block.from_color((1, 0, 0, 1), "r1")
        r2 = block.from_color((0, 1, 0, 1), "r2")
        b1 = block.from_color((1, 1, 1, 1)).with_attributes(tick_action=Become(r1))
        b2 = block.from_color((1, 1, 1, 1)).with_attributes(tick_action=Become(r2))
        got = self._compose(b1, b2).attributes.tick_action
        assert isinstance(got, Become)
        assert got.block == r2.with_modifier(
            Composite(source=r1, operator="over")
        )

    def test_non_become_actions_dropped(self):
        """composite.rs:655 — only Become composes; others drop."""
        from aic_tpu.block import AIR
        from aic_tpu.universe import DestroyTo

        b1 = block.from_color((1, 1, 1, 1)).with_attributes(
            tick_action=DestroyTo(AIR)
        )
        b2 = block.from_color((1, 1, 1, 1))
        assert self._compose(b1, b2).attributes.tick_action is None
