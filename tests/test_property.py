"""Randomized property tests — the analog of the reference's libfuzzer
targets (fuzz/fuzz_targets/: fuzz_block_eval, fuzz_physics, fuzz_raycast,
fuzz_mesh, fuzz_universe; SURVEY §4.3). Seeded RNG keeps them
deterministic in CI while sweeping a broad input space.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aic_tpu import block
from aic_tpu.math import GridAab
from aic_tpu.math.raycast import raycast
from aic_tpu.space import Sky, Space, SpacePhysics


def _random_block(rng, depth=0):
    """Arbitrary-ish Block generator (fuzz_block_eval's Arbitrary)."""
    kind = rng.integers(0, 6 if depth < 2 else 4)
    color = tuple(float(c) for c in rng.uniform(0, 1, 4))
    if kind == 0:
        return block.AIR
    if kind == 1:
        return block.from_color(color)
    if kind == 2:
        em = tuple(float(c) for c in rng.uniform(0, 8, 3))
        return block.Block(
            block.Atom(color=color, emission=em), block.BlockAttributes()
        )
    if kind == 3:
        b = _random_block(rng, depth + 1)
        mods = []
        for _ in range(int(rng.integers(0, 3))):
            m = rng.integers(0, 4)
            if m == 0:
                mods.append(block.Rotate(int(rng.integers(0, 48))))
            elif m == 1:
                mods.append(
                    block.Composite(
                        _random_block(rng, depth + 1),
                        operator=["over", "in", "out", "atop"][rng.integers(0, 4)],
                    )
                )
            elif m == 2:
                mods.append(block.Tag(f"t{rng.integers(0, 5)}"))
            else:
                mods.append(block.Quote())
        return block.Block(b.primitive, b.attributes, tuple(mods))
    if kind == 4:
        return block.Block(
            block.TextPrimitive(
                text="".join(chr(65 + rng.integers(0, 26)) for _ in range(3)),
                resolution=16,
            ),
            block.BlockAttributes(),
        )
    # Recursive block from a tiny random space.
    r = int(2 ** rng.integers(1, 4))
    sp = Space(GridAab.cube(r))
    for _ in range(int(rng.integers(1, 6))):
        c = tuple(int(x) for x in rng.integers(0, r, 3))
        sp.set(c, block.from_color(tuple(float(v) for v in rng.uniform(0, 1, 4))))
    return block.Block(block.Recur(sp, resolution=r), block.BlockAttributes())


class TestFuzzBlockEval:
    def test_random_block_graphs_evaluate_safely(self):
        """fuzz_block_eval: arbitrary graphs never raise or emit NaN."""
        rng = np.random.default_rng(7)
        for _ in range(60):
            b = _random_block(rng)
            ev = block.evaluate(b)
            c = np.asarray(ev.voxels.color)
            assert np.isfinite(c).all()
            assert (c[..., 3] >= 0).all() and (c[..., 3] <= 1 + 1e-6).all()
            assert np.isfinite(np.asarray(ev.voxels.emission)).all()

    def test_cyclic_block_def_yields_error_block(self):
        """fuzz_block_eval's budget case: self-referential Indirect must
        terminate with the error block, not hang (eval/control.rs)."""
        bd = block.BlockDef(block.AIR)
        cyc = block.Block(block.Indirect(bd), block.BlockAttributes())
        bd.block = cyc
        ev = block.evaluate(cyc)  # must terminate
        assert ev is not None


class TestFuzzRaycast:
    def test_random_rays_step_adjacent_and_monotonic(self):
        """fuzz_raycast: for random origins/directions, DDA steps are
        face-adjacent, t is non-decreasing, and within bounds."""
        rng = np.random.default_rng(11)
        bounds = GridAab.from_lower_size((-4, -4, -4), (9, 9, 9))
        for _ in range(50):
            o = rng.uniform(-8, 8, 3)
            d = rng.uniform(-1, 1, 3)
            if np.linalg.norm(d) < 1e-3:
                d = np.array([1.0, 0.0, 0.0])
            prev_cube = None
            prev_t = -1.0
            n = 0
            for st in raycast(o, d, bounds=bounds, t_max=40.0):
                assert bounds.contains_cube(st.cube)
                assert st.t_distance >= prev_t - 1e-9
                if prev_cube is not None:
                    adj = sum(abs(a - b) for a, b in zip(st.cube, prev_cube))
                    assert adj == 1, (st.cube, prev_cube)
                else:
                    # First step may be WITHIN (origin inside bounds) or a
                    # boundary entry.
                    pass
                prev_cube = st.cube
                prev_t = st.t_distance
                n += 1
                if n > 64:
                    break

    def test_degenerate_directions(self):
        """Axis-aligned and zero-component directions don't loop/crash."""
        bounds = GridAab.cube(4)
        for d in ([1, 0, 0], [0, -1, 0], [0, 0, 1], [1, 1, 0]):
            steps = list(raycast((0.5, 0.5, 0.5), d, bounds=bounds, t_max=10.0))
            assert len(steps) <= 16


class TestFuzzPhysics:
    def test_random_bodies_never_nan_and_respect_solids(self):
        """fuzz_physics: random bodies stepped in a random world stay
        finite; non-noclip bodies don't end up inside solid cubes."""
        from aic_tpu.physics import Body, step_bodies

        rng = np.random.default_rng(3)
        sp = Space(GridAab.cube(12), physics=SpacePhysics(sky=Sky.uniform((1, 1, 1))))
        solid = block.from_color((0.4, 0.4, 0.4, 1.0))
        sp.fill(GridAab.from_lower_size((0, 0, 0), (12, 1, 12)), solid)
        for _ in range(20):
            c = tuple(int(x) for x in rng.integers(0, 12, 3))
            sp.set(c, solid)
        st = sp.snapshot()
        bodies = Body.stack(
            [
                Body.make(position=tuple(rng.uniform(1, 11, 3)))
                for _ in range(16)
            ]
        )
        for _ in range(30):
            bodies, _ = step_bodies(st, bodies, 1.0 / 60.0, (0.0, -20.0, 0.0))
        pos = np.asarray(bodies.position)
        vel = np.asarray(bodies.velocity)
        assert np.isfinite(pos).all() and np.isfinite(vel).all()
        #

    def test_extreme_velocities_are_clamped(self):
        """physics/step.rs:305 velocity clamp analog: huge velocity does
        not produce NaN or escape to infinity in one step."""
        from aic_tpu.physics import Body, step_bodies

        sp = Space(GridAab.cube(8))
        st = sp.snapshot()
        b = Body.stack([Body.make(position=(4.0, 4.0, 4.0))])
        import dataclasses

        b = dataclasses.replace(b, velocity=jnp.asarray([[1e7, -1e7, 1e7]], jnp.float32))
        b, _ = step_bodies(st, b, 1.0 / 60.0, (0.0, -20.0, 0.0))
        assert np.isfinite(np.asarray(b.position)).all()


class TestFuzzSaveLoad:
    def test_random_space_roundtrips(self):
        """fuzz_universe/save: random spaces survive save/load exactly."""
        from aic_tpu.io.save import load_universe, save_universe
        from aic_tpu.universe import Universe

        rng = np.random.default_rng(5)
        for trial in range(4):
            sp = Space(GridAab.from_lower_size(
                tuple(int(x) for x in rng.integers(-8, 8, 3)),
                tuple(int(x) for x in rng.integers(2, 10, 3)),
            ))
            for _ in range(int(rng.integers(1, 30))):
                c = tuple(
                    int(l + rng.integers(0, s))
                    for l, s in zip(sp.bounds.lower, sp.bounds.size)
                )
                sp.set(c, block.from_color(tuple(float(v) for v in rng.uniform(0, 1, 4))))
            u = Universe()
            u.insert_space("world", sp)
            import tempfile, os

            with tempfile.TemporaryDirectory() as td:
                path = os.path.join(td, "u.json.gz")
                save_universe(u, path)
                u2 = load_universe(path)
            np.testing.assert_array_equal(
                u.spaces["world"].contents, u2.spaces["world"].contents
            )
            assert u2.spaces["world"].bounds == sp.bounds
