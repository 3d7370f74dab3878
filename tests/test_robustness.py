"""Robustness harness: adversarial/malformed inputs (fuzz/fuzz_targets/*.rs
analog, deterministic).

The reference fuzzes block eval, meshing, physics, raycast, universe, and
file import (fuzz_block_eval.rs, fuzz_mesh.rs, fuzz_physics.rs,
fuzz_raycast.rs, fuzz_universe.rs, fuzz_import.rs). Those targets assert
one contract: arbitrary input produces a typed error or a consistent
result — never a crash, hang, or poisoned state. This suite replays that
contract with seeded generators so failures reproduce.

Importer contract: malformed bytes raise ValueError (or a subclass);
anything else (KeyError, struct.error, RecursionError, MemoryError from
attacker-controlled allocations) is a bug.
"""

from __future__ import annotations

import json
import math
import os
import random
import struct

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import (
    AIR,
    Atom,
    Block,
    BlockDef,
    Composite,
    Indirect,
    Move,
    Quote,
    Recur,
    Rotate,
    Zoom,
    evaluate,
)
from aic_tpu.io.import_ref import load_alliscubesjson, save_alliscubesjson
from aic_tpu.io.vox import export_vox, import_vox
from aic_tpu.math import raycast
from aic_tpu.math.grid import GridAab
from aic_tpu.mesh import mesh_space
from aic_tpu.space import Sky, Space, SpacePhysics
from aic_tpu.universe import Universe


# --- shared generators ---------------------------------------------------------


def _random_block(rng: random.Random, universe=None, depth=0) -> Block:
    """Arbitrary-ish Block generator (fuzz_block_eval.rs input analog)."""
    roll = rng.random()
    if roll < 0.15:
        b = AIR
    elif roll < 0.55 or depth >= 2:
        b = Block(
            Atom(
                color=tuple(rng.random() for _ in range(3)) + (rng.random(),),
                emission=tuple(rng.uniform(0, 100) for _ in range(3)),
            )
        )
    elif roll < 0.8:
        res = rng.choice([1, 2, 4, 8, 16, 32])
        sp = Space(GridAab.from_lower_size((0, 0, 0), (res, res, res)))
        for _ in range(rng.randrange(8)):
            c = tuple(rng.randrange(res) for _ in range(3))
            sp.set(c, _random_block(rng, universe, depth + 1))
        b = Block(Recur(space=sp, resolution=res))
    else:
        b = Block(Atom(color=(rng.random(), rng.random(), rng.random(), 1.0)))
    # Random modifier stack.
    for _ in range(rng.randrange(4)):
        m = rng.randrange(5)
        if m == 0:
            b = b.rotate(rng.randrange(24))
        elif m == 1:
            b = Block(
                b.primitive,
                attributes=b.attributes,
                modifiers=tuple(b.modifiers) + (Quote(),),
            )
        elif m == 2:
            other = Block(Atom(color=(rng.random(),) * 3 + (rng.random(),)))
            b = Block(
                b.primitive,
                attributes=b.attributes,
                modifiers=tuple(b.modifiers)
                + (Composite(source=other, operator=rng.choice(["over", "in", "atop"])),),
            )
        elif m == 3:
            b = Block(
                b.primitive,
                attributes=b.attributes,
                modifiers=tuple(b.modifiers)
                + (Move(face=rng.randrange(6), distance=rng.randrange(256)),),
            )
        else:
            scale = rng.choice([2, 4])
            b = Block(
                b.primitive,
                attributes=b.attributes,
                modifiers=tuple(b.modifiers)
                + (Zoom(scale=scale, offset=tuple(rng.randrange(scale) for _ in range(3))),),
            )
    return b


def _random_space(rng: random.Random, size=3) -> Space:
    sp = Space(GridAab.from_lower_size((0, 0, 0), (size, size, size)))
    blocks = [_random_block(rng) for _ in range(3)]
    for x in range(size):
        for y in range(size):
            for z in range(size):
                i = rng.randrange(4)
                if i < 3:
                    sp.set((x, y, z), blocks[i])
    return sp


# --- import: .alliscubesjson ----------------------------------------------------


@pytest.fixture(scope="module")
def valid_save(tmp_path_factory):
    """A real save file to mutate."""
    path = str(tmp_path_factory.mktemp("rob") / "valid.alliscubesjson")
    rng = random.Random(7)
    u = Universe()
    u.insert_space("world", _random_space(rng, 4))
    u.insert_character("player", "world", (2.0, 2.0, 2.0))
    save_alliscubesjson(u, path)
    return path


def _expect_clean_import(tmp_path, data: bytes, i: int):
    """Importer must either succeed or raise ValueError-family."""
    p = str(tmp_path / f"m{i}.alliscubesjson")
    with open(p, "wb") as f:
        f.write(data)
    try:
        load_alliscubesjson(p)
    except ValueError:
        pass  # typed failure: the contract
    except RecursionError:
        pytest.fail(f"mutant {i}: importer recursed unboundedly")


def test_import_truncations(valid_save, tmp_path):
    data = open(valid_save, "rb").read()
    for i, cut in enumerate(range(0, len(data), max(1, len(data) // 37))):
        _expect_clean_import(tmp_path, data[:cut], i)


def test_import_bitflips(valid_save, tmp_path):
    data = bytearray(open(valid_save, "rb").read())
    rng = random.Random(11)
    for i in range(60):
        mutant = bytearray(data)
        for _ in range(rng.randrange(1, 6)):
            pos = rng.randrange(len(mutant))
            mutant[pos] ^= 1 << rng.randrange(8)
        _expect_clean_import(tmp_path, bytes(mutant), i)


def test_import_garbage(tmp_path):
    rng = random.Random(13)
    cases = [
        b"",
        b"\x00" * 64,
        b"not json at all",
        bytes(rng.randrange(256) for _ in range(512)),
        b"[" * 10000,  # nesting bomb: must not blow the stack
        b"{" + b'"a":{' * 5000,
        json.dumps({"type": "UniverseV1"}).encode(),  # missing members
        json.dumps({"type": "wrong"}).encode(),
        json.dumps(
            {
                "type": "UniverseV1",
                "members": [
                    {
                        "name": {"Specific": "w"},
                        "member_type": "Space",
                        "value": {"type": "SpaceV1", "bounds": "bogus"},
                    }
                ],
            }
        ).encode(),
    ]
    for i, data in enumerate(cases):
        _expect_clean_import(tmp_path, data, i)


def test_import_schema_value_attacks(tmp_path):
    """Well-formed JSON with adversarial values: huge bounds (allocation
    bomb), negative sizes, absurd resolutions, wrong types."""
    def space_doc(bounds_val):
        return {
            "type": "UniverseV1",
            "members": [
                {
                    "name": {"Specific": "w"},
                    "member_type": "Space",
                    "value": {"type": "SpaceV1", "bounds": bounds_val},
                }
            ],
        }

    attacks = [
        space_doc({"lower": [0, 0, 0], "upper": [1 << 40, 1 << 40, 1 << 40]}),
        space_doc({"lower": [0, 0, 0], "upper": [-5, 1, 1]}),
        space_doc({"lower": ["a", 0, 0], "upper": [1, 1, 1]}),
        space_doc({"lower": [0, 0], "upper": [1, 1, 1]}),
        space_doc(None),
    ]
    for i, doc in enumerate(attacks):
        p = str(tmp_path / f"attack{i}.alliscubesjson")
        with open(p, "w") as f:
            json.dump(doc, f)
        try:
            u = load_alliscubesjson(p)
            # If it loaded, the space must not have actually allocated a
            # petabyte — i.e. volume must be modest.
            for sp in u.spaces.values():
                assert sp.bounds.volume() < (1 << 26)
        except ValueError:
            pass


# --- import: .vox ----------------------------------------------------------------


@pytest.fixture(scope="module")
def valid_vox(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rob") / "valid.vox")
    rng = random.Random(5)
    sp = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
    for _ in range(10):
        sp.set(
            tuple(rng.randrange(4) for _ in range(3)),
            block.from_color((rng.random(), rng.random(), rng.random(), 1.0)),
        )
    export_vox(sp, path)
    return path


def _expect_clean_vox(tmp_path, data: bytes, i: int):
    p = str(tmp_path / f"v{i}.vox")
    with open(p, "wb") as f:
        f.write(data)
    try:
        spaces = import_vox(p)
        for sp in spaces:
            assert sp.bounds.volume() < (1 << 26)  # no allocation bombs
    except ValueError:
        pass
    except struct.error:
        pytest.fail(f"vox mutant {i}: raw struct.error escaped the importer")


def test_vox_truncations(valid_vox, tmp_path):
    data = open(valid_vox, "rb").read()
    for i, cut in enumerate(range(0, len(data), max(1, len(data) // 29))):
        _expect_clean_vox(tmp_path, data[:cut], i)


def test_vox_garbage_and_bombs(valid_vox, tmp_path):
    data = bytearray(open(valid_vox, "rb").read())
    rng = random.Random(3)
    cases = [b"", b"VOX \xff\xff\xff\xff", bytes(rng.randrange(256) for _ in range(256))]
    for _ in range(40):
        mutant = bytearray(data)
        for _ in range(rng.randrange(1, 8)):
            pos = rng.randrange(len(mutant))
            mutant[pos] ^= 1 << rng.randrange(8)
        cases.append(bytes(mutant))
    # SIZE chunk claiming absurd dimensions (allocation bomb).
    bomb = bytearray(data)
    idx = bytes(bomb).find(b"SIZE")
    if idx >= 0:
        struct.pack_into("<iii", bomb, idx + 12, 1 << 24, 1 << 24, 1 << 24)
        cases.append(bytes(bomb))
    for i, c in enumerate(cases):
        _expect_clean_vox(tmp_path, c, i)


# --- block evaluation -------------------------------------------------------------


@pytest.mark.slow
def test_eval_random_block_graphs():
    """fuzz_block_eval.rs analog: random primitive+modifier stacks must
    evaluate to a consistent EvaluatedBlock (possibly an error block) —
    no exception, voxels finite, resolution in range."""
    rng = random.Random(42)
    # 20 graphs ~ 100s on the CPU platform (each unique shape stack is a
    # fresh XLA trace); the seeded prefix keeps coverage reproducible.
    for i in range(20):
        b = _random_block(rng)
        ev = evaluate(b)
        assert 1 <= ev.resolution <= 255, i
        vox = np.asarray(ev.voxels.color, np.float64)
        assert np.isfinite(vox).all(), f"graph {i}: non-finite voxels"
        assert (vox[..., 3] >= 0).all() and (vox[..., 3] <= 1).all(), i


def test_eval_cyclic_blockdef():
    """A BlockDef referencing itself must produce an error block, not
    hang or recurse (fuzz_block_eval budget contract)."""
    d = BlockDef(AIR)
    d.block = Block(Indirect(d))
    ev = evaluate(d.block)
    assert ev is not None  # error block, finite

    # Mutual cycle.
    d1 = BlockDef(AIR)
    d2 = BlockDef(Block(Indirect(d1)))
    d1.block = Block(Indirect(d2))
    ev = evaluate(d1.block)
    assert ev is not None


def test_eval_deep_modifier_stack():
    b = Block(Atom(color=(1, 0, 0, 1)))
    for i in range(200):
        b = b.rotate((i % 23) + 1)
    ev = evaluate(b)
    assert ev.resolution >= 1


def test_eval_recur_cycle_via_space():
    """A Recur block whose space contains (an Indirect to) itself."""
    sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2)))
    d = BlockDef(AIR)
    recur = Block(Recur(space=sp, resolution=2))
    d.block = recur
    sp.set((0, 0, 0), Block(Indirect(d)))
    ev = evaluate(recur)
    assert ev is not None
    vox = np.asarray(ev.voxels.color, np.float64)
    assert np.isfinite(vox).all()


# --- physics ----------------------------------------------------------------------


@pytest.mark.slow
def test_physics_nan_and_huge_inputs():
    """fuzz_physics.rs analog: hostile body state must not crash or
    poison the simulation. The reference's contract (step.rs:346-391):
    a non-finite POSITION freezes that body (no panic, no movement); a
    non-finite VELOCITY is zeroed, so a finite-position body stays
    finite. Other bodies must never be affected."""
    rng = random.Random(21)
    sp = _random_space(rng, 3)
    hostile = [
        (math.nan, math.nan, math.nan),
        (math.inf, 0.0, 0.0),
        (0.0, -math.inf, 0.0),
        (1e300, 1e300, 1e300),
        (0.0, 0.0, 0.0),
    ]
    for pos in hostile:
        for vel in hostile:
            u = Universe()
            u.insert_space("w", sp)
            ch = u.insert_character("p", "w", (1.5, 1.5, 1.5))
            bystander = u.insert_character("b", "w", (1.5, 2.5, 1.5))
            import dataclasses

            import jax.numpy as jnp

            i = ch.body_index
            u.bodies = dataclasses.replace(
                u.bodies,
                position=u.bodies.position.at[i].set(jnp.asarray(pos, jnp.float32)),
                velocity=u.bodies.velocity.at[i].set(jnp.asarray(vel, jnp.float32)),
            )
            for _ in range(3):
                u.step()  # must not raise
            out = np.asarray(u.bodies.position)[i]
            # Body state is f32 (by-design deviation from the reference's
            # f64): judge finiteness after the storage cast — 1e300
            # becomes inf on input, which then freezes like inf.
            if all(math.isfinite(np.float32(c)) for c in pos):
                # Finite position + any velocity: stays finite (hostile
                # velocity is zeroed, step.rs:390).
                assert np.isfinite(out).all(), (pos, vel, out)
            other = np.asarray(u.bodies.position)[bystander.body_index]
            assert np.isfinite(other).all(), (pos, vel, other)


@pytest.mark.slow
def test_physics_random_spaces_many_steps():
    rng = random.Random(33)
    for trial in range(5):
        sp = _random_space(rng, 3)
        u = Universe()
        u.insert_space("w", sp)
        ch = u.insert_character("p", "w", tuple(rng.uniform(-5, 8) for _ in range(3)))
        for _ in range(20):
            u.step()
        assert np.isfinite(np.asarray(u.bodies.position)[ch.body_index]).all(), trial


# --- raycast ----------------------------------------------------------------------


def test_raycast_hostile_rays():
    """fuzz_raycast.rs analog: arbitrary origins/directions — iteration
    must terminate, yield adjacent cubes, and never yield non-finite t."""
    rng = random.Random(55)
    bounds = GridAab.from_lower_size((-4, -4, -4), (8, 8, 8))
    specials = [0.0, -0.0, math.nan, math.inf, -math.inf, 1e-320, 1e300, -1e300]

    def component():
        return rng.choice(specials) if rng.random() < 0.3 else rng.uniform(-20, 20)

    for trial in range(300):
        o = [component() for _ in range(3)]
        d = [component() for _ in range(3)]
        prev = None
        for n, step in enumerate(raycast.raycast(o, d, bounds=bounds, max_steps=200)):
            assert math.isfinite(step.t_distance) or step.t_distance >= 0
            cube = tuple(int(c) for c in step.cube)
            assert bounds.contains_cube(cube), (trial, cube)
            if prev is not None:
                assert sum(abs(a - b) for a, b in zip(cube, prev)) == 1, (
                    trial,
                    prev,
                    cube,
                )
            prev = cube
            assert n < 200


# --- meshing ----------------------------------------------------------------------


@pytest.mark.slow
def test_mesh_random_spaces():
    """fuzz_mesh.rs analog: random 3-block pattern spaces mesh to
    in-range indices and finite vertex data."""
    rng = random.Random(77)
    for trial in range(4):
        sp = _random_space(rng, 3)
        m = mesh_space(sp)
        verts = np.asarray(m.positions, np.float64)
        idx = np.asarray(m.indices)
        if len(idx):
            assert idx.min() >= 0 and idx.max() < len(verts), trial
        assert np.isfinite(verts).all(), trial


# --- universe op sequences ----------------------------------------------------------


@pytest.mark.slow
def test_universe_random_op_sequences(tmp_path):
    """fuzz_universe.rs analog: random insert/delete/gc/step sequences,
    then a save/load round trip of whatever survived."""
    rng = random.Random(99)
    from aic_tpu.io.save import load_universe, save_universe

    for trial in range(4):
        u = Universe()
        names = []
        for opn in range(30):
            op = rng.randrange(5)
            if op == 0:
                n = f"s{trial}_{opn}"
                u.insert_space(n, _random_space(rng, rng.choice([1, 2, 3])))
                names.append(n)
            elif op == 1 and names:
                victim = rng.choice(names)
                if victim in u.spaces:
                    # Characters may still reference it; deletion rules
                    # may refuse — both outcomes are fine, crashing isn't.
                    try:
                        u.delete(victim)
                    except ValueError:
                        pass
            elif op == 2 and names:
                host = rng.choice(names)
                if host in u.spaces:
                    u.insert_character(f"c{trial}_{opn}", host, (0.5, 0.5, 0.5))
            elif op == 3:
                u.gc()
            else:
                u.step()
        p = str(tmp_path / f"u{trial}.json")
        save_universe(u, p)
        u2 = load_universe(p)
        u2.step()
