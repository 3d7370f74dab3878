"""Reference-native save format (.alliscubesjson) import/export tests
(save/schema.rs UniverseV1; port/src/import.rs Format::AicJson)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.block import (
    Atom,
    Block,
    Composite,
    InvInBlock,
    InventoryModifier,
    Recur,
    Rotate,
    Tag,
)
from aic_tpu.io.import_ref import load_alliscubesjson, save_alliscubesjson
from aic_tpu.math.grid import GridAab, rotation_from_name, rotation_name
from aic_tpu.space import Sky, Space, SpacePhysics
from aic_tpu.universe import Universe


def test_import_reference_test_file():
    """The file checked into the reference's own port test suite parses."""
    u, warnings = load_alliscubesjson(
        "/root/reference/all-is-cubes-port/tests/port-files/native/native-test.alliscubesjson"
    )
    assert warnings == []


def test_rotation_names_roundtrip():
    for i in range(48):
        assert rotation_from_name(rotation_name(i)) == i


def _universe():
    u = Universe()
    vox = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
    for x in range(4):
        vox.set((x, 0, 0), block.from_color((1.0, 0.0, 0.0, 1.0)))
    u.insert_space("vox", vox)

    sp = Space(
        GridAab.from_lower_size((-2, 0, -2), (5, 4, 5)),
        physics=SpacePhysics(sky=Sky.uniform((0.6, 0.7, 0.9))),
    )
    sp.set((0, 0, 0), Block(Recur(space=vox, resolution=4)))
    sp.set(
        (1, 0, 0),
        Block(Atom(color=(0.2, 0.9, 0.3, 1.0), emission=(1.0, 2.0, 0.5))).with_attributes(
            display_name="emitter"
        ),
    )
    sp.set(
        (2, 0, 0),
        # Attach Rotate directly: Block.rotate() is a no-op on symmetric
        # atoms (block.rs:456), and here we are testing serialization.
        block.from_color((0.5, 0.5, 0.5, 1.0))
        .with_modifier(Rotate(rotation_from_name("RXZy")))
        .with_modifier(Tag("marker")),
    )
    sp.set(
        (0, 1, 0),
        block.from_color((0.3, 0.2, 0.1, 1.0), "chest")
        .with_attributes(inventory=InvInBlock.default_for_size(2))
        .with_modifier(
            InventoryModifier(icons=(block.from_color((1, 1, 0, 1)), None))
        ),
    )
    sp.set(
        (1, 1, 0),
        block.from_color((0.1, 0.1, 0.9, 0.5)).with_modifier(
            Composite(source=block.from_color((0.9, 0.1, 0.1, 1.0)), operator="atop")
        ),
    )
    u.insert_space("world", sp)
    u.insert_character("player", "world", (0.5, 2.0, 0.5))
    return u


class TestRoundTrip:
    def test_universe_roundtrip(self, tmp_path):
        u = _universe()
        path = tmp_path / "u.alliscubesjson"
        save_alliscubesjson(u, str(path))
        u2, warnings = load_alliscubesjson(str(path))
        assert warnings == []
        assert set(u2.spaces) == {"vox", "world"}
        sp1, sp2 = u.spaces["world"], u2.spaces["world"]
        assert sp1.bounds.lower == sp2.bounds.lower
        assert sp1.bounds.size == sp2.bounds.size
        # contents match cube-for-cube as evaluated colors
        np.testing.assert_array_equal(
            sp1.contents != 0, sp2.contents != 0
        )
        for cube in [(0, 0, 0), (1, 0, 0), (2, 0, 0), (0, 1, 0), (1, 1, 0)]:
            b1, b2 = sp1.block_at(cube), sp2.block_at(cube)
            assert type(b1.primitive) is type(b2.primitive), cube
        # emission survived
        em = sp2.block_at((1, 0, 0)).primitive.emission
        assert tuple(em) == (1.0, 2.0, 0.5)
        # rotation + tag survived
        mods = sp2.block_at((2, 0, 0)).modifiers
        names = [type(m).__name__ for m in mods]
        assert "Rotate" in names and "Tag" in names
        # inventory modifier + config survived
        chest = sp2.block_at((0, 1, 0))
        assert chest.attributes.inventory.inventory_size == 2
        inv = [m for m in chest.modifiers if isinstance(m, InventoryModifier)][0]
        assert inv.icons[0] is not None and inv.icons[1] is None
        # character survived
        assert "player" in u2.characters

    def test_rendered_equivalence(self, tmp_path):
        """Round-tripped universes evaluate to the same device state."""
        u = _universe()
        path = tmp_path / "u.alliscubesjson"
        save_alliscubesjson(u, str(path))
        u2, _ = load_alliscubesjson(str(path))
        st1 = u.get_state("world")
        st2 = u2.get_state("world")
        np.testing.assert_array_equal(
            np.asarray(st1.contents) != 0, np.asarray(st2.contents) != 0
        )
        np.testing.assert_allclose(
            np.asarray(st1.tables.face_colors),
            np.asarray(st2.tables.face_colors),
            atol=1e-6,
        )

    def test_light_field_roundtrip(self, tmp_path):
        from aic_tpu.light import evaluate_light

        u = _universe()
        u.states["world"], _ = evaluate_light(u.get_state("world"))
        path = tmp_path / "u.alliscubesjson"
        save_alliscubesjson(u, str(path))
        u2, _ = load_alliscubesjson(str(path))
        np.testing.assert_array_equal(
            np.asarray(u.states["world"].light), np.asarray(u2.states["world"].light)
        )


def test_sound_member_roundtrip(tmp_path):
    from aic_tpu.universe.sound import SoundDef

    u = Universe()
    u.sounds["ding"] = SoundDef(frequency=523.25, duration=0.12, amplitude=0.4)
    path = tmp_path / "s.alliscubesjson"
    save_alliscubesjson(u, str(path))
    u2, warnings = load_alliscubesjson(str(path))
    assert warnings == []
    sd = u2.sounds["ding"]
    assert abs(sd.frequency - 523.25) < 1e-6
    assert abs(sd.duration - 0.12) < 1e-6
    assert abs(sd.amplitude - 0.4) < 1e-6


# ---------------------------------------------------------------------------
# Round-3 fixes (ADVICE r2): palette-0 fill, action export, Move rounding.


def _minimal_space_doc(blocks, contents):
    """Build a UniverseV1 doc with one space by hand."""
    import base64 as _b64
    import gzip as _gz

    payload = _b64.b64encode(
        _gz.compress(np.ascontiguousarray(contents, dtype="<u2").tobytes())
    ).decode()
    return {
        "type": "UniverseV1",
        "members": [
            {
                "name": {"Specific": "world"},
                "member_type": "Space",
                "value": {
                    "type": "SpaceV1",
                    "bounds": {
                        "lower": [0, 0, 0],
                        "upper": list(contents.shape),
                    },
                    "physics": {
                        "gravity": [0.0, -20.0, 0.0],
                        "sky": {"type": "UniformV1", "color": [0.5, 0.5, 0.5]},
                        "light": {"type": "NoneV1"},
                    },
                    "blocks": blocks,
                    "contents": {"Base64Gzip": payload},
                    "light": None,
                    "spawn": {},
                },
            }
        ],
    }


def test_import_palette_zero_non_air(tmp_path):
    """Palette slot 0 is the SpaceBuilder fill block, not necessarily AIR
    (space/builder.rs filled_with → Palette::new seeds slot 0): index-0
    cells must import as that block."""
    import json as _json

    solid = {
        "type": "BlockV1",
        "primitive": {"type": "AtomV1", "color": [0.9, 0.1, 0.1, 1.0]},
    }
    air = {"type": "BlockV1", "primitive": {"type": "AirV1"}}
    contents = np.zeros((2, 2, 2), dtype=np.uint16)
    contents[1, 1, 1] = 1
    doc = _minimal_space_doc([solid, air], contents)
    path = tmp_path / "fill.alliscubesjson"
    path.write_text(_json.dumps(doc))
    u, warnings = load_alliscubesjson(str(path))
    sp = u.spaces["world"]
    b000 = sp.block_at((0, 0, 0))
    assert isinstance(b000.primitive, Atom)
    assert tuple(b000.primitive.color)[:3] == (0.9, 0.1, 0.1)
    # and the air cell really is air
    from aic_tpu.block import AIR

    assert sp.block_at((1, 1, 1)) == AIR


def test_actions_roundtrip(tmp_path):
    """tick_action / activation_action / animated survive save→load
    (ModifierSer::{TickActionV1,ActivationActionV1,AnimationHintV1},
    schema.rs:213-219)."""
    from aic_tpu.universe.op import Become, DestroyTo

    u = Universe()
    sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2)))
    target = block.from_color((0.0, 0.0, 1.0, 1.0), "target")
    ticker = (
        block.from_color((1.0, 0.5, 0.0, 1.0), "ticker")
        .with_attributes(tick_action=Become(target), tick_period=3)
        .with_attributes(activation_action=DestroyTo(target))
        .with_attributes(animated=True)
    )
    sp.set((0, 0, 0), ticker)
    u.insert_space("world", sp)
    path = tmp_path / "act.alliscubesjson"
    save_alliscubesjson(u, str(path))
    u2, warnings = load_alliscubesjson(str(path))
    assert warnings == []
    b = u2.spaces["world"].block_at((0, 0, 0))
    a = b.attributes
    assert isinstance(a.tick_action, Become)
    assert a.tick_period == 3
    assert isinstance(a.activation_action, DestroyTo)
    assert a.animated is True


def test_move_export_inexact_distance_rounds(tmp_path):
    """A Move distance with no exact schema resolution rounds (nearest)
    instead of silently floor-dividing; u8 overflow raises."""
    from aic_tpu.block import Move
    from aic_tpu.io.import_ref import _block_to_schema

    blk = block.from_color((1, 1, 1, 1)).with_modifier(
        Move(face=0, distance=3, velocity=0)
    )
    schema = _block_to_schema(blk, {})
    mv = [m for m in schema["modifiers"] if m["type"] == "Move"][0]
    # 3/256 is not representable: nearest at R128 is 2/128 = 4/256.
    assert mv["resolution"] == 128
    assert mv["distance"] == 2

    big = block.from_color((1, 1, 1, 1)).with_modifier(
        Move(face=0, distance=256 * 300, velocity=0)
    )
    with pytest.raises(ValueError):
        _block_to_schema(big, {})


def test_gc_keeps_recur_voxel_spaces():
    """gc() must trace Recur→Space references: an anonymous space used as
    a live palette block's voxel source survives; an unreferenced one is
    collected (gc.rs traces all handles incl. Recur's space handle)."""
    u = Universe()
    vox = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
    vox.set((0, 0, 0), block.from_color((1, 0, 0, 1)))
    vox_name = u.insert_anonymous(vox)

    orphan = Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2)))
    orphan_name = u.insert_anonymous(orphan)

    world = Space(GridAab.from_lower_size((0, 0, 0), (3, 3, 3)))
    world.set((0, 0, 0), Block(Recur(space=vox, resolution=4)))
    u.insert_space("world", world)

    collected = u.gc()
    assert vox_name in u.spaces, "Recur-referenced anonymous space collected"
    assert orphan_name not in u.spaces
    assert collected >= 1


def test_composite_concatenates_inventory_configs():
    """Composite of two inventory-bearing blocks concatenates their
    InvInBlock configs (composite.rs:270, inv_in_block.rs:222)."""
    from aic_tpu.block import IconRow

    dst_cfg = InvInBlock(
        inventory_size=2,
        icon_scale=4,
        render_resolution=16,
        icon_rows=(IconRow(first_slot=0, count=2, origin=(0, 0, 12), stride=(4, 0, 0)),),
    )
    src_cfg = InvInBlock(
        inventory_size=3,
        icon_scale=4,
        render_resolution=16,
        icon_rows=(IconRow(first_slot=0, count=3, origin=(0, 4, 12), stride=(4, 0, 0)),),
    )
    dst = block.from_color((0.5, 0.5, 0.5, 1.0)).with_attributes(inventory=dst_cfg)
    src = block.from_color((0.2, 0.8, 0.2, 1.0)).with_attributes(inventory=src_cfg)
    composed = dst.with_modifier(Composite(source=src, operator="atop"))
    from aic_tpu.block import evaluate as _evaluate

    ev = _evaluate(composed)
    inv = ev.attributes.inventory
    assert inv.inventory_size == 5
    # src rows first, dst rows re-based past src's slots (concatenate(src, dst))
    firsts = sorted(r.first_slot for r in inv.icon_rows)
    assert firsts == [0, 3]
