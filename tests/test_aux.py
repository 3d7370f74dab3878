"""Aux subsystem tests: fluff, tags, GC, drawing, settings, ortho, bloom,
auto-exposure (SURVEY §2.2/§2.5/§2.6/§5 coverage)."""

import os

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.math import GridAab
from aic_tpu.math import faces
from aic_tpu.space import Space
from aic_tpu.space.drawing import VoxelBrush, draw_rect, draw_text_line
from aic_tpu.universe import Universe
from aic_tpu.universe.transaction import Fluff, SpaceTransaction


class TestFluff:
    def test_fluff_reaches_universe_buffer(self):
        u = Universe()
        sp = Space(GridAab.cube(4))
        u.insert_space("w", sp)
        txn = SpaceTransaction.emitting_fluff((1, 1, 1), "Happened")
        txn = txn.merge(SpaceTransaction.set_cube((1, 1, 1), new=block.from_color((1, 0, 0, 1))))
        u._commit("w", txn)
        fluff = u.drain_fluff()
        assert fluff == [Fluff(name="Happened", position=(1, 1, 1))]
        assert u.drain_fluff() == []


class TestTag:
    def test_tag_modifier_lands_in_attributes(self):
        b = block.Block(
            block.Atom(color=(1, 1, 1, 1)),
            block.BlockAttributes(display_name="x"),
            modifiers=(block.Tag("lamp"), block.Tag("fixture")),
        )
        ev = block.evaluate(b)
        assert ev.attributes.tags == ("lamp", "fixture")

    def test_tag_keeps_voxels(self):
        plain = block.from_color((0.2, 0.4, 0.6, 1.0))
        tagged = block.Block(plain.primitive, plain.attributes, (block.Tag("t"),))
        np.testing.assert_array_equal(
            np.asarray(block.evaluate(plain).voxels.color),
            np.asarray(block.evaluate(tagged).voxels.color),
        )


class TestGc:
    def test_gc_collects_unreferenced_anon_spaces(self):
        u = Universe()
        u.insert_space("world", Space(GridAab.cube(4)))
        a1 = u.insert_anonymous(Space(GridAab.cube(4)))
        a2 = u.insert_anonymous(Space(GridAab.cube(4)))
        u.insert_character("p", a2, (2, 2, 2))  # pins a2
        removed = u.gc()
        assert removed == 1
        assert a1 not in u.spaces and a2 in u.spaces
        assert "world" in u.spaces


class TestDrawing:
    def test_brush_paints_with_offsets_and_clips(self):
        sp = Space(GridAab.cube(6))
        brush = VoxelBrush.column(block.from_color((1, 1, 1, 1)), 3)
        n = brush.paint(sp, (2, 4, 2))  # top of the column clips at bound 6
        assert n == 2
        c = np.asarray(sp.contents)
        assert c[2, 4, 2] != 0 and c[2, 5, 2] != 0

    def test_draw_rect_outline(self):
        sp = Space(GridAab.cube(8))
        draw_rect(sp, VoxelBrush.single(block.from_color((1, 0, 0, 1))), (1, 1), (5, 4), plane_z=2)
        c = np.asarray(sp.contents)
        assert c[1, 1, 2] != 0 and c[5, 4, 2] != 0 and c[3, 2, 2] == 0

    def test_draw_text_line(self):
        sp = Space(GridAab.from_lower_size((0, 0, 0), (10, 2, 2)))
        n = draw_text_line(sp, "Hi", (0, 0, 0))
        assert n >= 1
        assert np.asarray(sp.contents).any()


class TestSettings:
    def test_roundtrip_and_inheritance(self, tmp_path):
        from aic_tpu.apps.settings import Settings
        from aic_tpu.raytrace import GraphicsOptions

        parent = Settings(GraphicsOptions(fov_y=70.0))
        path = os.path.join(tmp_path, "settings.json")
        s = Settings(parent=parent, path=path)
        s.set(exposure=2.0)
        loaded = Settings.load(path, parent=parent)
        opts = loaded.graphics_options()
        assert opts.exposure == 2.0
        assert opts.fov_y == 70.0  # inherited

    def test_unknown_keys_ignored_and_repair(self, tmp_path):
        from aic_tpu.apps.settings import Settings

        path = os.path.join(tmp_path, "s.json")
        with open(path, "w") as f:
            f.write('{"version":1,"graphics_options":{"fov_y":720.0,"bogus":3}}')
        opts = Settings.load(path).graphics_options()
        assert opts.fov_y == 189.0  # repaired into range
        assert not hasattr(opts, "bogus")


class TestOrtho:
    def test_orthographic_views(self):
        from aic_tpu.raytrace.ortho import render_orthographic_views

        sp = Space(GridAab.cube(8))
        sp.fill(GridAab.from_lower_size((0, 0, 0), (8, 1, 8)), block.from_color((0.8, 0.2, 0.2, 1.0)))
        sp.fast_evaluate_light()
        st = sp.snapshot()
        views = render_orthographic_views(st, (faces.PY,), scale=2)
        img = views[faces.PY].data
        assert img.shape == (16, 16, 4)
        # Looking down at a red floor: red-dominant everywhere.
        assert (img[..., 0].astype(int) > img[..., 2].astype(int)).mean() > 0.9


class TestPostprocess:
    def test_bloom_spreads_light(self):
        import jax.numpy as jnp

        from aic_tpu.raytrace.render import apply_bloom

        img = jnp.zeros((16, 16, 3)).at[8, 8].set(10.0)
        out = np.asarray(apply_bloom(img, 0.5))
        assert out[8, 8, 0] < 10.0  # energy spread out
        assert out[8, 10, 0] > 0.0  # neighbors lit

    def test_auto_exposure_targets_middle_grey(self):
        import jax.numpy as jnp

        from aic_tpu.raytrace.render import auto_exposure_target

        dim = jnp.full((8, 8, 3), 0.01)
        bright = jnp.full((8, 8, 3), 4.0)
        assert auto_exposure_target(dim) > auto_exposure_target(bright)


class TestInventoryStacks:
    def test_remove_picks_up_and_place_depletes(self):
        """RemoveBlock(keep) adds a finite stack; placing depletes it
        (inventory.rs Slot::Stack semantics)."""
        from aic_tpu.content.template import build_universe
        from aic_tpu.universe.cursor import (
            Inventory,
            PlaceBlock,
            RemoveBlock,
            Stack,
            click,
            cursor_raycast,
        )

        u = build_universe("blank")
        sp = u.spaces["world"]
        c = tuple(l + s // 2 for l, s in zip(sp.bounds.lower, sp.bounds.size))
        red = block.from_color((1, 0, 0, 1), display_name="red")
        sp.set(c, red)
        # Anchor block behind it so the placement click has a target.
        sp.set((c[0] + 1, c[1], c[2]), block.from_color((0.4, 0.4, 0.4, 1)))
        u.resnapshot("world")
        ch = u.characters["player"]
        inv = Inventory(slots=[RemoveBlock(keep=True)])
        ch.inventory_obj = inv
        origin = (c[0] - 3.0, c[1] + 0.5, c[2] + 0.5)
        cur = cursor_raycast(sp, origin, (1.0, 0.0, 0.0))
        assert click(u, ch, cur)  # pick up
        stacks = [s for s in inv.slots if isinstance(s, Stack)]
        assert len(stacks) == 1 and stacks[0].count == 1
        assert isinstance(stacks[0].tool, PlaceBlock) and not stacks[0].tool.infinite
        # Select the stack and place it back; the stack empties.
        inv.selected = inv.slots.index(stacks[0])
        cur2 = cursor_raycast(sp, origin, (1.0, 0.0, 0.0))
        assert cur2 is not None
        assert click(u, ch, cur2)
        assert inv.slots[inv.selected] is None

    def test_stacking_merges_same_tool(self):
        from aic_tpu.universe.cursor import Inventory, PlaceBlock, Stack

        inv = Inventory(slots=[])
        red = block.from_color((1, 0, 0, 1))
        inv.add(PlaceBlock(red, infinite=False))
        inv.add(PlaceBlock(red, infinite=False))
        assert len(inv.slots) == 1 and inv.slots[0].count == 2


class TestUniverseTransaction:
    def test_insert_and_edit_atomically(self):
        from aic_tpu.universe import Universe
        from aic_tpu.universe.transaction import (
            PreconditionFailed,
            SpaceTransaction,
            UniverseTransaction,
        )

        u = Universe()
        sp = Space(GridAab.cube(4))
        txn = UniverseTransaction.inserting("annex", sp).merge(
            UniverseTransaction(
                spaces={"annex": SpaceTransaction.set_cube((1, 1, 1), new=block.from_color((1, 1, 1, 1)))}
            )
        )
        edits = txn.execute(u)
        assert "annex" in u.spaces and edits == 1
        assert u.spaces["annex"].block_at((1, 1, 1)) != block.AIR
        # Re-inserting the same name fails the check (nothing applied).
        import pytest as _pytest

        with _pytest.raises(PreconditionFailed):
            UniverseTransaction.inserting("annex", Space(GridAab.cube(2))).execute(u)


class TestDebugDumps:
    def test_dump_state_writes_sheets(self, tmp_path):
        """Rerun-glue analog: light/skip slice sheets + ortho views +
        state JSON land on disk and reflect the scene."""
        import json as _json
        import os

        from aic_tpu.debug import dump_state
        from aic_tpu.light import evaluate_light

        sp = Space(GridAab.cube(8))
        sp.fill(GridAab.from_lower_size((0, 0, 0), (8, 1, 8)), block.from_color((0.7, 0.7, 0.7, 1.0)))
        sp.fast_evaluate_light()
        st, _ = evaluate_light(sp.snapshot())
        paths = dump_state(st, str(tmp_path))
        for key in ("light_slices", "skip_slices", "ortho_views", "state"):
            assert os.path.getsize(paths[key]) > 0
        info = _json.load(open(paths["state"]))
        assert info["size"] == [8, 8, 8]
        assert info["light_status_counts"]["opaque"] > 0
        assert info["light_dirty"] == 0


class TestAudio:
    """Audio pipeline (desktop/src/audio.rs role): fluff → spatialized
    mix → PCM sink."""

    def test_mixer_schedules_and_pans(self):
        import numpy as np

        from aic_tpu.apps.audio import AudioMixer
        from aic_tpu.universe.sound import SoundDef

        m = AudioMixer()
        m.schedule(SoundDef(frequency=440.0, duration=0.05), 0.0, gain=1.0, pan=-1.0)
        m.schedule(SoundDef(frequency=880.0, duration=0.05), 0.1, gain=1.0, pan=1.0)
        out = m.take()
        assert out.shape[1] == 2
        # hard-left sound: right channel silent in the first window
        assert np.abs(out[: 2000, 0]).max() > 0.01
        assert np.abs(out[: 2000, 1]).max() < 1e-6
        # second sound occupies the right channel later
        s = int(0.1 * 44100)
        assert np.abs(out[s : s + 2000, 1]).max() > 0.01

    def test_spatialize_attenuates_and_pans(self):
        from aic_tpu.apps.audio import MAX_HEARING_DISTANCE, spatialize

        g_near, _ = spatialize((0, 0, 0), 0.0, (1, 0, 0))
        g_far, _ = spatialize((0, 0, 0), 0.0, (MAX_HEARING_DISTANCE + 5, 0, 0))
        assert g_near > 0.9 and g_far == 0.0
        _, pan_right = spatialize((0, 0, 0), 0.0, (5, 0, 0))
        _, pan_left = spatialize((0, 0, 0), 0.0, (-5, 0, 0))
        assert pan_right > 0.9 and pan_left < -0.9

    def test_session_audio_writes_wav(self, tmp_path):
        import wave

        import numpy as np

        from aic_tpu.apps import Session
        from aic_tpu.apps.audio import SessionAudio, WavFileSink
        from aic_tpu.content import TemplateParameters, build_universe
        from aic_tpu.raytrace import Viewport
        from aic_tpu.universe.transaction import Fluff

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 0
        s = Session(u, viewport=Viewport(8, 8))
        path = tmp_path / "out.wav"
        audio = SessionAudio(s, WavFileSink(str(path)))
        u._emit_fluff([Fluff("Place", (4, 4, 4))])
        assert audio.pump(now=0.0) == 1
        u._emit_fluff([Fluff("Destroy", (4, 4, 4))])
        assert audio.pump(now=0.25) == 1
        audio.flush()
        with wave.open(str(path)) as w:
            assert w.getnchannels() == 2
            frames = w.getnframes()
        assert frames > 0.25 * 44100


class TestProfiling:
    """Profiling surface (SURVEY §5 tracing role; aic_tpu/profiling.py)."""

    def test_spans_and_report(self):
        import time

        from aic_tpu.profiling import Profiler

        p = Profiler()
        with p.span("outer"):
            with p.span("inner"):
                time.sleep(0.01)
        assert p.spans["outer"].calls == 1
        assert p.spans["outer/inner"].total_s >= 0.01
        assert "outer/inner" in p.report()
        p.reset()
        assert not p.spans

    def test_universe_step_reports_phases(self):
        from aic_tpu.content import TemplateParameters, build_universe

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 1
        u.step()
        names = set(u.profiler.spans)
        assert {"tick_actions", "behaviors", "physics", "light"} <= names
        assert "ms" in u.profiler.report()


class TestAmbientSound:
    """sound/ambient.rs bands + AmbientSoundV1 attribute."""

    def test_band_frequencies(self):
        from aic_tpu.universe.sound import band_frequency, band_from_frequency

        assert abs(band_frequency(0) - 20.0) < 1e-6
        assert abs(band_frequency(10) - 640.0) < 1.0  # ambient.rs doc list
        assert band_from_frequency(20.0) == 0
        assert band_from_frequency(640.0) == 10
        assert band_from_frequency(1e6) == 19

    def test_synthesize_ambient(self):
        import numpy as np

        from aic_tpu.universe.sound import synthesize_ambient

        bands = [0.0] * 20
        bands[10] = 0.5  # 640 Hz
        pcm = synthesize_ambient(bands, duration=0.25)
        assert len(pcm) == 11025
        # Spectral peak near 640 Hz.
        spec = np.abs(np.fft.rfft(pcm))
        freqs = np.fft.rfftfreq(len(pcm), 1 / 44100)
        peak = freqs[np.argmax(spec)]
        assert 450 < peak < 900, peak

    def test_attribute_roundtrip(self, tmp_path):
        from aic_tpu import block
        from aic_tpu.io.import_ref import load_alliscubesjson, save_alliscubesjson
        from aic_tpu.math.grid import GridAab
        from aic_tpu.space import Space
        from aic_tpu.universe import Universe

        bands = tuple([0.0] * 9 + [0.3] + [0.0] * 10)
        u = Universe()
        sp = Space(GridAab.cube(2))
        sp.set((0, 0, 0), block.from_color((1, 0.5, 0, 1), "fire").with_attributes(
            ambient_sound=bands
        ))
        u.insert_space("world", sp)
        path = tmp_path / "a.alliscubesjson"
        save_alliscubesjson(u, str(path))
        u2, warnings = load_alliscubesjson(str(path))
        assert warnings == []
        blk = u2.spaces["world"].block_at((0, 0, 0))
        assert blk.attributes.ambient_sound == bands


class TestDebugOptions:
    """GraphicsOptions debug surface (graphics_options.rs:102-152)."""

    def _session(self):
        from aic_tpu import block
        from aic_tpu.apps.session import Session
        from aic_tpu.math.grid import GridAab
        from aic_tpu.raytrace import GraphicsOptions, Viewport
        from aic_tpu.space import Space

        u = Universe()
        sp = Space(GridAab.from_lower_size((-4, 0, -4), (8, 6, 8)))
        sp.fill(GridAab.from_lower_size((-4, 0, -4), (8, 1, 8)), block.from_color((.5,.5,.5,1)))
        u.insert_space("world", sp)
        u.light_rounds_per_tick = 0
        u.insert_character("player", "world", (0.5, 2.0, 0.5))
        s = Session(u, viewport=Viewport(32, 32))
        return s

    def test_debug_overlays_render(self):
        import dataclasses

        s = self._session()
        s.options = dataclasses.replace(
            s.options,
            debug_chunk_boxes=True,
            debug_collision_boxes=True,
        )
        base = self._session().render().data
        img = s.render().data
        assert img.shape == base.shape
        assert (img != base).any()  # overlays drew something

    def test_debug_pixel_cost_heatmap(self):
        import dataclasses

        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
        from aic_tpu.raytrace.render import render

        s = self._session()
        state = s.universe.get_state("world")
        cam = Camera(
            dataclasses.replace(GraphicsOptions(), debug_pixel_cost=True),
            Viewport(24, 24),
        )
        cam.look_at((0.5, 3.0, 6.0), (0.5, 1.0, 0.5))
        img = render(state, cam).data
        # Heatmap: red channel varies with traversal cost.
        assert img[..., 0].std() > 0

    def test_reduce_view_frustum_halves_far(self):
        import dataclasses

        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport

        c1 = Camera(GraphicsOptions(), Viewport(8, 8))
        c2 = Camera(
            dataclasses.replace(GraphicsOptions(), debug_reduce_view_frustum=True),
            Viewport(8, 8),
        )
        o1, d1 = c1.project_ndc_into_world(np.array([0.0, 0.0]))
        o2, d2 = c2.project_ndc_into_world(np.array([0.0, 0.0]))
        assert abs(d2[2]) < abs(d1[2]) * 0.6  # far plane halved


class TestFluffParticles:
    """Fluff → transient particles in the session renderer
    (gpu/in_wgpu/space.rs:1104 particle sets role)."""

    def test_fluff_fans_out_to_named_consumers(self):
        from aic_tpu.content.template import TemplateParameters, build_universe
        from aic_tpu.universe.transaction import Fluff

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u._emit_fluff([Fluff("Place", (1, 1, 1))])
        assert len(u.drain_fluff("audio")) == 1
        assert len(u.drain_fluff("particles")) == 1  # independent cursor
        assert u.drain_fluff("audio") == []
        u._emit_fluff([Fluff("Destroy", (2, 2, 2))])
        assert len(u.drain_fluff("particles")) == 1

    def test_particles_render_and_expire(self):
        import numpy as np

        from aic_tpu.apps.session import Session
        from aic_tpu.content.template import TemplateParameters, build_universe
        from aic_tpu.raytrace import Viewport
        from aic_tpu.universe.transaction import Fluff

        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 0
        s = Session(u, viewport=Viewport(32, 32))
        base = s.render().data.copy()
        u._emit_fluff([Fluff("Destroy", (4, 4, 4))])
        s.maybe_step(now=100.0)
        assert len(s.particles) == 1
        with_particles = s.render().data
        assert (with_particles[..., :3] != base[..., :3]).any()
        # Particles age out after particle_lifetime_ticks steps.
        s.particle_lifetime_ticks = 2
        s.maybe_step(now=100.1)
        s.maybe_step(now=100.2)
        assert s.particles == []
