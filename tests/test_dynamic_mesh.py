"""ChunkedSpaceMesh, sound synthesis, frame server, composite operators,
extra tools (SURVEY §2.4/§2.2/§2.8 coverage)."""

import json
import urllib.request

import numpy as np

from aic_tpu import block
from aic_tpu.math.grid import GridAab
from aic_tpu.mesh import ChunkedSpaceMesh, mesh_space
from aic_tpu.space import Space


def _floor_space(n=40):
    sp = Space(GridAab.cube(n))
    sp.fill(
        GridAab.from_lower_size((0, 0, 0), (n, 1, n)),
        block.from_color((0.5, 0.5, 0.5, 1.0)),
    )
    return sp


class TestChunkedMesh:
    def test_initial_update_is_budgeted_near_to_far(self):
        sp = _floor_space(40)
        csm = ChunkedSpaceMesh(sp)  # 3x3x3 chunks of 16 (40 -> 3 per axis)
        info = csm.update(view_position=(1, 1, 1), budget_chunks=4)
        assert info.chunks_updated == 4
        assert info.chunks_remaining > 0
        # Nearest chunk to the viewer is meshed first.
        assert (0, 0, 0) in csm.meshes

    @staticmethod
    def _area(mesh):
        tri = mesh.positions[mesh.indices.reshape(-1, 3)]
        a = tri[:, 1] - tri[:, 0]
        b = tri[:, 2] - tri[:, 0]
        return float(np.linalg.norm(np.cross(a, b), axis=1).sum() / 2.0)

    def test_converges_and_matches_whole_mesh_area(self):
        """Chunked (greedy per chunk) and whole-space (unit quads) meshes
        triangulate differently but must cover the same visible area."""
        sp = _floor_space(33)
        csm = ChunkedSpaceMesh(sp)
        while csm.update((0, 0, 0), budget_chunks=64).chunks_remaining:
            pass
        whole = mesh_space(sp, greedy=False)
        combined = csm.combined()
        assert combined.triangle_count > 0
        assert abs(self._area(combined) - self._area(whole)) < 1e-3

    def test_edit_dirties_only_nearby_chunks(self):
        sp = _floor_space(40)
        csm = ChunkedSpaceMesh(sp)
        while csm.update((0, 0, 0), budget_chunks=64).chunks_remaining:
            pass
        assert not csm.dirty
        sp.set((20, 0, 20), block.AIR)  # middle chunk
        csm.absorb_edits()
        assert 1 <= len(csm.dirty) <= 7
        info = csm.update((0, 0, 0), budget_chunks=64)
        assert info.chunks_remaining == 0

    def test_executor_meshing(self):
        from concurrent.futures import ThreadPoolExecutor

        sp = _floor_space(33)
        csm = ChunkedSpaceMesh(sp)
        with ThreadPoolExecutor(4) as ex:
            while csm.update((0, 0, 0), budget_chunks=16, executor=ex).chunks_remaining:
                pass
        assert csm.combined().triangle_count > 0


class TestSound:
    def test_synthesize_waveforms(self):
        from aic_tpu.universe.sound import SoundDef, fluff_sound_map, synthesize

        for wf in ("sine", "square", "saw", "noise"):
            pcm = synthesize(SoundDef(waveform=wf, duration=0.01))
            assert pcm.dtype == np.float32 and len(pcm) > 100
            assert np.abs(pcm).max() <= 1.0
        assert "Place" in fluff_sound_map()

    def test_envelope_decays(self):
        from aic_tpu.universe.sound import SoundDef, synthesize

        pcm = synthesize(SoundDef(duration=0.1, decay=60.0))
        head = np.abs(pcm[: len(pcm) // 4]).max()
        tail = np.abs(pcm[-len(pcm) // 4 :]).max()
        assert tail < head * 0.2


class TestCompositeOperators:
    def test_over_in_out_atop_alphas(self):
        """Porter–Duff table for src α=0.5 over dst α=1.0 (src is the
        Composite modifier's source block, dst the modified block)."""
        dst = block.from_color((1.0, 0.0, 0.0, 1.0), display_name="dst")
        src = block.from_color((0.0, 0.0, 1.0, 0.5), display_name="src")
        expect = {"over": 1.0, "in": 0.5, "out": 0.0, "atop": 1.0}
        for op, alpha in expect.items():
            c = block.Block(
                dst.primitive, dst.attributes, (block.Composite(src, operator=op),)
            )
            ev = block.evaluate(c)
            got = float(np.asarray(ev.voxels.color[0, 0, 0, 3]))
            assert abs(got - alpha) < 1e-5, (op, got)
        # 'in' keeps only source color; 'over' blends src over dst.
        c_in = block.Block(dst.primitive, dst.attributes, (block.Composite(src, operator="in"),))
        rgb = np.asarray(block.evaluate(c_in).voxels.color[0, 0, 0, :3])
        assert rgb[2] > 0.9 and rgb[0] < 0.1


class TestTools:
    def test_push_moves_block(self):
        from aic_tpu.content.template import build_universe
        from aic_tpu.universe.cursor import PushPull, cursor_raycast, click

        u = build_universe("blank")
        sp = u.spaces["world"]
        target = tuple(l + s // 2 for l, s in zip(sp.bounds.lower, sp.bounds.size))
        red = block.from_color((1, 0, 0, 1), display_name="red")
        sp.set(target, red)
        u.resnapshot("world")
        ch = u.characters["player"]
        origin = (target[0] - 3.0, target[1] + 0.5, target[2] + 0.5)
        cur = cursor_raycast(sp, origin, (1.0, 0.0, 0.0))
        assert cur is not None and cur.cube == target
        ch.inventory_obj = __import__("aic_tpu.universe.cursor", fromlist=["Inventory"]).Inventory(
            slots=[PushPull()]
        )
        assert click(u, ch, cur)
        pushed = (target[0] + 1, target[1], target[2])
        assert sp.block_at(pushed) == red
        assert sp.block_at(target) is block.AIR
        # Fluff emitted? (push isn't place/remove — no standard fluff needed)

    def test_jetpack_toggles_flying(self):
        from aic_tpu.content.template import build_universe
        from aic_tpu.universe.cursor import Cursor, Inventory, Jetpack, click

        u = build_universe("blank")
        ch = u.characters["player"]
        ch.inventory_obj = Inventory(slots=[Jetpack()])
        cur = Cursor(cube=(0, 0, 0), face=0, t_distance=1.0, block=block.AIR)
        before = bool(np.asarray(u.bodies.flying)[ch.body_index])
        assert click(u, ch, cur)
        after = bool(np.asarray(u.bodies.flying)[ch.body_index])
        assert after != before


class TestServer:
    def test_frame_server_endpoints(self):
        from aic_tpu.apps.server import SessionServer
        from aic_tpu.apps.session import Session
        from aic_tpu.content.template import build_universe
        from aic_tpu.raytrace import Viewport

        s = Session(build_universe("blank"), viewport=Viewport(32, 24))
        srv = SessionServer(s, port=0)
        srv.start()
        base = f"http://127.0.0.1:{srv.port}"
        try:
            page = urllib.request.urlopen(base + "/").read()
            assert b"all-is-cubes" in page
            png = urllib.request.urlopen(base + "/frame.png").read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            info = json.loads(urllib.request.urlopen(base + "/info").read())
            assert "info_text" in info
            req = urllib.request.Request(
                base + "/input", data=json.dumps({"keys": ["w"]}).encode(), method="POST"
            )
            urllib.request.urlopen(req)
            assert "w" in s.input.keys
        finally:
            srv.shutdown()
