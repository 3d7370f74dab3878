"""Pallas VMEM relight kernel: parity vs the XLA dense pass.

The kernel had NO coverage before round 4, which let a Mosaic
miscompile slip through: `pltpu.roll` with a negative dynamic shift is
wrong at non-power-of-two lane widths (scripts/probe_roll3.py), which
broke every volume whose padded (yp*zp) lane count wasn't a power of
two — cornell32 (lanes=1408) diverged by up to 160 packed steps while
light_bench (lanes=1024) was fine.

Interpret-mode tests pin the kernel LOGIC against relight_all_pass on
any platform; compiled parity runs only where the real compiler exists
(TPU), mirroring the reference's skip-when-no-adapter pattern for GPU
tests (test-renderers/README).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aic_tpu import block
from aic_tpu.light.dense import build_relight_ctx, relight_all_pass
from aic_tpu.light.pallas_relight import (
    _plane_shape,
    relight_all_pass_pallas,
)
from aic_tpu.math.grid import GridAab
from aic_tpu.space import Sky, Space, SpacePhysics


def _scene(size, md, seed=0):
    """Scene with emissive + opaque + transparent blocks and a sky."""
    sp = Space(
        GridAab.from_lower_size((0, 0, 0), size),
        physics=SpacePhysics(
            sky=Sky.uniform((0.6, 0.7, 0.9)), light_max_distance=md
        ),
    )
    rng = np.random.RandomState(seed)
    blocks = [
        block.from_color((0.8, 0.3, 0.2, 1.0)),
        block.from_color((0.2, 0.8, 0.3, 0.5)),
        block.from_color((0.9, 0.9, 0.9, 1.0), emission=(2.0, 1.5, 1.0)),
    ]
    n = max(6, int(np.prod(size) * 0.02))
    for _ in range(n):
        cube = tuple(int(rng.randint(0, s)) for s in size)
        sp.set(cube, blocks[rng.randint(len(blocks))])
    # A floor slab for interreflection.
    sp.fill(
        GridAab.from_lower_size((0, 0, 0), (size[0], 1, size[2])),
        block.from_color((0.5, 0.5, 0.5, 1.0)),
    )
    return sp.snapshot()


def _compare(state, interpret):
    ctx = build_relight_ctx(state)
    xla = np.asarray(relight_all_pass(state, ctx))
    pal = np.asarray(relight_all_pass_pallas(state, ctx, interpret=interpret))
    drgb = np.abs(pal[..., :3].astype(np.int32) - xla[..., :3].astype(np.int32))
    assert drgb.max() <= 1, f"max packed diff {drgb.max()}"
    np.testing.assert_array_equal(pal[..., 3], xla[..., 3])  # status


class TestInterpretParity:
    def test_pow2_lanes(self):
        """Lane width a power of two (the shape class that always worked)."""
        st = _scene((12, 12, 12), md=8)
        assert _plane_shape(st.contents.shape)[3] in (256, 512, 1024, 2048)
        _compare(st, interpret=True)

    def test_non_pow2_lanes(self):
        """Non-power-of-two lane width — the miscompile shape class; in
        interpret mode this pins the pure kernel logic."""
        st = _scene((6, 30, 38), md=6)
        lanes = _plane_shape(st.contents.shape)[3]
        assert lanes % 128 == 0 and (lanes & (lanes - 1)) != 0, lanes
        _compare(st, interpret=True)

    def test_md_exceeds_volume(self):
        """max_distance larger than every extent (cornell-box config):
        every ray is truncated by the bounds."""
        st = _scene((10, 10, 10), md=40)
        _compare(st, interpret=True)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Mosaic parity needs the real TPU",
)
class TestCompiledParity:
    def test_non_pow2_lanes_compiled(self):
        st = _scene((6, 30, 38), md=6)
        _compare(st, interpret=False)


class TestConvergeLoop:
    def test_on_device_loop_matches_host_loop(self):
        """evaluate_light_dense's on-device while_loop must land on the
        same fixed point as stepping relight_all_pass manually."""
        from aic_tpu.light.dense import _converge_xla, evaluate_light_dense
        from aic_tpu.math import lightpack

        st = _scene((8, 8, 8), md=6)
        ctx = build_relight_ctx(st)
        light, passes = _converge_xla(st, ctx, max_passes=32)
        # Manual host loop with the same pass function.
        cur = st.light
        host_passes = 0
        for _ in range(32):
            nxt = relight_all_pass(dataclasses.replace(st, light=cur), ctx)
            host_passes += 1
            diff = int(np.asarray(lightpack.difference_priority(cur, nxt)).max())
            cur = nxt
            if diff <= 1:
                break
        assert int(passes) == host_passes
        d = np.abs(
            np.asarray(light[..., :3], np.int32) - np.asarray(cur[..., :3], np.int32)
        )
        assert d.max() == 0

        lit, p2 = evaluate_light_dense(st, ctx=ctx, seed=False)
        assert p2 == host_passes
        assert not bool(np.asarray(lit.light_dirty > 0).any())

        # The fast-light seed must not change the fixpoint (Jacobi is a
        # contraction; each pass recomputes every cube from scratch) —
        # only the path to it, in no more passes than unseeded.
        lit_s, p_seed = evaluate_light_dense(st, ctx=ctx, seed=True)
        assert p_seed <= host_passes
        ds = np.abs(
            np.asarray(lit.light[..., :3], np.int32)
            - np.asarray(lit_s.light[..., :3], np.int32)
        )
        assert ds.max() <= 1


class TestCoarseSeed:
    def test_coarse_seed_same_fixpoint(self, monkeypatch):
        """The multigrid coarse-grid seed must not change the fixpoint —
        only the pass count (seeding guarantee of evaluate_light_dense).
        Exercised at small scale by lowering the volume threshold."""
        from aic_tpu.light import dense
        from aic_tpu.light.dense import (
            _coarse_state,
            _upsample_light,
            evaluate_light_dense,
        )

        st = _scene((10, 10, 10), md=8)
        lit_plain, _ = evaluate_light_dense(st, seed=False, coarse=False)
        monkeypatch.setattr(dense, "COARSE_SEED_MIN_VOLUME", 500)
        lit_coarse, _ = evaluate_light_dense(st, coarse=True)
        d = np.abs(
            np.asarray(lit_plain.light[..., :3], np.int32)
            - np.asarray(lit_coarse.light[..., :3], np.int32)
        )
        # Both runs stop when a pass moves no cube by >1 packed step
        # (the reference's re-enqueue threshold), so each parks within
        # that slack of the true fixpoint — two different seeds may park
        # up to ~2 packed steps apart (observed: a handful of cubes at
        # 2 on the CPU platform, ≤1 on TPU).
        assert d.max() <= 2
        assert np.mean(d >= 2) < 0.01

    def test_coarse_state_shapes_and_pick(self):
        """Odd extents pad with air; the most-blocking child wins."""
        from aic_tpu.light.dense import _coarse_state

        st = _scene((9, 10, 11), md=6)
        cs = _coarse_state(st)
        assert cs.contents.shape == (5, 5, 6)
        assert cs.light.shape == (5, 5, 6, 4)
        assert cs.light_max_distance == 3
        # A coarse cube covering any opaque child must not be air when
        # alternatives are air: check against a host reduction.
        t = st.tables
        alpha = np.clip(np.asarray(t.face_colors[:, 6, 3]), 0, 1)
        fine = np.asarray(st.contents)
        fa = alpha[fine]
        cc = np.asarray(cs.contents)
        for (x, y, z) in [(0, 0, 0), (2, 3, 4), (4, 4, 5)]:
            blk = fa[2 * x : 2 * x + 2, 2 * y : 2 * y + 2, 2 * z : 2 * z + 2]
            if blk.size and blk.max() > 0:
                assert alpha[cc[x, y, z]] > 0 or blk.max() == 0
