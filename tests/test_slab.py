"""Slab-sharded world (parallel/slab.py): equality vs the replicated
implementations on the 8-virtual-device CPU mesh.

- relight: each pass must produce per-cube results identical to
  `relight_all_pass` on the replicated state (same chart stream, windows
  satisfied from ppermute halos — single- and multi-hop).
- trace: per-slab windowed traces composited front-to-back must match
  `trace_rays` on the replicated state.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aic_tpu import block
from aic_tpu.light.dense import build_relight_ctx, relight_all_pass
from aic_tpu.math.grid import GridAab
from aic_tpu.parallel.mesh import make_mesh
from aic_tpu.parallel.slab import (
    evaluate_light_slab,
    relight_pass_slab,
    shard_space,
    trace_rays_slab,
)
from aic_tpu.raytrace import GraphicsOptions
from aic_tpu.raytrace.tracer import trace_rays
from aic_tpu.space import Sky, Space, SpacePhysics


def scene(max_distance=5, sky=None):
    """(32, 12, 16) space: ground, pillars crossing slab boundaries,
    transparent + emissive atoms, one voxel-detail block."""
    sky = sky if sky is not None else Sky.uniform((0.6, 0.7, 0.9))
    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (32, 12, 16)),
        physics=SpacePhysics(sky=sky, light_max_distance=max_distance),
    )
    ground = block.from_color((0.5, 0.5, 0.4, 1.0))
    sp.fill(GridAab.from_lower_size((0, 0, 0), (32, 1, 16)), ground)
    red = block.from_color((0.9, 0.2, 0.2, 1.0))
    glass = block.Block(block.Atom(color=(0.3, 0.9, 0.4, 0.4)))
    lamp = block.Block(block.Atom(color=(0, 0, 0, 1.0), emission=(3.0, 2.0, 1.0)))
    for x in range(3, 32, 5):  # pillars land on both sides of x=4k cuts
        for y in range(1, 4):
            sp.set((x, y, 7), red)
    sp.set((11, 1, 3), glass)
    sp.set((12, 1, 3), glass)  # pair straddles the 12|13 region, near 12|16 cut
    sp.set((16, 2, 10), lamp)  # exactly on a slab boundary plane
    vox = Space(GridAab.cube(4))
    for i in range(4):
        vox.set((i, i, i), block.from_color((0.9, 0.9, 0.1, 1.0)))
    sp.set((19, 1, 12), block.Block(block.Recur(space=vox, resolution=4)))
    return sp


def mesh8():
    return make_mesh(8, axis="slab")


@pytest.mark.parametrize("md", [3, 5])  # pad 4 = single-hop, pad 6 = 2 hops
def test_relight_pass_matches_replicated(md):
    st = scene(max_distance=md).snapshot()
    mesh = mesh8()
    sh = shard_space(st, mesh)

    ref = relight_all_pass(st, build_relight_ctx(st), lanes=1)
    relight_pass_slab(sh, lanes=1)
    got = np.concatenate(list(np.asarray(sh.vols["light"])), axis=0)
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_relight_pass_default_lanes_close():
    """Default lane counts differ per-slab vs replicated (summation
    order); packed results may differ by float rounding only."""
    st = scene().snapshot()
    sh = shard_space(st, mesh8())
    ref = relight_all_pass(st, build_relight_ctx(st))
    relight_pass_slab(sh)
    got = np.concatenate(list(np.asarray(sh.vols["light"])), axis=0)
    r = np.asarray(ref)
    assert np.abs(got[..., :3].astype(int) - r[..., :3].astype(int)).max() <= 1
    np.testing.assert_array_equal(got[..., 3], r[..., 3])  # status exact


def test_relight_iterated_matches_replicated():
    """Six fixed passes, halos re-exchanged each pass: still exact."""
    st = scene(max_distance=4).snapshot()
    sh = shard_space(st, mesh8())
    ctx = build_relight_ctx(st)
    cur = st
    for _ in range(6):
        new_light = relight_all_pass(cur, ctx, lanes=1)
        cur = dataclasses.replace(cur, light=new_light)
        relight_pass_slab(sh, lanes=1)
    got = np.concatenate(list(np.asarray(sh.vols["light"])), axis=0)
    np.testing.assert_array_equal(got, np.asarray(cur.light))


def test_evaluate_light_slab_converges():
    st = scene(max_distance=4).snapshot()
    sh = shard_space(st, mesh8())
    passes = evaluate_light_slab(sh, max_passes=32)
    assert 1 <= passes < 32
    gathered = sh.gather()
    # Converged field is self-consistent: one more replicated pass moves
    # nothing by more than one packed step.
    after = relight_all_pass(gathered, build_relight_ctx(gathered), lanes=1)
    from aic_tpu.math import lightpack

    diff = lightpack.difference_priority(gathered.light, after)
    assert int(np.asarray(diff).max()) <= 1


CAMS = [
    # (eye, spread axes) — ±x rays, dx == 0 rays, diagonals
    ((45.0, 6.0, 8.0), (-1.0, 0.0, 0.0)),
    ((-12.0, 6.0, 8.0), (1.0, 0.0, 0.0)),
    ((16.0, 30.0, 8.0), (0.0, -1.0, 0.0)),  # dx == 0
    ((40.0, 18.0, -10.0), (-1.0, -0.45, 0.7)),
]


def _ray_fan(eye, fwd, n=9, spread=0.35):
    fwd = np.asarray(fwd, np.float32)
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(fwd @ up) > 0.95:
        up = np.array([1.0, 0.0, 0.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    us, vs = np.meshgrid(np.linspace(-spread, spread, n), np.linspace(-spread, spread, n))
    d = fwd + us[..., None] * right + vs[..., None] * up2
    o = np.broadcast_to(np.asarray(eye, np.float32), d.shape).copy()
    return o.reshape(-1, 3), d.reshape(-1, 3).astype(np.float32)


@pytest.mark.parametrize("opts", [
    GraphicsOptions(lighting_display="none", fog="none", transparency="surface"),
    GraphicsOptions(lighting_display="flat", fog="none", transparency="volumetric"),
    GraphicsOptions(lighting_display="smoothstep", fog="distance", transparency="volumetric"),
])
def test_trace_matches_replicated(opts):
    sp = scene()
    sp.fast_evaluate_light()
    st = sp.snapshot()
    sh = shard_space(st, mesh8())
    for eye, fwd in CAMS:
        o, d = _ray_fan(eye, fwd)
        l_ref, t_ref = trace_rays(st, jnp.asarray(o), jnp.asarray(d), opts, beam_tile=0)
        l_got, t_got = trace_rays_slab(sh, o, d, opts)
        np.testing.assert_allclose(
            np.asarray(l_got), np.asarray(l_ref), atol=5e-3,
            err_msg=f"eye={eye} fwd={fwd}",
        )
        np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref), atol=5e-3)


def test_trace_rays_outside_and_axis_aligned():
    """Rays that miss the world entirely, graze one slab, or run exactly
    along a slab boundary plane."""
    sp = scene()
    sp.fast_evaluate_light()
    st = sp.snapshot()
    sh = shard_space(st, mesh8())
    opts = GraphicsOptions(lighting_display="none", fog="none", transparency="surface")
    o = np.array(
        [
            [16.0, 50.0, 8.0],   # above, looking up: pure sky
            [16.0, 6.0, -9.0],   # along +z at the x=16 boundary plane
            [4.0, 0.5, -9.0],    # clips only slab 1's ground row
            [-5.0, 2.0, 7.5],    # +x through every slab at ground level
        ],
        np.float32,
    )
    d = np.array(
        [[0, 1, 0], [0, 0, 1], [0, 0.05, 1], [1, 0, 0]], np.float32
    )
    l_ref, t_ref = trace_rays(st, jnp.asarray(o), jnp.asarray(d), opts, beam_tile=0)
    l_got, t_got = trace_rays_slab(sh, o, d, opts)
    np.testing.assert_allclose(np.asarray(l_got), np.asarray(l_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref), atol=5e-3)


def test_shard_space_requires_divisible_x():
    sp = Space(GridAab.from_lower_size((0, 0, 0), (30, 4, 4)))
    with pytest.raises(ValueError, match="divisible"):
        shard_space(sp.snapshot(), mesh8())


def test_shards_actually_sharded():
    """The stacked volumes really live sharded over the mesh (one shard
    per device), not replicated."""
    st = scene().snapshot()
    sh = shard_space(st, mesh8())
    for name in ("contents", "light"):
        arr = sh.vols[name]
        assert len(arr.sharding.device_set) == 8
        shard = next(iter(arr.addressable_shards))
        assert shard.data.shape[0] == 1  # one slab per device
