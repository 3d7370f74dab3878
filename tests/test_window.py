"""Windowed big-world rendering (the light-texture region-mapping analog,
gpu/src/light_texture.rs:39,139)."""

import numpy as np
import pytest

from aic_tpu import block
from aic_tpu.light import evaluate_light
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport, render
from aic_tpu.space import Sky, Space, SpacePhysics
from aic_tpu.space.state import visible_light_volume, window_state


def big_space(n=160):
    sp = Space(
        GridAab.from_lower_size((0, 0, 0), (n, 24, n)),
        physics=SpacePhysics(sky=Sky.uniform((0.7, 0.8, 1.0)), light_max_distance=20),
    )
    sp.fill(GridAab.from_lower_size((0, 0, 0), (n, 1, n)), block.from_color((0.4, 0.6, 0.3, 1.0)))
    for x in range(8, n - 8, 16):
        for z in range(8, n - 8, 16):
            for y in range(1, 5):
                sp.set((x, y, z), block.from_color((0.7, 0.3, 0.2, 1.0)))
    # A voxel-detail block near the camera exercises the shared vox bricks.
    vox = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
    for i in range(4):
        vox.set((i, i, 0), block.from_color((0.9, 0.9, 0.1, 1.0)))
    from aic_tpu.block import Block, Recur

    sp.set((20, 1, 22), Block(Recur(space=vox, resolution=4)))
    sp.fast_evaluate_light()
    return sp


class TestWindow:
    def test_visible_light_volume_clips(self):
        st = big_space(64).snapshot()
        lo, hi = visible_light_volume(st, (32.0, 5.0, 32.0), 20.0)
        assert all(l >= b for l, b in zip(lo, (0, 0, 0)))
        assert all(h <= b for h, b in zip(hi, (64, 24, 64)))
        assert all(h > l for l, h in zip(lo, hi))

    def test_windowed_render_matches_full_near_view(self):
        sp = big_space(96)
        st = sp.snapshot()
        eye = (24.0, 6.0, 30.0)
        opts = GraphicsOptions(
            lighting_display="flat", fog="none", view_distance=24.0
        )
        cam = Camera(opts, Viewport(64, 48))
        cam.look_at(eye, (20.0, 2.0, 22.0))

        lo, hi = visible_light_volume(st, eye, opts.view_distance)
        win = window_state(st, lo, hi)
        assert win.contents.shape[0] < st.contents.shape[0]

        full = render(st, cam).data
        windowed = render(win, cam).data
        # Only content within view distance matters; the near scene
        # must match (distant pillars may differ at the horizon edge).
        center = (slice(8, 40), slice(8, 56))
        diff = np.abs(
            full[center].astype(int) - windowed[center].astype(int)
        )
        assert np.median(diff) == 0
        assert (diff > 8).mean() < 0.06

    def test_window_bounds_validation(self):
        st = big_space(64).snapshot()
        with pytest.raises(ValueError):
            window_state(st, (-10, 0, 0), (5, 5, 5))
