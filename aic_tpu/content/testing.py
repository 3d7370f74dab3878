"""light_bench_space: the canonical light-benchmark scene.

Reference: all-is-cubes/src/content/testing.rs:25 — a ground slab plus a
grid of randomized 6³ "sections" (solid buildings / hollow shells / random
noise, occasionally semi-transparent), under an octant sky, sized 54×16×54
by the light benchmark (all-is-cubes/benches/light.rs).

RNG streams differ from the reference (we use numpy PCG64 per section
instead of Xoshiro256Plus) but the structural recipe — section layout,
shape choice weights, color/alpha distribution — matches.
"""

from __future__ import annotations

import numpy as np

from ..block import AIR, Block, from_color
from ..math.color import np_srgb8_to_linear
from ..math.grid import GridAab
from ..space import Sky, Space, SpacePhysics

SECTION_WIDTH = 6
MARGIN = 4
SECTION_SPACING = SECTION_WIDTH + MARGIN

ALMOST_BLACK = np_srgb8_to_linear(np.array([10, 10, 10]))
DAY_SKY = np_srgb8_to_linear(np.array([243, 243, 255]))


def light_bench_space(requested_size=(54, 16, 54)) -> Space:
    w, h, d = requested_size
    nx = (w - MARGIN) // SECTION_SPACING
    nz = (d - MARGIN) // SECTION_SPACING
    section_height = max(h - 2, 2)
    yup = section_height * 4 // 14
    ydown = section_height - yup

    bounds = GridAab.from_lower_upper(
        (0, -ydown - 1, 0),
        (SECTION_SPACING * nx + MARGIN, 1 + yup, SECTION_SPACING * nz + MARGIN),
    )
    sky = Sky.from_octants(
        # testing.rs:124: octant order (x, y, z) sign bits; ground below,
        # bright +Y on -X side, dim +Y on +X side.
        np.array(
            [
                ALMOST_BLACK, ALMOST_BLACK, DAY_SKY * 2.0, DAY_SKY * 2.0,
                ALMOST_BLACK, ALMOST_BLACK, DAY_SKY * 0.5, DAY_SKY * 0.5,
            ],
            np.float32,
        ),
    )
    space = Space(
        bounds,
        physics=SpacePhysics(sky=sky, light_max_distance=min(max(w, d), 255)),
    )

    # Ground: everything below the top `yup` layers.
    ground = GridAab.from_lower_upper(
        bounds.lower, (bounds.upper[0], bounds.upper[1] - yup, bounds.upper[2])
    )
    space.fill(ground, from_color((0.5, 0.5, 0.5, 1.0), "ground"))

    for sx in range(nx):
        for sz in range(nz):
            rng = np.random.default_rng(sx + sz * nx)
            section = GridAab.from_lower_size(
                (MARGIN + sx * SECTION_SPACING, -ydown + 1, MARGIN + sz * SECTION_SPACING),
                (SECTION_WIDTH, section_height, SECTION_WIDTH),
            )
            color = from_color(
                (
                    float(rng.uniform(0, 1)),
                    float(rng.uniform(0, 1)),
                    float(rng.uniform(0, 1)),
                    0.5 if rng.random() < 0.125 else 1.0,
                ),
                f"section{sx},{sz}",
            )
            shape = int(rng.integers(0, 3))
            if shape == 0:
                space.fill(section, color)
            elif shape == 1:
                # Hollow shell: solid box, then air interior (walls only in
                # x/z — testing.rs:89 shrinks nx/nz/px/pz by 1).
                space.fill(section, color)
                interior = GridAab.from_lower_upper(
                    (section.lower[0] + 1, section.lower[1], section.lower[2] + 1),
                    (section.upper[0] - 1, section.upper[1], section.upper[2] - 1),
                )
                space.fill(interior, AIR)
            else:
                noise = rng.random(section.size) < 0.25
                lx, ly, lz = section.lower
                for (x, y, z) in section.interior_iter():
                    if noise[x - lx, y - ly, z - lz]:
                        space.set((x, y, z), color)

    space.fast_evaluate_light()
    return space


def make_some_blocks(n: int) -> list[Block]:
    """N distinct fully-opaque atom blocks for tests/demos.

    Reference: all-is-cubes/src/content.rs:46 `make_some_blocks` — block i
    is a grayscale of luminance i/(n-1) named by its index."""
    out = []
    for i in range(n):
        lum = i / (n - 1) if n > 1 else 0.5
        out.append(from_color((lum, lum, lum, 1.0), str(i)))
    return out


def make_some_voxel_blocks(n: int, resolution: int = 16) -> list[Block]:
    """N distinct R16 voxel blocks: a filled grayscale cube with the
    block's index drawn on the front face.

    Reference: all-is-cubes/src/content.rs:81 `make_some_voxel_blocks_txn`
    (filled color + centered digit label; we draw the digit with the
    builtin voxel font instead of the text-primitive plumbing)."""
    from ..block import Recur
    from ..block.model import BlockAttributes
    from ..space.drawing import draw_text_line

    out = []
    for i in range(n):
        lum = i / (n - 1) if n > 1 else 0.5
        vox = Space(GridAab.cube(resolution))
        vox.fill(vox.bounds, from_color((lum, lum, lum, 1.0)))
        label_lum = 1.0 if lum < 0.5 else 0.04
        draw_text_line(
            vox,
            str(i),
            (resolution // 2 - 2, resolution // 2 - 4, resolution - 1),
            color=(label_lum, label_lum, label_lum, 1.0),
        )
        out.append(
            Block(
                Recur(space=vox, resolution=resolution),
                attributes=BlockAttributes(display_name=str(i)),
            )
        )
    return out
