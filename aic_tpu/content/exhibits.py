"""Exhibits: small self-contained demo scenes placed in the demo city.

Role of the reference's exhibits gallery
(all-is-cubes-content/src/city/exhibit.rs:11 `Exhibit` + exhibits/*.rs):
each exhibit is a named factory producing a small Space that stresses one
engine feature (transparency, composite modifiers, rotations,
resolutions, Move animation, voxel text, color fidelity). The demo-city
generator places them on pedestals around the plaza with voxel-text name
signs (city.rs exhibit placement role).

The factories mirror specific reference exhibits (cited per function);
geometry is re-derived, not copied.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..block import AIR, Atom, Block, Composite, Move, Recur, Rotate, TextPrimitive
from ..block import from_color
from ..math import faces
from ..math.grid import GridAab, ROTATION_MATRICES
from ..space import Sky, Space, SpacePhysics


@dataclass(frozen=True)
class Exhibit:
    """exhibit.rs:11 Exhibit: name + subtitle + factory."""

    name: str
    subtitle: str
    factory: Callable[[], Space]


def _exhibit_space(size, sky=(0.8, 0.8, 0.8)) -> Space:
    return Space(
        GridAab.from_lower_size((0, 0, 0), size),
        physics=SpacePhysics(sky=Sky.uniform(sky)),
    )


def transparency_exhibit() -> Space:
    """exhibits/transparency.rs TRANSPARENCY_LARGE: panes of decreasing
    alpha in front of reference pillars."""
    sp = _exhibit_space((7, 5, 5))
    alphas = [0.9, 0.7, 0.5, 0.3, 0.1]
    for i, a in enumerate(alphas):
        pane = Block(Atom(color=(0.2, 0.6, 1.0, a)))
        for y in range(1, 4):
            sp.set((1 + i, y, 1), pane)
    pillar = from_color((1.0, 0.3, 0.1, 1.0))
    for x in (1, 3, 5):
        for y in range(1, 4):
            sp.set((x, y, 3), pillar)
    return sp


def composite_exhibit() -> Space:
    """exhibits/composite.rs: the Porter–Duff operator matrix applied to
    two voxel shapes."""
    r = 8
    vox_a = Space(GridAab.from_lower_size((0, 0, 0), (r, r, r)))
    vox_b = Space(GridAab.from_lower_size((0, 0, 0), (r, r, r)))
    red = from_color((1.0, 0.1, 0.1, 1.0))
    blue = from_color((0.1, 0.1, 1.0, 1.0))
    for x in range(r):
        for y in range(r):
            for z in range(r):
                if (x - r / 2) ** 2 + (y - r / 2) ** 2 + (z - r / 2) ** 2 <= (r / 2) ** 2:
                    vox_a.set((x, y, z), red)
                if abs(x - r // 2) <= 1 or abs(y - r // 2) <= 1:
                    vox_b.set((x, y, z), blue)
    a = Block(Recur(space=vox_a, resolution=r))
    b = Block(Recur(space=vox_b, resolution=r))
    ops = ["over", "in", "out", "atop"]
    sp = _exhibit_space((2 * len(ops) + 1, 3, 3))
    for i, op in enumerate(ops):
        sp.set((1 + 2 * i, 1, 1), a.with_modifier(Composite(source=b, operator=op)))
    return sp


def rotation_exhibit() -> Space:
    """exhibits/rotation.rs: an asymmetric block under many rotations."""
    r = 8
    vox = Space(GridAab.from_lower_size((0, 0, 0), (r, r, r)))
    body = from_color((0.8, 0.7, 0.2, 1.0))
    tip = from_color((0.1, 0.8, 0.2, 1.0))
    for y in range(r):
        vox.set((0, y, 0), body)
    for x in range(r):
        vox.set((x, 0, 0), tip)
    vox.set((0, r - 1, 1), tip)
    arrow = Block(Recur(space=vox, resolution=r))
    n = len(ROTATION_MATRICES)
    cols = 8
    rows = (n + cols - 1) // cols
    sp = _exhibit_space((2 * cols + 1, 3, 2 * rows + 1))
    for i in range(n):
        sp.set(
            (1 + 2 * (i % cols), 1, 1 + 2 * (i // cols)),
            arrow.with_modifier(Rotate(i)),
        )
    return sp


def resolution_exhibit() -> Space:
    """exhibits/resolutions.rs: the same sphere at R2..R32."""
    sp = _exhibit_space((13, 3, 3))
    for i, r in enumerate([2, 4, 8, 16, 32]):
        vox = Space(GridAab.from_lower_size((0, 0, 0), (r, r, r)))
        mat = from_color((0.3, 0.6, 0.9, 1.0))
        c = (r - 1) / 2.0
        for x in range(r):
            for y in range(r):
                for z in range(r):
                    if (x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2 <= (r / 2) ** 2:
                        vox.set((x, y, z), mat)
        sp.set((1 + 2 * i, 1, 1), Block(Recur(space=vox, resolution=r)))
    return sp


def move_exhibit() -> Space:
    """exhibits/move_modifier.rs: blocks displaced by Move at several
    phases (the animated version is the elevator; here the phases are laid
    out spatially so a still render shows the modifier working)."""
    sp = _exhibit_space((9, 4, 3))
    base = from_color((0.6, 0.3, 0.7, 1.0))
    for i, dist in enumerate([0, 64, 128, 192]):
        sp.set((1 + 2 * i, 1, 1), base.with_modifier(Move(face=faces.PY, distance=dist)))
    return sp


def text_exhibit() -> Space:
    """exhibits/text_blocks.rs: voxel text rendered from TextPrimitive."""
    sp = _exhibit_space((9, 3, 3))
    from ..text.font import text_tile_count

    # Backdrop wall so the thin glyph slabs read from any angle.
    sp.fill(
        GridAab.from_lower_size((0, 0, 0), (9, 3, 1)),
        from_color((0.25, 0.25, 0.3, 1.0)),
    )
    text = "AIC"
    n = text_tile_count(text, 16)
    for i in range(min(n, 7)):
        sp.set(
            (1 + i, 1, 2),
            Block(
                TextPrimitive(
                    text=text, resolution=16, color=(1.0, 1.0, 0.2, 1.0), tile=(i, 0)
                )
            ),
        )
    return sp


def color_exhibit() -> Space:
    """exhibits/color.rs COLORS: a swatch grid over hue × lightness."""
    cols, rows = 8, 4
    sp = _exhibit_space((cols + 2, 2, rows + 2))
    for i in range(cols):
        for j in range(rows):
            h = i / cols * 6.0
            lightness = (j + 1) / (rows + 1)
            c = np.clip(
                np.array(
                    [abs(h - 3) - 1, 2 - abs(h - 2), 2 - abs(h - 4)], np.float64
                ),
                0,
                1,
            )
            rgb = tuple(float(v) for v in c * lightness)
            sp.set((1 + i, 1, 1 + j), from_color(rgb + (1.0,)))
    return sp


EXHIBITS: tuple[Exhibit, ...] = (
    Exhibit("Transparency", "Alpha blending of surfaces", transparency_exhibit),
    Exhibit("Composite", "Porter-Duff block combination", composite_exhibit),
    Exhibit("Rotations", "All 48 grid rotations", rotation_exhibit),
    Exhibit("Resolutions", "Voxel detail R2-R32", resolution_exhibit),
    Exhibit("Move", "Move modifier phases", move_exhibit),
    Exhibit("Text", "Voxel text blocks", text_exhibit),
    Exhibit("Colors", "Color fidelity swatches", color_exhibit),
)


def place_exhibit(city: Space, exhibit: Exhibit, origin, pedestal: Block) -> None:
    """Copy an exhibit's space into the city at `origin`, on a pedestal
    slab, with a voxel-text name sign (city.rs exhibit placement role)."""
    sp = exhibit.factory()
    size = sp.bounds.size
    ox, oy, oz = origin
    # Pedestal slab under the exhibit footprint.
    city.fill(
        GridAab.from_lower_size((ox, oy, oz), (size[0], 1, size[2])), pedestal
    )
    contents = sp.contents
    for rel in np.argwhere(contents != 0):
        blk = sp.palette[int(contents[tuple(rel)])]
        cube = (
            ox + int(rel[0]),
            oy + 1 + int(rel[1] - 0),
            oz + int(rel[2]),
        )
        if city.bounds.contains_cube(cube):
            city.set(cube, blk)
    # Name sign: one text block per tile along the front edge.
    from ..text.font import text_tile_count

    n = min(text_tile_count(exhibit.name, 16), size[0])
    for i in range(n):
        cube = (ox + i, oy + 1, oz - 1)
        if city.bounds.contains_cube(cube):
            city.set(
                cube,
                Block(
                    TextPrimitive(
                        text=exhibit.name,
                        resolution=16,
                        color=(1.0, 1.0, 1.0, 1.0),
                        tile=(i, 0),
                    )
                ),
            )
