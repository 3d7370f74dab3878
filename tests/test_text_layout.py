"""Text layout/positioning tests ported from the reference
(test-aic/tests/test-aic/text.rs): metrics, baseline behavior, exact
glyph planes, positioning rounding, non-intersection, plus schema round
trips for the extended TextPrimitive fields."""

import numpy as np
import pytest

from aic_tpu.block import evaluate
from aic_tpu.math.grid import GridAab
from aic_tpu.text.layout import (
    FONT_BODY_TEXT,
    FONT_SYSTEM_16,
    Positioning,
    Text,
    compute_layout,
)


def plane_to_text(ev) -> list[str]:
    """text.rs:17 plane_to_text: z-flattened occupancy rows, y-down,
    cropped to the drawn bounding box."""
    color = np.asarray(ev.voxels.color)
    occ = color[..., 3] > 0  # [x, y, z]
    occ2 = occ.any(axis=2)  # [x, y]
    xs, ys = np.nonzero(occ2)
    assert len(xs) > 0
    x0, x1 = xs.min(), xs.max() + 1
    y0, y1 = ys.min(), ys.max() + 1
    rows = []
    for y in reversed(range(y0, y1)):  # top row first (y-up voxels)
        rows.append(
            "".join("#" if occ2[x, y] else "." for x in range(x0, x1))
        )
    return rows


class TestMetrics:
    def test_metrics_of_builtin_fonts(self):
        """text.rs metrics_of_builtin_fonts (font.rs:23-38 decls)."""
        assert (FONT_SYSTEM_16.char_w, FONT_SYSTEM_16.char_h) == (7, 16)
        assert FONT_SYSTEM_16.baseline == 13
        assert (FONT_BODY_TEXT.char_w, FONT_BODY_TEXT.char_h) == (6, 14)
        assert FONT_BODY_TEXT.baseline == 11

    @pytest.mark.parametrize("font", [FONT_SYSTEM_16, FONT_BODY_TEXT])
    def test_baseline_of_builtin_fonts(self, font):
        """text.rs baseline_of_builtin_fonts: Baseline positioning keeps
        text at or above y=0; BodyTop puts the bottom edge at
        -baseline."""
        name = {"system-16": "system16"}.get(font.name, font.name)
        above = Text(
            string="ab",
            font=name,
            resolution=16,
            positioning=Positioning(x="left", line_y="baseline", z="back"),
        )
        bb = above.layout().rendering_bounding_box
        assert bb.lower[1] == 0

        from_top = Text(
            string="ab",
            font=name,
            resolution=16,
            layout_bounds=((0, 0, 0), (0, 0, 0)),
            positioning=Positioning(x="left", line_y="body-top", z="back"),
        )
        bb2 = from_top.layout().rendering_bounding_box
        assert bb2.lower[1] == -font.baseline


@pytest.mark.skipif(
    not __import__("os").path.exists(FONT_SYSTEM_16.atlas_path),
    reason="reference font atlas not mounted (pixel-exact cases need it)",
)
class TestExactPlanes:
    def test_single_line_text_smoke_test(self):
        """text.rs single_line_text_smoke_test, pixel for pixel."""
        t = Text(
            string="ab",
            font="system16",
            foreground=(1, 1, 1, 1),
            resolution=16,
            positioning=Positioning(x="left", line_y="body-bottom", z="back"),
        )
        assert t.layout().rendering_bounding_box == GridAab.from_lower_size(
            [0, 3, 0], [13, 10, 1]
        )
        ev = evaluate(t.single_block())
        assert plane_to_text(ev) == [
            ".......##....",
            ".......##....",
            ".......##....",
            "..##...####..",
            ".####..#####.",
            "##..##.##..##",
            "##..##.##..##",
            "##..##.##..##",
            ".#####.#####.",
            "..##.#.#.##..",
        ]

    def test_multiple_line(self):
        """text.rs multiple_line, pixel for pixel at R32."""
        t = Text(
            string="abcd\nefgh",
            font="system16",
            foreground=(1, 1, 1, 1),
            resolution=32,
            positioning=Positioning(x="left", line_y="body-top", z="back"),
        )
        ev = evaluate(t.single_block())
        assert plane_to_text(ev) == [
            ".......##................##",
            ".......##................##",
            ".......##................##",
            "..##...####.....##.....####",
            ".####..#####...####...#####",
            "##..##.##..##.##..##.##..##",
            "##..##.##..##.##.....##..##",
            "##..##.##..##.##..##.##..##",
            ".#####.#####...####...#####",
            "..##.#.#.##.....##.....##.#",
            "...........................",
            "...........................",
            "...........................",
            "...........................",
            "...........................",
            "...........##..............",
            "..........###........##....",
            ".........##..........##....",
            ".........##..........##....",
            "..##...######...##.#.####..",
            ".####..######..#####.#####.",
            "##..##...##...##..##.##..##",
            "#####....##...##..##.##..##",
            "##.......##...##..##.##..##",
            ".####....##....#####.##..##",
            "..##.....##.....####.##..##",
            "..............#...##.......",
            "..............##..##.......",
            "...............####........",
        ]

    def test_bounding_voxels_of_positioning_high(self):
        """text.rs bounding_voxels_of_positioning_high: Right/BodyTop/
        Front meets the upper corner exactly."""
        t = Text(
            string="abc",
            font="system16",
            resolution=32,
            positioning=Positioning(x="right", line_y="body-top", z="front"),
        )
        assert t.layout().logical_bounding_box == GridAab.from_lower_upper(
            [11, 16, 31], [32, 32, 32]
        )


@pytest.mark.parametrize(
    "pos,odd,bounds_x,expected_x",
    [
        ("left", False, (0, 16), (0, 36)),
        ("right", False, (0, 16), (-20, 16)),
        ("center", False, (0, 16), (-10, 26)),
        ("center", True, (0, 16), (-2, 19)),
        ("center", False, (0, 15), (-10, 26)),
        ("center", True, (0, 15), (-3, 18)),
        ("center", False, (1, 16), (-9, 27)),
        ("center", True, (1, 16), (-2, 19)),
    ],
)
def test_positioning_x(pos, odd, bounds_x, expected_x):
    """text.rs positioning_x: exact i32 rounding of line placement."""
    string, font = ("abc", FONT_SYSTEM_16) if odd else ("abcdef", FONT_BODY_TEXT)
    lay = compute_layout(
        string,
        font,
        False,
        GridAab.from_lower_upper(
            (bounds_x[0], 0, 0), (bounds_x[1], 16, 16)
        ),
        Positioning(x=pos, line_y="body-middle", z="back"),
    )
    lb = lay.logical_bounding_box
    assert (lb.lower[0], lb.upper[0]) == expected_x


def test_no_intersection_with_block():
    """text.rs no_intersection_with_block: layout bounds far outside the
    block window produce an invisible evaluation (no crash)."""
    t = Text(
        string="ab",
        font="system16",
        resolution=16,
        layout_bounds=((100000, 0, 0), (16, 16, 16)),
    )
    ev = evaluate(t.single_block())
    assert not ev.visible_or_animated()


def test_outline_brush_layers():
    """text.rs Brush (819-838): outlined text draws OUTLINE at z and
    FOREGROUND at z+1; outline ring surrounds every foreground pixel."""
    t = Text(
        string="o",
        font="system16",
        foreground=(1, 0, 0, 1),
        outline=(0, 0, 1, 1),
        resolution=16,
        positioning=Positioning(x="left", line_y="body-bottom", z="back"),
    )
    ev = evaluate(t.single_block())
    col = np.asarray(ev.voxels.color)
    red = (col[..., 0] > 0.5) & (col[..., 3] > 0)
    blue = (col[..., 2] > 0.5) & (col[..., 3] > 0)
    assert red.any() and blue.any()
    # Foreground only on the z=1 plane, outline only on z=0.
    assert set(np.nonzero(red)[2]) == {1}
    assert set(np.nonzero(blue)[2]) == {0}
    # Every foreground pixel sits over an outline pixel (P1+P0 pairing).
    assert (blue[:, :, 0] >= red[:, :, 1]).all()


def test_multiblock_tiles_partition_text():
    """Blocks at different offsets show disjoint windows whose union is
    the whole rendering (text.rs installation role)."""
    t = Text(
        string="Wide text!",
        font="system16",
        foreground=(1, 1, 1, 1),
        resolution=16,
        layout_bounds=((0, 0, 0), (48, 16, 16)),
        positioning=Positioning(x="left", line_y="body-bottom", z="back"),
    )
    bb = t.bounding_blocks()
    assert bb.size[0] >= 3  # 10 chars * 7 px > 48 px: several blocks
    total = 0
    for off, blk in t.blocks().items():
        ev = evaluate(blk)
        total += int((np.asarray(ev.voxels.color)[..., 3] > 0).sum())
    # Sum over tiles equals the whole layout's drawn voxel count.
    from aic_tpu.text.layout import draw_layout_voxels

    lay = t.layout()
    expected = len({c for c, _ in draw_layout_voxels(lay, FONT_SYSTEM_16, False)})
    assert total == expected


class TestSchema:
    def test_alliscubesjson_round_trip(self, tmp_path):
        """TextV1 schema (save/schema.rs:233): font handle, positioning
        variants, layout bounds, outline survive a save/load cycle."""
        from aic_tpu.io.import_ref import load_alliscubesjson, save_alliscubesjson
        from aic_tpu.space import Space
        from aic_tpu.universe import Universe

        t = Text(
            string="S",
            font="body-text",
            foreground=(0.9, 0.2, 0.1, 1.0),
            outline=(0, 0, 0, 1),
            resolution=32,
            layout_bounds=((2, 1, 0), (28, 30, 8)),
            positioning=Positioning(x="right", line_y="baseline", z="front"),
        )
        sp = Space(GridAab.from_lower_size((0, 0, 0), (2, 2, 2)))
        sp.set((0, 0, 0), t.single_block())
        u = Universe()
        u.insert_space("w", sp)
        path = str(tmp_path / "t.alliscubesjson")
        save_alliscubesjson(u, path)
        u2, warnings = load_alliscubesjson(path)
        p = u2.spaces["w"].block_at((0, 0, 0)).primitive
        assert p.text == "S"
        assert p.font == "body-text"
        assert p.positioning == ("right", "baseline", "front")
        assert p.layout_lower == (2, 1, 0) and p.layout_size == (28, 30, 8)
        assert p.outline_color is not None
        assert p.resolution == 32

    def test_native_save_round_trip(self, tmp_path):
        from aic_tpu.io.save import load_universe, save_universe
        from aic_tpu.space import Space
        from aic_tpu.universe import Universe

        t = Text(string="N", font="system16", resolution=16)
        sp = Space(GridAab.from_lower_size((0, 0, 0), (1, 1, 1)))
        sp.set((0, 0, 0), t.single_block())
        u = Universe()
        u.insert_space("w", sp)
        path = str(tmp_path / "t.json")
        save_universe(u, path)
        u2 = load_universe(path)
        p = u2.spaces["w"].block_at((0, 0, 0)).primitive
        assert (p.font, p.text) == ("system16", "N")
        assert p.positioning == ("center", "body-middle", "back")
