"""Megakernel (v2) classify-page tables: codes, layout, stability.

The v2 tracer's in-kernel classification reads per-region codes
(pallas_trace.py build_bitmask_ctx2). Two formats, chosen per scene:
narrow u16 pairs (atoms: palette index, bit 15 clear; voxel blocks:
0x8000 | res_log2<<12 | ventry — 16 rows/page) whenever every code fits
16 bits, else wide u32 (bit 31 flag, res_log2<<28, ventry<<14, row
base — 32 rows/page; required for R32 scenes).
"""

from __future__ import annotations

import numpy as np
import pytest

from aic_tpu.block import Block, Recur, from_color
from aic_tpu.math.grid import GridAab
from aic_tpu.raytrace.pallas_trace import (
    REGION,
    BitmaskCtx2,
    _megakernel_fits,
    build_bitmask_ctx2,
)
from aic_tpu.space import Space


def _voxel_block(res=4):
    vox = Space(GridAab.from_lower_size((0, 0, 0), (res, res, res)))
    vox.fill(vox.bounds, from_color((0.8, 0.2, 0.2, 1.0)))
    return Block(Recur(space=vox, resolution=res))


class TestCtx2:
    def test_atom_only_scene_has_no_pages(self):
        sp = Space(GridAab.from_lower_size((0, 0, 0), (8, 8, 8)))
        sp.fill(
            GridAab.from_lower_size((0, 0, 0), (8, 1, 8)),
            from_color((0.5, 0.5, 0.5, 1.0)),
        )
        ctx = build_bitmask_ctx2(sp.snapshot())
        assert ctx.pages is None and ctx.page_idx is None

    def test_codes_for_atoms_and_voxel_blocks(self):
        sp = Space(GridAab.from_lower_size((0, 0, 0), (8, 8, 8)))
        atom = from_color((0.1, 0.9, 0.1, 1.0))
        sp.set((1, 2, 3), atom)
        sp.set((4, 2, 3), _voxel_block())
        st = sp.snapshot()
        ctx = build_bitmask_ctx2(st)
        assert ctx.pages is not None
        assert not ctx.wide_pages  # tiny palette/ventries -> narrow u16
        pidx = np.asarray(ctx.page_idx)[: ctx.n_regions, 0]
        assert (pidx >= 0).sum() == 1  # single occupied region owns a page
        page = np.asarray(ctx.pages)[pidx.max() * 16 : pidx.max() * 16 + 16]
        words = page.reshape(-1)
        flat = np.empty(words.size * 2, np.uint32)
        flat[0::2] = words & 0xFFFF
        flat[1::2] = words >> 16
        codes = flat.reshape(REGION, REGION, REGION)

        contents = np.asarray(st.contents)
        atom_code = codes[1, 2, 3]
        vox_code = codes[4, 2, 3]
        assert atom_code < 0x8000 and atom_code == contents[1, 2, 3]
        assert vox_code >= 0x8000
        res_log2 = (vox_code >> 12) & 7
        assert res_log2 == 2  # R4 block
        ventry = vox_code & 0xFFF
        vidx = np.asarray(st.tables.voxel_index)[contents[4, 2, 3]]
        assert ventry == vidx

    def test_page_count_padded_to_eight(self):
        sp = Space(GridAab.from_lower_size((0, 0, 0), (40, 8, 8)))
        sp.set((1, 1, 1), _voxel_block())
        ctx = build_bitmask_ctx2(sp.snapshot())
        rows_per_page = 32 if ctx.wide_pages else 16
        assert ctx.pages.shape[0] % (rows_per_page * 8) == 0
        # More occupied regions, same padded page-array shape while the
        # true page count stays under the same 8-boundary (jit stability
        # across small edits).
        sp.set((20, 1, 1), _voxel_block())
        ctx2 = build_bitmask_ctx2(sp.snapshot())
        assert ctx2.pages.shape == ctx.pages.shape

    def test_r32_octant_rows(self):
        sp = Space(GridAab.from_lower_size((0, 0, 0), (8, 8, 8)))
        sp.set((2, 2, 2), _voxel_block(32))
        sp.set((5, 2, 2), _voxel_block(4))
        ctx = build_bitmask_ctx2(sp.snapshot())
        assert ctx.has_r32
        assert ctx.wide_pages  # R32 requires the u32 row-base format
        # rows: regions + 8 octant rows for the R32 entry + 1 for the R4.
        assert ctx.rows.shape[0] == ctx.n_regions + 9

    def test_fits_rejects_huge_palettes(self):
        sp = Space(GridAab.from_lower_size((0, 0, 0), (4, 4, 4)))
        sp.set((0, 0, 0), from_color((0.2, 0.2, 0.9, 1.0)))
        st = sp.snapshot()
        assert _megakernel_fits(st)  # tiny scene fits
