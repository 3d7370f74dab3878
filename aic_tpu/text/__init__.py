"""Text rasterization for voxel text blocks and the VUI.

Role of the reference's `all-is-cubes/src/block/text.rs` + `text/font.rs`
(845 + 609 LoC of font/layout machinery over embedded bitmap fonts). Our
deviation: glyph rasters come from PIL's built-in bitmap font on the host
(text is content-time work, never frame-time), laid out into per-block
voxel tiles by block evaluation.
"""

from .font import measure_text, rasterize_text, text_tile

__all__ = ["measure_text", "rasterize_text", "text_tile"]
