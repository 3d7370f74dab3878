"""Color/sRGB tests ported from the reference
(all-is-cubes-base/src/math/color.rs tests): exact srgb8 conversion
values, saturation, and 8-bit round-trip stability."""

import numpy as np

from aic_tpu.math import color


class TestToSrgb8:
    def test_rgba_to_srgb8(self):
        """color.rs:1222 — exact reference bytes."""
        rgb8 = color.np_linear_to_srgb8(np.array([0.125, 0.25, 0.5], np.float32))
        np.testing.assert_array_equal(rgb8, [99, 137, 188])
        # Alpha channel is linear 0..255 (0.75 → 191).
        assert int(round(0.75 * 255)) == 191

    def test_saturation(self):
        """color.rs:1229 — out-of-range components clamp."""
        rgb8 = color.np_linear_to_srgb8(np.array([0.5, -0.0, 10.0], np.float32))
        np.testing.assert_array_equal(rgb8, [188, 0, 255])


class TestRoundTrip:
    def test_srgb_round_trip(self):
        """color.rs:1261 — from_srgb8 ∘ to_srgb8 is the identity for
        every byte value."""
        vals = np.arange(256, dtype=np.uint8)
        linear = color.np_srgb8_to_linear(vals)
        back = color.np_linear_to_srgb8(linear)
        np.testing.assert_array_equal(back, vals)

    def test_srgb_decode_encode_float_consistency(self):
        """color.rs:1285 srgb_float — float encode rounds to the same
        bytes as the direct 8-bit path."""
        rng = np.random.default_rng(7)
        rgb = rng.uniform(0.0, 1.0, (64, 3)).astype(np.float32)
        direct = color.np_linear_to_srgb8(rgb)
        via_float = np.round(
            np.asarray(color.srgb_encode(rgb)) * 255.0
        ).astype(np.uint8)
        np.testing.assert_array_equal(direct, via_float)


class TestEdgeValues:
    def test_zero_and_one(self):
        assert color.np_linear_to_srgb8(np.array([0.0]))[0] == 0
        assert color.np_linear_to_srgb8(np.array([1.0]))[0] == 255
        np.testing.assert_allclose(color.np_srgb8_to_linear(np.array([0], np.uint8)), 0.0)
        np.testing.assert_allclose(color.np_srgb8_to_linear(np.array([255], np.uint8)), 1.0)

    def test_luminance_bt709(self):
        """color.rs luminance uses BT.709 weights."""
        w = np.array([0.2126, 0.7152, 0.0722], np.float32)
        rgb = np.array([0.3, 0.5, 0.2], np.float32)
        np.testing.assert_allclose(
            float(np.asarray(color.luminance(rgb))), float(w @ rgb), rtol=1e-6
        )
