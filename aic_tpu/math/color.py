"""Color math (layer 0): linear RGB(A), premultiplied compositing, sRGB.

Behavioral equivalent of the reference's `Rgb`/`Rgba`
(all-is-cubes-base/src/math/color.rs:107,160) re-expressed as array ops:
colors are float32 arrays with a trailing axis of 3 or 4; all functions are
jittable and work on arbitrarily-batched inputs.

The reference's NaN-free newtypes (`PositiveSign`, `ZeroOne`,
restricted_number.rs:35,45) become clamping discipline at the boundaries:
`clamp01`, `nonneg`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TRANSPARENT = np.zeros(4, np.float32)
WHITE = np.array([1, 1, 1, 1], np.float32)
BLACK = np.array([0, 0, 0, 1], np.float32)


def nonneg(x):
    return jnp.maximum(x, 0.0)


def clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def reflect(rgba, illumination):
    """Light reflected by a surface: rgb * illumination * alpha.

    color.rs:707 `Rgba::reflect`.
    `rgba` is (..., 4); `illumination` is (..., 3); returns (..., 3).
    """
    return rgba[..., :3] * illumination * rgba[..., 3:4]


def composite_over(light, transmittance, surface_light, surface_transmittance):
    """Front-to-back premultiplied-alpha accumulation.

    raytracer_components.rs:87 `ColorBuf::add_color_internal`: the new
    surface's light is scaled by the transmittance accumulated so far, then
    transmittance is multiplied in. Returns (light', transmittance').
    """
    return (
        light + surface_light * transmittance,
        transmittance * surface_transmittance,
    )


def srgb_encode(c):
    """Linear → sRGB gamma for color components (color.rs:1036)."""
    c = nonneg(c)
    return jnp.where(
        c <= 0.0031308,
        c * (323.0 / 25.0),
        (211.0 * jnp.power(jnp.maximum(c, 1e-10), 5.0 / 12.0) - 11.0) / 200.0,
    )


def srgb_decode(c):
    """sRGB → linear for color components (color.rs:1066)."""
    c = nonneg(c)
    return jnp.where(
        c <= 0.04045,
        c * (25.0 / 323.0),
        jnp.power((200.0 * c + 11.0) / 211.0, 12.0 / 5.0),
    )


def linear_to_srgb8(rgb):
    """float linear components → u8 sRGB (color.rs:1049)."""
    return jnp.clip(jnp.round(srgb_encode(rgb) * 255.0), 0, 255).astype(jnp.uint8)


def srgb8_to_linear(rgb8):
    return srgb_decode(jnp.asarray(rgb8, jnp.float32) / 255.0)


def np_srgb8_to_linear(rgb8) -> np.ndarray:
    """Host-side (numpy) sRGB u8 → linear float, for content generation."""
    c = np.asarray(rgb8, np.float64) / 255.0
    out = np.where(c <= 0.04045, c * (25.0 / 323.0), ((200.0 * c + 11.0) / 211.0) ** (12.0 / 5.0))
    return out.astype(np.float32)


def np_linear_to_srgb8(rgb) -> np.ndarray:
    c = np.maximum(np.asarray(rgb, np.float64), 0.0)
    out = np.where(c <= 0.0031308, c * (323.0 / 25.0), (211.0 * c ** (5.0 / 12.0) - 11.0) / 200.0)
    return np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)


def luminance(rgb):
    """Rec.709 luminance of linear RGB (color.rs `Rgb::luminance`)."""
    return rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722
