"""PackedLight: logarithmic u8 light encoding + status channel (layer 0).

Bit-exact re-derivation of the reference's `PackedLight`
(all-is-cubes/src/space/light/data.rs:51-69): each RGB component is stored as
``round(log2(v) * 10 + 144)`` saturating-cast to u8, with a 4th status byte:

    UNINITIALIZED = 0, NO_RAYS = 1, OPAQUE = 128, VISIBLE = 255

Encoded value 0 decodes to exactly 0.0 (data.rs:239 special case), and the
encode/decode pair round-trips over all u8 values (tested like data.rs:397).

The light field of a Space is a ``uint8[..., 4]`` array (rgb + status), the
same texel layout the reference uploads to its GPU light texture
(data.rs:162 `as_texel`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LOG_SCALE = 10.0
LOG_OFFSET = 144.0

STATUS_UNINITIALIZED = 0
STATUS_NO_RAYS = 1
STATUS_OPAQUE = 128
STATUS_VISIBLE = 255

#: Decode lookup table, exactly data.rs PACKED_LIGHT_SCALAR_LOOKUP_TABLE's
#: defining formula: exp2((v - 144) / 10), with table[0] = 0.
DECODE_TABLE = np.exp2((np.arange(256, dtype=np.float32) - LOG_OFFSET) / LOG_SCALE)
DECODE_TABLE[0] = 0.0
DECODE_TABLE = DECODE_TABLE.astype(np.float32)


def encode_scalar(v):
    """Linear light component (f32 >= 0) → u8 log scale (data.rs:213)."""
    v = jnp.maximum(jnp.asarray(v, jnp.float32), 0.0)
    # log2(0) = -inf → clipped to 0, matching Rust's saturating `as u8`.
    raw = jnp.round(jnp.log2(v) * LOG_SCALE + LOG_OFFSET)
    return jnp.clip(jnp.nan_to_num(raw, nan=0.0, neginf=0.0, posinf=255.0), 0, 255).astype(
        jnp.uint8
    )


def decode_scalar(u):
    """u8 log scale → linear light component (data.rs:222)."""
    return jnp.asarray(DECODE_TABLE)[jnp.asarray(u, jnp.int32)]


def encode_rgb(rgb, status=STATUS_VISIBLE):
    """(..., 3) linear RGB → (..., 4) packed texel with given status."""
    packed = encode_scalar(rgb)
    status_arr = jnp.broadcast_to(
        jnp.asarray(status, jnp.uint8), packed.shape[:-1] + (1,)
    )
    return jnp.concatenate([packed, status_arr], axis=-1)


def decode_rgb(texel):
    """(..., 4) packed texel → (..., 3) linear RGB (ignores status)."""
    return decode_scalar(texel[..., :3])


def decode_with_ao(texel):
    """(..., 4) texel → (..., 4) [r, g, b, weight].

    data.rs:146 `value_with_ambient_occlusion`: weight is 1 for Visible,
    0.25 for Opaque (ambient-occlusion fudge), 0 otherwise.
    """
    rgb = decode_rgb(texel)
    status = texel[..., 3]
    weight = jnp.where(
        status == STATUS_VISIBLE,
        1.0,
        jnp.where(status == STATUS_OPAQUE, 0.25, 0.0),
    ).astype(jnp.float32)
    return jnp.concatenate([rgb, weight[..., None]], axis=-1)


def valid(texel):
    """Whether the stored light value is meaningful (data.rs:127)."""
    return texel[..., 3] == STATUS_VISIBLE


def difference_priority(a, b):
    """Max abs component difference incl. status flip (data.rs:193).

    Returns u8-ish int32; 0 iff equal. Used to decide relight re-enqueueing.
    """
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    diff = jnp.max(jnp.abs(a[..., :3] - b[..., :3]), axis=-1)
    status_change = a[..., 3] != b[..., 3]
    return jnp.where(status_change, jnp.maximum(diff, 255), diff)


# Host-side (numpy) variants for content generation / tests.
def np_encode_scalar(v) -> np.ndarray:
    v = np.maximum(np.asarray(v, np.float32), 0.0)
    with np.errstate(divide="ignore"):
        raw = np.round(np.log2(v) * LOG_SCALE + LOG_OFFSET)
    raw = np.nan_to_num(raw, nan=0.0, neginf=0.0, posinf=255.0)
    return np.clip(raw, 0, 255).astype(np.uint8)


def np_decode_scalar(u) -> np.ndarray:
    return DECODE_TABLE[np.asarray(u, np.int32)]
