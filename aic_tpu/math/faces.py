"""Axis-aligned face/direction conventions (layer 0).

Role equivalent to the reference's ``Face6``/``Face7``/``FaceMap`` types
(all-is-cubes-base/src/math/face.rs:76,104,919), re-designed as plain integer
codes + static numpy tables so that per-face data is an ordinary trailing
array axis of length 6 (or 7) on device.

Face order: NX, NY, NZ, PX, PY, PZ  (indices 0..5), WITHIN = 6.
This matches the reference's ``FaceMap { nx, ny, nz, px, py, pz }`` field
order so per-face tables line up with its semantics.
"""

from __future__ import annotations

import numpy as np

NX, NY, NZ, PX, PY, PZ, WITHIN = 0, 1, 2, 3, 4, 5, 6

FACE_NAMES = ("NX", "NY", "NZ", "PX", "PY", "PZ", "WITHIN")

#: Unit normal of each face, pointing in the direction the face name denotes.
#: (A cube's NX face's normal points in -X; entering a cube moving +X means
#: crossing its NX face.)
FACE_NORMALS = np.array(
    [
        [-1, 0, 0],
        [0, -1, 0],
        [0, 0, -1],
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
    ],
    dtype=np.int32,
)

#: FACE_NORMALS extended with a zero row for WITHIN (index 6).
FACE7_NORMALS = np.concatenate([FACE_NORMALS, np.zeros((1, 3), np.int32)])

#: Axis (0=x,1=y,2=z) of each of the 6 faces.
FACE_AXES = np.array([0, 1, 2, 0, 1, 2], dtype=np.int32)

#: True for the positive-direction faces.
FACE_IS_POSITIVE = np.array([False, False, False, True, True, True])


def opposite(face: int) -> int:
    """Opposite face; WITHIN maps to itself (face.rs `Face7::opposite`)."""
    if face == WITHIN:
        return WITHIN
    return (face + 3) % 6


OPPOSITE = np.array([3, 4, 5, 0, 1, 2, 6], dtype=np.int32)


def face_from_step(axis: int, positive_step: bool) -> int:
    """Face of the *entered* cube crossed by a ray stepping along `axis`.

    Stepping in +axis enters through the new cube's negative face and vice
    versa (raycast.rs step semantics: `face` points back toward the ray
    origin).
    """
    return axis if positive_step else axis + 3


#: rotation_from_nz analog: for each face, an orthonormal integer frame
#: (tangent_u, tangent_v, normal) with normal = FACE_NORMALS[face].
#: Used by smooth-light interpolation (sr.rs:263 `face.rotation_from_nz()`
#: transforming the +X/+Y tangent basis).  Any right-handed tangent basis
#: works as long as it is consistent between light store and lookup; we pick
#: cyclic axes: tangents are the other two axes in cyclic order.
def _tangent_frame() -> np.ndarray:
    frames = np.zeros((6, 3, 3), dtype=np.int32)
    for f in range(6):
        n = FACE_NORMALS[f]
        axis = FACE_AXES[f]
        u = np.zeros(3, np.int32)
        v = np.zeros(3, np.int32)
        u[(axis + 1) % 3] = 1
        v[(axis + 2) % 3] = 1
        frames[f, 0] = u
        frames[f, 1] = v
        frames[f, 2] = n
    return frames


FACE_TANGENT_FRAMES = _tangent_frame()
