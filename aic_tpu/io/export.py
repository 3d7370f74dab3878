"""Mesh export: glTF 2.0 and binary STL.

Equivalent of all-is-cubes-port's exporters (port/src/gltf/ 2,500 LoC;
port/src/stl.rs): meshes come from aic_tpu.mesh; glTF uses one embedded
buffer with vertex colors (COLOR_0), STL is the standard 50-byte-triangle
binary layout.
"""

from __future__ import annotations

import base64
import json
import struct

import numpy as np

from ..mesh.mesher import SpaceMesh


def export_gltf(mesh: SpaceMesh, path: str, name: str = "space"):
    positions = mesh.positions.astype("<f4")
    colors = mesh.colors.astype("<f4")
    indices = mesh.indices.astype("<u4")

    pos_bytes = positions.tobytes()
    col_bytes = colors.tobytes()
    idx_bytes = indices.tobytes()
    buffer = pos_bytes + col_bytes + idx_bytes

    gltf = {
        "asset": {"version": "2.0", "generator": "aic_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "name": name}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "COLOR_0": 1},
                        "indices": 2,
                        "mode": 4,
                    }
                ]
            }
        ],
        "buffers": [
            {
                "byteLength": len(buffer),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(buffer).decode(),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes), "target": 34962},
            {
                "buffer": 0,
                "byteOffset": len(pos_bytes),
                "byteLength": len(col_bytes),
                "target": 34962,
            },
            {
                "buffer": 0,
                "byteOffset": len(pos_bytes) + len(col_bytes),
                "byteLength": len(idx_bytes),
                "target": 34963,
            },
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": len(positions),
                "type": "VEC3",
                "min": positions.min(axis=0).tolist() if len(positions) else [0, 0, 0],
                "max": positions.max(axis=0).tolist() if len(positions) else [0, 0, 0],
            },
            {
                "bufferView": 1,
                "componentType": 5126,
                "count": len(colors),
                "type": "VEC4",
            },
            {
                "bufferView": 2,
                "componentType": 5125,
                "count": len(indices),
                "type": "SCALAR",
            },
        ],
    }
    with open(path, "w") as f:
        json.dump(gltf, f)


def export_stl(mesh: SpaceMesh, path: str):
    tri = mesh.indices.reshape(-1, 3)
    v = mesh.positions[tri]  # [T,3,3]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    lens = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(lens > 0, n / np.maximum(lens, 1e-12), 0.0)
    with open(path, "wb") as f:
        f.write(b"aic_tpu binary STL".ljust(80, b"\0"))
        f.write(struct.pack("<I", len(tri)))
        for i in range(len(tri)):
            f.write(struct.pack("<3f", *n[i]))
            for j in range(3):
                f.write(struct.pack("<3f", *v[i, j]))
            f.write(struct.pack("<H", 0))
