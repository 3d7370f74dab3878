"""Native (C++) host components, bound via ctypes.

The reference's performance-critical host loops are native Rust; ours are
native C++ where a host hot loop warrants it (device compute stays in
XLA/Pallas). First component: the no-T-junction plane triangulator
(triangulate.cpp), the role of all-is-cubes-mesh's `planar` module.

The shared library builds on first use with the baked-in g++ (cached next
to the source); `triangulate_plane` falls back to a pure-Python
implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "triangulate.cpp")
_SO = os.path.join(_DIR, "_triangulate.so")
_MESH_SRC = os.path.join(_DIR, "space_mesher.cpp")
_MESH_SO = os.path.join(_DIR, "_space_mesher.so")

_lib = None
_build_failed = False
_mesh_lib = None
_mesh_build_failed = False


def _build(src, so):
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
            check=True,
            capture_output=True,
        )


def _load_mesher():
    global _mesh_lib, _mesh_build_failed
    if _mesh_lib is not None or _mesh_build_failed:
        return _mesh_lib
    try:
        _build(_MESH_SRC, _MESH_SO)
        lib = ctypes.CDLL(_MESH_SO)
        lib.mesh_space_greedy.restype = ctypes.c_int
        lib.mesh_space_greedy.argtypes = [
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _mesh_lib = lib
    except Exception:
        _mesh_build_failed = True
    return _mesh_lib


def mesh_space_greedy(contents, visible, opaque_faces):
    """Native whole-space greedy face-rect extraction (space_mesher.cpp).

    contents: u16[X,Y,Z]; visible: bool[P]; opaque_faces: bool[P,6].
    Returns i32[N,7] rows [face, layer, u0, v0, du, dv, block_id], or
    None when the native component is unavailable (callers fall back to
    the Python path).
    """
    lib = _load_mesher()
    if lib is None:
        return None
    contents = np.ascontiguousarray(contents, np.uint16)
    visible = np.ascontiguousarray(visible, np.uint8)
    opaque = np.ascontiguousarray(opaque_faces, np.uint8)
    sx, sy, sz = contents.shape
    cap = max(int(visible[contents].sum()) * 6 + 64, 1024)
    out = np.empty((cap, 7), np.int32)
    n = ctypes.c_int()
    rc = lib.mesh_space_greedy(
        contents.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        sx, sy, sz,
        visible.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        opaque.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
        ctypes.byref(n),
    )
    if rc != 0:
        return None
    return out[: n.value].copy()


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        _build(_SRC, _SO)
        lib = ctypes.CDLL(_SO)
        lib.triangulate_plane.restype = ctypes.c_int
        lib.triangulate_plane.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def triangulate_plane(mask: np.ndarray, ids: np.ndarray):
    """No-T-junction triangulation of a mesh plane.

    mask: bool[H, W]; ids: u16[H, W]. Returns (verts f32[N,2],
    tris i32[M,3], tri_ids u16[M]). See triangulate.cpp for the
    algorithm and the parity contract with the reference's planar
    triangulator.
    """
    mask = np.ascontiguousarray(mask, np.uint8)
    ids = np.ascontiguousarray(ids, np.uint16)
    h, w = mask.shape
    lib = _load()
    if lib is None:
        return _triangulate_py(mask, ids)
    n_cells = int(mask.sum())
    # Capacity: per rect ≤ 1 center + perimeter verts ≤ 1 + 4·cells.
    max_v = 8 * n_cells + 8
    max_t = 8 * n_cells + 8
    verts = np.empty((max_v, 2), np.float32)
    tris = np.empty((max_t, 3), np.int32)
    tri_ids = np.empty(max_t, np.uint16)
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib.triangulate_plane(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h,
        w,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tri_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        max_v,
        max_t,
        ctypes.byref(nv),
        ctypes.byref(nt),
    )
    if rc != 0:
        return _triangulate_py(mask, ids)
    return verts[: nv.value].copy(), tris[: nt.value].copy(), tri_ids[: nt.value].copy()


def _triangulate_py(mask, ids):
    """Pure-Python fallback with identical output contract."""
    h, w = mask.shape
    used = np.zeros_like(mask, bool)
    verts, tris, tri_ids = [], [], []
    for u0 in range(h):
        for v0 in range(w):
            if not mask[u0, v0] or used[u0, v0]:
                continue
            bid = ids[u0, v0]
            dv = 1
            while v0 + dv < w and mask[u0, v0 + dv] and not used[u0, v0 + dv] and ids[u0, v0 + dv] == bid:
                dv += 1
            du = 1
            while u0 + du < h and all(
                mask[u0 + du, v] and not used[u0 + du, v] and ids[u0 + du, v] == bid
                for v in range(v0, v0 + dv)
            ):
                du += 1
            used[u0 : u0 + du, v0 : v0 + dv] = True
            center = len(verts)
            verts.append((u0 + du / 2.0, v0 + dv / 2.0))
            ring = []
            for v in range(v0, v0 + dv):
                ring.append(len(verts)); verts.append((u0, v))
            for u in range(u0, u0 + du):
                ring.append(len(verts)); verts.append((u, v0 + dv))
            for v in range(v0 + dv, v0, -1):
                ring.append(len(verts)); verts.append((u0 + du, v))
            for u in range(u0 + du, u0, -1):
                ring.append(len(verts)); verts.append((u, v0))
            n = len(ring)
            for k in range(n):
                tris.append((center, ring[k], ring[(k + 1) % n]))
                tri_ids.append(bid)
    return (
        np.asarray(verts, np.float32).reshape(-1, 2),
        np.asarray(tris, np.int32).reshape(-1, 3),
        np.asarray(tri_ids, np.uint16),
    )


# ---------------------------------------------------------------------------
# Reference-procedure relight denominator (ref_relight.cpp)
# ---------------------------------------------------------------------------

_REF_RELIGHT_SRC = os.path.join(_DIR, "ref_relight.cpp")
_REF_RELIGHT_SO = os.path.join(_DIR, "_ref_relight.so")
_ref_relight_lib = None
_ref_relight_failed = False


def _load_ref_relight():
    global _ref_relight_lib, _ref_relight_failed
    if _ref_relight_lib is not None or _ref_relight_failed:
        return _ref_relight_lib
    try:
        if not os.path.exists(_REF_RELIGHT_SO) or os.path.getmtime(
            _REF_RELIGHT_SO
        ) < os.path.getmtime(_REF_RELIGHT_SRC):
            subprocess.run(
                ["g++", "-O2", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
                 _REF_RELIGHT_SRC, "-o", _REF_RELIGHT_SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_REF_RELIGHT_SO)
        p8, p8s, pf, p32, p64 = (
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        )
        lib.ref_relight_run.restype = ctypes.c_double
        lib.ref_relight_run.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, p32, ctypes.c_int,
            p8, p8, pf, pf, pf, pf, ctypes.c_int, ctypes.c_int,
            p8s, p8, p8, pf, p64, p8,
        ]
        _ref_relight_lib = lib
    except Exception:
        _ref_relight_failed = True
    return _ref_relight_lib


def ref_relight_state(state, return_light: bool = False):
    """Run the reference evaluate_light procedure (C++, this host's CPU)
    on a SpaceState. Returns (seconds, updates) or with return_light,
    (seconds, updates, light u8[X,Y,Z,4]).

    The denominator for BASELINE's ">=10x faster than reference
    evaluate_light": same scene tables, same chart, same packed-light
    encoding as the device kernel; algorithm per updater.rs (see
    ref_relight.cpp header). Raises RuntimeError when the native
    component cannot build.
    """
    from ..light.update import _chart_host

    lib = _load_ref_relight()
    if lib is None:
        raise RuntimeError("ref_relight native component unavailable")
    t = state.tables
    contents = np.ascontiguousarray(np.asarray(state.contents), np.int32)
    sx, sy, sz = contents.shape
    visible = np.ascontiguousarray(np.asarray(t.visible), np.uint8)
    opaque_all = np.ascontiguousarray(
        np.asarray(t.opaque_faces).all(-1), np.uint8
    )
    face_rows = np.ascontiguousarray(np.asarray(t.light_face_rows), np.float32)
    emission = np.ascontiguousarray(np.asarray(t.light_emission), np.float32)
    mean_alpha = np.ascontiguousarray(
        np.asarray(t.face_colors)[:, 6, 3], np.float32
    )
    sky_faces = np.ascontiguousarray(np.asarray(state.sky_faces), np.float32)
    ch = _chart_host(state.light_max_distance)
    offsets = np.ascontiguousarray(ch["offsets"], np.int8)
    faces_in = np.ascontiguousarray(ch["faces_in"], np.uint8)
    kinds = np.ascontiguousarray(ch["kinds"], np.uint8)
    cosines = np.ascontiguousarray(ch["cosines"], np.float32)
    stats = np.zeros(2, np.int64)
    out_light = (
        np.zeros((sx, sy, sz, 4), np.uint8) if return_light else None
    )
    cp = lambda a, ty: a.ctypes.data_as(ctypes.POINTER(ty))
    secs = lib.ref_relight_run(
        sx, sy, sz, cp(contents, ctypes.c_int32), visible.shape[0],
        cp(visible, ctypes.c_uint8), cp(opaque_all, ctypes.c_uint8),
        cp(face_rows, ctypes.c_float), cp(emission, ctypes.c_float),
        cp(mean_alpha, ctypes.c_float), cp(sky_faces, ctypes.c_float),
        int(ch["n_rays"]), int(ch["max_steps"]),
        cp(offsets, ctypes.c_int8), cp(faces_in, ctypes.c_uint8),
        cp(kinds, ctypes.c_uint8), cp(cosines, ctypes.c_float),
        cp(stats, ctypes.c_int64),
        cp(out_light, ctypes.c_uint8) if return_light else None,
    )
    if return_light:
        return float(secs), int(stats[0]), out_light
    return float(secs), int(stats[0])


def ref_relight_light_bench():
    """Measure the reference procedure on the reference's own benchmark
    scene (content/testing.rs light_bench_space 54x16x54; benches
    light.rs:27-67 "eval/full"). Returns (seconds, n_cubes)."""
    from ..content.testing import light_bench_space

    state = light_bench_space().snapshot()
    secs, _ = ref_relight_state(state)
    return secs, int(np.prod(np.asarray(state.contents).shape))
