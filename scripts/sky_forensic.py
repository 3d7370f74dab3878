"""Forensic for the sky-* golden known-deltas (VERDICT r2 item 4).

Renders a sky case, lists differing pixels vs the reference golden, and
for each computes the current-reference-source interpolated light value
(sr.rs:248 get_interpolated_light + sky.rs:113 light_outside, emulated
host-side in f64) to classify the delta: our-bug vs golden version skew.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join("/root/repo", "tests"))

import numpy as np

FACE = sys.argv[1] if len(sys.argv) > 1 else "NY"

import test_reference_goldens as T

FACES = {"NX": 0, "NY": 1, "NZ": 2, "PX": 3, "PY": 4, "PZ": 5}
face_idx = FACES[FACE]

self = T.TestSky()
# Re-derive the scene exactly as the test does.
rc = T.srgb(0x9E, 0x00, 0x00)
g = T.srgb(0x00, 0x59, 0x00)
b = T.srgb(0x00, 0x00, 0xFF)
add = lambda *cs: tuple(float(sum(v)) for v in zip(*cs))
zero = (0.0, 0.0, 0.0)
octants = [zero, b, g, add(g, b), rc, add(rc, b), add(rc, g), add(rc, g, b)]

from aic_tpu.math.grid import GridAab
from aic_tpu.space import Sky, Space, SpacePhysics

sp = Space(
    GridAab.from_lower_size((0, 0, 0), (1, 1, 1)),
    physics=SpacePhysics(sky=Sky.from_octants(np.asarray(octants, np.float32))),
)
sp.set((0, 0, 0), T._sky_test_block())

opp = (face_idx + 3) % 6
m, t = T._face_transform_matrix(opp, 1.0)
eye = m @ np.array([0.5, 0.5, -1.5]) + t
axis = face_idx % 3
if axis == 1:
    eye[2] -= 0.25
else:
    eye[1] += 0.25
look = np.array([0.5, 0.5, 0.5]) - eye

base = T.GraphicsOptions.unaltered_colors()
opts = base.__class__(**{**base.__dict__, "lighting_display": "linear"})
r = T.render_case(sp, eye, look, opts, light=True)
act = np.asarray(r.data)[..., :3].astype(np.int32)
exp = T._expected_image(f"sky-{FACE}")[..., :3].astype(np.int32)
d = np.abs(act - exp).max(axis=-1)
ys, xs = np.nonzero(d > 4)
print(f"sky-{FACE}: {len(ys)} px differ by >4")
for y, x in zip(ys, xs):
    print(f"  px({x:3d},{y:3d}) act={tuple(act[y,x])} exp={tuple(exp[y,x])} d={d[y,x]}")

# ---- current-reference-source emulation (f64) --------------------------------

from aic_tpu.math import faces as F
from aic_tpu.math import lightpack as LP
from aic_tpu.math import raycast as RC

st = sp.snapshot()
from aic_tpu.light import evaluate_light

st, _ = evaluate_light(st)
light_grid = np.asarray(st.light)  # [1,1,1,4] u8
sky_faces = np.asarray(st.sky_faces)  # [6,3] linear rgb (already averaged)

# PackedLight-quantized sky faces (the reference stores them as
# PackedLight::some(rgb), sky.rs:57/64).
sky_q = [LP.np_decode_scalar(LP.np_encode_scalar(sky_faces[f])) for f in range(6)]


def get_packed_light(cube):
    """sr.rs:241 + sky.rs:113 light_outside → ([r,g,b,weight], valid)."""
    cube = np.asarray(cube, np.int64)
    inside = (cube >= 0) & (cube < 1)
    if inside.all():
        texel = light_grid[cube[0], cube[1], cube[2]]
        rgb = LP.np_decode_scalar(texel[:3].astype(np.float64))
        status = int(texel[3])
        w = {LP.STATUS_VISIBLE: 1.0, LP.STATUS_OPAQUE: 0.25}.get(status, 0.0)
        return np.array([*rgb, w]), status == LP.STATUS_VISIBLE
    at_lower = cube == -1
    at_upper = cube == 1
    outside = ~inside
    if outside.sum() == 1 and (at_lower | at_upper).sum() == 1:
        axisf = int(np.argmax(at_lower | at_upper))
        f = axisf if at_lower[axisf] else axisf + 3
        return np.array([*sky_q[f], 1.0]), True
    return np.array([0.0, 0.0, 0.0, 0.0]), False  # NO_RAYS


def mix4(a, b, amt):
    return a + (b - a) * amt


def ref_interpolated_light(cube, point, face):
    """sr.rs:248 get_interpolated_light, f64, Linear modifier."""
    eps = 0.5 / 256.0
    u = np.asarray(F.FACE_TANGENT_FRAMES, np.float64)[face, 0]
    v = np.asarray(F.FACE_TANGENT_FRAMES, np.float64)[face, 1]
    n = np.asarray(F.FACE_NORMALS, np.float64)[face]
    mix1 = np.mod(point @ u - 0.5, 1.0)
    mix2 = np.mod(point @ v - 0.5, 1.0)
    dir1, dir2 = u.copy(), v.copy()
    if mix1 > 0.5:
        mix1, dir1 = 1.0 - mix1, -u
    if mix2 > 0.5:
        mix2, dir2 = 1.0 - mix2, -v
    height = (point - (np.asarray(cube) + 0.5)) @ n + 0.5

    def fetch_2d(origin):
        def get(s1, s2):
            p = origin + dir1 * (0.5 * s1) + dir2 * (0.5 * s2)
            return get_packed_light(np.floor(p))

        near12, _ = get(-1, -1)
        near1far2, v1 = get(-1, 1)
        near2far1, v2 = get(1, -1)
        far12, _ = get(1, 1)
        if (not v1) and (not v2):
            far12 = near12
        lo = mix4(near12, near1far2, mix2)
        hi = mix4(near2far1, far12, mix2)
        return mix4(lo, hi, mix1)

    in_front = fetch_2d(point + n * (1.0 - eps))
    if height > 1.0 - eps:
        final = in_front
    else:
        same = fetch_2d(point + n * eps)
        final = mix4(same, in_front, np.clip(height, 0, 1))
    return final[:3] / max(final[3], 0.1)


# Host trace: single cube at origin holding the R16 voxel block.
blk = T._sky_test_block()
vox_space = blk.primitive.space
vox = np.zeros((16, 16, 16, 4), np.float64)
for xx in range(16):
    for yy in range(16):
        for zz in range(16):
            vox[xx, yy, zz] = vox_space.block_at((xx, yy, zz)).primitive.color


def host_hit(origin, direction):
    """First opaque voxel along the ray → (point_world, face, voxel rgba)."""
    for step in RC.raycast(origin, direction, bounds=sp.bounds):
        if tuple(step.cube) != (0, 0, 0):
            continue
        so, sd = RC.recursive_raycast_ray(origin, direction, step.cube, 16)
        for sub in RC.raycast(so, sd, bounds=GridAab.from_lower_size((0, 0, 0), (16, 16, 16))):
            c = sub.cube
            rgba = vox[c[0], c[1], c[2]]
            if rgba[3] > 0:
                p_sub = so + sd * sub.t_distance
                return np.asarray(step.cube) + p_sub / 16.0, sub.face, rgba
    return None, None, None


from aic_tpu.math.color import np_linear_to_srgb8

cam = T.camera_for(sp, eye, look, opts, T.VIEWPORT)
w, h = T.VIEWPORT.width, T.VIEWPORT.height
for y, x in zip(ys, xs):
    ndc = np.array([(x + 0.5) * 2.0 / w - 1.0, 1.0 - (y + 0.5) * 2.0 / h])
    o, dvec = cam.project_ndc_into_world(ndc)
    point, face, rgba = host_hit(o, dvec)
    if point is None:
        print(f"  px({x},{y}): no host hit")
        continue
    light = ref_interpolated_light((0, 0, 0), point, face)
    out = rgba[:3] * light
    pix = np_linear_to_srgb8(out)
    print(
        f"  px({x},{y}) face={face} hit={np.round(point,4)} voxelrgba={np.round(rgba,3)}\n"
        f"    ref-src light={np.round(light,4)} -> srgb8={tuple(int(v) for v in pix)}"
        f"  (act={tuple(act[y,x])} exp={tuple(exp[y,x])})"
    )
