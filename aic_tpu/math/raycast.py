"""Host-side (numpy) Amanatides–Woo grid raycaster (layer 0).

Semantic re-derivation of the reference's `Raycaster`
(all-is-cubes-base/src/raycast.rs:63): a DDA over the unit cube grid that
yields, per step, the cube entered, the face through which it was entered
(pointing back toward the ray origin), and the t-distance *in units of the
ray's direction vector* at which the boundary was crossed. The first step is
the cube containing the origin with face WITHIN and t = 0.

This host implementation is used by the light-chart generator
(light/chart.py), content generation, and as the semantic oracle the device
DDA kernels (raytrace/tracer.py) are property-tested against. Conventions
matched to the reference:

- next-boundary t uses `scale_to_integer_step` (raycast.rs:797): smallest
  strictly positive t such that s + t·ds is an integer; +inf for ds == 0.
- axis tie-break prefers Z, then Y, then X (raycast.rs:584-596's comparison
  chain).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .faces import WITHIN, face_from_step


def scale_to_integer_step(s: float, ds: float) -> float:
    """Smallest positive t with s + t*ds integral (raycast.rs:797)."""
    if ds == 0.0:
        return np.inf
    if ds < 0.0:
        s, ds = -s, -ds
    s = s % 1.0  # rem_euclid
    return (1.0 - s) / ds


@dataclass
class RaycastStep:
    cube: tuple[int, int, int]
    face: int  # faces.NX..PZ, or WITHIN for the first step
    t_distance: float

    def intersection_point(self, origin, direction):
        """Point where the ray crossed into this cube (raycast.rs:301).

        For the WITHIN step this is the origin itself.
        """
        origin = np.asarray(origin, np.float64)
        direction = np.asarray(direction, np.float64)
        if self.face == WITHIN:
            return origin
        p = origin + direction * self.t_distance
        # Snap the crossing axis to the exact boundary: entering through a
        # negative face (NX/NY/NZ) means crossing the cube's lower boundary;
        # a positive face means its upper boundary.
        axis = self.face % 3
        p[axis] = self.cube[axis] + (0 if self.face < 3 else 1)
        return p


def raycast(origin, direction, bounds=None, max_steps: int = 100000, t_max: float = np.inf):
    """Yield `RaycastStep`s for a ray through the unit grid.

    `bounds` is an optional GridAab; when given, steps outside it are
    suppressed and iteration stops once the ray has exited it after having
    been inside (raycast.rs:223 `within`). No fast-forward optimization is
    done here (host oracle only — device kernels do slab-test entry).
    """
    origin = np.asarray(origin, np.float64)
    direction = np.asarray(direction, np.float64)

    cube = np.floor(origin).astype(np.int64)
    step = np.sign(direction).astype(np.int64)
    with np.errstate(divide="ignore"):
        t_delta = np.where(direction != 0.0, np.abs(1.0 / direction), np.inf)
    tmax = np.array(
        [scale_to_integer_step(origin[i], direction[i]) for i in range(3)], np.float64
    )

    def in_bounds(c):
        return bounds is None or bounds.contains_cube(c)

    was_inside = in_bounds(cube)
    if was_inside:
        yield RaycastStep(tuple(int(c) for c in cube), WITHIN, 0.0)

    if not np.any(step != 0):
        return

    for _ in range(max_steps):
        # Axis choice with Z-then-Y-then-X tie preference (raycast.rs:584).
        if tmax[0] < tmax[1]:
            axis = 0 if tmax[0] < tmax[2] else 2
        else:
            axis = 1 if tmax[1] < tmax[2] else 2
        t = tmax[axis]
        if not np.isfinite(t) or t > t_max:
            return
        cube[axis] += step[axis]
        tmax[axis] += t_delta[axis]
        face = face_from_step(axis, step[axis] > 0)
        inside = in_bounds(cube)
        if inside:
            was_inside = True
            yield RaycastStep(tuple(int(c) for c in cube), face, float(t))
        elif was_inside:
            return


def recursive_raycast_ray(origin, direction, cube, resolution: int):
    """Rescale a ray into a block's voxel grid (raycast.rs:458).

    Returns the sub-ray (origin', direction) such that casting it over the
    [0, R)³ voxel grid visits the block's voxels; sub-t values relate to
    world t by t_world = t_sub / R... — note the reference keeps direction
    unscaled so sub-t is *not* directly comparable to outer t; callers must
    rescale when mixing (we always convert to world t).
    """
    origin = np.asarray(origin, np.float64)
    cube = np.asarray(cube, np.float64)
    return (origin - cube) * resolution, np.asarray(direction, np.float64)
