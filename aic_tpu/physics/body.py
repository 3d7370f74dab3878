"""Body physics: AABB vs voxel-grid collision, vmapped over bodies.

TPU-native re-design of the reference's body stepping
(all-is-cubes/src/physics/step.rs:314 `step_one_body`, :592
`collide_and_advance`; physics/collision.rs `collide_along_ray`):

- gravity + velocity clamp (step.rs:305 VELOCITY_MAGNITUDE_LIMIT = 1e4)
- swept-AABB collision via the Minkowski trick: a moving box vs a unit
  cube is a point ray vs the cube dilated by the box extents; candidate
  cubes are a static neighborhood window so every body compiles to the
  same gather pattern (vmap-friendly), with the movement subdivided into
  unit-bounded segments by an outer `while_loop`.
- sliding resolution: up to 3 collide-and-advance segments per step, each
  zeroing the velocity along the axis of impact (step.rs:420-440).

Round-1 deviations (documented, planned work): collision is cube-granular
using the palette's uniform-collision class (blocks with mixed voxel
collision are treated as solid); the reference's push_out/crush/uncrush
recovery (step.rs:660,745,804) is approximated by a single-axis push-out.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..space.state import SpaceState

VELOCITY_MAGNITUDE_LIMIT = 1e4  # step.rs:305
VELOCITY_EPSILON_SQUARED = 1e-12  # quiescence threshold (step.rs VELOCITY_EPSILON)
POSITION_EPSILON = 1e-4  # nudge back from contact (collision.rs nudge semantics)

#: Static candidate window half-size (cubes) per collision segment.
_WINDOW = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Body:
    """physics/body.rs:38 `Body` as a batched pytree: every field has a
    leading batch axis when used with the vmapped step."""

    position: jax.Array  # f32[...,3] world coords
    velocity: jax.Array  # f32[...,3] cubes/sec
    box_lo: jax.Array  # f32[...,3] collision box, relative to position
    box_hi: jax.Array  # f32[...,3]
    flying: jax.Array  # bool[...]
    noclip: jax.Array  # bool[...]
    yaw: jax.Array  # f32[...] look direction (degrees), for Characters
    pitch: jax.Array  # f32[...]

    @staticmethod
    def make(position, box_lo=(-0.3, 0.0, -0.3), box_hi=(0.3, 1.75, 0.3),
             velocity=(0.0, 0.0, 0.0), flying=False, noclip=False,
             yaw=0.0, pitch=0.0) -> "Body":
        """Single body; character-sized box by default (body.rs default)."""
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Body(
            position=f(position), velocity=f(velocity),
            box_lo=f(box_lo), box_hi=f(box_hi),
            flying=jnp.asarray(flying), noclip=jnp.asarray(noclip),
            yaw=jnp.asarray(yaw, jnp.float32), pitch=jnp.asarray(pitch, jnp.float32),
        )

    @staticmethod
    def stack(bodies: list) -> "Body":
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bodies)


def _solid_lookup(state: SpaceState, cubes):
    """bool[...]: cube contains colliding material (cube-granular)."""
    size = jnp.asarray(state.contents.shape, jnp.int32)
    idxs = cubes - jnp.asarray(state.lower, jnp.int32)
    inside = ((idxs >= 0) & (idxs < size)).all(-1)
    ic = jnp.clip(idxs, 0, size - 1)
    flat = (ic[..., 0] * size[1] + ic[..., 1]) * size[2] + ic[..., 2]
    pal = jnp.take(state.contents.reshape(-1), flat, axis=0).astype(jnp.int32)
    cu = jnp.take(state.tables.collision_uniform, pal, axis=0)
    # Solid if uniformly HARD (1) or non-uniform (-1, conservative round 1).
    solid = (cu == 1) | (cu == -1)
    return solid & inside  # outside bounds is empty space (reference: bodies
    # can leave the space; no world border collision)


# Precomputed candidate offsets [-W..W]^3.
_OFFSETS = np.stack(
    np.meshgrid(*([np.arange(-_WINDOW, _WINDOW + 1)] * 3), indexing="ij"), axis=-1
).reshape(-1, 3).astype(np.int32)


def _collide_segment(state: SpaceState, pos, delta, box_lo, box_hi):
    """One collide_and_advance (step.rs:592) for |delta| <= 1 cube.

    Returns (new_pos, new_delta, hit_axis i32 or -1, hit_any bool).
    """
    offsets = jnp.asarray(_OFFSETS)
    center_cube = jnp.floor(pos + (box_lo + box_hi) * 0.5).astype(jnp.int32)
    cand = center_cube[None, :] + offsets  # [C,3]
    solid = _solid_lookup(state, cand)  # [C]

    # Minkowski-dilated boxes: [c - box_hi, c + 1 - box_lo].
    cand_f = jnp.asarray(cand, jnp.float32)
    lo = cand_f - box_hi[None, :]
    hi = cand_f + 1.0 - box_lo[None, :]

    # Already overlapping at t=0 → not a movement blocker
    # (collision.rs StopAt::NotAlreadyColliding).
    eps = 1e-6
    overlap0 = ((pos[None, :] > lo + eps) & (pos[None, :] < hi - eps)).all(-1)

    safe_d = jnp.where(delta == 0.0, 1e-30, delta)
    t0 = (lo - pos[None, :]) / safe_d[None, :]
    t1 = (hi - pos[None, :]) / safe_d[None, :]
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    # Degenerate axes: strictly inside the slab → always intersecting;
    # touching the boundary does NOT count (a body resting exactly on a
    # surface must not catch on the seams between its cubes — the
    # reference keeps an epsilon gap via nudge_on_ray, step.rs:620).
    in_slab = (pos[None, :] > lo + eps) & (pos[None, :] < hi - eps)
    t_lo = jnp.where(delta[None, :] == 0.0, jnp.where(in_slab, -jnp.inf, jnp.inf), t_lo)
    t_hi = jnp.where(delta[None, :] == 0.0, jnp.where(in_slab, jnp.inf, -jnp.inf), t_hi)
    t_enter = t_lo.max(-1)
    t_exit = t_hi.min(-1)
    entry_axis = jnp.argmax(t_lo, axis=-1)

    hits = solid & ~overlap0 & (t_enter <= t_exit) & (t_enter >= 0.0) & (t_enter < 1.0)
    t_hit = jnp.where(hits, t_enter, jnp.inf).min()
    hit_any = jnp.isfinite(t_hit)
    first = jnp.argmin(jnp.where(hits, t_enter, jnp.inf))
    axis = entry_axis[first]
    axis_onehot = jax.nn.one_hot(axis, 3, dtype=jnp.float32)

    # Advance to the contact, then snap the hit axis to the contact plane
    # minus an epsilon gap (nudge_on_ray, step.rs:620: "a little bit back
    # ... to avoid floating point error pushing us into being already
    # colliding next frame").
    t_adv = jnp.clip(t_hit, 0.0, 1.0)
    advanced = pos + delta * t_adv
    plane = jnp.where(
        delta[axis] > 0, lo[first, axis] - POSITION_EPSILON, hi[first, axis] + POSITION_EPSILON
    )
    snapped = advanced * (1.0 - axis_onehot) + plane * axis_onehot
    new_pos = jnp.where(hit_any, snapped, pos + delta)
    # Remaining motion slides: zero the hit axis.
    remaining = jnp.where(hit_any, delta * (1.0 - t_adv), jnp.zeros(3))
    remaining = jnp.where(hit_any, remaining * (1.0 - axis_onehot), remaining)
    return new_pos, remaining, jnp.where(hit_any, axis, -1), hit_any


def _step_single(state: SpaceState, body: Body, dt, gravity):
    """step_one_body (step.rs:314) for one (unbatched) body."""
    velocity = body.velocity
    velocity = jnp.where(
        body.flying | body.noclip, velocity, velocity + gravity * dt
    )
    # Clamp (step.rs:404).
    vmag2 = (velocity**2).sum()
    velocity = jnp.where(
        vmag2 > VELOCITY_MAGNITUDE_LIMIT**2,
        velocity * (VELOCITY_MAGNITUDE_LIMIT / jnp.sqrt(jnp.maximum(vmag2, 1e-30))),
        velocity,
    )
    velocity = jnp.where(jnp.isfinite(velocity), velocity, 0.0)
    quiescent = vmag2 <= VELOCITY_EPSILON_SQUARED

    delta = velocity * dt

    def no_collide():
        return body.position + delta, velocity, jnp.zeros(6, bool)

    def collide():
        # Outer loop: subdivide movement into <=1-cube segments so the
        # static candidate window always covers the sweep; inner: up to 3
        # sliding segments (step.rs:417 "sliding collision loop").
        def cond(carry):
            pos, d, vel, contacts, fuel = carry
            return (fuel > 0) & (jnp.abs(d).max() > 1e-9)

        def step(carry):
            pos, d, vel, contacts, fuel = carry
            # Clamp this segment to at most 1 cube of motion per axis.
            seg_scale = jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.abs(d).max(), 1e-9))
            seg = d * seg_scale
            new_pos, rem_seg, axis, hit = _collide_segment(
                state, pos, seg, body.box_lo, body.box_hi
            )
            # Remaining motion = what this segment didn't cover + the rest,
            # with the hit axis zeroed everywhere (velocity response).
            rest = d * (1.0 - seg_scale)
            axis_onehot = jnp.where(
                axis >= 0, jax.nn.one_hot(jnp.maximum(axis, 0), 3, dtype=jnp.float32), 0.0
            )
            d_new = (rem_seg + rest) * (1.0 - axis_onehot)
            vel_new = vel * (1.0 - axis_onehot)
            # Contact faces: axis & direction of motion.
            face = jnp.where(seg[jnp.maximum(axis, 0)] > 0, jnp.maximum(axis, 0) + 3, jnp.maximum(axis, 0))
            contacts = jnp.where(
                hit, contacts.at[face].set(True), contacts
            )
            return (new_pos, d_new, vel_new, contacts, fuel - 1)

        init = (body.position, delta, velocity, jnp.zeros(6, bool), jnp.int32(64))
        pos, _, vel, contacts, _ = jax.lax.while_loop(cond, step, init)
        return pos, vel, contacts

    new_pos, new_vel, contacts = collide()
    # noclip bodies move unobstructed (step.rs:335); quiescent bodies rest.
    new_pos = jnp.where(body.noclip, body.position + delta, new_pos)
    new_vel = jnp.where(body.noclip, velocity, new_vel)
    new_pos = jnp.where(quiescent, body.position, new_pos)

    on_ground = contacts[1]  # NY contact face below us → standing
    return dataclasses.replace(
        body, position=new_pos, velocity=new_vel
    ), dict(on_ground=on_ground, contacts=contacts, quiescent=quiescent)


@functools.partial(jax.jit, static_argnames=())
def step_bodies(state: SpaceState, bodies: Body, dt, gravity):
    """Vmapped body step: the device replacement for
    body_physics_step_system (space/step.rs:68). bodies: batched Body."""
    f = lambda b: _step_single(state, b, jnp.float32(dt), jnp.asarray(gravity, jnp.float32))
    return jax.vmap(f)(bodies)
