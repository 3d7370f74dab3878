"""Body physics: AABB vs voxel world, vmapped over bodies.

TPU-native re-design of the reference's body stepping
(all-is-cubes/src/physics/step.rs:314 `step_one_body`, :592
`collide_and_advance`, :660 `push_out`, :745 `crush_if_colliding`, :804
`uncrush`; physics/collision.rs `collide_along_ray`):

- gravity + velocity clamp (step.rs:305 VELOCITY_MAGNITUDE_LIMIT = 1e4)
- swept-AABB collision at **voxel resolution**: every candidate cube
  contributes its solid boxes (unit box for uniform-Hard blocks, one box
  per solid voxel for `Recur` blocks — the flattened equivalent of
  collision.rs's per-block recursion; see collision.py), slab-tested in
  one vectorized pass. Movement is subdivided into unit-bounded segments
  by an outer `while_loop` so the static candidate window always covers
  the sweep.
- sliding resolution: collide-and-advance segments, each zeroing the
  velocity along the axis of impact (step.rs:420-440).
- recovery from bad states, in the reference's order (step.rs:370-386):
  `uncrush` (regrow the crushed occupying box), `push_out` (move the
  position out of solid matter along the best of 27 directions,
  step.rs:660-737), `crush_if_colliding` (shrink the occupying box until
  it is collision-free, step.rs:745-800). The whole recovery pass is
  gated behind one `lax.cond` over the batch, so ordinary steps pay only
  the cheap needs-recovery test.

Deviations (documented):
- push_out locates the exit surface by sampled bisection (8 samples to a
  reach of 2 cubes + 10 bisection rounds) instead of exact aab_raycast
  boundary enumeration; the result differs from the reference by < 1e-3.
- crush picks the overlapping box with the *smallest* least-penetration
  depth (deterministic, gentlest crush) where the reference picks
  whichever contact its cube iteration happened to report last.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..space.state import SpaceState
from .collision import (
    POSITION_EPSILON,
    boxes_overlap,
    colliding_at,
    sweep_boxes,
    window_solid_boxes,
)

VELOCITY_MAGNITUDE_LIMIT = 1e4  # step.rs:305
VELOCITY_EPSILON_SQUARED = 1e-12  # quiescence threshold (step.rs VELOCITY_EPSILON)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Body:
    """physics/body.rs:38 `Body` as a batched pytree: every field has a
    leading batch axis when used with the vmapped step.

    `occ_lo/occ_hi` is the `occupying` box (body.rs), relative to
    position: normally equal to the collision box, shrunk by crush when
    the body is squeezed into a space smaller than itself."""

    position: jax.Array  # f32[...,3] world coords
    velocity: jax.Array  # f32[...,3] cubes/sec
    box_lo: jax.Array  # f32[...,3] collision box, relative to position
    box_hi: jax.Array  # f32[...,3]
    occ_lo: jax.Array  # f32[...,3] occupying box (crushable), rel. position
    occ_hi: jax.Array  # f32[...,3]
    flying: jax.Array  # bool[...]
    noclip: jax.Array  # bool[...]
    yaw: jax.Array  # f32[...] look direction (degrees), for Characters
    pitch: jax.Array  # f32[...]

    @staticmethod
    def make(position, box_lo=(-0.3, 0.0, -0.3), box_hi=(0.3, 1.75, 0.3),
             velocity=(0.0, 0.0, 0.0), flying=False, noclip=False,
             yaw=0.0, pitch=0.0, occ_lo=None, occ_hi=None) -> "Body":
        """Single body; character-sized box by default (body.rs default)."""
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Body(
            position=f(position), velocity=f(velocity),
            box_lo=f(box_lo), box_hi=f(box_hi),
            occ_lo=f(box_lo if occ_lo is None else occ_lo),
            occ_hi=f(box_hi if occ_hi is None else occ_hi),
            flying=jnp.asarray(flying), noclip=jnp.asarray(noclip),
            yaw=jnp.asarray(yaw, jnp.float32), pitch=jnp.asarray(pitch, jnp.float32),
        )

    @staticmethod
    def stack(bodies: list) -> "Body":
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bodies)

    def set_position(self, position) -> "Body":
        """Functional setter; a non-finite input is ignored wholesale
        (body.rs set_position / tests.rs position_nan_ignored)."""
        p = jnp.asarray(position, jnp.float32)
        ok = jnp.isfinite(p).all()
        return dataclasses.replace(
            self, position=jnp.where(ok, p, self.position)
        )

    def set_velocity(self, velocity) -> "Body":
        """Functional setter; a non-finite input is ignored wholesale
        (body.rs set_velocity / tests.rs velocity_nan_ignored)."""
        v = jnp.asarray(velocity, jnp.float32)
        ok = jnp.isfinite(v).all()
        return dataclasses.replace(
            self, velocity=jnp.where(ok, v, self.velocity)
        )


def _collide_segment(state: SpaceState, pos, delta, box_lo, box_hi):
    """One collide_and_advance (step.rs:592) for |delta| <= 1 cube.

    Returns (new_pos, new_delta, hit_axis i32 or -1, hit_any bool).
    """
    center_cube = jnp.floor(pos + (box_lo + box_hi) * 0.5).astype(jnp.int32)
    lo, hi, valid = window_solid_boxes(state, center_cube)
    sw = sweep_boxes(lo, hi, valid, pos, delta, box_lo, box_hi)
    hit_any, axis, first = sw["hit_any"], sw["axis"], sw["first"]
    axis_onehot = jax.nn.one_hot(axis, 3, dtype=jnp.float32)

    # Advance to the contact, then snap the hit axis to the contact plane
    # minus an epsilon gap (nudge_on_ray, step.rs:620: "a little bit back
    # ... to avoid floating point error pushing us into being already
    # colliding next frame").
    t_adv = jnp.clip(sw["t_hit"], 0.0, 1.0)
    advanced = pos + delta * t_adv
    plane = jnp.where(
        delta[axis] > 0,
        sw["dlo"][first, axis] - POSITION_EPSILON,
        sw["dhi"][first, axis] + POSITION_EPSILON,
    )
    snapped = advanced * (1.0 - axis_onehot) + plane * axis_onehot
    new_pos = jnp.where(hit_any, snapped, pos + delta)
    # Remaining motion slides: zero the hit axis.
    remaining = jnp.where(hit_any, delta * (1.0 - t_adv), jnp.zeros(3))
    remaining = jnp.where(hit_any, remaining * (1.0 - axis_onehot), remaining)
    return new_pos, remaining, jnp.where(hit_any, axis, -1), hit_any


# --- recovery: push_out / crush / uncrush -----------------------------------

# 27 push-out directions (step.rs:666-684); the zero entry is replaced by
# -velocity at runtime.
_DIRS = np.stack(
    np.meshgrid(*([np.array([-1.0, 0.0, 1.0])] * 3), indexing="ij"), axis=-1
).reshape(-1, 3).astype(np.float32)

_PUSH_SAMPLES = 8
_PUSH_STEP = 0.25  # reach = 2.0 cubes
_PUSH_BISECT = 10


def _push_out(state: SpaceState, body: Body) -> Body:
    """push_out (step.rs:660): move position out of solid matter along the
    direction with the shortest clear distance (27 candidates, the zero
    one standing in for 'backwards out of our velocity')."""
    pos, box_lo, box_hi = body.position, body.box_lo, body.box_hi
    colliding = colliding_at(state, pos, box_lo, box_hi)

    dirs = jnp.asarray(_DIRS)
    vel_dir = -body.velocity
    is_zero = (dirs == 0.0).all(-1)
    dirs = jnp.where(is_zero[:, None], vel_dir[None, :], dirs)
    norms = jnp.linalg.norm(dirs, axis=-1)
    unit = dirs / jnp.maximum(norms, 1e-30)[:, None]
    usable = norms > 1e-30

    ts = (jnp.arange(_PUSH_SAMPLES, dtype=jnp.float32) + 1.0) * _PUSH_STEP

    def clear_at(d, t):
        return ~colliding_at(state, pos + d * t, box_lo, box_hi)

    def per_dir(d_ok):
        d, ok = d_ok
        # Samples march sequentially: each colliding_at materializes the
        # full 125·R³ voxel-box window, so vmapping positions multiplies
        # that window by S (and by 27 under the direction map) — the
        # [27,S,125,R³,3] temp OOMed a 16G chip on demo-city (R=32).
        def scan_clear(k, acc):
            first_clear, found = acc
            c = clear_at(d, ts[k])
            first_clear = jnp.where(c & ~found, ts[k], first_clear)
            return first_clear, found | c

        t_hi0, any_clear = jax.lax.fori_loop(
            0, _PUSH_SAMPLES, scan_clear, (ts[-1], jnp.asarray(False))
        )
        any_clear = any_clear & ok
        t_lo0 = t_hi0 - _PUSH_STEP

        def bisect(_, lohi):
            t_lo, t_hi = lohi
            mid = 0.5 * (t_lo + t_hi)
            c = clear_at(d, mid)
            return jnp.where(c, t_lo, mid), jnp.where(c, mid, t_hi)

        t_lo1, t_hi1 = jax.lax.fori_loop(0, _PUSH_BISECT, bisect, (t_lo0, t_hi0))
        t_final = t_hi1 + POSITION_EPSILON
        return jnp.where(any_clear, t_final, jnp.inf)

    # Directions run SEQUENTIALLY (lax.map, one window live at a time) for
    # the same memory reason; push_out is the rare recovery path, so the
    # latency is paid only when a body is stuck inside matter.
    dists = jax.lax.map(per_dir, (unit, usable))  # [27]
    best = jnp.argmin(dists)
    found = jnp.isfinite(dists[best])
    new_pos = jnp.where(
        colliding & found, pos + unit[best] * dists[best], pos
    )
    return dataclasses.replace(body, position=new_pos)


def _face_outward(abs_lo, abs_hi):
    """Aab::face_coordinate_outward as a 6-vector [NX,NY,NZ,PX,PY,PZ]."""
    return jnp.concatenate([-abs_lo, abs_hi])


_CRUSH_ITERS = 6


def _crush(state: SpaceState, body: Body) -> Body:
    """crush_if_colliding (step.rs:745): shrink `occupying` one face at a
    time (the face with least penetration) until collision-free."""
    center = jnp.floor(
        body.position + (body.box_lo + body.box_hi) * 0.5
    ).astype(jnp.int32)
    lo, hi, valid = window_solid_boxes(state, center)

    def step(_, occ):
        occ_lo, occ_hi = occ
        abs_lo = body.position + occ_lo
        abs_hi = body.position + occ_hi
        contacts = valid & boxes_overlap(lo, hi, abs_lo, abs_hi)

        occ_out = _face_outward(abs_lo, abs_hi)  # [6]
        box_out = jnp.concatenate([-lo, hi], axis=-1)  # [N,6] outward coords
        # depth[n, f] = occ_out[f] + box_out[n, opposite(f)]
        opp = jnp.asarray([3, 4, 5, 0, 1, 2])
        depth = occ_out[None, :] + box_out[:, opp]
        depth = jnp.where(depth >= 0.0, depth, jnp.inf)
        least = depth.min(-1)  # per-contact least penetration
        least = jnp.where(contacts, least, jnp.inf)
        n_best = jnp.argmin(least)  # gentlest crush (deviation: see module doc)
        f_best = jnp.argmin(depth[n_best])
        d_best = depth[n_best, f_best]
        any_contact = jnp.isfinite(least[n_best]) & contacts.any()

        # Shrink face f_best inward by d_best (expand_or_shrink with(-d)).
        is_pos = f_best >= 3
        axis = f_best % 3
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.float32)
        new_lo = jnp.where(is_pos, occ_lo, occ_lo + onehot * d_best)
        new_hi = jnp.where(is_pos, occ_hi - onehot * d_best, occ_hi)
        shrink_valid = (new_lo <= new_hi).all()
        apply = any_contact & shrink_valid
        return (
            jnp.where(apply, new_lo, occ_lo),
            jnp.where(apply, new_hi, occ_hi),
        )

    occ_lo, occ_hi = jax.lax.fori_loop(
        0, _CRUSH_ITERS, step, (body.occ_lo, body.occ_hi)
    )
    return dataclasses.replace(body, occ_lo=occ_lo, occ_hi=occ_hi)


_UNCRUSH_ITERS = 3


def _uncrush(state: SpaceState, body: Body) -> Body:
    """uncrush (step.rs:804): regrow `occupying` toward the collision box,
    one axis at a time, choosing the axis with the largest volume gain
    (ties: last of X,Y,Z, matching Rust max_by_key)."""
    center = jnp.floor(
        body.position + (body.box_lo + body.box_hi) * 0.5
    ).astype(jnp.int32)
    lo, hi, valid = window_solid_boxes(state, center)
    unc_lo = body.position + body.box_lo  # uncrushed box, absolute
    unc_hi = body.position + body.box_hi
    contacts_unc = valid & boxes_overlap(lo, hi, unc_lo, unc_hi)
    any_contact = contacts_unc.any()
    unc_out = _face_outward(unc_lo, unc_hi)
    box_out = jnp.concatenate([-lo, hi], axis=-1)  # [N,6]
    opp = jnp.asarray([3, 4, 5, 0, 1, 2])
    pos = body.position
    eps = 1e-6

    def step(_, occ):
        occ_lo, occ_hi = occ
        abs_lo = pos + occ_lo
        abs_hi = pos + occ_hi
        # Single-axis expansions: occupying with one axis widened to the
        # uncrushed range.
        exp_lo = jnp.stack(
            [abs_lo.at[a].set(unc_lo[a]) for a in range(3)]
        )  # [3,3]
        exp_hi = jnp.stack([abs_hi.at[a].set(unc_hi[a]) for a in range(3)])

        # Which contacts intersect each single-axis expansion (strict).
        inter = (
            (exp_hi[:, None, :] > lo[None, :, :] + eps)
            & (exp_lo[:, None, :] < hi[None, :, :] - eps)
        ).all(-1)  # [3,N]
        relevant = contacts_unc[None, :] & inter

        # Side classification per axis per contact.
        c_lb = lo.T  # [3,N]
        c_ub = hi.T
        neg_side = c_ub <= pos[:, None]
        pos_side = c_lb >= pos[:, None]
        middle = relevant & ~neg_side & ~pos_side

        occ_out = _face_outward(abs_lo, abs_hi)
        limit = -box_out[:, opp].T.reshape(6, -1)  # [6,N]: -out(opp f) per box
        neg_rel = relevant & neg_side  # contacts limiting the negative face
        pos_rel = relevant & pos_side
        rel6 = jnp.concatenate([neg_rel, pos_rel], axis=0)  # [6,N]
        side_min = jnp.where(rel6, limit, jnp.inf).min(-1)  # [6]
        mid6 = jnp.concatenate([middle.any(-1)] * 2)  # [6] per-axis blocked
        clear = jnp.minimum(
            unc_out,
            jnp.minimum(
                jnp.where(mid6, occ_out, jnp.inf),
                side_min,
            ),
        )

        # Candidate expansions per axis: axis range [-clear[neg], clear[pos]].
        new_lo_ax = -clear[:3]  # [3]
        new_hi_ax = clear[3:]
        cand_lo = jnp.stack([abs_lo.at[a].set(new_lo_ax[a]) for a in range(3)])
        cand_hi = jnp.stack([abs_hi.at[a].set(new_hi_ax[a]) for a in range(3)])
        valid_box = (
            (cand_lo <= cand_hi).all(-1)
            & (cand_lo <= pos[None, :]).all(-1)
            & (cand_hi >= pos[None, :]).all(-1)
        )
        vol0 = jnp.prod(abs_hi - abs_lo)
        vols = jnp.prod(cand_hi - cand_lo, axis=-1)
        gains = jnp.where(valid_box, vols - vol0, -jnp.inf)
        # Rust max_by_key keeps the LAST max on ties → argmax on reversed.
        best_rev = jnp.argmax(gains[::-1])
        best = 2 - best_rev
        improve = gains[best] > 0.0
        new_abs_lo = jnp.where(improve, cand_lo[best], abs_lo)
        new_abs_hi = jnp.where(improve, cand_hi[best], abs_hi)
        return new_abs_lo - pos, new_abs_hi - pos

    def do_uncrush(occ):
        return jax.lax.cond(
            any_contact,
            lambda o: jax.lax.fori_loop(0, _UNCRUSH_ITERS, step, o),
            # No collisions at all → full uncrush immediately.
            lambda o: (body.box_lo, body.box_hi),
            occ,
        )

    needed = ((body.occ_lo != body.box_lo) | (body.occ_hi != body.box_hi)).any()
    occ_lo, occ_hi = jax.lax.cond(
        needed, do_uncrush, lambda o: o, (body.occ_lo, body.occ_hi)
    )
    return dataclasses.replace(body, occ_lo=occ_lo, occ_hi=occ_hi)


def _recover(state: SpaceState, body: Body) -> Body:
    """Recovery pass in reference order (step.rs:370-386)."""
    body = _uncrush(state, body)
    body = _push_out(state, body)
    body = _crush(state, body)
    return body


def _needs_recovery(state: SpaceState, body: Body):
    crushed = ((body.occ_lo != body.box_lo) | (body.occ_hi != body.box_hi)).any()
    stuck = colliding_at(state, body.position, body.box_lo, body.box_hi)
    return (crushed | stuck) & ~body.noclip


# --- stepping ----------------------------------------------------------------


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

        # Fuel covers the whole sweep (the reference's collide_along_ray
        # also walks every cube): one segment per cube of motion, plus
        # slack for sliding re-segments.
        fuel0 = jnp.ceil(jnp.abs(delta).max()).astype(jnp.int32) + 8
        init = (body.position, delta, velocity, jnp.zeros(6, bool), fuel0)
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
    body_physics_step_system (space/step.rs:68). bodies: batched Body.

    Recovery (uncrush → push_out → crush) runs first, in reference order,
    behind a batch-level cond so ordinary steps only pay the cheap
    needs-recovery test."""
    dt = jnp.float32(dt)
    gravity = jnp.asarray(gravity, jnp.float32)
    needs = jax.vmap(lambda b: _needs_recovery(state, b))(bodies)
    bodies = jax.lax.cond(
        needs.any(),
        lambda bs: jax.vmap(
            lambda b, n: jax.tree.map(
                lambda new, old: jnp.where(n, new, old), _recover(state, b), b
            )
        )(bs, needs),
        lambda bs: bs,
        bodies,
    )
    f = lambda b: _step_single(state, b, dt, gravity)
    return jax.vmap(f)(bodies)


# Host-facing recovery entry points (used by tests and the universe step);
# these take *batched* bodies like step_bodies.
@jax.jit
def push_out(state: SpaceState, bodies: Body) -> Body:
    return jax.vmap(lambda b: _push_out(state, b))(bodies)


@jax.jit
def crush_if_colliding(state: SpaceState, bodies: Body) -> Body:
    return jax.vmap(lambda b: _crush(state, b))(bodies)


@jax.jit
def uncrush(state: SpaceState, bodies: Body) -> Body:
    return jax.vmap(lambda b: _uncrush(state, b))(bodies)
