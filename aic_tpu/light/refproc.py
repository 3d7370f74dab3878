"""Reference-procedure light evaluation (golden-image conformance).

The reference's golden images are rendered from light fields produced by
``fast_evaluate_light()`` followed by ``evaluate_light(1, ..)``
(test-renderers/cases/src/lib.rs:1396-1397 and siblings) — NOT from the
true fixed point of the light equation. Its queue updater deliberately
refuses to re-enqueue 1-unit differences (updater.rs:343-354, "don't
bother queueing them at all"), so propagation chains stall, and the
bright ``fast_evaluate_light`` seed (sky-from-above per column,
updater.rs:531-576) leaves a bias the stall never corrects. Our dense
Jacobi solver (light/dense.py) converges to the actual fixed point,
which differs from the goldens by several packed-light steps in
multi-bounce regions.

This module emulates the reference procedure so renders can be compared
against its goldens:

- :func:`fast_evaluate_seed` — the column-scan seed + initial queue
  (updater.rs:531): opaque cubes → OPAQUE, visible-or-adjacent cubes →
  queued at ESTIMATED with sky-from-+Y (or uninitialized black when
  covered from above), the rest → NO_RAYS.
- :func:`evaluate_light_reference` — priority-bucket queue processing:
  each round pops every cube at the current max priority as one batch
  (the reference pops serially in *arbitrary hash order* within a
  priority, queue.rs:224-230, so batch-Jacobi within a bucket is as
  valid an order as any), computes new values with the bit-exact
  :func:`~aic_tpu.light.update.relight_batch` kernel, applies any
  nonzero difference, guess-fills uninitialized neighbors
  (updater.rs:307-335), and re-enqueues each changed cube's ray-walk
  *dependencies* at ``Priority::from_difference`` — only when the
  difference exceeds 1 (updater.rs:343-354).

Queue/priority bookkeeping is host numpy: golden-conformance scenes are
small (≤ ~40k cubes); the 602-ray chart walks run on device.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..math import faces, lightpack
from ..space.state import SpaceState
from .chart import STEP_END, STEP_PAD
from .update import _chart_device, _gather_contents, relight_batch

#: Queue priorities (queue.rs:25-45).
PRIORITY_ESTIMATED = 200

#: Pops applied per micro-batch. The reference's threaded updater pops 32
#: requests, computes them in parallel FROM THE SAME FIELD, then applies
#: all 32 (updater.rs:205-246, `data: [Calc; 32]`) — so 32-wide
#: batch-Jacobi over a serially-draining queue is the reference's own
#: update granularity, and the stall pattern (how far from the fixed
#: point the ≤1-difference cutoff freezes each cube) tracks it.
_CHUNK = 32


def _tables_np(state: SpaceState):
    t = state.tables
    return (
        np.asarray(t.visible),
        np.asarray(t.opaque_faces),
        np.asarray(t.light_emission),
    )


def fast_evaluate_seed(state: SpaceState):
    """``fast_evaluate_light`` (updater.rs:531-576): returns
    ``(seeded_state, priority u8[X,Y,Z])``.

    Per (x, z) column scanned from +Y down: opaque-for-light cubes set
    OPAQUE (and cover everything below), visible cubes and cubes adjacent
    to visible ones are queued at ESTIMATED with light = sky's +Y face
    (uninitialized black when covered), all others NO_RAYS.
    """
    contents = np.asarray(state.contents)
    visible_t, opaque_t, emission_t = _tables_np(state)
    vis = visible_t[contents]  # bool[X,Y,Z]
    opaque_flc = opaque_t[contents].all(-1) & ~(emission_t[contents] != 0).any(-1)

    # covered[x,y,z]: any opaque-for-light cube strictly above (higher y).
    above = np.flip(np.cumsum(np.flip(opaque_flc, 1), axis=1), 1)
    covered = (above - opaque_flc) > 0

    # adjacent-visible in 6 directions (OOB neighbors are not visible).
    adj = np.zeros_like(vis)
    for a in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[a] = slice(None, -1)
        hi[a] = slice(1, None)
        adj[tuple(lo)] |= vis[tuple(hi)]
        adj[tuple(hi)] |= vis[tuple(lo)]

    queued = ~opaque_flc & (vis | adj)

    sky_py = np.concatenate(
        [
            lightpack.np_encode_scalar(np.asarray(state.sky_faces)[faces.PY]),
            [lightpack.STATUS_VISIBLE],
        ]
    ).astype(np.uint8)  # u8[4]

    light = np.zeros(contents.shape + (4,), np.uint8)
    light[..., 3] = lightpack.STATUS_NO_RAYS
    light[opaque_flc] = (0, 0, 0, lightpack.STATUS_OPAQUE)
    light[queued & covered] = (0, 0, 0, lightpack.STATUS_UNINITIALIZED)
    light[queued & ~covered] = sky_py

    prio = np.where(queued, PRIORITY_ESTIMATED, 0).astype(np.uint8)
    state = dataclasses.replace(state, light=jnp.asarray(light))
    return state, prio


@jax.jit
def _deps_scatter(state: SpaceState, cubes, prios):
    """Scatter each batch cube's requeue priority onto its ray-walk
    dependencies; returns u8[X,Y,Z] of max priorities.

    Replays :func:`relight_batch`'s masked chart walk (same gating — the
    walk's branching depends only on contents, not light values) and
    marks the positions whose stored light the walk *reads*: the cube
    behind a struck face (updater.rs:827-829) and a passed-through
    cube's own position (updater.rs:874). Out-of-bounds reads are
    dropped (light_needs_update bounds check, updater.rs:109-113).
    """
    ch = _chart_device(state.light_max_distance)
    tables = state.tables
    size = state.contents.shape
    n_rays = ch["n_rays"]
    b = cubes.shape[0]
    size_v = jnp.asarray(size, jnp.int32)

    face_normals = jnp.asarray(faces.FACE_NORMALS, jnp.int32)

    idx0, _ = _gather_contents(state, cubes)
    origin_opaque = jnp.take(tables.opaque_faces, idx0, axis=0).all(-1)
    origin_visible = jnp.take(tables.visible, idx0, axis=0)
    origin_face_colors = jnp.take(tables.face_colors, idx0, axis=0)

    neighbor_pos = cubes[:, None, :] + face_normals[None, :, :]
    nidx, _ = _gather_contents(state, neighbor_pos)
    n_visible = jnp.take(tables.visible, nidx, axis=0)
    n_emissive = (jnp.take(tables.light_emission, nidx, axis=0) != 0).any(-1)
    opp = jnp.asarray(faces.OPPOSITE[:6], jnp.int32)
    dir_weights = jnp.where(
        origin_visible[:, None],
        1.0,
        jnp.where(n_visible[:, opp] | n_emissive, 1.0, 0.0),
    )
    ray_w = dir_weights @ ch["cosines"].T  # [B,R]

    mean_alpha = jnp.clip(origin_face_colors[:, 6, 3], 0.0, 1.0)
    root_pickup = origin_visible & ~origin_opaque & (mean_alpha < 1.0)
    alpha0 = jnp.where(root_pickup, 1.0 - mean_alpha, 1.0)
    # Opaque origins never walk (compute_light:370-383).
    alpha = jnp.where(
        origin_opaque[:, None], 0.0, jnp.broadcast_to(alpha0[:, None], (b, n_rays))
    )
    live = (ray_w > 0.0) & (alpha > 0.0)

    offsets = ch["offsets"]
    faces_in = ch["faces_in"]
    kinds = ch["kinds"]
    max_steps = ch["max_steps"]

    prio_b = jnp.broadcast_to(prios[:, None], (b, n_rays))

    def mark(deps, pos, mask):
        inside = ((pos >= 0) & (pos < size_v)).all(-1) & mask
        pc = jnp.clip(pos, 0, size_v - 1)
        flat = (pc[..., 0] * size_v[1] + pc[..., 1]) * size_v[2] + pc[..., 2]
        return deps.at[flat.reshape(-1)].max(
            jnp.where(inside, prio_b, 0).reshape(-1).astype(jnp.uint8)
        )

    def body(carry_s):
        (alpha, live, deps), s = carry_s
        off = jax.lax.dynamic_slice_in_dim(offsets, s, 1, axis=1)[:, 0, :]
        f_in = jax.lax.dynamic_slice_in_dim(faces_in, s, 1, axis=1)[:, 0]
        kind = jax.lax.dynamic_slice_in_dim(kinds, s, 1, axis=1)[:, 0]

        pos = cubes[:, None, :] + off[None, :, :]
        idx, inside = _gather_contents(state, pos)
        row = jnp.take(tables.light_face_rows, idx * 6 + f_in[None, :], axis=0)
        fc = row[..., 0:4]
        flags = row[..., 4]
        opaque_f = jnp.mod(flags, 2.0) >= 1.0
        visible = flags >= 2.0

        is_end = kind[None, :] == STEP_END
        is_pad = kind[None, :] == STEP_PAD
        active = live & ~is_pad
        exits = active & (is_end | ~inside)

        hit_alpha = jnp.clip(fc[..., 3], 0.0, 1.0)
        interacting = active & ~exits & visible

        struck = interacting & (hit_alpha > 0.0)
        behind_pos = pos + jnp.take(face_normals, f_in, axis=0)[None, :, :]
        deps = mark(deps, behind_pos, struck)

        hit_opaque = struck & opaque_f
        alpha = jnp.where(struck & ~hit_opaque, alpha * (1.0 - hit_alpha), alpha)

        through = interacting & (hit_alpha < 1.0) & ~hit_opaque
        deps = mark(deps, pos, through)
        alpha = jnp.where(through, alpha * (1.0 - hit_alpha), alpha)

        alpha = jnp.where(hit_opaque, 0.0, alpha)
        ends_now = exits | hit_opaque | (active & (alpha <= 0.0) & ~exits)
        live = live & ~ends_now
        return (alpha, live, deps), s + 1

    def cond(carry_s):
        (alpha, live, deps), s = carry_s
        return (s < max_steps) & live.any()

    deps0 = jnp.zeros(int(np.prod(size)), jnp.uint8)
    (_, _, deps), _ = jax.lax.while_loop(cond, body, ((alpha, live, deps0), 0))
    return deps.reshape(size)


def _difference_priority_ref(old, new):
    """data.rs:193 exactly: max abs component diff; +63 (saturating) when
    the status differs."""
    old = old.astype(np.int32)
    new = new.astype(np.int32)
    diff = np.abs(old[..., :3] - new[..., :3]).max(-1)
    return np.where(
        old[..., 3] != new[..., 3], np.minimum(diff + 63, 255), diff
    )


def evaluate_light_reference(state: SpaceState, max_rounds: int = 10000):
    """``fast_evaluate_light(); evaluate_light(1)`` as the reference's
    golden generation runs it. Returns the lit state.

    Processing order: all cubes at the current maximum queue priority
    form one batch (chunked at {_CHUNK}); within a batch, values are
    computed from the same pre-batch field. The reference's serial pops
    within a priority happen in arbitrary hash order, so any order —
    including all-at-once — is a faithful member of the same family of
    stalled fields; the goldens' comparison thresholds absorb exactly
    this nondeterminism (they must, for the reference's own reruns).
    """
    state, prio = fast_evaluate_seed(state)
    visible_t, opaque_t, _ = _tables_np(state)
    contents = np.asarray(state.contents)
    fully_opaque = opaque_t[contents].all(-1)  # guess-fill gate

    light = np.asarray(state.light).copy()
    normals = np.asarray(faces.FACE_NORMALS)
    size = contents.shape

    rng = np.random.default_rng(0)  # stands in for the hash-order pops
    for _round in range(max_rounds):
        p = prio.max()
        if p <= 1:
            break
        # Pop up to _CHUNK cubes at the current max priority (re-derived
        # every micro-batch: requeues may raise the max mid-drain).
        bucket = np.argwhere(prio == p)
        if len(bucket) > _CHUNK:
            bucket = bucket[rng.choice(len(bucket), _CHUNK, replace=False)]
        for cubes_np in (bucket,):
            bn = len(cubes_np)
            # Pad to the next power of two: relight_batch/_deps_scatter
            # compile per batch shape, so raw sizes would recompile every
            # round.
            bpad = max(64, 1 << int(np.ceil(np.log2(bn))))
            cubes_pad = np.zeros((bpad, 3), np.int32)
            cubes_pad[:bn] = cubes_np
            cubes = jnp.asarray(cubes_pad)
            state = dataclasses.replace(state, light=jnp.asarray(light))
            new = np.asarray(
                relight_batch(
                    state, cubes, jnp.arange(bpad) < bn
                )
            )[:bn]
            old = light[cubes_np[:, 0], cubes_np[:, 1], cubes_np[:, 2]]
            diff = _difference_priority_ref(old, new)

            # Pop the chunk, then apply any nonzero difference.
            prio[cubes_np[:, 0], cubes_np[:, 1], cubes_np[:, 2]] = 0
            changed = diff > 0
            ch_cubes = cubes_np[changed]
            light[ch_cubes[:, 0], ch_cubes[:, 1], ch_cubes[:, 2]] = new[changed]

            # Guess-fill uninitialized, not-fully-opaque neighbors of
            # changed cubes with the changed cube's rgb (updater.rs:307).
            for f in range(6):
                npos = ch_cubes + normals[f]
                ok = ((npos >= 0) & (npos < size)).all(-1)
                npos_ok = npos[ok]
                src = new[changed][ok]
                if not len(npos_ok):
                    continue
                tgt = light[npos_ok[:, 0], npos_ok[:, 1], npos_ok[:, 2]]
                fill = (
                    (tgt[:, 3] == lightpack.STATUS_UNINITIALIZED)
                    & ~fully_opaque[npos_ok[:, 0], npos_ok[:, 1], npos_ok[:, 2]]
                )
                guess = src.copy()
                guess[:, 3] = lightpack.STATUS_UNINITIALIZED
                tgt[fill] = guess[fill]
                light[npos_ok[:, 0], npos_ok[:, 1], npos_ok[:, 2]] = tgt

            # Re-enqueue dependencies of cubes whose difference exceeds 1
            # at Priority::from_difference = d/2 + 1 (queue.rs:47).
            requeue = diff > 1
            if requeue.any():
                rq = np.zeros(bpad, np.uint8)
                rq[:bn] = np.where(requeue, diff // 2 + 1, 0)
                dep_prio = np.asarray(
                    _deps_scatter(state, cubes, jnp.asarray(rq))
                )
                prio = np.maximum(prio, dep_prio)

    return dataclasses.replace(state, light=jnp.asarray(light))
