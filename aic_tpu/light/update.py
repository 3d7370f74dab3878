"""Batched global-illumination relight kernel + convergence driver.

TPU-native re-design of the reference light updater
(all-is-cubes/src/space/light/updater.rs): where the reference pops ≤32
cubes from a priority queue and walks the ray tree per cube on rayon
threads (updater.rs:175-246), we relight a *batch* of cubes at once: state
of shape [B, R_RAYS] steps through the static chart tables (light/chart.py)
under masks, accumulating per-ray contributions that sum to exactly the
tree-walk result (see chart.py docstring for the linearity argument).

The queue becomes a per-cube priority field (`light_dirty`): each round
selects the top-K dirtiest cubes with `lax.top_k`, relights them, scatters
results, and bumps neighbors whose value changed by more than 1 step
(updater.rs:340: differences of ≤1 are not re-enqueued, preventing
oscillation). `evaluate_light` loops rounds until the queue drains —
the analog of Mutation::evaluate_light (space.rs:1494).

Semantics per step follow LightBuffer::traverse (updater.rs:755-880):
struck-face reflection using the light *behind* the face, pass-through
pickup using the light *in* the cube, double (1-α) attenuation for
semi-transparent blocks, opaque faces terminating rays, sky at every ray
end weighted by remaining alpha.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..math import faces, lightpack
from ..space.state import SpaceState
from .chart import STEP_END, STEP_NORMAL, STEP_PAD, build_chart


@functools.lru_cache(maxsize=8)
def _chart_host(max_distance: int):
    """Chart tables as numpy (host cache). Conversion to device arrays
    happens inside the traced function so the tables become compile-time
    constants — caching jnp arrays here would leak tracers when the first
    call happens under jit."""
    ch = build_chart(max_distance)
    return dict(
        offsets=np.asarray(ch["offsets"], np.int32),
        faces_in=np.asarray(ch["faces_in"], np.int32),
        kinds=np.asarray(ch["kinds"], np.int32),
        cosines=np.asarray(ch["cosines"], np.float32),
        n_rays=ch["n_rays"],
        max_steps=ch["max_steps"],
    )


def _chart_device(max_distance: int):
    ch = _chart_host(max_distance)
    return dict(
        offsets=jnp.asarray(ch["offsets"]),
        faces_in=jnp.asarray(ch["faces_in"]),
        kinds=jnp.asarray(ch["kinds"]),
        cosines=jnp.asarray(ch["cosines"]),
        n_rays=ch["n_rays"],
        max_steps=ch["max_steps"],
    )


def _gather_contents(state: SpaceState, pos):
    size = jnp.asarray(state.contents.shape, jnp.int32)
    inside = ((pos >= 0) & (pos < size)).all(-1)
    pc = jnp.clip(pos, 0, size - 1)
    flat = (pc[..., 0] * size[1] + pc[..., 1]) * size[2] + pc[..., 2]
    idx = jnp.take(state.contents.reshape(-1), flat, axis=0).astype(jnp.int32)
    return jnp.where(inside, idx, 0), inside


def _gather_light_rgb(state: SpaceState, pos):
    """Stored light .value() at positions: decoded rgb; OOB → sky face /
    zero per BlockSky::light_outside (value() of NO_RAYS is zero)."""
    size = jnp.asarray(state.light.shape[:3], jnp.int32)
    inside = ((pos >= 0) & (pos < size)).all(-1)
    pc = jnp.clip(pos, 0, size - 1)
    flat = (pc[..., 0] * size[1] + pc[..., 1]) * size[2] + pc[..., 2]
    texel = jnp.take(state.light.reshape(-1, 4), flat, axis=0)
    stored = lightpack.decode_rgb(texel)
    # Outside: sky face value if adjacent to exactly one face, else 0.
    at_lower = pos == -1
    at_upper = pos == size
    adjacent = at_lower | at_upper
    below_above = (pos < 0) | (pos >= size)
    touching = (below_above.sum(-1) == 1) & (adjacent.sum(-1) == 1)
    face_idx = jnp.argmax(
        jnp.concatenate([at_lower, at_upper], axis=-1).astype(jnp.int32), axis=-1
    )
    sky_rgb = jnp.take(state.sky_faces, face_idx, axis=0)
    outside = jnp.where(touching[..., None], sky_rgb, 0.0)
    return jnp.where(inside[..., None], stored, outside)


@jax.jit
def relight_batch(state: SpaceState, cubes, valid):
    """Compute new light for a batch of cubes (index-space coords).

    cubes: i32[B,3]; valid: bool[B] (padding rows produce garbage safely).
    Returns u8[B,4] packed light texels.

    This is `compute_light` (updater.rs:362) for B cubes × 602 rays at once.
    """
    ch = _chart_device(state.light_max_distance)
    tables = state.tables
    n_rays = ch["n_rays"]
    b = cubes.shape[0]

    face_normals = jnp.asarray(faces.FACE_NORMALS, jnp.int32)

    # --- origin cube evaluation -------------------------------------------
    idx0, _ = _gather_contents(state, cubes)
    origin_opaque = jnp.take(tables.opaque_faces, idx0, axis=0).all(-1)
    origin_visible = jnp.take(tables.visible, idx0, axis=0)
    origin_emission = jnp.take(tables.light_emission, idx0, axis=0)
    origin_face_colors = jnp.take(tables.face_colors, idx0, axis=0)  # [B,7,4]

    # directions_to_seek_light (updater.rs:663).
    neighbor_pos = cubes[:, None, :] + face_normals[None, :, :]  # [B,6,3]
    nidx, _ = _gather_contents(state, neighbor_pos)
    n_visible = jnp.take(tables.visible, nidx, axis=0)  # [B,6]
    n_emissive = (jnp.take(tables.light_emission, nidx, axis=0) != 0).any(-1)
    opp = jnp.asarray(faces.OPPOSITE[:6], jnp.int32)
    dir_weights = jnp.where(
        origin_visible[:, None],
        1.0,
        jnp.where(n_visible[:, opp] | n_emissive, 1.0, 0.0),
    )  # [B,6]

    # Per-(cube, ray) weight: Σ_f dir_weights·face_cosines (constant along
    # the walk since direction_weights are never modified mid-ray except
    # the defensive Within-opaque case, impossible here because opaque
    # origins skip the walk entirely).
    ray_w = dir_weights @ ch["cosines"].T  # [B,R]

    # Sky sample per ray: Σ_f sky_face·cos_f / Σ_f cos_f (end_of_ray,
    # updater.rs:895; per-ray cosines — see chart.py deviation note).
    cos_sum = ch["cosines"].sum(-1)  # [R]
    sky_ray = (ch["cosines"] @ state.sky_faces) / cos_sum[:, None]  # [R,3]

    # --- root step: the origin cube itself (face Within) -------------------
    # traverse() with hit.face == Within (updater.rs:767-880): the struck-
    # face branch requires a real face, so only the pass-through branch
    # applies: if the origin block is visible and its mean alpha < 1, pick
    # up its emission (its own stored light reads as zero, updater.rs:858)
    # and attenuate by (1 - mean_alpha). Otherwise the root is a no-op.
    mean_alpha = jnp.clip(origin_face_colors[:, 6, 3], 0.0, 1.0)  # face7 Within
    root_pickup = origin_visible & ~origin_opaque & (mean_alpha < 1.0)
    root_contrib = jnp.where(root_pickup[:, None], origin_emission, 0.0)  # [B,3]
    alpha0 = jnp.where(root_pickup, 1.0 - mean_alpha, 1.0)
    incoming0 = root_contrib * ray_w.sum(-1, keepdims=True)  # Σ_r w[b,r]
    alpha = jnp.broadcast_to(alpha0[:, None], (b, n_rays))
    live = (ray_w > 0.0) & (alpha > 0.0)

    # --- masked walk over chart steps --------------------------------------
    offsets = ch["offsets"]  # [R,S,3]
    faces_in = ch["faces_in"]  # [R,S]
    kinds = ch["kinds"]  # [R,S]
    max_steps = ch["max_steps"]

    def body(s, carry):
        alpha, live, incoming, total_w, prev_own = carry
        off = jax.lax.dynamic_slice_in_dim(offsets, s, 1, axis=1)[:, 0, :]  # [R,3]
        f_in = jax.lax.dynamic_slice_in_dim(faces_in, s, 1, axis=1)[:, 0]  # [R]
        kind = jax.lax.dynamic_slice_in_dim(kinds, s, 1, axis=1)[:, 0]  # [R]

        pos = cubes[:, None, :] + off[None, :, :]  # [B,R,3]
        idx, inside = _gather_contents(state, pos)
        # One packed row gather per step (state.py light_face_rows).
        row = jnp.take(tables.light_face_rows, idx * 6 + f_in[None, :], axis=0)
        fc = row[..., 0:4]  # face rgba
        flags = row[..., 4]
        opaque_f = jnp.mod(flags, 2.0) >= 1.0
        visible = flags >= 2.0
        emission = row[..., 5:8]

        is_end = kind[None, :] == STEP_END
        is_pad = kind[None, :] == STEP_PAD
        active = live & ~is_pad

        # Ray ends this step: distance exceeded (static) or bounds exit
        # (dynamic) — sky contribution with remaining alpha; or opaque face.
        exits = active & (is_end | ~inside)

        hit_alpha = jnp.clip(fc[..., 3], 0.0, 1.0)
        interacting = active & ~exits & visible

        # Struck-face branch (hit_alpha > 0): reflect light from the cube
        # behind the face. A DDA path enters pos(s) from pos(s-1) =
        # pos + normal(f_in), the cube whose own light the PREVIOUS step
        # fetched — carried in prev_own, replacing a whole [B,R] light
        # gather per step (same trick as pallas_relight.py point 3).
        behind_light = prev_own  # [B,R,3]
        struck = interacting & (hit_alpha > 0.0)
        # hit_surface_color.clamp() (updater.rs:802): reflectance is
        # clamped to [0,1] so over-unity block colors cannot amplify light.
        light_struck = emission + jnp.clip(fc[..., :3], 0.0, 1.0) * behind_light * hit_alpha[..., None]
        contrib = jnp.where(
            struck[..., None], light_struck * (alpha * ray_w)[..., None], 0.0
        )

        hit_opaque = struck & opaque_f
        alpha = jnp.where(struck & ~hit_opaque, alpha * (1.0 - hit_alpha), alpha)

        # Pass-through branch (hit_alpha < 1): pick up the cube's own light.
        through = interacting & (hit_alpha < 1.0) & ~hit_opaque
        own_light = _gather_light_rgb(state, pos)
        light_through = emission + own_light * hit_alpha[..., None]
        contrib = contrib + jnp.where(
            through[..., None], light_through * (alpha * ray_w)[..., None], 0.0
        )
        alpha = jnp.where(through, alpha * (1.0 - hit_alpha), alpha)

        # Opaque hits end the ray with alpha → 0 (sky contributes nothing
        # but the weight still counts).
        alpha = jnp.where(hit_opaque, 0.0, alpha)
        ends_now = exits | hit_opaque | (active & (alpha <= 0.0) & ~exits)

        sky_contrib = jnp.where(
            ends_now[..., None], sky_ray[None, :, :] * (alpha * ray_w)[..., None], 0.0
        )
        contrib = contrib + sky_contrib
        total_w = total_w + jnp.where(ends_now, ray_w, 0.0)
        live = live & ~ends_now

        incoming = incoming + contrib.sum(1)
        return (alpha, live, incoming, total_w, own_light)

    total_w0 = jnp.zeros((b, n_rays), jnp.float32)
    # prev_own starts as the origin cube's stored light: step 0 enters
    # pos(0) from the origin itself (updater.rs traverse: the ray's first
    # struck face reflects the origin's light value).
    origin_light = _gather_light_rgb(state, cubes)  # [B,3]
    prev_own0 = jnp.broadcast_to(origin_light[:, None, :], (b, n_rays, 3))
    init = (alpha, live, incoming0, total_w0, prev_own0)

    def cond_wrap(carry_s):
        carry, s = carry_s
        live = carry[1]
        return (s < max_steps) & live.any()

    def body_wrap(carry_s):
        carry, s = carry_s
        return (body(s, carry), s + 1)

    (alpha, live, incoming, total_w, _), _ = jax.lax.while_loop(
        cond_wrap, body_wrap, (init, jnp.int32(0))
    )

    total = total_w.sum(-1)

    # finish (updater.rs:925): average; opaque origins get OPAQUE unless
    # emissive (compute_light:378 adds emission with weight 1).
    origin_emissive = (origin_emission != 0).any(-1)
    opaque_emissive = origin_opaque & origin_emissive
    total = jnp.where(origin_opaque, jnp.where(opaque_emissive, 1.0, 0.0), total)
    incoming = jnp.where(
        origin_opaque[:, None],
        jnp.where(opaque_emissive[:, None], origin_emission, 0.0),
        incoming,
    )

    rgb = incoming / jnp.maximum(total, 1.0)[:, None]
    packed_rgb = lightpack.encode_scalar(rgb)
    status = jnp.where(
        total > 0.0,
        lightpack.STATUS_VISIBLE,
        jnp.where(origin_opaque, lightpack.STATUS_OPAQUE, lightpack.STATUS_NO_RAYS),
    ).astype(jnp.uint8)
    packed_rgb = jnp.where((status == lightpack.STATUS_VISIBLE)[:, None], packed_rgb, 0)
    return jnp.concatenate([packed_rgb, status[:, None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("batch_size",))
def light_update_round(state: SpaceState, batch_size: int = 256):
    """One queue round: select top-K dirty cubes, relight, scatter,
    re-enqueue changed neighborhoods. Returns (state, stats dict).

    The device analog of update_light_from_queue (updater.rs:175).
    """
    size = state.contents.shape
    flat_dirty = state.light_dirty.reshape(-1)
    n = flat_dirty.shape[0]
    k = min(batch_size, n)
    # Two-stage hierarchical selection. A flat top_k/approx_max_k over
    # the volume costs 3-8 ms at demo-city size (measured,
    # scripts/probe_round_ablate.py) — more than the relight itself at
    # B=32. Instead: max-reduce 128-lane rows (one cheap pass), exact
    # top-k over the ~N/128 row maxima, then up to 4 candidates per
    # selected row and a final exact top-k over those ≤4k candidates.
    # The queue only needs "a batch of high-priority dirty cubes"
    # (queue.rs:135 pops max first, but convergence is a fixpoint);
    # cubes missed by the per-row cap surface next round — processed
    # cubes clear, so remaining ranks strictly rise and nothing starves.
    if n % 128:
        flat_dirty = jnp.pad(flat_dirty, (0, 128 - n % 128))
    rows2 = flat_dirty.reshape(-1, 128)
    n_rows = rows2.shape[0]
    kr = min(k, n_rows)
    row_max = rows2.max(axis=1).astype(jnp.int32)
    _, rsel = jax.lax.top_k(row_max, kr)
    cand = jnp.take(rows2, rsel, axis=0).astype(jnp.int32)  # [kr,128]
    m = -(-k // kr) if kr * 4 < k else 4  # tiny volumes: deepen per-row picks
    m = min(m, 128)
    cprio, coff = jax.lax.top_k(cand, m)  # [kr,m] per-row candidates
    cpos = rsel[:, None] * 128 + coff  # [kr,m]
    k = min(k, kr * m)
    prio, ci = jax.lax.top_k(cprio.reshape(-1), k)
    flat_pos = jnp.take(cpos.reshape(-1), ci)
    flat_pos = jnp.minimum(flat_pos, n - 1).astype(jnp.int32)
    valid = prio > 0
    pos = jnp.stack(
        [
            flat_pos // (size[1] * size[2]),
            (flat_pos // size[2]) % size[1],
            flat_pos % size[2],
        ],
        axis=-1,
    ).astype(jnp.int32)

    new_light = relight_batch(state, pos, valid)

    old_light = state.light[pos[:, 0], pos[:, 1], pos[:, 2]]
    diff = lightpack.difference_priority(old_light, new_light)  # i32[B]

    # One u32 scatter instead of a [B,4]-u8 scatter (texel = 4 packed u8).
    light_u32 = jax.lax.bitcast_convert_type(state.light, jnp.uint32)
    new_u32 = jax.lax.bitcast_convert_type(
        jnp.where(valid[:, None], new_light, old_light), jnp.uint32
    )
    light = jax.lax.bitcast_convert_type(
        light_u32.at[pos[:, 0], pos[:, 1], pos[:, 2]].set(new_u32), jnp.uint8
    )
    # Clear processed cubes, then bump neighbors where diff > 1
    # (apply_light_update, updater.rs:289-355) — one fused scatter-max
    # over 7K rows: row 0 holds the cleared self (value 0 via max over a
    # pre-cleared base), rows 1..6 the neighbor bumps. Clearing cannot
    # ride a max, so the self-clear is a (cheap, K-row) scatter-set and
    # the 6K neighbor bumps share ONE scatter-max.
    dirty = state.light_dirty.at[pos[:, 0], pos[:, 1], pos[:, 2]].set(
        jnp.where(valid, 0, state.light_dirty[pos[:, 0], pos[:, 1], pos[:, 2]])
    )
    normals = jnp.asarray(faces.FACE_NORMALS, jnp.int32)
    npos = (pos[:, None, :] + normals[None, :, :]).reshape(-1, 3)
    nprio = jnp.broadcast_to(
        jnp.where(valid & (diff > 1), jnp.minimum(diff, 255), 0)[:, None], (k, 6)
    ).reshape(-1)
    dirty = dirty.at[npos[:, 0], npos[:, 1], npos[:, 2]].max(
        nprio.astype(jnp.uint8), mode="drop"
    )

    new_state = dataclasses.replace(state, light=light, light_dirty=dirty)
    stats = dict(
        updated=valid.sum(),
        max_diff=jnp.where(valid, diff, 0).max(),
        queue_remaining=(dirty > 0).sum(),
    )
    return new_state, stats


def evaluate_light(
    state: SpaceState,
    batch_size: int = 256,
    max_rounds: int = 100000,
    dense_threshold: float = 0.02,
):
    """Relight to convergence (space.rs:1494 Mutation::evaluate_light).

    Strategy selection (the TPU analog of the reference's queue-vs-
    fast_evaluate_light split): when more than `dense_threshold` of the
    volume is dirty, whole-volume Jacobi passes (light/dense.py) relight
    everything at once; the sparse top-k queue handles the incremental
    tail. Returns (state, total cubes updated).
    """
    from .dense import evaluate_light_dense  # lazy: dense imports us

    if not state.light_enabled:
        # LightPhysics::None: no queue, no updates (updater.rs:534).
        return state, 0

    n_dirty = int((state.light_dirty > 0).sum())
    total_updated = 0
    if state.light_enabled and n_dirty > dense_threshold * state.light_dirty.size:
        state, passes = evaluate_light_dense(state)
        return state, passes * int(state.light_dirty.size)
    for _ in range(max_rounds):
        state, stats = light_update_round(state, batch_size=batch_size)
        total_updated += int(stats["updated"])
        if int(stats["queue_remaining"]) == 0:
            break
    return state, total_updated
