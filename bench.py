"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline: raytrace throughput on the NORTH-STAR config (BASELINE.json
config 4): the Atrium template at 1920×1080 with recursive R16 blocks and
emissive lighting, smoothstep light display. `vs_baseline` is the ratio
against the 100 Mrays/sec north-star target (the reference publishes no
absolute numbers — BASELINE.md). Extra fields cover BASELINE configs 1-2:
cornell-box 256² trace and full relight convergence (cornell 32³ and the
reference's light_bench 54×16×54 scene).

Timing note: on the tunneled TPU backend `jax.block_until_ready` can
return before execution completes; every timed section syncs by copying
one element to host (np.asarray), which is reliable.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax

    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def _time(fn, n=5):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from aic_tpu.content import atrium, cornell_box
    from aic_tpu.content.testing import light_bench_space
    from aic_tpu.light import build_relight_ctx, evaluate_light_dense
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace.tracer import trace_rays

    extra = {}

    # --- relight metrics (BASELINE config 2) -----------------------------
    for name, space in (
        ("cornell32", cornell_box(32)),
        ("light_bench", light_bench_space()),
    ):
        state = space.snapshot()
        n_cubes = int(np.prod(state.contents.shape))
        ctx = build_relight_ctx(state)
        warm, _ = evaluate_light_dense(state, max_passes=1, ctx=ctx)
        _sync(warm.light)
        t0 = time.perf_counter()
        lit, passes = evaluate_light_dense(state, ctx=ctx)
        _sync(lit.light)
        dt = time.perf_counter() - t0
        extra[f"relight_{name}_s"] = round(dt, 3)
        extra[f"relight_{name}_passes"] = passes
        extra[f"relight_{name}_cube_updates_per_s"] = round(n_cubes * passes / dt)
        if name == "cornell32":
            cornell_state = lit

    # --- cornell 256² trace (BASELINE config 1) ---------------------------
    opts = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    cam = Camera(opts, Viewport(256, 256))
    cam.look_at(np.array([0.5, 0.5, 1.6]) * 32, (16, 16, 16))
    o, d = cam.pixel_rays()
    dt = _time(lambda: trace_rays(cornell_state, o, d, opts)[0], n=10)
    extra["raytrace_cornell256_mrays"] = round(256 * 256 / dt / 1e6, 3)

    # --- headline: atrium 1080p (north star, BASELINE config 4) ----------
    space = atrium()
    state = space.snapshot()
    state, _ = evaluate_light_dense(state)
    w, h = 1920, 1080
    cam = Camera(opts, Viewport(w, h))
    sz = np.asarray(state.contents.shape, np.float64)
    lo = np.asarray(state.lower, np.float64)
    cam.look_at(lo + sz * np.array([0.5, 0.75, 0.9]), lo + sz / 2)
    o, d = cam.pixel_rays()
    dt = _time(lambda: trace_rays(state, o, d, opts)[0], n=5)
    mrays = w * h / dt / 1e6
    extra["atrium_frame_ms"] = round(dt * 1e3, 1)

    print(
        json.dumps(
            {
                "metric": "raytrace_atrium1080p_smoothstep",
                "value": round(mrays, 3),
                "unit": "Mrays/sec",
                "vs_baseline": round(mrays / 100.0, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
