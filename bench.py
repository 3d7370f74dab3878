"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline: raytrace throughput in Mrays/sec on the cornell-box config
(BASELINE.json config 1; the atrium 1080p config lands in a later round).
`vs_baseline` is the ratio against the 100 Mrays/sec north-star target
(the reference publishes no absolute numbers — BASELINE.md). Extra fields
report the relight kernel (BASELINE config 2: lighting convergence).

Timing note: on the tunneled TPU backend `jax.block_until_ready` can
return before execution completes; every timed section syncs by copying
one element to host (np.asarray), which is reliable.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    from aic_tpu.content import cornell_box
    from aic_tpu.light import build_relight_ctx, evaluate_light_dense
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace.tracer import trace_rays

    size = 256
    space = cornell_box(32)
    state = space.snapshot()
    n_cubes = int(np.prod(state.contents.shape))

    # --- relight metrics (whole-volume dense kernel) --------------------
    from aic_tpu.light import relight_all

    ctx = build_relight_ctx(state)
    warm, _ = relight_all(state, ctx)  # compile pass + apply
    np.asarray(warm.light[0, 0, 0])
    t0 = time.perf_counter()
    state_lit, passes = evaluate_light_dense(state, ctx=ctx)
    np.asarray(state_lit.light[0, 0, 0])
    relight_dt = time.perf_counter() - t0
    relight_rate = n_cubes * passes / relight_dt
    state = state_lit

    # --- headline: raytrace throughput ----------------------------------
    options = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    camera = Camera(options, Viewport(size, size))
    camera.look_at(np.array([0.5, 0.5, 1.6]) * 32, (16, 16, 16))
    origins, directions = camera.pixel_rays()

    def frame():
        light, trans = trace_rays(state, origins, directions, options)
        return light

    np.asarray(frame()[0, 0])  # compile + sync

    n_frames = 20
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = frame()
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / n_frames

    mrays = size * size / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "raytrace_cornell256_smoothstep",
                "value": round(mrays, 3),
                "unit": "Mrays/sec",
                "vs_baseline": round(mrays / 100.0, 4),
                "extra": {
                    "relight_full_convergence_s": round(relight_dt, 2),
                    "relight_passes": passes,
                    "relight_cube_updates_per_s": round(relight_rate),
                    "scene": "cornell_box 32^3, 39k cubes",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
