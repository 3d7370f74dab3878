"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline: raytrace throughput in Mrays/sec on the cornell-box config
(BASELINE.json config 1; the atrium 1080p config lands in a later round).
`vs_baseline` is the ratio against the 100 Mrays/sec north-star target
(the reference publishes no absolute numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from aic_tpu.content import cornell_box
    from aic_tpu.light import evaluate_light
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace.tracer import trace_rays

    size = 256
    space = cornell_box(32)
    state = space.snapshot()
    # Partial relight: enough for a lit scene; full-convergence relighting
    # is benchmarked separately (it is its own headline metric). Kept small
    # so the driver's bench run stays fast — ray throughput does not depend
    # on light convergence.
    state, _ = evaluate_light(state, batch_size=2048, max_rounds=8)

    options = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    camera = Camera(options, Viewport(size, size))
    camera.look_at(np.array([0.5, 0.5, 1.6]) * 32, (16, 16, 16))
    origins, directions = camera.pixel_rays()

    def frame():
        light, trans = trace_rays(state, origins, directions, options)
        return light

    # Warm up / compile.
    jax.block_until_ready(frame())

    n_frames = 20
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = frame()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_frames

    rays_per_sec = size * size / dt
    mrays = rays_per_sec / 1e6
    print(
        json.dumps(
            {
                "metric": "raytrace_cornell256_smoothstep",
                "value": round(mrays, 3),
                "unit": "Mrays/sec",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
