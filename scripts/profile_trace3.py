"""Measure atrium 1080p with beams + cumsum compaction (round-2 state)."""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    import jax

    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, n=3):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax

    print(f"backend={jax.default_backend()}")
    from aic_tpu.content import atrium
    from aic_tpu.light import evaluate_light_dense
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace.tracer import trace_rays

    space = atrium()
    state = space.snapshot()
    t0 = time.perf_counter()
    state, passes = evaluate_light_dense(state)
    sync(state.light)
    print(f"relight: {time.perf_counter()-t0:.1f}s passes={passes}")

    w, h = 1920, 1080
    options = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    camera = Camera(options, Viewport(w, h))
    sz = np.asarray(state.contents.shape, np.float64)
    lo = np.asarray(state.lower, np.float64)
    camera.look_at(lo + sz * np.array([0.5, 0.75, 0.9]), lo + sz / 2)
    origins, directions = camera.pixel_rays()
    n_rays = w * h

    configs = [
        ("beams, no compact", dict()),
        ("beams + compact", dict(compact=True)),
        ("no beams (r2 baseline)", dict(beam_tile=0)),
        ("beams tile=4", dict(beam_tile=4)),
        ("beams + compact + substeps=4", dict(compact=True, substeps=4)),
        ("beams + compact s1", dict(compact=True, substeps=1)),
    ]
    for name, kw in configs:
        dt = timeit(lambda kw=kw: trace_rays(state, origins, directions, options, **kw)[0])
        print(f"{name}: {dt*1e3:.1f} ms -> {n_rays/dt/1e6:.2f} Mrays/s")

    _, _, stats = trace_rays(
        state, origins, directions, options, return_stats=True
    )
    print("per-phase iters (beams):", np.asarray(stats["iters"]))


if __name__ == "__main__":
    main()
