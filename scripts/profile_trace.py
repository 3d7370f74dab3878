"""Profile the atrium-1080p raytrace on the real TPU: phase-by-phase cost.

Usage: python scripts/profile_trace.py [--size WxH] [--scene atrium|cornell]

Times (a) full trace_rays, (b) traversal loop only (shading stubbed),
(c) shading only, (d) iteration counts, so optimization targets the
real bottleneck. Each measurement syncs via np.asarray (tunneled-TPU
block_until_ready can return early; see bench.py).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def sync(x):
    return np.asarray(x if x.ndim == 0 else x.reshape(-1)[0])


def timeit(fn, n=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--scene", default="atrium")
    ap.add_argument("--lighting", default="smoothstep")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.device_count()}")

    from aic_tpu.content import atrium, cornell_box
    from aic_tpu.light import evaluate_light_dense
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace.tracer import trace_rays

    t0 = time.perf_counter()
    if args.scene == "atrium":
        space = atrium()
        eye, target = None, None
    else:
        space = cornell_box(32)
    print(f"build scene: {time.perf_counter()-t0:.1f}s bounds={space.bounds}")
    t0 = time.perf_counter()
    state = space.snapshot()
    print(f"snapshot: {time.perf_counter()-t0:.1f}s size={state.contents.shape}")
    t0 = time.perf_counter()
    state, passes = evaluate_light_dense(state)
    sync(state.light)
    print(f"relight: {time.perf_counter()-t0:.1f}s passes={passes}")

    options = GraphicsOptions(
        lighting_display=args.lighting, fog="none", transparency="surface"
    )
    camera = Camera(options, Viewport(w, h))
    sz = np.asarray(state.contents.shape, np.float64)
    lo = np.asarray(state.lower, np.float64)
    center = lo + sz / 2
    eye = lo + sz * np.array([0.5, 0.75, 0.9])
    camera.look_at(eye, center)
    origins, directions = camera.pixel_rays()
    n_rays = w * h

    dt = timeit(lambda: trace_rays(state, origins, directions, options)[0], n=3)
    print(f"full frame: {dt*1e3:.1f} ms  -> {n_rays/dt/1e6:.2f} Mrays/s")

    for phases in (1, 2, 4):
        dt = timeit(
            lambda p=phases: trace_rays(
                state, origins, directions, options, phases=p
            )[0],
            n=3,
        )
        print(f"phases={phases}: {dt*1e3:.1f} ms -> {n_rays/dt/1e6:.2f} Mrays/s")

    for lighting in ("none", "flat", "smoothstep"):
        opt = GraphicsOptions(
            lighting_display=lighting, fog="none", transparency="surface"
        )
        dt = timeit(
            lambda o=opt: trace_rays(state, origins, directions, o, phases=1)[0],
            n=3,
        )
        print(f"lighting={lighting} (1 phase): {dt*1e3:.1f} ms -> {n_rays/dt/1e6:.2f} Mrays/s")

    for ss in (1, 2, 4, 8):
        dt = timeit(
            lambda s=ss: trace_rays(
                state, origins, directions, options, phases=1, substeps=s
            )[0],
            n=3,
        )
        print(f"substeps={ss} (1 phase): {dt*1e3:.1f} ms -> {n_rays/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
