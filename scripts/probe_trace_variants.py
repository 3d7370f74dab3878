"""Atrium 1080p pallas-tracer sweep: domains-per-iter x macro-steps x
substeps, on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, n=4):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from aic_tpu.content import atrium
    from aic_tpu.light import evaluate_light_dense
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace.pallas_trace import trace_rays_pallas

    t0 = time.perf_counter()
    state = atrium().snapshot()
    state, _ = evaluate_light_dense(state)
    sync(state.light)
    print(f"setup {time.perf_counter()-t0:.0f}s", flush=True)

    opts = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    W, H = 1920, 1080
    cam = Camera(opts, Viewport(W, H))
    sz = np.asarray(state.contents.shape, np.float64)
    lo = np.asarray(state.lower, np.float64)
    cam.look_at(lo + sz * np.array([0.5, 0.75, 0.9]), lo + sz / 2)
    o, d = cam.pixel_rays()
    o, d = jnp.asarray(o), jnp.asarray(d)
    n = W * H

    for dom, mac, sub in ((1, 1, 4), (2, 2, 4), (2, 2, 8), (4, 2, 8), (2, 4, 8)):
        try:
            f = lambda: trace_rays_pallas(
                state, o, d, opts, domains=dom, macro=mac, substeps=sub
            )[0]
            dt = timeit(f)
            print(
                f"dom={dom} mac={mac} sub={sub}: {dt*1e3:.1f} ms "
                f"{n/dt/1e6:.1f} Mrays/s", flush=True,
            )
        except Exception as e:
            print(f"dom={dom} mac={mac} sub={sub}: FAIL {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
