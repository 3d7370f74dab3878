"""Round-5 probe: atrium 1080p headline at HEAD vs knob variants.

Context: the shader-gather fixes measured 61.9 ms (33.7 Mrays/s) on this
config mid-session, but the following end-of-session bench recorded
~90 ms (23.0 Mrays/s) after the R32/fuel/domain-default commits landed.
This probe isolates which knob (or measurement condition) moved:
default at HEAD, relaunch fuel 32 (the old default), group geometry,
substeps, and kernel_iters — each with an image-parity check against
the first variant so a "fast" number can't hide dropped rays.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
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
    print(f"backend={jax.default_backend()}", flush=True)
    from aic_tpu.content import atrium
    from aic_tpu.light import evaluate_light_dense
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace import pallas_trace as pt
    from aic_tpu.raytrace.tracer import trace_rays

    t0 = time.perf_counter()
    state = atrium().snapshot()
    state, passes = evaluate_light_dense(state)
    sync(state.light)
    print(f"setup {time.perf_counter()-t0:.1f}s passes={passes}", flush=True)

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
    n_rays = W * H

    ctx2 = pt.get_bitmask_ctx2(state)
    print(f"rows={ctx2.rows.shape[0]} regions={ctx2.n_regions}", flush=True)

    variants = [
        ("default", dict()),
        ("mr32", dict(max_rounds=32)),
        ("ph1", dict(phases=1)),
        ("ph2", dict(phases=2)),
        ("rows8", dict(group_rows=8)),
        ("rows64", dict(group_rows=64)),
        ("kit512", dict(kernel_iters=512)),
        ("kit128", dict(kernel_iters=128)),
        ("s4", dict(substeps=4)),
        ("d2", dict(domains=2)),
    ]
    if len(sys.argv) > 1:
        keep = sys.argv[1:]
        variants = [v for v in variants if any(k in v[0] for k in keep)]
    ref = None
    for name, kw in variants:
        try:
            f = lambda: pt.trace_rays_pallas(
                state, o, d, opts, return_stats=True, **kw
            )
            out = f()
            img = np.asarray(out[0])
            unfin = bool(np.asarray(out[1] if len(out) == 2 else out[2]["unfinished"]))
            dt = timeit(lambda: f()[0], n=3)
            line = f"{name}: {dt*1e3:.1f} ms  {n_rays/dt/1e6:.2f} Mrays/s  unfinished={unfin}"
            if ref is None:
                ref = img
            else:
                diff = np.abs(img - ref)
                line += f"  vs-default max={diff.max():.4f} frac>0.01={np.mean(diff > 0.01):.6f}"
            print(line, flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:300], flush=True)

    dt_x = timeit(lambda: trace_rays(state, o, d, opts)[0], n=2)
    print(f"xla: {dt_x*1e3:.1f} ms  {n_rays/dt_x/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
