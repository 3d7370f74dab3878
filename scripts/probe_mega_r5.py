"""Round-5 probe: megakernel (v2) vs v1 pallas tracer on atrium 1080p.

Measures on the real chip: v2 at knob variants, v1 baseline, and image
agreement v2-vs-v1 (same entry setup + shader, so differences isolate
traversal).
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

    t0 = time.perf_counter()
    space = atrium()
    state = space.snapshot()
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
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    n_rays = W * H

    ctx2 = pt.get_bitmask_ctx2(state)
    n_pages = 0 if ctx2.pages is None else ctx2.pages.shape[0] // 16
    tot = ctx2.rows.size * 4 + (
        0 if ctx2.pages is None
        else ctx2.pages.size * 4 + ctx2.page_idx.size * 4
    )
    print(
        f"regions={ctx2.n_regions} rdims={ctx2.rdims} pages={n_pages} "
        f"tables={tot/2**20:.2f} MiB fits={pt._megakernel_fits(state)}",
        flush=True,
    )

    variants = [
        ("v2 default", dict(megakernel=True)),
        ("v2 s8", dict(megakernel=True, substeps=8)),
        ("v2 macro2", dict(megakernel=True, macro=2)),
        ("v2 s8 macro2", dict(megakernel=True, substeps=8, macro=2)),
        ("v2 ph2", dict(megakernel=True, phases=2)),
        ("v2 d2", dict(megakernel=True, domains=2)),
        ("v2 d4", dict(megakernel=True, domains=4)),
        ("v2 s8 d2", dict(megakernel=True, substeps=8, domains=2)),
        ("v2 s8 d4", dict(megakernel=True, substeps=8, domains=4)),
        ("v2 s8 d4 macro2", dict(megakernel=True, substeps=8, domains=4, macro=2)),
        ("v1 default", dict(megakernel=False)),
    ]
    if len(sys.argv) > 1:
        keep = sys.argv[1:]
        variants = [v for v in variants if any(k in v[0] for k in keep)]
    imgs = {}
    for name, kw in variants:
        try:
            f = lambda: pt.trace_rays_pallas(state, o, d, opts, **kw)[0]
            dt = timeit(f, n=3)
            imgs[name] = np.asarray(f())
            print(
                f"{name}: {dt*1e3:.1f} ms  {n_rays/dt/1e6:.2f} Mrays/s",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:400], flush=True)

    if "v2 default" in imgs and "v1 default" in imgs:
        a, b = imgs["v2 default"], imgs["v1 default"]
        diff = np.abs(a - b)
        print(
            f"v2-vs-v1 image: mean={diff.mean():.5f} max={diff.max():.4f} "
            f"frac>0.01={np.mean(diff > 0.01):.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
