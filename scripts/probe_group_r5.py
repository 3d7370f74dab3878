"""Round-5 probe: megakernel GROUP geometry sweep on atrium 1080p.

GROUP rows are fixed at import (AIC_TRACE_GROUP_ROWS); this driver
re-execs itself per value. Light values don't affect tracer cost, so
the scene is traced unlit (saves ~2 min of setup per exec).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time


def run_one():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aic_tpu.content import atrium
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace import pallas_trace as pt

    rows = pt.GROUP[0]
    space = atrium()
    state = space.snapshot()
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

    all_variants = {
        "s8": dict(megakernel=True, substeps=8),
        "s8 macro2": dict(megakernel=True, substeps=8, macro=2),
        "s8 d2": dict(megakernel=True, substeps=8, domains=2),
        "s8 d4": dict(megakernel=True, substeps=8, domains=4),
        "s16": dict(megakernel=True, substeps=16),
        "s16 d2": dict(megakernel=True, substeps=16, domains=2),
    }
    sel = os.environ.get("AIC_PROBE_VARIANTS", "s8,s8 macro2").split(",")
    for name, kw in [(n, all_variants[n]) for n in sel]:
        try:
            f = lambda: pt.trace_rays_pallas(state, o, d, opts, **kw)[0]
            out = f()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = f()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3
            print(
                f"rows={rows} {name}: {dt*1e3:.1f} ms "
                f"{n_rays/dt/1e6:.2f} Mrays/s",
                flush=True,
            )
            sums = np.asarray(out).sum()
            print(f"  checksum {sums:.1f}", flush=True)
        except Exception as e:
            print(f"rows={rows} {name}: FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)


def main():
    if os.environ.get("AIC_PROBE_CHILD"):
        run_one()
        return
    for rows in sys.argv[1:] or ["8", "16", "32"]:
        env = dict(os.environ)
        env["AIC_TRACE_GROUP_ROWS"] = rows
        env["AIC_PROBE_CHILD"] = "1"
        subprocess.run([sys.executable, __file__], env=env, check=False)
        time.sleep(65)  # TPU claim cooldown between child processes


if __name__ == "__main__":
    main()
