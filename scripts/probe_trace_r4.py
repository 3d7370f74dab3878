"""Atrium 1080p tracer knob sweep on the real chip: substeps,
kernel_iters, and a kernel-iteration count census."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aic_tpu.content import atrium
from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
from aic_tpu.raytrace.pallas_trace import trace_rays_pallas

space = atrium()
state = space.snapshot()
from aic_tpu.light.dense import evaluate_light_dense

state, _ = evaluate_light_dense(state)

opts = GraphicsOptions(
    lighting_display="smoothstep", fog="none", transparency="surface"
)
W, H = 1920, 1080
cam = Camera(opts, Viewport(W, H))
size = np.asarray(state.contents.shape, np.float64)
center = size * 0.5
eye = (size[0] * 0.5, size[1] * 0.62, size[2] * 0.95)
cam.look_at(eye, center)
o, d = cam.pixel_rays()
o = jnp.asarray(o)
d = jnp.asarray(d)

for substeps, kit, phases in (
    (4, 48, 4),
    (8, 48, 4),
    (8, 96, 4),
    (16, 96, 4),
    (8, 192, 4),
    (4, 48, 2),
    (8, 96, 2),
):
    try:
        lt = trace_rays_pallas(
            state, o, d, opts, substeps=substeps, kernel_iters=kit,
            phases=phases,
        )
        np.asarray(lt[0][0, 0])
        t0 = time.perf_counter()
        for _ in range(3):
            lt = trace_rays_pallas(
                state, o, d, opts, substeps=substeps, kernel_iters=kit,
                phases=phases,
            )
        np.asarray(lt[0][0, 0])
        dt = (time.perf_counter() - t0) / 3
        print(
            f"substeps={substeps} iters={kit} phases={phases}: "
            f"{dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s",
            flush=True,
        )
    except Exception as e:
        print(f"substeps={substeps} iters={kit}: FAIL {str(e)[:120]}", flush=True)
