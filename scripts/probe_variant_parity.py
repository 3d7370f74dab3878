"""Interpret-mode parity of domains/macro kernel variants vs defaults."""
import numpy as np, jax.numpy as jnp
import jax
jax.config.update("jax_platforms", "cpu")
from aic_tpu.content import cornell_box
from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
from aic_tpu.raytrace.pallas_trace import trace_rays_pallas
state = cornell_box(32).snapshot()
opts = GraphicsOptions(lighting_display="flat", fog="none")
cam = Camera(opts, Viewport(64, 64))
cam.look_at(np.array([0.5, 0.5, 1.6]) * 32, (16,) * 3)
o, d = cam.pixel_rays()
base = trace_rays_pallas(state, o, d, opts, interpret=True)
for dom, mac in ((2, 1), (1, 2), (4, 2)):
    v = trace_rays_pallas(state, o, d, opts, interpret=True, domains=dom, macro=mac)
    err = float(jnp.abs(v[0] - base[0]).max())
    print(f"domains={dom} macro={mac}: max|dL|={err}", flush=True)
