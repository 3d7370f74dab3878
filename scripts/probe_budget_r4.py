"""Per-component device timing for the demo-city step at md=30:
queue rounds at several batch sizes, fused device_tick at 0 rounds,
physics, and one dense Jacobi pass on the city volume."""
import sys
import time

sys.stdout.reconfigure(line_buffering=True)

import jax
import numpy as np

from aic_tpu.content.template import TemplateParameters, build_universe
from aic_tpu.light.update import light_update_round
from aic_tpu.light.dense import build_relight_ctx, relight_all_pass

print("devices:", jax.devices())
t0 = time.perf_counter()
u = build_universe("demo-city", TemplateParameters(seed=0))
print(f"build demo-city: {time.perf_counter()-t0:.1f}s")
name = next(iter(u.states))
for i in range(64):
    u.step()
st = u.states[name]
print("volume:", st.contents.shape, "md:", st.light_max_distance)
print("dirty now:", int((st.light_dirty > 0).sum()))


def timeit(f, n=5):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


for b in (32, 64, 128, 256):
    dt = timeit(lambda: light_update_round(st, batch_size=b)[0].light)
    print(f"light_update_round b={b}: {dt*1e3:.1f} ms")

from aic_tpu.universe.device_step import device_tick

plan = u._tick_plan(name)
dt = timeit(lambda: device_tick(st, plan, 7, light_rounds=0, light_batch=256)[0].contents)
print(f"device_tick rounds=0: {dt*1e3:.1f} ms")
dt = timeit(lambda: device_tick(st, plan, 7, light_rounds=1, light_batch=256)[0].contents)
print(f"device_tick rounds=1 b=256: {dt*1e3:.1f} ms")

from aic_tpu.physics.body import step_bodies

if u.bodies is not None:
    g = u.spaces[name].physics.gravity
    dt = timeit(lambda: step_bodies(st, u.bodies, 1 / 60, g)[0])
    print(f"step_bodies: {dt*1e3:.1f} ms (n={u.bodies.position.shape[0]} bodies)")

# Dense pass cost on this volume.
ctx = build_relight_ctx(st)
dt = timeit(lambda: relight_all_pass(st, ctx), n=3)
print(f"relight_all_pass (dense XLA, full volume): {dt*1e3:.1f} ms")
