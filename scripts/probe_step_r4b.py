"""Demo-city step: steady-state timing after the palette stabilizes
(Become chains intern their frames over the first cycle), plus per-phase
breakdown and per-step wall times to spot recompiles."""
import sys
import time

sys.stdout.reconfigure(line_buffering=True)

import jax
import numpy as np

from aic_tpu.content.template import TemplateParameters, build_universe

print("devices:", jax.devices())
t0 = time.perf_counter()
u = build_universe("demo-city", TemplateParameters(seed=0))
print(f"build demo-city: {time.perf_counter()-t0:.1f}s")
name = next(iter(u.states))

# Warm until the palette stops growing (all Become frames interned).
prev_pal = -1
for i in range(64):
    u.step()
    pal = u.spaces[name].palette_len()
    if i % 16 == 15:
        print(f"  warm tick {i}: palette {pal}")
u.profiler.spans.clear()

print("plan compiled:", u._tick_plan(name) is not None)

times = []
for i in range(20):
    t0 = time.perf_counter()
    u.step()
    # NO sync — measure dispatch; sync at the end.
    times.append(time.perf_counter() - t0)
np.asarray(u.states[name].light[0, 0, 0])
total = sum(times)
print(f"20 async steps wall: {total:.3f}s -> {total/20*1e3:.1f} ms/step")
print("per-step ms:", [round(t * 1e3, 1) for t in times])
print(
    "profiler per-step ms:",
    {k: round(v.total_s * 1000 / 20, 1) for k, v in u.profiler.spans.items()},
)

# Fully synced steps (worst case):
times = []
for i in range(10):
    t0 = time.perf_counter()
    u.step()
    np.asarray(u.states[name].light[0, 0, 0])
    times.append(time.perf_counter() - t0)
print(f"10 synced steps: {sum(times)/10*1e3:.1f} ms/step")

# Physics in isolation.
from aic_tpu.physics.body import step_bodies

if u.bodies is not None:
    st = u.states[name]
    g = u.spaces[name].physics.gravity
    b, info = step_bodies(st, u.bodies, 1 / 60, g)
    np.asarray(b.position)
    t0 = time.perf_counter()
    for _ in range(10):
        b, info = step_bodies(st, b, 1 / 60, g)
    np.asarray(b.position)
    print(f"step_bodies: {(time.perf_counter()-t0)/10*1e3:.1f} ms")
