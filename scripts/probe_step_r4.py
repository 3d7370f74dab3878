"""Round-4 step-loop probe: where do demo-city's 4.7 s/step go?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aic_tpu.content.template import TemplateParameters, build_universe
from aic_tpu.light.update import light_update_round

print("devices:", jax.devices())

# Dispatch overhead: a trivial jitted op, timed per call.
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8, 128))
np.asarray(f(x))
t0 = time.perf_counter()
N = 50
for _ in range(N):
    x = f(x)
np.asarray(x)
print(f"dispatch+sync per trivial call: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

t0 = time.perf_counter()
u = build_universe("demo-city", TemplateParameters(seed=0))
print(f"build demo-city: {time.perf_counter()-t0:.1f}s")
name = next(iter(u.states))
st = u.states[name]
print("space size:", st.contents.shape, "palette:", st.tables.padded_palette_size)
print("dirty now:", int((st.light_dirty > 0).sum()))

for _ in range(3):
    u.step()

u.profiler.spans.clear() if hasattr(u.profiler, "spans") else None
t0 = time.perf_counter()
for _ in range(10):
    u.step()
np.asarray(next(iter(u.states.values())).light[0, 0, 0])
print(f"step: {(time.perf_counter()-t0)/10*1e3:.1f} ms avg")
print("profiler:", {k: round(v.total_s * 1000 / 10, 1) for k, v in u.profiler.spans.items()})

# Isolate light_update_round cost at two batch sizes.
for bs in (64, 256):
    st2, stats = light_update_round(st, batch_size=bs)
    np.asarray(st2.light[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        st2, stats = light_update_round(st, batch_size=bs)
    np.asarray(st2.light[0, 0, 0])
    print(f"light_update_round b={bs}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

# Isolate tick-action host scan.
t0 = time.perf_counter()
for _ in range(5):
    n = u._run_tick_actions(name, type("T", (), {"ticks": u.clock.ticks})())
t1 = (time.perf_counter() - t0) / 5
print(f"_run_tick_actions: {t1*1e3:.1f} ms, edits={n}")
print("tick action index sizes:", {k: len(v) for k, v in u._tick_action_index.items()})
