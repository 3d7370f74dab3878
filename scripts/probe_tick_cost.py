import time, numpy as np, jax
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
from aic_tpu.content.template import TemplateParameters, build_universe
from aic_tpu.universe.device_step import device_tick
u = build_universe("demo-city", TemplateParameters(seed=0))
plan = u._tick_plan("world")
st = u.states["world"]
print("palette", u.spaces["world"].palette_len(), "state", st.contents.shape, flush=True)
for rounds, batch in ((0,32),(1,32),(2,32),(1,64),(1,128),(2,256)):
    f = jax.jit(lambda s, t: device_tick(s, plan, t, light_rounds=rounds, light_batch=batch)[0].light)
    out = f(st, 6); sync(out)   # tick=6 fires the period-6 action (worst case)
    t0 = time.perf_counter()
    for i in range(5): out = f(st, 6)
    sync(out)
    fire_ms = (time.perf_counter()-t0)/5*1e3
    out = f(st, 1); sync(out)
    t0 = time.perf_counter()
    for i in range(5): out = f(st, 1)
    sync(out)
    idle_ms = (time.perf_counter()-t0)/5*1e3
    print(f"rounds={rounds} batch={batch}: fire={fire_ms:.1f} ms idle={idle_ms:.1f} ms", flush=True)
