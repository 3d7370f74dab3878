import time, numpy as np, jax
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
from aic_tpu.content.template import TemplateParameters, build_universe
t0=time.perf_counter()
u = build_universe("demo-city", TemplateParameters(seed=0))
print("build", time.perf_counter()-t0, flush=True)
for n, st in u.states.items():
    print(n, st.contents.shape, "md", st.light_max_distance, "dirty", int(np.asarray((st.light_dirty>0).sum())), flush=True)
for i in range(3):
    t0=time.perf_counter(); u.step(); print("warm step", time.perf_counter()-t0, flush=True)
u.profiler.spans.clear()
t0=time.perf_counter()
for i in range(5):
    u.step()
sync(next(iter(u.states.values())).light)
print("step avg ms", (time.perf_counter()-t0)/5*1e3, flush=True)
for k, v in u.profiler.spans.items():
    print("span", k, round(v.total_s*1000,1), "ms total", flush=True)
