import time, numpy as np, jax
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
from aic_tpu.content.template import TemplateParameters, build_universe
u = build_universe("demo-city", TemplateParameters(seed=0))
sp = u.spaces["world"]
for s in range(8):
    plan = u._tick_plan("world")
    t0 = time.perf_counter()
    u.step()
    print(f"step {s}: plan={'dev' if plan is not None else 'HOST'} "
          f"palette={sp.palette_len()} dt={time.perf_counter()-t0:.2f}", flush=True)
# steady-state timing with per-step device sync
times = []
for s in range(10):
    t0 = time.perf_counter()
    u.step()
    sync(u.states["world"].light)
    times.append(time.perf_counter() - t0)
print("synced step ms:", [round(t*1e3,1) for t in times], flush=True)
for k, v in u.profiler.spans.items():
    print("span", k, round(v.total_s*1000,1), flush=True)
