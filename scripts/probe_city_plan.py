import time, numpy as np, jax
from aic_tpu.content.template import TemplateParameters, build_universe
u = build_universe("demo-city", TemplateParameters(seed=0))
sp = u.spaces["world"]
print("palette_len", sp.palette_len(), flush=True)
acts = []
for i in range(sp.palette_len()):
    att = sp.evaluated(i).attributes
    if att.tick_action is not None:
        acts.append((i, type(att.tick_action).__name__, att.tick_period))
print("tick actions:", acts, flush=True)
for s in range(12):
    plan = u._tick_plan("world")
    t0 = time.perf_counter()
    u.step()
    print(f"step {s}: plan={'dev' if plan is not None else 'HOST'} "
          f"palette={sp.palette_len()} dt={time.perf_counter()-t0:.2f}", flush=True)
