import time, numpy as np, jax
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
from aic_tpu.content.template import TemplateParameters, build_universe
from aic_tpu.universe.device_step import device_tick
u = build_universe("demo-city", TemplateParameters(seed=0))
plan = u._tick_plan("world")
st = u.states["world"]
for rounds, batch in ((1,16),(1,32)):
    f = jax.jit(lambda s, t: device_tick(s, plan, t, light_rounds=rounds, light_batch=batch)[0])
    cur = f(st, 6); sync(cur.light)
    # pipelined: chain state through 30 dispatches, one final sync
    t0 = time.perf_counter()
    cur2 = cur
    for i in range(30):
        cur2 = f(cur2, i)
    sync(cur2.light)
    print(f"rounds={rounds} batch={batch}: pipelined {(time.perf_counter()-t0)/30*1e3:.1f} ms/step", flush=True)
