import time, numpy as np, jax
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
from aic_tpu.content.testing import light_bench_space
from aic_tpu.light import build_relight_ctx
from aic_tpu.light.dense import _pallas_split, relight_all_pass, evaluate_light_dense
from aic_tpu.light.pallas_relight import vmem_estimate_bytes, relight_all_pass_pallas

state = light_bench_space().snapshot()
print("shape", state.contents.shape, "md", state.light_max_distance)
print("vmem_est", vmem_estimate_bytes(state.contents.shape)/2**20, "MiB")
ctx = build_relight_ctx(state)
t0=time.perf_counter(); split = _pallas_split(state, ctx); print("split", split, f"(probe {time.perf_counter()-t0:.1f}s)")
if split:
    f = jax.jit(lambda s,c: relight_all_pass_pallas(s,c,n_groups=split))
    out = f(state, ctx); sync(out)
    t0=time.perf_counter()
    for _ in range(5): out = f(state,ctx)
    sync(out)
    print("pallas pass ms", (time.perf_counter()-t0)/5*1e3)
g = jax.jit(relight_all_pass)
out = g(state, ctx); sync(out)
t0=time.perf_counter()
for _ in range(3): out = g(state,ctx)
sync(out)
print("xla pass ms", (time.perf_counter()-t0)/3*1e3)
t0=time.perf_counter()
lit, passes = evaluate_light_dense(state, ctx=ctx)
sync(lit.light)
print("evaluate_light_dense", time.perf_counter()-t0, "s passes", passes)
