import time, numpy as np, jax, jax.numpy as jnp
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
from aic_tpu.content.template import TemplateParameters, build_universe
from aic_tpu.light.update import light_update_round, relight_batch
u = build_universe("demo-city", TemplateParameters(seed=0))
st = u.states["world"]
B = 32
cubes = jnp.tile(jnp.asarray([[48, 10, 48]], jnp.int32), (B, 1))
valid = jnp.ones(B, bool)
f = jax.jit(lambda s, c, v: relight_batch(s, c, v))
out = f(st, cubes, valid); sync(out)
t0 = time.perf_counter()
for _ in range(10): out = f(st, cubes, valid)
sync(out)
print("relight_batch B=32:", (time.perf_counter()-t0)/10*1e3, "ms", flush=True)
g = jax.jit(lambda s: light_update_round(s, batch_size=32)[0].light)
out = g(st); sync(out)
t0 = time.perf_counter()
for _ in range(10): out = g(st)
sync(out)
print("light_update_round B=32:", (time.perf_counter()-t0)/10*1e3, "ms", flush=True)
# top_k cost alone
h = jax.jit(lambda d: jax.lax.top_k(d.reshape(-1).astype(jnp.int32), 32))
out = h(st.light_dirty); sync(out)
t0 = time.perf_counter()
for _ in range(20): out = h(st.light_dirty)
sync(out[0])
print("top_k 331k->32:", (time.perf_counter()-t0)/20*1e3, "ms", flush=True)
