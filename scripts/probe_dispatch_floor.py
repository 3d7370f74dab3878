import time, numpy as np, jax, jax.numpy as jnp
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8, 128), jnp.float32)
x = f(x); sync(x)
t0 = time.perf_counter()
for _ in range(100): x = f(x)
sync(x)
print("tiny chained dispatch ms:", (time.perf_counter()-t0)/100*1e3, flush=True)
# medium program: volume remap like the tick base
vol = jnp.zeros((96,28,96), jnp.uint16)
tbl = jnp.arange(256, dtype=jnp.int32)
g = jax.jit(lambda v: (jnp.take(tbl, v.astype(jnp.int32)) != v.astype(jnp.int32)).sum())
y = g(vol); sync(y)
t0 = time.perf_counter()
for _ in range(100): y = g(vol)
sync(y)
print("vol remap dispatch ms:", (time.perf_counter()-t0)/100*1e3, flush=True)
