import time, numpy as np, jax, jax.numpy as jnp
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
def t(f, *a, n=20):
    out = f(*a); sync(out); t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    sync(out); return (time.perf_counter()-t0)/n*1e3
X,Y,Z = 96,28,96
K = 32
light = jnp.zeros((X,Y,Z,4), jnp.uint8)
dirty = jnp.zeros((X,Y,Z), jnp.uint8)
pos = jnp.tile(jnp.asarray([[48,10,48]], jnp.int32), (K,1))
vals = jnp.ones((K,4), jnp.uint8)
f3d = jax.jit(lambda L,p,v: L.at[p[:,0],p[:,1],p[:,2]].set(v))
print("3d u8x4 set:", t(f3d, light, pos, vals), flush=True)
lu32 = jnp.zeros((X,Y,Z), jnp.uint32)
v32 = jnp.ones((K,), jnp.uint32)
f3d32 = jax.jit(lambda L,p,v: L.at[p[:,0],p[:,1],p[:,2]].set(v))
print("3d u32 set:", t(f3d32, lu32, pos, v32), flush=True)
flat = jnp.zeros((X*Y*Z,), jnp.uint32)
fp = jnp.full((K,), 17, jnp.int32)
f1d = jax.jit(lambda L,p,v: L.at[p].set(v))
print("1d u32 set:", t(f1d, flat, fp, v32), flush=True)
flat8 = jnp.zeros((X*Y*Z,), jnp.uint8)
v8 = jnp.ones((K,), jnp.uint8)
print("1d u8 set:", t(f1d, flat8, fp, v8), flush=True)
fmax = jax.jit(lambda L,p,v: L.at[p].max(v))
print("1d u8 max (6K rows):", t(fmax, flat8, jnp.tile(fp,6), jnp.tile(v8,6)), flush=True)
fmax3 = jax.jit(lambda L,p,v: L.at[p[:,0],p[:,1],p[:,2]].max(v))
print("3d u8 max (6K rows):", t(fmax3, dirty, jnp.tile(pos,(6,1)), jnp.tile(v8,6)), flush=True)
# gather [K] rows from 3D
fg = jax.jit(lambda L,p: L[p[:,0],p[:,1],p[:,2]])
print("3d u8x4 gather:", t(fg, light, pos), flush=True)
# approx vs exact top_k
d = jnp.zeros((X*Y*Z,), jnp.uint8).at[1000].set(5)
fa = jax.jit(lambda d: jax.lax.approx_max_k(d.astype(jnp.float32), 32, recall_target=0.9))
print("approx_max_k:", t(fa, d), flush=True)
fe = jax.jit(lambda d: jax.lax.top_k(d.astype(jnp.int32), 32))
print("exact top_k:", t(fe, d), flush=True)
