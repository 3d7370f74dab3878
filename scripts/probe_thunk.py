import time, numpy as np, jax, jax.numpy as jnp
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
def t(f, *a, n=20):
    out = f(*a); sync(out); t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    sync(out); return (time.perf_counter()-t0)/n*1e3
X,Y,Z,K = 96,28,96,32
flat8 = jnp.zeros((X*Y*Z,), jnp.uint8)
fp = jnp.full((K,), 17, jnp.int32)
v8 = jnp.ones((K,), jnp.uint8)
f1d = jax.jit(lambda L,p,v: L.at[p].set(v))
print("top-level 1d u8 set:", t(f1d, flat8, fp, v8), flush=True)
def wrapped(L,p,v):
    return jax.lax.fori_loop(0, 1, lambda i, L: L.at[p].set(v), L)
fw = jax.jit(wrapped)
print("fori-wrapped 1d u8 set:", t(fw, flat8, fp, v8), flush=True)
def wrapped5(L,p,v):
    def body(i, L):
        L = L.at[p].set(v)
        L = L.at[p+1].max(v)
        g = L[p]
        L = L.at[p+2].set(g)
        L = L.at[p+3].max(g)
        return L
    return jax.lax.fori_loop(0, 1, body, L)
fw5 = jax.jit(wrapped5)
print("fori-wrapped 5 scatter/gather:", t(fw5, flat8, fp, v8), flush=True)
def top5(L,p,v):
    L = L.at[p].set(v)
    L = L.at[p+1].max(v)
    g = L[p]
    L = L.at[p+2].set(g)
    L = L.at[p+3].max(g)
    return L
ft5 = jax.jit(top5)
print("top-level 5 scatter/gather:", t(ft5, flat8, fp, v8), flush=True)
