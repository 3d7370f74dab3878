import time, dataclasses, numpy as np, jax, jax.numpy as jnp
def sync(x):
    jax.block_until_ready(x); return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])
def t(f, *a, n=10):
    out = f(*a); sync(out); t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    sync(out); return (time.perf_counter()-t0)/n*1e3
from aic_tpu.content.template import TemplateParameters, build_universe
from aic_tpu.light.update import relight_batch
from aic_tpu.math import lightpack, faces
u = build_universe("demo-city", TemplateParameters(seed=0))
st = u.states["world"]
size = st.contents.shape
K = 32

def sel_only(state):
    flat = state.light_dirty.reshape(-1)
    prio, fp = jax.lax.approx_max_k(flat.astype(jnp.float32), K, recall_target=0.9)
    return prio.sum() + fp.sum()
print("A select only:", t(jax.jit(sel_only), st), flush=True)

def sel_relight(state):
    flat = state.light_dirty.reshape(-1)
    prio, fp = jax.lax.approx_max_k(flat.astype(jnp.float32), K, recall_target=0.9)
    fp = fp.astype(jnp.int32)
    pos = jnp.stack([fp // (size[1]*size[2]), (fp // size[2]) % size[1], fp % size[2]], -1).astype(jnp.int32)
    return relight_batch(state, pos, prio > 0)
print("B select+relight:", t(jax.jit(sel_relight), st), flush=True)

def full_no_scatter(state):
    nl = sel_relight(state)
    return nl.sum()
print("C select+relight+reduce:", t(jax.jit(full_no_scatter), st), flush=True)

def diff_part(state):
    flat = state.light_dirty.reshape(-1)
    prio, fp = jax.lax.approx_max_k(flat.astype(jnp.float32), K, recall_target=0.9)
    fp = fp.astype(jnp.int32)
    pos = jnp.stack([fp // (size[1]*size[2]), (fp // size[2]) % size[1], fp % size[2]], -1).astype(jnp.int32)
    nl = relight_batch(state, pos, prio > 0)
    old = state.light[pos[:,0], pos[:,1], pos[:,2]]
    diff = lightpack.difference_priority(old, nl)
    light = state.light.at[pos[:,0],pos[:,1],pos[:,2]].set(jnp.where((prio>0)[:,None], nl, old))
    return light
print("D +old gather+diff+light scatter:", t(jax.jit(diff_part), st), flush=True)
from aic_tpu.light.update import light_update_round
print("E full round:", t(jax.jit(lambda s: light_update_round(s, batch_size=32)[0].light), st), flush=True)
