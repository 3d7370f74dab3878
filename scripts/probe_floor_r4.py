"""What exactly costs 4-5 us per fori_loop iteration in Mosaic kernels?
Variants: empty body / vector-op body / N scalar VMEM loads / scalar
SMEM loads / vector body + scalar load (overlap?)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4000
ROWS, LANES = 56, 1024

tbl = np.random.RandomState(0).randint(0, 100, size=(N, 8)).astype(np.int32)


def run(name, kernel, *inputs, in_specs):
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.float32)],
    ))
    try:
        out = f(*inputs)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(*inputs)
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / 3
        print(f"{name}: {dt/N*1e6:.2f} us/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


VMEM_SPEC = pl.BlockSpec(memory_space=pltpu.VMEM)
SMEM_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)
x = jnp.asarray(np.random.rand(ROWS, LANES), jnp.float32)

def k_empty(tbl_ref, x_ref, o_ref, acc):
    def body(i, s):
        return s
    s = jax.lax.fori_loop(0, N, body, jnp.float32(0))
    o_ref[:] = x_ref[:] + s
run("empty", k_empty, jnp.asarray(tbl), x, in_specs=[VMEM_SPEC, VMEM_SPEC])

def k_vec(tbl_ref, x_ref, o_ref, acc):
    def body(i, _):
        acc[:] = acc[:] * 1.0001 + x_ref[:]
        return 0
    acc[:] = jnp.zeros_like(acc)
    jax.lax.fori_loop(0, N, body, 0)
    o_ref[:] = acc[:]
run("vector-only (2 plane ops)", k_vec, jnp.asarray(tbl), x, in_specs=[VMEM_SPEC, VMEM_SPEC])

def make_scalar(n_loads):
    def k(tbl_ref, x_ref, o_ref, acc):
        def body(i, s):
            for j in range(n_loads):
                s = s + tbl_ref[i, j].astype(jnp.float32)
            return s
        s = jax.lax.fori_loop(0, N, body, jnp.float32(0))
        o_ref[:] = x_ref[:] + s
    return k
for n in (1, 2, 6):
    run(f"{n} scalar VMEM loads", make_scalar(n), jnp.asarray(tbl), x,
        in_specs=[VMEM_SPEC, VMEM_SPEC])

for n in (1, 6):
    run(f"{n} scalar SMEM loads", make_scalar(n), jnp.asarray(tbl), x,
        in_specs=[SMEM_SPEC, VMEM_SPEC])

def k_mix(tbl_ref, x_ref, o_ref, acc):
    def body(i, s):
        s = s + tbl_ref[i, 0].astype(jnp.float32)
        acc[:] = acc[:] * 1.0001 + x_ref[:]
        return s
    acc[:] = jnp.zeros_like(acc)
    s = jax.lax.fori_loop(0, N, body, jnp.float32(0))
    o_ref[:] = acc[:] + s
run("1 smem load + 2 plane ops", k_mix, jnp.asarray(tbl), x,
    in_specs=[SMEM_SPEC, VMEM_SPEC])

def k_mix8(tbl_ref, x_ref, o_ref, acc):
    """8-substep body: one scalar load + 2 plane ops per substep,
    loop iterations N//8 — does amortizing loop overhead help?"""
    def body(i, s):
        for j in range(8):
            s = s + tbl_ref[i * 8 + j, 0].astype(jnp.float32)
            acc[:] = acc[:] * 1.0001 + x_ref[:]
        return s
    acc[:] = jnp.zeros_like(acc)
    s = jax.lax.fori_loop(0, N // 8, body, jnp.float32(0))
    o_ref[:] = acc[:] + s
run("unroll8 (per substep)", k_mix8, jnp.asarray(tbl), x,
    in_specs=[SMEM_SPEC, VMEM_SPEC])
