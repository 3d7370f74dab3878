"""Bisect Mosaic support for the new bf16 relight kernel's primitives:
bf16 VMEM refs, 16-aligned dynamic row slice, pltpu.roll on bf16,
scalar-bool select shift, bf16 scratch row partitions, f32 out accumulate."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 64, 1024
x = jnp.asarray(np.random.RandomState(0).rand(6 * ROWS + 32, LANES), jnp.bfloat16)
tbl = jnp.asarray(np.random.RandomState(1).randint(0, 60, size=(16, 8)), jnp.int32)


def run(name, kernel, *inputs, scratch=()):
    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            scratch_shapes=list(scratch),
        ))
        out = f(*inputs)
        print(f"{name}: OK {np.asarray(out)[0, :2]}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}", flush=True)


def k_basic(x_ref, o_ref):
    o_ref[:] = x_ref[0:ROWS, :].astype(jnp.float32)
run("bf16 read + f32 store", k_basic, x)


def k_roll_static(x_ref, o_ref):
    v = pltpu.roll(x_ref[0:ROWS, :], 5, axis=1)
    o_ref[:] = v.astype(jnp.float32)
run("bf16 static lane roll", k_roll_static, x)


def k_roll_dyn(tbl_ref, x_ref, o_ref):
    s = tbl_ref[0, 0]
    v = pltpu.roll(x_ref[0:ROWS, :], s, axis=1)
    o_ref[:] = v.astype(jnp.float32)
run("bf16 dynamic lane roll", k_roll_dyn, tbl, x)


def k_dynslice(tbl_ref, x_ref, o_ref):
    d = tbl_ref[0, 1]
    start = pl.multiple_of((d >> 4) << 4, 16)
    v = x_ref[pl.ds(start, ROWS), :]
    o_ref[:] = v.astype(jnp.float32)
run("bf16 16-aligned dyn row slice", k_dynslice, tbl, x)


def k_selshift(tbl_ref, x_ref, o_ref):
    d = tbl_ref[0, 1]
    start = pl.multiple_of((d >> 4) << 4, 16)
    dxr = d - ((d >> 4) << 4)
    v = x_ref[pl.ds(start, ROWS + 16), :]
    v = jnp.where((dxr & 8) != 0, v[8 : ROWS + 16, :], v[0 : ROWS + 8, :])
    v = jnp.where((dxr & 4) != 0, v[4 : ROWS + 8, :], v[0 : ROWS + 4, :])
    v = jnp.where((dxr & 2) != 0, v[2 : ROWS + 4, :], v[0 : ROWS + 2, :])
    v = jnp.where((dxr & 1) != 0, v[1 : ROWS + 2, :], v[0 : ROWS + 1, :])
    o_ref[:] = v[0:ROWS, :].astype(jnp.float32)
run("bf16 4-stage select shift", k_selshift, tbl, x)


def k_combo(tbl_ref, x_ref, o_ref, alpha, rwb, prevb):
    o_ref[:] = jnp.zeros_like(o_ref)
    alpha[:] = jnp.zeros_like(alpha)
    rwb[:] = jnp.zeros_like(rwb)
    prevb[:] = x_ref[0 : 2 * ROWS, :]

    def body(p, _):
        d = tbl_ref[p, 1]
        ls = tbl_ref[p, 2]
        roll = jnp.where(ls > 0, LANES - ls, -ls)
        start = pl.multiple_of((d >> 4) << 4, 16)
        dxr = d - ((d >> 4) << 4)
        v = x_ref[pl.ds(start, ROWS + 16), :]
        v = pltpu.roll(v, roll, axis=1)
        v = jnp.where((dxr & 8) != 0, v[8 : ROWS + 16, :], v[0 : ROWS + 8, :])
        v = jnp.where((dxr & 4) != 0, v[4 : ROWS + 8, :], v[0 : ROWS + 4, :])
        v = jnp.where((dxr & 2) != 0, v[2 : ROWS + 4, :], v[0 : ROWS + 2, :])
        v = jnp.where((dxr & 1) != 0, v[1 : ROWS + 2, :], v[0 : ROWS + 1, :])
        blk = v[0:ROWS, :]
        pv = prevb[0:ROWS, :]
        a = alpha[0:ROWS, :]
        c = (blk * pv).astype(jnp.float32) * a
        o_ref[:] = o_ref[:] + c
        alpha[0:ROWS, :] = a * (1.0 - blk.astype(jnp.float32))
        prevb[0:ROWS, :] = blk
        return 0

    jax.lax.fori_loop(0, 16, body, 0)
run(
    "combo loop",
    k_combo,
    tbl,
    x,
    scratch=[
        pltpu.VMEM((ROWS, LANES), jnp.float32),
        pltpu.VMEM((ROWS, LANES), jnp.bfloat16),
        pltpu.VMEM((2 * ROWS, LANES), jnp.bfloat16),
    ],
)
