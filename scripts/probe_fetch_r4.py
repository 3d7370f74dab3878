"""Probe: per-pair x-remainder fetch strategies for the relight kernel.

Current kernel does an 8-way masked remainder sum per fetch (~10 us/pair
measured via the 284 ms light_bench pass). Candidates:
  A) 8-way masked sum (baseline, as shipped)
  B) pl.when-predicated copy into scratch (one branch executes)
  C) jax.lax.switch over 8 static slices
Each probe loops N_PAIRS times doing one 5-plane fetch + a cheap use.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XP8, LANES = 56, 1024
NROWS = 5 * XP8  # 5-plane fetch like the face fetch
N_PAIRS = 2000

stack = jnp.asarray(
    np.random.RandomState(0).rand(XP8 + 8 + 30 * XP8 + XP8 + 8, LANES), jnp.float32
)
tbl = jnp.asarray(
    np.random.RandomState(1).randint(0, 48, size=(N_PAIRS, 8)), jnp.int32
)  # col0: dx in [0,48)


def make(kind):
    def kernel(tbl_ref, stack_ref, out_ref, acc, scr):
        def body(p, _):
            dx = tbl_ref[p, 0]
            dx8 = (dx >> 3) << 3
            dxr = dx - dx8
            start = pl.multiple_of(XP8 + 8 + dx8, 8)
            if kind == "masked8":
                wide = stack_ref[pl.ds(start, NROWS + 8), :]
                a = jnp.zeros((NROWS, LANES), jnp.float32)
                for k in range(8):
                    a = a + jnp.where(dxr == k, wide[k : k + NROWS, :], 0.0)
                acc[:] = acc[:] + a
            elif kind == "when8":
                for k in range(8):
                    @pl.when(dxr == k)
                    def _(k=k):
                        scr[:] = stack_ref[pl.ds(start + k, NROWS), :]
                acc[:] = acc[:] + scr[:]
            elif kind == "switch8":
                wide = stack_ref[pl.ds(start, NROWS + 8), :]
                a = jax.lax.switch(
                    dxr, [lambda w=wide, k=k: w[k : k + NROWS, :] for k in range(8)]
                )
                acc[:] = acc[:] + a
            return 0

        acc[:] = jnp.zeros_like(acc)
        jax.lax.fori_loop(0, N_PAIRS, body, 0)
        out_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NROWS, LANES), jnp.float32),
            pltpu.VMEM((NROWS, LANES), jnp.float32),
        ],
    )


for kind in ("masked8", "when8", "switch8"):
    try:
        f = jax.jit(lambda t, s, k=kind: make(k)(t, s))
        out = f(tbl, stack)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(tbl, stack)
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / 3
        print(f"{kind}: {dt/N_PAIRS*1e6:.2f} us/pair", flush=True)
    except Exception as e:
        print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

# loop floor with unrolling
for unroll in (1, 2, 4):
    def kernel(tbl_ref, stack_ref, out_ref, acc, scr):
        def body(i, s):
            for j in range(unroll):
                p = i * unroll + j
                dx = tbl_ref[p, 0]
                s = s + dx.astype(jnp.float32)
            return s
        total = jax.lax.fori_loop(0, N_PAIRS // unroll, body, jnp.float32(0))
        out_ref[:] = jnp.full((NROWS, LANES), total)
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NROWS, LANES), jnp.float32),
                        pltpu.VMEM((NROWS, LANES), jnp.float32)],
    ))
    out = f(tbl, stack)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(tbl, stack)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / 3
    print(f"empty-ish loop unroll={unroll}: {dt/N_PAIRS*1e6:.2f} us/pair", flush=True)
