"""Round-5 probe: relight fetch strategies, microbenched at kernel shape.

One kernel iterates 1000 fetch+accumulate steps over a [400, 1024] bf16
stack (the em_light fetch shape at light_bench size) with per-iteration
dynamic (row, lane) shifts from a table. Variants:
- sel4: 16-aligned dslice + lane roll + 4-stage static select (current)
- subroll: dslice + packed-i32 sublane roll (even part) + scratch
  materialize + lane roll + 1 odd-row select
- subroll_noscratch: same without the scratch materialization (checks
  whether the bitcast alone defeats the roll-compose miscompile)
Each variant prints a checksum; agreement across variants = correct.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp16 = 64
    nrows = 6 * xp16  # 384
    G = xp16 + 16
    R = nrows + 2 * G  # stack with guards
    lanes = 1024
    n_iters = 1000

    rng = np.random.default_rng(0)
    stack = rng.standard_normal((R, lanes)).astype(jnp.bfloat16)
    tbl = np.zeros((n_iters, 8), np.int32)
    tbl[:, 0] = rng.integers(0, 48, n_iters)  # dx row shift
    tbl[:, 1] = rng.integers(0, lanes, n_iters)  # lane shift (positive)

    def make_kernel(variant):
        def kernel(tbl_ref, x_ref, o_ref, scratch):
            o_ref[:] = jnp.zeros_like(o_ref)

            def body(p, _):
                dx = tbl_ref[p, 0]
                lsh = tbl_ref[p, 1]
                dx16 = (dx >> 4) << 4
                dxr = dx - dx16
                start = pl.multiple_of(G + dx16, 16)
                if variant == "sel4":
                    v = x_ref[pl.ds(start, nrows + 16), :]
                    w = pltpu.bitcast(v, jnp.int32)
                    w = pltpu.roll(w, lsh, axis=1)
                    v = pltpu.bitcast(w, jnp.bfloat16)
                    v = jnp.where((dxr & 8) != 0, v[8 : nrows + 16], v[0 : nrows + 8])
                    v = jnp.where((dxr & 4) != 0, v[4 : nrows + 8], v[0 : nrows + 4])
                    v = jnp.where((dxr & 2) != 0, v[2 : nrows + 4], v[0 : nrows + 2])
                    v = jnp.where((dxr & 1) != 0, v[1 : nrows + 2], v[0 : nrows + 1])
                    v = v[0:nrows]
                else:
                    v = x_ref[pl.ds(start, nrows + 16), :]
                    w = pltpu.bitcast(v, jnp.int32)  # [(nrows+16)/2, lanes]
                    half = (nrows + 16) // 2
                    ev = dxr >> 1
                    w = pltpu.roll(w, (half - ev) % half, axis=0)
                    if variant == "subroll":
                        scratch[0:half, :] = w
                        w = scratch[0:half, :]
                    w = pltpu.roll(w, lsh, axis=1)
                    v = pltpu.bitcast(w, jnp.bfloat16)
                    v = jnp.where(
                        (dxr & 1) != 0, v[1 : nrows + 1], v[0:nrows]
                    )
                o_ref[:] = o_ref[:] + v.astype(jnp.float32)
                return 0

            jax.lax.fori_loop(0, n_iters, body, 0)

        return kernel

    for variant in ("sel4", "subroll", "subroll_noscratch"):
        try:
            f = pl.pallas_call(
                make_kernel(variant),
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nrows, lanes), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM(((nrows + 16) // 2, lanes), jnp.int32)
                ],
            )
            g = jax.jit(lambda t, x: f(t, x))
            out = np.asarray(g(jnp.asarray(tbl), jnp.asarray(stack)))
            t0 = time.perf_counter()
            out = np.asarray(g(jnp.asarray(tbl), jnp.asarray(stack)))
            dt = time.perf_counter() - t0
            print(
                f"{variant}: {dt*1e3:.1f} ms /{n_iters} iters "
                f"({dt/n_iters*1e6:.2f} us/fetch) checksum={out.sum():.1f}",
                flush=True,
            )
        except Exception as e:
            print(f"{variant}: FAIL {type(e).__name__}: {e}"[:250], flush=True)


if __name__ == "__main__":
    main()
