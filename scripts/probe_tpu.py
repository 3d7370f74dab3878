"""TPU microbenchmarks backing round-2 kernel decisions (see PERF.md).

1. Row-gather cost vs row width (64 / 128 / 256 / 512) — does the
   "cost per row, independent of width" rule hold past 128 lanes?
   Decides 4^3 vs 8^3 traversal bricks.
2. Batched shifted-window gather (vmapped dynamic_slice of a padded
   volume) — the lane-parallel relight fetch. Cost per (lane, iter).
3. Pallas: take_along_axis and one-hot extraction inside a kernel
   (vreg-resident brick extract) — the traversal substep candidate.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, *args, n=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def probe_row_gathers():
    print("== row gathers: chained in fori_loop, 65536 indices")
    n_idx = 65536
    n_rows = 40000
    for width in (64, 128, 256, 512):
        table = jnp.arange(n_rows * width, dtype=jnp.int32).reshape(n_rows, width)
        idx0 = jnp.arange(n_idx, dtype=jnp.int32) % n_rows

        @jax.jit
        def chain(table, idx0, _w=width):
            def body(i, carry):
                idx, acc = carry
                rows = jnp.take(table, idx, axis=0)
                acc = acc + rows[:, 0]
                idx = (idx + rows[:, 1] + 1) % n_rows
                return idx, acc

            idx, acc = jax.lax.fori_loop(
                0, 20, body, (idx0, jnp.zeros(n_idx, jnp.int32))
            )
            return acc

        dt = timeit(chain, table, idx0)
        rate = n_idx * 20 / dt
        print(f"  width {width:4d}: {dt*1e3:7.2f} ms /20 iters -> {rate/1e6:6.1f} M rows/s")


def probe_window_gathers():
    print("== batched shifted-window gathers (lane relight fetch)")
    for size in ((32, 32, 32), (54, 16, 54)):
        pad = 16
        vol = jnp.ones(
            (size[0] + 2 * pad, size[1] + 2 * pad, size[2] + 2 * pad, 8),
            jnp.bfloat16,
        )
        for lanes in (8, 32):
            offs = jnp.asarray(
                np.random.randint(0, 2 * pad, size=(lanes, 3)), jnp.int32
            )

            @jax.jit
            def fetch(vol, offs):
                def one(off):
                    return jax.lax.dynamic_slice(
                        vol, (off[0], off[1], off[2], 0), size + (8,)
                    )

                def body(i, acc):
                    w = jax.vmap(one)(offs + i % 3)
                    return acc + w.astype(jnp.float32).sum(-1)

                return jax.lax.fori_loop(
                    0, 20, body, jnp.zeros((lanes,) + size, jnp.float32)
                )

            dt = timeit(fetch, vol, offs)
            per_iter = dt / 20
            cells = int(np.prod(size))
            print(
                f"  size {size} lanes {lanes:2d}: {per_iter*1e6:8.1f} us/iter "
                f"({per_iter/lanes*1e6:6.2f} us/lane, "
                f"{lanes*cells*16/per_iter/1e9:6.1f} GB/s)"
            )


def probe_pallas_extract():
    print("== pallas: brick extract in-kernel")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 65536
    rows = jnp.asarray(np.random.randint(0, 1 << 20, (n, 64)), jnp.int32)
    local = jnp.asarray(np.random.randint(0, 64, (n,)), jnp.int32)

    # one-hot extract: rays along lanes, cells along sublanes.
    def kernel(rows_ref, local_ref, out_ref):
        r = rows_ref[:]  # [64, BLK] (cells as sublanes)
        loc = local_ref[:]  # [1, BLK]
        iota = jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
        out_ref[:] = jnp.sum(jnp.where(iota == loc, r, 0), axis=0, keepdims=True)

    BLK = 1024

    @jax.jit
    def extract(rows, local):
        rt = rows.T.reshape(64, n)  # cells as leading axis
        return pl.pallas_call(
            kernel,
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((64, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        )(rt, local.reshape(1, n))

    try:
        dt = timeit(extract, rows, local)
        print(f"  one-hot extract [65536 rays x 64]: {dt*1e6:.1f} us")
    except Exception as e:  # noqa: BLE001
        print(f"  one-hot extract failed: {type(e).__name__}: {str(e)[:300]}")

    # XLA comparison
    @jax.jit
    def extract_xla(rows, local):
        iota = jnp.arange(64, dtype=jnp.int32)
        return (rows * (iota[None, :] == local[:, None])).sum(-1)

    dt = timeit(extract_xla, rows, local)
    print(f"  XLA one-hot extract:                 {dt*1e6:.1f} us")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    probe_row_gathers()
    probe_window_gathers()
    probe_pallas_extract()
