"""Probe: batched shifted-3D-window fetch as FLAT contiguous 1-D slices.

A 3-D window shift (dx,dy,dz) of a padded volume equals a single flat
offset dx*Yp*Zp + dy*Zp + dz into the flattened array, read contiguously
for vol-flat elements (row-carry positions land in the padding, where
values are never consumed as in-bounds cubes... they ARE consumed as
shifted values — but identical to the 3D slice because flat index math
carries exactly). Compare vs the vmapped 3-D dynamic_slice gather.
"""

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


def main():
    print(f"backend={jax.default_backend()}")
    for size in ((32, 32, 32), (54, 16, 54)):
        pad = 16
        ps = tuple(s + 2 * pad for s in size)
        vol = jnp.ones(ps + (8,), jnp.bfloat16)
        flat = vol.reshape(-1, 8)
        n_out = int(np.prod(size))
        ypzp = ps[1] * ps[2]
        zp = ps[2]
        for lanes in (8, 32):
            offs = jnp.asarray(
                np.random.randint(0, 2 * pad, size=(lanes, 3)), jnp.int32
            )

            @jax.jit
            def fetch_flat(flat, offs):
                def one(off):
                    fo = off[0] * ypzp + off[1] * zp + off[2]
                    return jax.lax.dynamic_slice(
                        flat, (fo, 0), (n_out + 0, 8)
                    )

                def body(i, acc):
                    w = jax.vmap(one)(offs + i % 3)
                    return acc + w.astype(jnp.float32).sum(-1)

                return jax.lax.fori_loop(
                    0, 20, body, jnp.zeros((lanes, n_out), jnp.float32)
                )

            dt = timeit(fetch_flat, flat, offs) / 20
            print(
                f"  flat size {size} lanes {lanes:2d}: {dt*1e6:8.1f} us/iter "
                f"({dt/lanes*1e6:6.2f} us/lane, "
                f"{lanes*n_out*16/dt/1e9:6.1f} GB/s)"
            )

            # Variant: lanes unrolled as separate dynamic_slices (no vmap).
            @jax.jit
            def fetch_unroll(flat, offs):
                def body(i, acc):
                    o2 = offs + i % 3
                    ws = []
                    for l in range(lanes):
                        fo = o2[l, 0] * ypzp + o2[l, 1] * zp + o2[l, 2]
                        ws.append(jax.lax.dynamic_slice(flat, (fo, 0), (n_out, 8)))
                    w = jnp.stack(ws)
                    return acc + w.astype(jnp.float32).sum(-1)

                return jax.lax.fori_loop(
                    0, 20, body, jnp.zeros((lanes, n_out), jnp.float32)
                )

            dt = timeit(fetch_unroll, flat, offs) / 20
            print(
                f"  unrl size {size} lanes {lanes:2d}: {dt*1e6:8.1f} us/iter "
                f"({dt/lanes*1e6:6.2f} us/lane)"
            )


if __name__ == "__main__":
    main()
