"""Round-5 probe: is a lone DYNAMIC SUBLANE roll correct on Mosaic?

The r4 probes established two miscompiles: a dynamic sublane roll
COMPOSED with a dynamic lane roll (probe_roll2), and pltpu.roll with a
negative dynamic shift at non-pow2 lane widths (probe_roll3). The
relight fetch therefore uses a 16-aligned slice + 4-stage static select
for the row remainder. This probe checks whether a SINGLE dynamic
sublane roll (axis=0), with the lane roll applied to a separately
materialized value, compiles and matches numpy — if so, fetch drops
from 6 ops to 3.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = 96, 1024
    x = np.arange(rows * lanes, dtype=np.float32).reshape(rows, lanes)
    x = np.sin(x * 0.01).astype(np.float32)

    def kernel(shift_ref, x_ref, o_ref, scratch):
        s = shift_ref[0]
        v = pltpu.roll(x_ref[:], s, axis=0)
        scratch[:] = v  # materialize between the two dynamic rolls
        o_ref[:] = pltpu.roll(scratch[:], (s * 7) % lanes, axis=1)

    @functools.partial(jax.jit, static_argnames=())
    def run(shift, xv):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, lanes), jnp.float32)],
        )(shift, xv)

    ok = True
    for s in (0, 1, 5, 15, 16, 31, 47, 95):
        try:
            got = np.asarray(run(jnp.asarray([s], jnp.int32), jnp.asarray(x)))
        except Exception as e:
            print(f"shift={s}: FAIL {type(e).__name__}: {e}"[:200], flush=True)
            ok = False
            continue
        want = np.roll(np.roll(x, s, axis=0), (s * 7) % lanes, axis=1)
        good = np.array_equal(got, want)
        ok &= good
        print(f"shift={s}: {'OK' if good else 'MISMATCH'}", flush=True)
    print("VERDICT:", "sublane+materialized-lane roll is usable" if ok
          else "still broken - keep slice+select", flush=True)


if __name__ == "__main__":
    main()
