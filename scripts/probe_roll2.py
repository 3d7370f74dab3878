"""Reproduce + fix the composed-dynamic-rolls Mosaic miscompile.

Kernel shape mirrors pallas_relight: dynamic slice [80,128] from a
[480,128] stack, then roll axis0 (small shift) + roll axis1 (large
shift), inside fori with shifts from VMEM scalar reads.

Variants: base (two rolls), swapped order, barrier between, select-shift
(axis-0 shift via 8 masked adds instead of a roll).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 80
SRC = 480
LANES = 128
N = 12


def make_kernel(variant):
    def kernel(tbl_ref, x_ref, o_ref):
        def body(p, _):
            dx = tbl_ref[p, 0]
            dl = tbl_ref[p, 1]
            fid = tbl_ref[p, 2]
            start = pl.multiple_of(fid * ROWS, 8)
            blk = x_ref[pl.ds(start, ROWS), :]
            if variant == "base":
                blk = pltpu.roll(blk, -dx, axis=0)
                blk = pltpu.roll(blk, -dl, axis=1)
            elif variant == "swap":
                blk = pltpu.roll(blk, -dl, axis=1)
                blk = pltpu.roll(blk, -dx, axis=0)
            elif variant == "select":
                # x-shift without a sublane roll: 8-aligned dynamic slice
                # (floor(dx/8)) + an 8-way masked sum for the remainder.
                dx8 = (dx >> 3) << 3
                dxr = dx - dx8
                start2 = pl.multiple_of(8 + fid * ROWS + dx8, 8)
                wide = x_ref[pl.ds(start2, ROWS + 8), :]
                wide = pltpu.roll(wide, -dl, axis=1)
                acc = jnp.zeros((ROWS, LANES), jnp.int32)
                for k in range(8):
                    acc = acc + jnp.where(dxr == k, wide[k : k + ROWS, :], 0)
                blk = acc
            o_ref[pl.ds(p * ROWS, ROWS), :] = blk
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    return kernel


def run(variant, interp):
    tbl = np.zeros((N, 8), np.int32)
    rng = np.random.RandomState(0)
    tbl[:, 0] = rng.randint(-7, 8, N)
    tbl[:, 1] = rng.randint(-90, 91, N)
    tbl[:, 2] = rng.randint(0, SRC // ROWS, N)
    x = jnp.asarray(rng.randint(0, 1 << 20, (SRC + 24, LANES)), jnp.int32)
    out = pl.pallas_call(
        make_kernel(variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * ROWS, LANES), jnp.int32),
        interpret=interp,
    )(jnp.asarray(tbl), x)
    return np.asarray(out), tbl, np.asarray(x)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    a, tbl, x = run(variant, False)
    b, _, _ = run(variant, True)
    ok = (a == b).all()
    print(f"variant={variant}: hw == interp: {ok}")
    if not ok:
        bad = [
            p
            for p in range(N)
            if not (a[p * ROWS : (p + 1) * ROWS] == b[p * ROWS : (p + 1) * ROWS]).all()
        ]
        for p in bad[:4]:
            print("  pair", p, "dx,dl,fid =", tbl[p, :3])


if __name__ == "__main__":
    main()
