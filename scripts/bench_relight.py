"""Measure dense relight pass/convergence times on the real TPU, by lanes."""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    import jax

    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def main():
    import jax

    print(f"backend={jax.default_backend()}")
    from aic_tpu.content import cornell_box
    from aic_tpu.content.testing import light_bench_space
    from aic_tpu.light.dense import (
        build_relight_ctx,
        evaluate_light_dense,
        relight_all_pass,
    )

    for name, space in (
        ("cornell32", cornell_box(32)),
        ("light_bench", light_bench_space()),
    ):
        state = space.snapshot()
        n = int(np.prod(state.contents.shape))
        ctx = build_relight_ctx(state)
        print(f"-- {name}: {state.contents.shape} = {n} cubes")
        for lanes in (1, 8, 16, 32):
            t0 = time.perf_counter()
            out = relight_all_pass(state, ctx, lanes=lanes)
            sync(out)
            compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = relight_all_pass(state, ctx, lanes=lanes)
            sync(out)
            dt = (time.perf_counter() - t0) / reps
            print(
                f"  lanes={lanes:2d}: pass {dt*1e3:8.1f} ms "
                f"({n/dt/1e6:6.2f} M cube-updates/s) compile {compile_t:.0f}s"
            )
        t0 = time.perf_counter()
        lit, passes = evaluate_light_dense(state, ctx=ctx)
        sync(lit.light)
        print(f"  convergence: {time.perf_counter()-t0:.2f}s in {passes} passes")


if __name__ == "__main__":
    main()
