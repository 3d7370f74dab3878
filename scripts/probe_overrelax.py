"""Measure over-relaxed Jacobi convergence: passes + wall time + final
field agreement vs the plain (w=1) fixpoint, on light_bench + cornell32."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def main():
    from aic_tpu.content import cornell_box
    from aic_tpu.content.testing import light_bench_space
    from aic_tpu.light import build_relight_ctx
    from aic_tpu.light.dense import _pallas_split
    from aic_tpu.light.pallas_relight import converge_pallas
    from aic_tpu.math import lightpack

    for name, mk in (("light_bench", light_bench_space), ("cornell32", lambda: cornell_box(32))):
        state = mk().snapshot()
        ctx = build_relight_ctx(state)
        split = _pallas_split(state, ctx)
        print(f"{name}: shape={state.contents.shape} split={split}", flush=True)
        if not split:
            continue
        ref = None
        for w in (1.0, 1.4, 1.6, 1.8):
            f = jax.jit(
                lambda s, c: converge_pallas(s, c, max_passes=48, n_groups=split, overrelax=w),
                static_argnames=(),
            )
            light, passes = f(state, ctx)
            sync(light)
            t0 = time.perf_counter()
            light, passes = f(state, ctx)
            sync(light)
            dt = time.perf_counter() - t0
            if w == 1.0:
                ref = light
                dmax = 0
            else:
                dmax = int(np.asarray(lightpack.difference_priority(ref, light).max()))
            print(
                f"  w={w}: passes={int(passes)} hot={dt*1e3:.0f} ms "
                f"max_packed_diff_vs_plain={dmax}",
                flush=True,
            )


if __name__ == "__main__":
    main()
