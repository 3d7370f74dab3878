"""Round-5 probe: multigrid coarse-grid seed for evaluate_light_dense.

Measures full-convergence wall time and pass counts with and without the
coarse seed on the two bench scenes (light_bench, cornell32), plus the
fixpoint agreement between the two paths.
"""
from __future__ import annotations

import time

import jax
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from aic_tpu.content import cornell_box
    from aic_tpu.content.testing import light_bench_space
    from aic_tpu.light import build_relight_ctx, evaluate_light_dense

    for name, make in [
        ("light_bench", light_bench_space),
        ("cornell32", lambda: cornell_box(32)),
    ]:
        state = make().snapshot()
        ctx = build_relight_ctx(state)
        results = {}
        for coarse in (False, True):
            # Warm with the same program that is timed.
            warm, _ = evaluate_light_dense(state, ctx=ctx, coarse=coarse)
            sync(warm.light)
            t0 = time.perf_counter()
            lit, passes = evaluate_light_dense(state, ctx=ctx, coarse=coarse)
            sync(lit.light)
            dt = time.perf_counter() - t0
            results[coarse] = lit
            print(
                f"{name} coarse={coarse}: {dt:.3f} s, {passes} fine passes",
                flush=True,
            )
        d = np.abs(
            np.asarray(results[False].light[..., :3], np.int32)
            - np.asarray(results[True].light[..., :3], np.int32)
        )
        print(
            f"{name} fixpoint diff: max={d.max()} frac>=2={np.mean(d >= 2):.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
