"""Round-5 relight probe: dead-pair gate x fast seed x overrelax.

Measures on the real chip, for light_bench (and optionally cornell32):
- single-pass kernel time, gate on vs off (ablate token)
- full convergence: passes + wall time for seed x overrelax variants
- packed-light agreement vs the ungated/unseeded baseline
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np


def sync(x):
    jax.block_until_ready(x)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from aic_tpu.content import cornell_box
    from aic_tpu.content.testing import light_bench_space
    from aic_tpu.light import build_relight_ctx
    from aic_tpu.light import pallas_relight as pr
    from aic_tpu.light.dense import evaluate_light_dense
    from aic_tpu.math import lightpack

    scenes = [("light_bench", light_bench_space)]
    if "cornell" in sys.argv:
        scenes.append(("cornell32", lambda: cornell_box(32)))

    for name, make in scenes:
        state = make().snapshot()
        ctx = build_relight_ctx(state)
        split = pr._resolve_split(state, ctx)
        print(f"--- {name} shape={state.contents.shape} split={split}",
              flush=True)
        if not split:
            continue

        # single-pass: gate on vs off
        import functools
        for tag, ablate in [("gate", set()), ("nogate", {"nogate"})]:
            pr._ABLATE.clear()
            pr._ABLATE.update(ablate)
            f = jax.jit(functools.partial(
                pr.relight_all_pass_pallas, n_groups=split))
            out = f(state, ctx)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(state, ctx)
            sync(out)
            dt = (time.perf_counter() - t0) / 5
            print(f"  pass[{tag}]: {dt*1e3:.1f} ms", flush=True)
            jax.clear_caches()
        pr._ABLATE.clear()

        # convergence variants
        ref_light = None
        for tag, kw in [
            ("noseed", dict(seed=False)),
            ("seed", dict(seed=True)),
        ]:
            st, passes = evaluate_light_dense(state, ctx=ctx, **kw)
            sync(st.light)
            t0 = time.perf_counter()
            st, passes = evaluate_light_dense(state, ctx=ctx, **kw)
            sync(st.light)
            dt = time.perf_counter() - t0
            print(f"  converge[{tag}]: {dt:.3f}s passes={passes}",
                  flush=True)
            lt = np.asarray(st.light)
            if ref_light is None:
                ref_light = lt
            else:
                d = np.abs(
                    ref_light[..., :3].astype(int) - lt[..., :3].astype(int)
                )
                print(f"    vs baseline: max packed delta "
                      f"{int(np.max(d))}", flush=True)

        # overrelax sweep (seeded)
        from aic_tpu.light.pallas_relight import converge_pallas
        for w in (1.3, 1.5, 1.7):
            from aic_tpu.light.refproc import fast_evaluate_seed
            st0, _ = fast_evaluate_seed(state)
            f = jax.jit(functools.partial(
                converge_pallas, max_passes=48, n_groups=split, overrelax=w))
            light, passes = f(st0, ctx)
            sync(light)
            t0 = time.perf_counter()
            light, passes = f(st0, ctx)
            sync(light)
            dt = time.perf_counter() - t0
            d = np.abs(ref_light[..., :3].astype(int)
                       - np.asarray(light)[..., :3].astype(int))
            print(f"  overrelax[{w}]: {dt:.3f}s passes={int(passes)} "
                  f"maxdelta={int(np.max(d))}", flush=True)


if __name__ == "__main__":
    main()
