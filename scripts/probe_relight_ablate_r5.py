"""Round-5 relight pass ablation on the real chip: which stage costs.

Times ONE kernel pass (not convergence) on light_bench under each
_ABLATE token. Tokens progressively remove work: noshade keeps only
fetches; nofetchA/B remove the shifted fetches; nosel removes the
4-stage row-remainder select; noroll the lane roll.
"""
from __future__ import annotations

import functools
import time

import jax
import numpy as np


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from aic_tpu.content.testing import light_bench_space
    from aic_tpu.light import build_relight_ctx
    from aic_tpu.light import pallas_relight as pr

    state = light_bench_space().snapshot()
    ctx = build_relight_ctx(state)
    split = pr._resolve_split(state, ctx)
    print(f"split={split}", flush=True)

    tokens = [
        (),
        ("noshade",),
        ("shade1",),
        ("shade2",),
        ("nofetchB",),
        ("nofetchA",),
        ("nofetchA", "nofetchB"),
        ("nosel",),
        ("noroll",),
        ("nowhen",),
    ]
    for tok in tokens:
        pr._ABLATE.clear()
        pr._ABLATE.update(tok)
        try:
            f = jax.jit(
                functools.partial(pr.relight_all_pass_pallas, n_groups=split)
            )
            out = f(state, ctx)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(state, ctx)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / 5
            print(f"{','.join(tok) or 'baseline'}: {dt*1e3:.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"{','.join(tok)}: FAIL {type(e).__name__}: {e}"[:200],
                  flush=True)
        finally:
            jax.clear_caches()
    pr._ABLATE.clear()

    # Can a single-group (8 mirrors/iter) kernel compile on this shape?
    for g in (1, 2, 4):
        try:
            jax.jit(
                functools.partial(pr.relight_all_pass_pallas, n_groups=g)
            ).lower(state, ctx).compile()
            print(f"n_groups={g}: compiles", flush=True)
        except Exception as e:
            print(f"n_groups={g}: FAIL {type(e).__name__}"[:120], flush=True)


if __name__ == "__main__":
    main()
