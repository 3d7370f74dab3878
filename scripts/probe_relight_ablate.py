"""Timing ablation of the Pallas relight pass on light_bench: where do
the 230 ms/pass go (fetch A / fetch B / roll / select / shade stages)?"""
import time

import jax
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def main():
    from aic_tpu.content.testing import light_bench_space
    from aic_tpu.light import build_relight_ctx
    from aic_tpu.light import pallas_relight as pr
    from aic_tpu.light.dense import _pallas_split

    state = light_bench_space().snapshot()
    ctx = build_relight_ctx(state)
    split = _pallas_split(state, ctx)
    print(f"split={split}", flush=True)

    for ablate in ("", "noshade", "shade1", "shade2", "nofetchA", "nofetchB",
                   "noroll", "nosel", "nofetchA nofetchB"):
        pr._ABLATE = set(ablate.split())
        try:
            f = jax.jit(
                lambda s, c: pr.relight_all_pass_pallas(s, c, n_groups=split)
            )
            out = f(state, ctx)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(state, ctx)
            sync(out)
            print(f"ablate={ablate!r}: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"ablate={ablate!r}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        finally:
            pr._ABLATE = set()
            # distinct ablations share one jit cache key (same args) —
            # clear so each variant recompiles with its own kernel
            f.clear_cache() if hasattr(f, "clear_cache") else None
            jax.clear_caches()


if __name__ == "__main__":
    main()
