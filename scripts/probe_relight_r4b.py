"""Round-4 relight probe #2: true per-pass timing (np.asarray sync)."""
import time

import jax
import numpy as np

from aic_tpu.content.cornell import cornell_box
from aic_tpu.content.testing import light_bench_space
from aic_tpu.light.dense import build_relight_ctx, relight_all_pass
from aic_tpu.light.pallas_relight import relight_all_pass_pallas

def timeit(f, n=5):
    np.asarray(f()[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    np.asarray(out[0, 0, 0])
    return (time.perf_counter() - t0) / n

for label, make in (("light_bench", light_bench_space), ("cornell32", lambda: cornell_box(32))):
    sp = make()
    st = sp.snapshot()
    ctx = build_relight_ctx(st)
    t_xla = timeit(lambda: relight_all_pass(st, ctx))
    print(f"{label} XLA pass:    {t_xla*1000:.1f} ms", flush=True)
    t_pl = timeit(lambda: relight_all_pass_pallas(st, ctx))
    print(f"{label} Pallas pass: {t_pl*1000:.1f} ms  ({t_xla/t_pl:.1f}x)", flush=True)
