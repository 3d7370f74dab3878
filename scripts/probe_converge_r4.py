"""Round-4: on-device relight convergence loop vs per-pass host loop."""
import time

import jax
import numpy as np

from aic_tpu.content.cornell import cornell_box
from aic_tpu.content.testing import light_bench_space
from aic_tpu.light.dense import build_relight_ctx, evaluate_light_dense, _pallas_split

for label, make in (("light_bench", light_bench_space), ("cornell32", lambda: cornell_box(32))):
    sp = make()
    st = sp.snapshot()
    ctx = build_relight_ctx(st)
    print(label, "pallas eligible:", _pallas_split(st), flush=True)
    t0 = time.perf_counter()
    lit, passes = evaluate_light_dense(st, ctx=ctx)
    np.asarray(lit.light[0, 0, 0])
    print(f"{label} first call (incl compile): {time.perf_counter()-t0:.1f}s, {passes} passes", flush=True)
    t0 = time.perf_counter()
    lit2, passes2 = evaluate_light_dense(st, ctx=ctx)
    np.asarray(lit2.light[0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"{label} steady: {dt:.2f}s, {passes2} passes  ({dt/passes2*1000:.0f} ms/pass)", flush=True)
