"""Time ONE Pallas relight pass per bench scene + convergence pass count."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aic_tpu.content import cornell_box
from aic_tpu.content.testing import light_bench_space
from aic_tpu.light.dense import build_relight_ctx, evaluate_light_dense
from aic_tpu.light.pallas_relight import (
    _pack_planes,
    _kernel_pass,
    relight_all_pass_pallas,
    converge_pallas,
)

for name, mk in (("light_bench", light_bench_space), ("cornell32", lambda: cornell_box(32))):
    st = mk()
    ctx = build_relight_ctx(st)
    # Single pass timing (packing included vs excluded).
    out = relight_all_pass_pallas(st, ctx)
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = relight_all_pass_pallas(st, ctx)
    np.asarray(out[0, 0, 0])
    per_pass = (time.perf_counter() - t0) / 3
    print(f"{name}: pass+pack {per_pass*1e3:.1f} ms", flush=True)

    planes = _pack_planes(st, ctx)
    f = jax.jit(lambda st, ctx, planes: _kernel_pass(st, ctx, planes))
    out = f(st, ctx, planes)
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(st, ctx, planes)
    np.asarray(out[0, 0, 0])
    k_only = (time.perf_counter() - t0) / 3
    print(f"{name}: kernel-only {k_only*1e3:.1f} ms", flush=True)

    # Full convergence.
    t0 = time.perf_counter()
    light, passes = converge_pallas(st, ctx)
    np.asarray(light[0, 0, 0])
    print(
        f"{name}: converge {time.perf_counter()-t0:.2f}s "
        f"passes={int(passes)}",
        flush=True,
    )
