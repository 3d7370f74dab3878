"""Round-4 relight probe on the real TPU: measure the existing Pallas
kernel vs the XLA dense pass at light_bench size, and test whether the
kernel compiles past the 14 MiB gate estimate."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aic_tpu.content.testing import light_bench_space
from aic_tpu.light.dense import (
    build_relight_ctx, relight_all_pass, evaluate_light_dense, _apply_pass,
)
from aic_tpu.light.pallas_relight import (
    relight_all_pass_pallas, vmem_estimate_bytes,
)

print("devices:", jax.devices())
sp = light_bench_space()
st = sp.snapshot()
size = st.contents.shape
print("size:", size, "max_distance:", st.light_max_distance)
print("vmem estimate MiB:", vmem_estimate_bytes(size) / (1 << 20))

ctx = build_relight_ctx(st)

def timeit(f, n=3):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

# XLA dense pass
t_xla, new_xla = timeit(lambda: relight_all_pass(st, ctx))
print(f"XLA pass: {t_xla*1000:.1f} ms")

# Pallas kernel (bypass the gate)
try:
    t_pl, new_pl = timeit(lambda: relight_all_pass_pallas(st, ctx))
    print(f"Pallas pass: {t_pl*1000:.1f} ms")
    d = np.abs(
        np.asarray(new_pl[..., :3], np.int32) - np.asarray(new_xla[..., :3], np.int32)
    )
    print("max packed diff vs XLA:", d.max())
except Exception as e:
    print("Pallas FAILED:", type(e).__name__, str(e)[:500])

# pass count to convergence (XLA path, small volume may use pallas gate)
t0 = time.perf_counter()
st2, passes = evaluate_light_dense(st)
jax.block_until_ready(st2.light)
print(f"evaluate_light_dense: {time.perf_counter()-t0:.2f}s, {passes} passes")
