"""Round-5 probe: megakernel frame-time split — kernel vs XLA shading.

Times, on atrium 1080p (unlit state; shading cost is value-independent):
- full trace at phases=1..4
- the raw v2 kernel via a jitted _run_kernel2 wrapper (no shading)
Derives the per-phase shading cost and the kernel share.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, n=3):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from aic_tpu.content import atrium
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace import pallas_trace as pt

    space = atrium()
    state = space.snapshot()
    opts = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    W, H = 1920, 1080
    cam = Camera(opts, Viewport(W, H))
    sz = np.asarray(state.contents.shape, np.float64)
    lo = np.asarray(state.lower, np.float64)
    cam.look_at(lo + sz * np.array([0.5, 0.75, 0.9]), lo + sz / 2)
    o, d = cam.pixel_rays()
    o, d = jnp.asarray(o), jnp.asarray(d)
    n_rays = W * H

    for ph in (1, 2, 4):
        dt = timeit(
            lambda: pt.trace_rays_pallas(state, o, d, opts, phases=ph)[0]
        )
        print(f"phases={ph}: {dt*1e3:.1f} ms {n_rays/dt/1e6:.2f} Mrays/s",
              flush=True)

    # Raw kernel: one full-fuel launch over the same rays, no shading.
    ctx2 = pt.get_bitmask_ctx2(state)
    rows_g = 32
    size_i = jnp.asarray(state.contents.shape, jnp.int32)
    size_f = jnp.asarray(state.contents.shape, jnp.float32)
    of = o.reshape(-1, 3).astype(jnp.float32) - jnp.asarray(
        state.lower, jnp.float32
    )
    df = d.reshape(-1, 3).astype(jnp.float32)
    n_group = rows_g * 128
    T = 64
    Hp, Wp = -(-H // T) * T, -(-W // T) * T

    def to_tiles(a):
        a = a.reshape(H, W, 3)
        a = jnp.pad(a, ((0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
        a = a.reshape(Hp // T, T, Wp // T, T, 3)
        return a.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    of, df = to_tiles(of), to_tiles(df)
    m = of.shape[0]

    from aic_tpu.raytrace.tracer import ray_entry_setup

    @functools.partial(jax.jit, static_argnames=("iters", "substeps"))
    def kernel_only(of, df, iters=256, substeps=8):
        entry = ray_entry_setup(of, df, size_i, size_f)
        inv_d, step = entry["inv_d"], entry["step"]
        cube0 = entry["cube0"]
        cc = jnp.clip(cube0, 0, size_i - 1)
        rdy, rdz = ctx2.rdims[1], ctx2.rdims[2]
        dom0 = ((cc[:, 0] >> 4) * rdy + (cc[:, 1] >> 4)) * rdz + (cc[:, 2] >> 4)
        rays = dict(
            ox=of[:, 0], oy=of[:, 1], oz=of[:, 2],
            dx=df[:, 0], dy=df[:, 1], dz=df[:, 2],
            ivx=inv_d[:, 0], ivy=inv_d[:, 1], ivz=inv_d[:, 2],
            stx=step[:, 0], sty=step[:, 1], stz=step[:, 2],
        )
        tmax0 = entry["tmax0"]
        zi = jnp.zeros(m, jnp.int32)
        zf = jnp.zeros(m, jnp.float32)
        st = dict(
            dom=dom0, cx=cube0[:, 0], cy=cube0[:, 1], cz=cube0[:, 2],
            tmx=tmax0[:, 0], tmy=tmax0[:, 1], tmz=tmax0[:, 2],
            tdx=jnp.abs(inv_d[:, 0]), tdy=jnp.abs(inv_d[:, 1]),
            tdz=jnp.abs(inv_d[:, 2]),
            resl=zi, mode=entry["hits_box"].astype(jnp.int32),
            hit=zi, pidx=zi, face=zi, t=zf, nt=zf, hx=zi, hy=zi, hz=zi,
            vbase=zi, sdom=zi, scx=zi, scy=zi, scz=zi, stmx=zf, stmy=zf, stmz=zf,
        )
        out = pt._run_kernel2(
            rays, st, ctx2, iters, substeps, False, 1, 1, rows_g
        )
        return out["t"], out["mode"]

    t, mode = kernel_only(of, df)
    unfinished = int((np.asarray(mode) != 0).sum())
    dt = timeit(lambda: kernel_only(of, df)[0])
    print(f"kernel-only (1 launch, fuel 256): {dt*1e3:.1f} ms "
          f"unfinished={unfinished}/{m}", flush=True)


if __name__ == "__main__":
    main()
