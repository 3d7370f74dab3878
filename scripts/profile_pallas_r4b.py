"""Split pallas-tracer frame time into kernel vs XLA-glue on atrium 1080p.

Measures, on the real chip:
  1. full trace_rays_pallas at current defaults
  2. kernel-only: one _run_kernel invocation over the initial ray state
  3. classification-glue-only: one round_body's XLA part given kernel outs
  4. knob sweep: substeps x kernel_iters x phases
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, n=3):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from aic_tpu.content import atrium
    from aic_tpu.light import evaluate_light_dense
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport
    from aic_tpu.raytrace import pallas_trace as pt

    t0 = time.perf_counter()
    space = atrium()
    state = space.snapshot()
    state, passes = evaluate_light_dense(state)
    sync(state.light)
    print(f"setup {time.perf_counter()-t0:.1f}s relight passes={passes}", flush=True)

    opts = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    W, H = 1920, 1080
    cam = Camera(opts, Viewport(W, H))
    sz = np.asarray(state.contents.shape, np.float64)
    lo = np.asarray(state.lower, np.float64)
    cam.look_at(lo + sz * np.array([0.5, 0.75, 0.9]), lo + sz / 2)
    o, d = cam.pixel_rays()
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    n_rays = W * H

    ctx = pt.get_bitmask_ctx(state)
    print(
        f"regions={ctx.n_regions} rdims={ctx.rdims} ventries={ctx.n_ventries} "
        f"rows={ctx.rows.shape}", flush=True,
    )

    # --- 1. full trace at defaults -------------------------------------
    dt = timeit(lambda: pt.trace_rays_pallas(state, o, d, opts)[0], n=5)
    print(f"full default: {dt*1e3:.1f} ms  {n_rays/dt/1e6:.1f} Mrays/s", flush=True)

    # --- 2. kernel-only ---------------------------------------------------
    of = o.reshape(-1, 3).astype(jnp.float32) - jnp.asarray(state.lower, jnp.float32)
    df = d.reshape(-1, 3).astype(jnp.float32)
    # tile-rearrange like trace_rays_pallas
    T = 32
    Hp, Wp = -(-H // T) * T, -(-W // T) * T

    def to_tiles(a):
        a = a.reshape(H, W, 3)
        a = jnp.pad(a, ((0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
        a = a.reshape(Hp // T, T, Wp // T, T, 3)
        return a.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

    of, df = to_tiles(of), to_tiles(df)
    m = of.shape[0]

    from aic_tpu.raytrace.tracer import ray_entry_setup

    size_i = jnp.asarray(state.contents.shape, jnp.int32)
    size_f = jnp.asarray(state.contents.shape, jnp.float32)

    @jax.jit
    def kernel_once(o, d, kernel_iters=48, substeps=4):
        entry = ray_entry_setup(o, d, size_i, size_f)
        inv_d, step = entry["inv_d"], entry["step"]
        cube0 = entry["cube0"]
        cc = jnp.clip(cube0, 0, size_i - 1)
        rdy, rdz = ctx.rdims[1], ctx.rdims[2]
        dom0 = ((cc[:, 0] >> 4) * rdy + (cc[:, 1] >> 4)) * rdz + (cc[:, 2] >> 4)
        rays = dict(
            ox=o[:, 0], oy=o[:, 1], oz=o[:, 2],
            dx=d[:, 0], dy=d[:, 1], dz=d[:, 2],
            ivx=inv_d[:, 0], ivy=inv_d[:, 1], ivz=inv_d[:, 2],
            stx=step[:, 0], sty=step[:, 1], stz=step[:, 2],
        )
        tmax0 = entry["tmax0"]
        st = dict(
            dom=dom0,
            cx=cube0[:, 0], cy=cube0[:, 1], cz=cube0[:, 2],
            tmx=tmax0[:, 0], tmy=tmax0[:, 1], tmz=tmax0[:, 2],
            resl=jnp.zeros(m, jnp.int32),
            walking=entry["hits_box"].astype(jnp.int32),
        )
        out = pt._run_kernel(
            rays, st, ctx.l1, ctx.rows, ctx.rdims, tuple(state.contents.shape),
            ctx.n_regions, 48, 4, False,
        )
        return out

    out0 = kernel_once(of, df)
    dt_k = timeit(lambda: kernel_once(of, df)["hit"], n=5)
    hits = np.asarray(out0["hit"])
    walk = np.asarray(out0["walking"])
    print(
        f"kernel-only (48 iters x 4 substeps): {dt_k*1e3:.1f} ms | "
        f"hit counts: {np.bincount(hits, minlength=4)} walking={walk.sum()}",
        flush=True,
    )

    # --- 3. glue-only: fetch_cell-style classification over m rays -------
    sbd_cells = state.cells

    @jax.jit
    def classify(hx, hy, hz):
        from aic_tpu.raytrace.accel import brick_dims

        sbd = brick_dims(tuple(state.contents.shape))
        iota64 = jnp.arange(64, dtype=jnp.int32)
        xc = jnp.clip(hx, 0, state.contents.shape[0] - 1)
        yc = jnp.clip(hy, 0, state.contents.shape[1] - 1)
        zc = jnp.clip(hz, 0, state.contents.shape[2] - 1)
        key = ((xc >> 2) * sbd[1] + (yc >> 2)) * sbd[2] + (zc >> 2)
        row = jnp.take(sbd_cells, key, axis=0)
        local = ((xc & 3) << 4) | ((yc & 3) << 2) | (zc & 3)
        return (row * (iota64 == local[:, None])).sum(-1)

    hx = jnp.asarray(out0["hx"]); hy = jnp.asarray(out0["hy"]); hz = jnp.asarray(out0["hz"])
    dt_c = timeit(lambda: classify(hx, hy, hz), n=5)
    print(f"classify-glue (one round, {m} rays): {dt_c*1e3:.1f} ms", flush=True)

    # --- 4. knob sweep ----------------------------------------------------
    for substeps, kit, phases, rounds in (
        (4, 48, 4, 48),
        (8, 48, 4, 48),
        (8, 96, 4, 24),
        (16, 96, 4, 24),
        (4, 48, 2, 48),
        (8, 96, 2, 24),
    ):
        try:
            f = lambda: pt.trace_rays_pallas(
                state, o, d, opts, phases=phases, kernel_iters=kit,
                substeps=substeps, max_rounds=rounds,
            )[0]
            dt = timeit(f, n=3)
            print(
                f"s={substeps} it={kit} ph={phases} r={rounds}: "
                f"{dt*1e3:.1f} ms {n_rays/dt/1e6:.1f} Mrays/s", flush=True,
            )
        except Exception as e:
            print(f"s={substeps} it={kit}: FAIL {type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    main()
