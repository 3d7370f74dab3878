"""Full-frame renderer: camera + tracer + postprocess → image.

Equivalent of the reference's `RtRenderer::draw`
(all-is-cubes-render/src/raytracer/renderer.rs:183,543-556): per-pixel rays
(2×2 supersampled when antialiasing is on, renderer.rs:426), traced by the
core (tracer.py), then exposure + tone mapping (camera.rs:373) and sRGB
encoding. Where the reference rayon-parallelizes over rows, the whole frame
here is one device computation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..math.color import linear_to_srgb8
from ..space.state import SpaceState
from .camera import Camera, Viewport
from .options import GraphicsOptions
from .tracer import trace_rays


def _use_pallas(state, origins) -> bool:
    """Engine dispatch for the production render path: the Pallas
    megakernel wins at large ray counts on the TPU (25.7 vs 4.9 Mrays/s
    on atrium 1080p) but loses to the XLA tracer below ~0.5M rays
    (cornell 256²: 1.6 vs 2.2 — per-program loop serialization doesn't
    amortize) and cannot hold voxel resolutions > 16 (the caller falls
    back on ValueError for that case)."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    n_rays = 1
    for s in origins.shape[:-1]:
        n_rays *= int(s)
    return n_rays >= 1 << 19


@dataclass
class Rendering:
    """render/headless.rs Rendering: size + RGBA data + flaws."""

    width: int
    height: int
    data: np.ndarray  # u8[H,W,4] sRGB
    flaws: tuple[str, ...] = ()


def render_hdr(
    state: SpaceState,
    camera: Camera,
    include_sky: bool = True,
    with_stats: bool = False,
):
    """Trace the frame; returns HDR linear light f32[H,W,3] on device
    (plus a stats dict when with_stats — the RaytraceInfo analog)."""
    aa = camera.options.antialiasing
    origins, directions = camera.pixel_rays(supersample=aa)
    opts = camera.options
    if opts.lighting_display == "bounce":
        from .tracer import trace_rays_bounce
        import jax

        light, trans = trace_rays_bounce(
            state, origins, directions, opts, jax.random.PRNGKey(0),
            include_sky=include_sky,
        )
        stats = None
    else:
        out = None
        if _use_pallas(state, origins):
            from .pallas_trace import trace_rays_pallas

            try:
                out = trace_rays_pallas(
                    state, origins, directions, opts,
                    include_sky=include_sky, return_stats=with_stats,
                )
            except ValueError:
                out = None  # state exceeds kernel tables → XLA below
        if out is None:
            out = trace_rays(
                state, origins, directions, opts, include_sky=include_sky,
                return_stats=with_stats,
            )
        light, trans = out[0], out[1]
        stats = out[2] if with_stats else None
    if aa:
        light = light.mean(axis=2)  # mean over the 4 sub-pixels (accum.rs mean)
        trans = trans.mean(axis=2)
    if with_stats:
        return light, trans, stats
    return light, trans


def _bilerp(img, ys, xs):
    """Clamp-to-edge bilinear sample of img[H,W,C] at continuous texel
    coords (texel centers at k+0.5), vectorized over ys[...]/xs[...]."""
    h, w = img.shape[:2]
    y = jnp.clip(ys - 0.5, 0.0, h - 1.0)
    x = jnp.clip(xs - 0.5, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    return (
        img[y0][:, x0] * (1 - fy[:, None]) * (1 - fx[None, :])
        + img[y0][:, x1] * (1 - fy[:, None]) * fx[None, :]
        + img[y1][:, x0] * fy[:, None] * (1 - fx[None, :])
        + img[y1][:, x1] * fy[:, None] * fx[None, :]
    )


def _stage_sample(src, out_h, out_w, dy, dx):
    """Sample `src` at the centers of an out_h×out_w grid offset by
    (dy, dx) OUTPUT texels, mapped into src texel coords (the shaders'
    `input_pixel`, resampling.wgsl:71)."""
    sh, sw = src.shape[:2]
    ys = (jnp.arange(out_h) + 0.5 + dy) * (sh / out_h)
    xs = (jnp.arange(out_w) + 0.5 + dx) * (sw / out_w)
    return _bilerp(src, ys, xs)


def apply_bloom(light, intensity: float):
    """Bloom, matching the reference wgpu pipeline exactly
    (gpu/src/bloom.rs: base = framebuffer/2, 6 mip levels, 3 repetitions;
    resampling.wgsl:91 bloom_downsample 5-tap, :101 bloom_upsample 9-tap
    + higher-stage blend 5·1.5^−stage; postprocess.wgsl:149 mix by
    intensity). The reference's CPU raytracer skips bloom with
    Flaws::NO_BLOOM (renderer.rs:295); we implement the wgpu formula so
    frames match its golden images."""
    if intensity <= 0.0:
        return light

    h, w = light.shape[:2]
    base_h, base_w = -(-h // 2), -(-w // 2)
    levels = min(6, int(np.log2(max(min(base_h, base_w), 1))) + 1)
    div = 1 << levels
    base_h = -(-base_h // div) * div
    base_w = -(-base_w // div) * div
    sizes = [(base_h >> k, base_w >> k) for k in range(levels)]

    def downsample(src, oh, ow):
        return (
            0.5 * _stage_sample(src, oh, ow, 0.0, 0.0)
            + 0.125 * _stage_sample(src, oh, ow, 0.5, 0.5)
            + 0.125 * _stage_sample(src, oh, ow, 0.5, -0.5)
            + 0.125 * _stage_sample(src, oh, ow, -0.5, 0.5)
            + 0.125 * _stage_sample(src, oh, ow, -0.5, -0.5)
        )

    def upsample(src, higher, oh, ow, stage):
        hw = 5.0 * (1.5 ** -float(stage))
        acc = (
            2.0 * _stage_sample(src, oh, ow, 0.5, 0.5)
            + 2.0 * _stage_sample(src, oh, ow, 0.5, -0.5)
            + 2.0 * _stage_sample(src, oh, ow, -0.5, 0.5)
            + 2.0 * _stage_sample(src, oh, ow, -0.5, -0.5)
            + _stage_sample(src, oh, ow, 1.0, 0.0)
            + _stage_sample(src, oh, ow, -1.0, 0.0)
            + _stage_sample(src, oh, ow, 0.0, 1.0)
            + _stage_sample(src, oh, ow, 0.0, -1.0)
            + hw * _stage_sample(higher, oh, ow, 0.0, 0.0)
        )
        return acc / (12.0 + hw)

    mips = [None] * levels
    for rep in range(3):
        for k in range(levels):
            if rep != 0 and k == 0:
                continue  # keep the previous repetition's upsampled mip 0
            src = light if k == 0 else mips[k - 1]
            mips[k] = downsample(src, *sizes[k])
        for k in range(levels - 2, -1, -1):
            higher = mips[k - 1] if k > 0 else mips[k + 1]
            mips[k] = upsample(mips[k + 1], higher, *sizes[k], stage=k)

    bloom = _stage_sample(mips[0], h, w, 0.0, 0.0)
    return light * (1.0 - intensity) + bloom * intensity


@jax.jit
def _mean_log_luminance(light):
    lum = (
        light[..., 0] * 0.2126 + light[..., 1] * 0.7152 + light[..., 2] * 0.0722
    )
    return jnp.mean(jnp.log2(jnp.maximum(lum, 1e-6)))


def auto_exposure_target(light) -> float:
    """Scene-adaptive exposure (character/exposure.rs:67): target such
    that the mean log luminance maps to middle grey. Returns a host float
    for the camera's smoothed exposure state (one compiled reduce + one
    scalar readback — this runs every interactive frame)."""
    return float(0.5 / np.exp2(np.asarray(_mean_log_luminance(light))))


#: Volume above which `render` windows the state to the camera's visible
#: volume before tracing (the light-texture windowing analog,
#: space/state.py window_state). 2^24 cubes ≈ a 256³ space.
AUTO_WINDOW_VOLUME = 1 << 24


def render(state: SpaceState, camera: Camera, include_sky: bool = True) -> Rendering:
    """Render to an sRGB image (host). Imperfections are *reported* in
    Rendering.flaws (flaws.rs contract), never silently dropped."""
    flaws: list[str] = []
    if camera.viewport.is_empty():
        # camera.rs Viewport::is_empty: nothing to render.
        return Rendering(
            camera.viewport.width,
            camera.viewport.height,
            np.zeros((camera.viewport.height, camera.viewport.width, 4), np.uint8),
        )
    if getattr(camera.options, "debug_pixel_cost", False):
        return render_pixel_cost(state, camera)
    n_cubes = int(np.prod(state.contents.shape))
    if n_cubes > AUTO_WINDOW_VOLUME:
        from ..space.state import visible_light_volume, window_state

        eye = np.asarray(camera.eye_to_world[:3, 3], np.float64)
        lo, hi = visible_light_volume(state, eye, camera.options.view_distance)
        if int(np.prod(np.asarray(hi) - np.asarray(lo))) < n_cubes:
            state = window_state(state, lo, hi)
    if camera.options.lighting_display == "bounce":
        light, trans = render_hdr(state, camera, include_sky)
    else:
        light, trans, stats = render_hdr(state, camera, include_sky, with_stats=True)
        if bool(np.asarray(stats["unfinished"])):
            flaws.append("UNFINISHED")  # rays exhausted their step budget
    img = np.asarray(
        _finish_frame(light, trans, jnp.float32(camera.exposure), camera.options)
    )
    return Rendering(
        camera.viewport.width, camera.viewport.height, img, tuple(flaws)
    )


@functools.partial(jax.jit, static_argnames=("options",))
def _finish_frame(light, trans, exposure, options):
    """Bloom + exposure/tone-map + sRGB + alpha as ONE compiled program.

    These were eager jnp ops; on the tunneled TPU backend each eager op
    is a relay dispatch, which made the per-frame tail cost seconds in
    interactive sessions. Exposure is a TRACED argument so auto-exposure
    (a new float every frame) does not recompile."""
    if options.bloom_intensity > 0.0:
        light = apply_bloom(light, options.bloom_intensity)
    rgb = light * exposure
    maxi = options.maximum_intensity
    if np.isfinite(maxi):
        if options.tone_mapping == "reinhard":
            lum = (
                rgb[..., 0] * 0.2126
                + rgb[..., 1] * 0.7152
                + rgb[..., 2] * 0.0722
            )
            rgb = rgb / (1.0 + lum / jnp.float32(maxi))[..., None]
        else:
            rgb = jnp.minimum(rgb, jnp.float32(maxi))
    srgb = linear_to_srgb8(rgb)
    alpha = jnp.clip(jnp.round((1.0 - trans) * 255.0), 0, 255).astype(jnp.uint8)
    # One RGBA array = one device->host readback per frame.
    return jnp.concatenate([srgb, alpha[..., None]], axis=-1)


def render_pixel_cost(state: SpaceState, camera: Camera) -> Rendering:
    """debug_pixel_cost (graphics_options.rs:145): shade each pixel by
    its traversal step count — a cost heatmap (black = cheap, white =
    expensive, red channel saturates first like the wgpu debug view)."""
    from .tracer import trace_rays

    origins, directions = camera.pixel_rays()
    _, _, steps = trace_rays(
        state, origins, directions, camera.options, count_steps=True
    )
    steps = np.asarray(steps).astype(np.float32)
    scale = max(float(steps.max()), 1.0)
    t = steps / scale
    r = np.clip(t * 3.0, 0.0, 1.0)
    g = np.clip(t * 3.0 - 1.0, 0.0, 1.0)
    b = np.clip(t * 3.0 - 2.0, 0.0, 1.0)
    img = np.stack(
        [r, g, b, np.ones_like(t)], axis=-1
    )
    img = np.round(img * 255.0).astype(np.uint8)
    return Rendering(camera.viewport.width, camera.viewport.height, img)


def save_png(rendering: Rendering, path: str):
    from PIL import Image

    Image.fromarray(rendering.data, "RGBA").save(path)


def print_space_ascii(state: SpaceState, camera: Camera, chars: str = " .:-=+*#%@") -> str:
    """ASCII-art rendering, the analog of the reference's `print_space`
    terminal debugging (raytracer/text.rs)."""
    light, trans = render_hdr(state, camera)
    lum = np.asarray(
        (light[..., 0] * 0.2126 + light[..., 1] * 0.7152 + light[..., 2] * 0.0722)
    )
    lum = lum / max(lum.max(), 1e-6)
    idx = np.clip((lum * (len(chars) - 1)).round().astype(int), 0, len(chars) - 1)
    return "\n".join("".join(chars[i] for i in row) for row in idx)


def render_depth(state: SpaceState, camera: Camera):
    """Depth image: t-distance (in units of the camera ray's near→far
    span) of the first surface per pixel; misses are +inf.

    The DepthBuf accumulator (render/src/raytracer/accum.rs:254-282):
    depth = min over hits of t_distance, starting from +inf. Our
    hit-buffered tracer exposes the first phase's hit buffer directly.
    """
    from .tracer import HIT_NONE, trace_rays

    origins, directions = camera.pixel_rays()
    _, _, hits = trace_rays(
        state, origins, directions, camera.options, return_hits=True
    )
    shape = origins.shape[:-1]
    t = jnp.asarray(hits["hit_t"]).reshape(shape)
    kind = jnp.asarray(hits["hit_kind"]).reshape(shape)
    return jnp.where(kind == HIT_NONE, jnp.inf, t)


def accumulate_hits(state: SpaceState, camera: Camera, fold, init):
    """Custom accumulation over the tracer's per-phase hit buffers — the
    batch analog of the reference's `Accumulate` trait (accum.rs:108):
    where the reference folds per surface along each serial ray, the TPU
    tracer produces one hit buffer per transparency phase; `fold(acc,
    phase_hits)` is called once per phase with dict arrays over all rays
    (hit_kind/hit_idx/hit_face/hit_cube/hit_t) and must return the new
    accumulator pytree.
    """
    from .tracer import trace_rays

    origins, directions = camera.pixel_rays()
    _, _, hits = trace_rays(
        state, origins, directions, camera.options, return_hits=True
    )
    acc = init
    for phase_hits in hits["phases"]:
        acc = fold(acc, {k: jnp.asarray(v) for k, v in phase_hits.items()})
    return acc


def resample_frame(image, out_h: int, out_w: int):
    """Bilinear frame resample (the reference's frame-texture resampling,
    gpu/src/shaders/resampling.wgsl scene-copy role): maps any rendered
    resolution onto the display resolution."""
    img = jnp.asarray(image, jnp.float32)
    out = _stage_sample(img, out_h, out_w, 0.0, 0.0)
    if np.issubdtype(np.asarray(image).dtype, np.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out


def render_scaled(state: SpaceState, camera: Camera, scale: float) -> Rendering:
    """Render at `scale`× resolution and resample to the camera viewport
    (the reference's Viewport nominal-vs-framebuffer scaling,
    camera.rs Viewport::with_scale + the gpu frame-resampling pass).
    scale < 1 trades sharpness for ray count; scale > 1 supersamples.
    """
    from .camera import Viewport

    vp = camera.viewport
    rw = max(int(round(vp.width * scale)), 1)
    rh = max(int(round(vp.height * scale)), 1)
    small_cam = Camera(camera.options, Viewport(rw, rh), eye_to_world=camera.eye_to_world)
    small_cam.exposure = camera.exposure
    r = render(state, small_cam)
    data = np.asarray(resample_frame(r.data, vp.height, vp.width))
    return Rendering(vp.width, vp.height, data, r.flaws)
