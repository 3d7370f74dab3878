"""Multi-device platform probes + sharded-vs-single-device equality.

Round 1's suite silently ran on the single real TPU (the axon
sitecustomize registers its backend before conftest can force CPU), so
every "multi-device" test was vacuous. These tests assert the platform
itself — if the conftest re-exec regresses, they fail loudly — and pin
the sharded raytrace/relight paths against single-device results on a
genuine 8-device mesh. Reference analog: SURVEY §2.9 (rayon pixel rows →
ray-sharded mesh axis).
"""

import numpy as np
import pytest


def test_platform_is_cpu_with_8_devices():
    import jax

    assert jax.default_backend() == "cpu", (
        "test suite must run on the CPU platform (conftest re-exec broken?); "
        f"got {jax.default_backend()!r}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual devices, got {jax.device_count()}"
    )


def test_make_mesh_rejects_overcommit():
    from aic_tpu.parallel import make_mesh

    with pytest.raises(RuntimeError, match="mesh"):
        make_mesh(1000)


def test_make_mesh_8_devices():
    from aic_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def _demo_scene(n=12):
    from aic_tpu.content import cornell_box
    from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport

    space = cornell_box(n)
    state = space.snapshot()
    options = GraphicsOptions(
        lighting_display="smoothstep", fog="none", transparency="surface"
    )
    camera = Camera(options, Viewport(32, 32))
    camera.look_at(np.array([0.5, 0.5, 1.6]) * n, (n / 2, n / 2, n / 2))
    return state, camera, options


def test_sharded_raytrace_matches_single_device():
    """Rays sharded over 8 devices produce the same frame as unsharded."""
    from aic_tpu.parallel import make_mesh, render_sharded
    from aic_tpu.raytrace.tracer import trace_rays

    state, camera, options = _demo_scene()
    origins, directions = camera.pixel_rays()
    single_light, single_trans = trace_rays(state, origins, directions, options)

    mesh = make_mesh(8)
    shard_light, shard_trans = render_sharded(state, camera, mesh)

    np.testing.assert_allclose(
        np.asarray(single_light), np.asarray(shard_light), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(single_trans), np.asarray(shard_trans), rtol=1e-5, atol=1e-6
    )


def test_dryrun_multichip_impl_inprocess():
    """The driver-facing full-step dryrun executes on the 8-device mesh."""
    import __graft_entry__ as g

    g._dryrun_multichip_impl(8)
