"""Camera tests ported from the reference
(all-is-cubes/src/camera/tests.rs): projection depth range, NDC→world
rays, exposure rules, look-at consistency, viewport emptiness."""

import dataclasses

import numpy as np
import pytest

from aic_tpu.raytrace import GraphicsOptions, Viewport
from aic_tpu.raytrace.camera import Camera, look_at_transform
from aic_tpu.raytrace.options import LIGHT_LINEAR, LIGHT_NONE

ARBITRARY = Viewport(100, 100)


class TestBasics:
    def test_camera_bad_viewport_doesnt_panic(self):
        """tests.rs:14."""
        Camera(GraphicsOptions(), Viewport(0, 0))

    def test_camera_view_position(self):
        """tests.rs:37."""
        cam = Camera(GraphicsOptions(), ARBITRARY)
        m = np.eye(4)
        m[:3, 3] = (1.0, 2.0, 3.0)
        cam.set_view_transform(m)
        np.testing.assert_array_equal(cam.view_position, (1.0, 2.0, 3.0))

    def test_projection_depth(self):
        """tests.rs:49 — eye-space z at the near plane maps to NDC 0,
        at the view distance to NDC 1."""
        cam = Camera(GraphicsOptions(), Viewport(4, 3))
        near = cam.near_plane_distance()
        far = cam.options.view_distance
        fov_cot = 1.0 / np.tan(np.radians(cam.options.fov_y) / 2.0)
        aspect = cam.viewport.aspect
        proj = np.array(
            [
                [fov_cot / aspect, 0, 0, 0],
                [0, fov_cot, 0, 0],
                [0, 0, far / (near - far), (far * near) / (near - far)],
                [0, 0, -1, 0],
            ]
        )
        for z, want in [(near, 0.0), (far, 1.0)]:
            clip = proj @ np.array([0.0, 0.0, -z, 1.0])
            assert clip[2] / clip[3] == pytest.approx(want, abs=1e-8)


class TestProjectNdc:
    def test_project_ndc_into_world(self):
        """tests.rs:195 — the center ray spans near→far along -Z; with a
        90°-about-Y view transform it spans along -X from (0,100,0)."""
        cam = Camera(GraphicsOptions(), ARBITRARY)
        near = cam.near_plane_distance()
        far = cam.options.view_distance
        o, d = cam.project_ndc_into_world(np.array([0.0, 0.0]))
        np.testing.assert_allclose(o, (0.0, 0.0, -near), atol=1e-9)
        np.testing.assert_allclose(d, (0.0, 0.0, -(far - near)), rtol=1e-6)

        # Rotation of +90° about Y maps -Z to -X.
        ang = np.pi / 2
        m = np.eye(4)
        m[0, 0] = np.cos(ang)
        m[0, 2] = np.sin(ang)
        m[2, 0] = -np.sin(ang)
        m[2, 2] = np.cos(ang)
        m[:3, 3] = (0.0, 100.0, 0.0)
        cam.set_view_transform(m)
        o, d = cam.project_ndc_into_world(np.array([0.0, 0.0]))
        np.testing.assert_allclose(o, (-near, 100.0, 0.0), atol=1e-9)
        np.testing.assert_allclose(d, (-(far - near), 0.0, 0.0), atol=1e-6)

    def test_project_ndc_into_world_edge_cases(self):
        """tests.rs:227 — NaN/inf NDC inputs propagate as NaN, not
        crash."""
        cam = Camera(GraphicsOptions(), ARBITRARY)
        for bad in [float("nan"), float("inf")]:
            o, d = cam.project_ndc_into_world(np.array([bad, 0.0]))
            assert np.isnan(o[0])
            assert np.isnan(d[0])


class TestExposure:
    def test_post_process_identity_by_default(self):
        """tests.rs:110 post_process — default options pass colors
        through unchanged."""
        import jax

        cam = Camera(GraphicsOptions(), ARBITRARY)
        rgb = np.array([0.1, 0.2, 0.3], np.float32)
        np.testing.assert_allclose(np.asarray(cam.post_process(rgb)), rgb, atol=1e-7)

    def test_post_process_fixed_exposure(self):
        cam = Camera(dataclasses.replace(GraphicsOptions(), exposure=0.5), ARBITRARY)
        rgb = np.array([0.1, 0.2, 0.3], np.float32)
        np.testing.assert_allclose(
            np.asarray(cam.post_process(rgb)), rgb * 0.5, atol=1e-7
        )

    def test_exposure_automatic_active(self):
        """tests.rs:126."""
        cam = Camera(
            dataclasses.replace(
                GraphicsOptions(), exposure_auto=True, lighting_display=LIGHT_LINEAR
            ),
            ARBITRARY,
        )
        cam.set_measured_exposure(7.0)
        assert cam.exposure == 7.0

    def test_exposure_automatic_disabled_when_lighting_disabled(self):
        """tests.rs:141."""
        cam = Camera(
            dataclasses.replace(
                GraphicsOptions(), exposure_auto=True, lighting_display=LIGHT_NONE
            ),
            ARBITRARY,
        )
        cam.set_measured_exposure(7.0)
        assert cam.exposure == 1.0


class TestLookAt:
    def test_look_at_identity(self):
        """tests.rs:156 — looking down -Z from the origin is identity."""
        np.testing.assert_allclose(
            look_at_transform((0.0, 0.0, 0.0), (0.0, 0.0, -10.0)), np.eye(4), atol=1e-12
        )

    def test_look_at_direction_consistency(self):
        """tests.rs:162 — the rotated -Z axis equals the normalized look
        direction, for 100 random directions."""
        rng = np.random.default_rng(253789)
        for _ in range(100):
            d = rng.uniform(-1.0, 1.0, 3)
            n = np.linalg.norm(d)
            if n < 1e-9:
                continue
            d = d / n
            m = look_at_transform((0.0, 0.0, 0.0), d)
            rotated = m[:3, :3] @ np.array([0.0, 0.0, -1.0])
            assert np.linalg.norm(rotated - d) < 1e-4, d


class TestViewport:
    def test_viewport_is_empty(self):
        """tests.rs:181."""
        assert Viewport(0, 1).is_empty()
        assert Viewport(1, 0).is_empty()
        assert Viewport(100, 0).is_empty()
        assert not Viewport(100, 1).is_empty()
        assert not Viewport(10, 10).is_empty()
