"""Record-mode camera scripts (desktop/src/record/script.rs)."""

import json

import numpy as np
import pytest


def _mk(times, values, look=None):
    from aic_tpu.apps.record_script import CameraScript

    d = {"position": {"times": times, "values": values}}
    if look:
        d["look_direction"] = look
    return CameraScript.from_dict(d)


class TestCameraScript:
    def test_lerp_between_keyframes(self):
        s = _mk([0.0, 2.0], [[0, 0, 0], [10, 4, 2]])
        np.testing.assert_allclose(s.position.get(1.0), [5, 2, 1])

    def test_clamped_extrapolation(self):
        """script.rs Data::get: constant beyond the keyframe range."""
        s = _mk([1.0, 2.0], [[1, 1, 1], [3, 3, 3]])
        np.testing.assert_allclose(s.position.get(0.0), [1, 1, 1])
        np.testing.assert_allclose(s.position.get(9.0), [3, 3, 3])

    def test_duplicate_times_no_nan(self):
        s = _mk([1.0, 1.0], [[0, 0, 0], [2, 2, 2]])
        assert np.isfinite(s.position.get(1.0)).all()

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            _mk([2.0, 1.0], [[0, 0, 0], [1, 1, 1]])  # decreasing times
        with pytest.raises(ValueError):
            _mk([0.0], [[0, 0], [1, 1]])  # shape mismatch

    def test_round_trip_file(self, tmp_path):
        from aic_tpu.apps.record_script import CameraScript

        s = CameraScript()
        s.add_frame(0.0, (0, 0, 0), (0, 0, -1))
        s.add_frame(1.0, (4, 0, 0), (1, 0, 0))
        p = tmp_path / "script.json"
        p.write_text(json.dumps(s.to_dict()))
        s2 = CameraScript.from_file(str(p))
        np.testing.assert_allclose(s2.position.get(0.5), [2, 0, 0])
        np.testing.assert_allclose(s2.look_direction.get(0.0), [0, 0, -1])

    def test_camera_at_uses_fallback_for_missing_channels(self):
        from aic_tpu.raytrace import Camera, GraphicsOptions, Viewport

        s = _mk([0.0, 1.0], [[0, 5, 0], [10, 5, 0]])
        cam = Camera(GraphicsOptions(), Viewport(8, 8))
        s.camera_at(0.5, cam, (9, 9, 9), (5, 5, -10))
        np.testing.assert_allclose(np.asarray(cam.view_position), [5, 5, 0])


class TestPerformanceBehavior:
    def test_performance_drives_character_body(self):
        from aic_tpu.apps.record_script import CameraScript, Performance
        from aic_tpu.content.template import TemplateParameters, build_universe

        # build_universe already inserts the "player" character (body 0);
        # drive THAT body — a second insert_character("player") is a
        # duplicate-name error (universe.rs InsertError::AlreadyExists).
        u = build_universe("cornell-box", TemplateParameters(size=8))
        u.light_rounds_per_tick = 0
        idx = u.characters["player"].body_index
        s = CameraScript.from_dict(
            {
                "position": {"times": [0.0, 1.0], "values": [[1, 6, 1], [7, 6, 7]]},
                "look_direction": {"times": [0.0], "values": [[0, 0, -1]]},
            }
        )
        u.add_behavior("player", Performance(s))
        u.step()
        pos = np.asarray(u.bodies.position)[idx]
        # Physics runs after behaviors (space/step.rs ordering), so the
        # scripted position carries one tick of gravity (g·dt² ≈ 6e-3).
        np.testing.assert_allclose(pos, [1, 6, 1], atol=2e-2)
        # Look direction (0,0,-1) → yaw 0, pitch 0.
        assert abs(float(np.asarray(u.bodies.yaw)[idx])) < 1e-4
        for _ in range(30):
            u.step()
        pos = np.asarray(u.bodies.position)[idx]
        assert pos[0] > 1.5  # moved along the scripted path

    def test_insert_duplicate_character_raises(self):
        from aic_tpu.content.template import TemplateParameters, build_universe

        u = build_universe("cornell-box", TemplateParameters(size=8))
        with pytest.raises(ValueError, match="already exists"):
            u.insert_character("player", next(iter(u.spaces)), (4.0, 4.0, 4.0))

    def test_record_cli_accepts_script(self, tmp_path):
        import os
        import subprocess
        import sys

        script = tmp_path / "s.json"
        script.write_text(
            json.dumps(
                {
                    "position": {
                        "times": [0.0, 0.2],
                        "values": [[12, 6, 12], [2, 6, 2]],
                    }
                }
            )
        )
        out = tmp_path / "out.png"
        r = subprocess.run(
            [
                sys.executable, "-m", "aic_tpu.main",
                "--graphics", "record", "--template", "cornell-box",
                "--size", "8", "--width", "24", "--height", "16",
                "--frames", "3", "--no-relight",
                "--camera-script", str(script), "--output", str(out),
            ],
            capture_output=True,
            text=True,
            timeout=600,
            # Hermetic CPU subprocess: PALLAS_AXON_* would make the TPU
            # plugin's sitecustomize dial the single-session device relay
            # at interpreter start, which blocks forever while the parent
            # pytest process holds its own session (observed as a futex
            # hang before any output).
            env={
                **{
                    k: v
                    for k, v in os.environ.items()
                    if not k.startswith("PALLAS_AXON")
                },
                "JAX_PLATFORMS": "cpu",
            },
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert out.exists()
