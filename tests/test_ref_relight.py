"""The C++ reference-procedure relight (native/ref_relight.cpp): the
perf denominator for BASELINE's ">=10x faster than reference
evaluate_light" target, validated against the Python emulation of the
same procedure (light/refproc.py) on a small scene."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # refproc convergence is minutes on CPU

from aic_tpu.content import cornell_box
from aic_tpu.light.refproc import evaluate_light_reference
from aic_tpu.math import lightpack


def test_ref_relight_matches_refproc():
    try:
        from aic_tpu.native import ref_relight_state
    except ImportError:
        pytest.skip("native unavailable")
    state = cornell_box(10).snapshot()
    secs, updates, light = ref_relight_state(state, return_light=True)
    assert updates > 0 and secs > 0

    ours = np.asarray(evaluate_light_reference(state).light)
    # Statuses must agree exactly; packed values within a few steps
    # (pop order within a priority bucket is arbitrary in the reference,
    # queue.rs:224, so stall patterns differ slightly).
    assert (light[..., 3] == ours[..., 3]).all()
    vis = light[..., 3] == lightpack.STATUS_VISIBLE
    diff = np.abs(
        light[..., :3].astype(int) - ours[..., :3].astype(int)
    )[vis]
    assert diff.max() <= 4
    a = lightpack.DECODE_TABLE[light[..., :3]][vis]
    b = lightpack.DECODE_TABLE[ours[..., :3]][vis]
    assert np.abs(a - b).mean() < 0.01
