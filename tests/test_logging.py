"""Logging/telemetry tests (logging.rs install/AicLogger/progress/Rerun
stream analogs in aic_tpu/logging.py)."""

import io
import json
import logging as pylog

from aic_tpu.logging import ProgressBar, Telemetry, get_logger, install


def test_install_filters_foreign_modules():
    """logging.rs:128 AicLogger::enabled: app modules at the chosen
    level, foreign libraries clamped to ERROR."""
    buf = io.StringIO()
    install(verbose=True, simplify_log_format=True, stream=buf)
    get_logger("aic_tpu.test").debug("app debug visible")
    pylog.getLogger("jax.interpreters").warning("foreign warning hidden")
    pylog.getLogger("jax").error("foreign error visible")
    out = buf.getvalue()
    assert "app debug visible" in out
    assert "foreign warning hidden" not in out
    assert "foreign error visible" in out


def test_install_nonverbose_hides_debug():
    buf = io.StringIO()
    install(verbose=False, simplify_log_format=True, stream=buf)
    get_logger("aic_tpu.test").debug("quiet")
    get_logger("aic_tpu.test").info("loud")
    out = buf.getvalue()
    assert "quiet" not in out and "loud" in out


def test_progress_bar_cooperates_with_logging():
    """logging.rs:180 suspend_indicatif_in: a log record clears the bar
    line and the bar redraws after."""
    logbuf = io.StringIO()
    barbuf = io.StringIO()
    install(verbose=False, simplify_log_format=True, stream=logbuf)
    with ProgressBar(10, "work", stream=barbuf) as bar:
        bar.advance(5)
        get_logger("aic_tpu.test").info("midway")
    out = barbuf.getvalue()
    assert "5/10" in out
    assert "\x1b[K" in out  # bar cleared around the record and at exit
    assert "midway" in logbuf.getvalue()


def test_telemetry_stream_records_universe_steps(tmp_path):
    """Telemetry (Rerun-stream analog) captures per-step phase data."""
    from aic_tpu import block
    from aic_tpu.math.grid import GridAab
    from aic_tpu.space import Space
    from aic_tpu.universe import Universe

    path = str(tmp_path / "tele.jsonl")
    sp = Space(GridAab.from_lower_size((0, 0, 0), (3, 3, 3)))
    sp.set((1, 1, 1), block.from_color((1, 0, 0, 1)))
    u = Universe()
    u.light_rounds_per_tick = 0
    u.insert_space("w", sp)
    tele = Telemetry(path)
    tele.attach_to_universe(u)
    for _ in range(3):
        u.step()
    tele.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3
    assert lines[0]["kind"] == "universe_step"
    assert "phases" in lines[0] and "wall_ms" in lines[0]
    assert lines[2]["tick"] == 2
