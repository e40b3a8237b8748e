import io
import re
import time
from contextlib import redirect_stdout

from vmap_tpu.utils.profiling import StageTimer, performance_measure


def test_stage_timer_accumulates_and_reports():
    t = StageTimer(enabled=True)
    for _ in range(3):
        with t("stage_a"):
            time.sleep(0.002)
    with t("stage_b"):
        pass
    buf = io.StringIO()
    with redirect_stdout(buf):
        out = t.report()
    assert set(out) == {"stage_a", "stage_b"}
    assert out["stage_a"] >= 2.0  # ms, mean of 3 sleeps
    assert "stage_a" in buf.getvalue()
    # report resets
    assert t.report() == {} or t.totals == {}


def test_stage_timer_disabled_is_noop():
    t = StageTimer(enabled=False)
    with t("x"):
        pass
    assert t.report() == {}


def test_performance_measure_prints_ms():
    buf = io.StringIO()
    with redirect_stdout(buf):
        with performance_measure("unit"):
            time.sleep(0.001)
    line = buf.getvalue()
    assert "unit execution time:" in line
    ms = float(re.search(r"([\d.]+) ms", line).group(1))
    assert ms >= 1.0
