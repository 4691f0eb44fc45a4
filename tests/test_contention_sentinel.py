"""scripts/_contention.Sentinel — the scale-measurement twin of bench.py's
contention sentinel (round-10 verdict #5). Pins that the two rule sets
cannot drift apart and that the verdict logic is the documented asymmetric
one.
"""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "contention_under_test", os.path.join(REPO, "scripts", "_contention.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contention_sentinel_rules_match_bench():
    """bench.py hard-codes loadavg > 4.0 and after/before > 1.2; the scale
    scripts' shared helper must use the same numbers or factor tables stop
    being comparable to BENCH_r{N} flags."""
    mod = _mod()
    with open(os.path.join(REPO, "bench.py"), encoding="utf-8") as fh:
        bench = fh.read()
    m_load = re.search(r"load_start > (\d+\.\d+)", bench)
    m_drift = re.search(r"calibration_after / calibration > (\d+\.\d+)", bench)
    m_abs = re.search(r"\(\s*calibration > (\d+\.\d+)", bench)
    m_front = re.search(r"calibration / calibration_after > (\d+\.\d+)", bench)
    assert m_load and float(m_load.group(1)) == mod.LOADAVG_GATE
    assert m_drift and float(m_drift.group(1)) == mod.DRIFT_GATE
    assert m_abs and float(m_abs.group(1)) == mod.FRONTLOAD_ABS
    assert m_front and float(m_front.group(1)) == mod.FRONTLOAD_RATIO


def test_sentinel_verdict_is_asymmetric(monkeypatch):
    """A FASTER after-probe (JIT tiering within the run) must not flag; a
    >20% slower one must; a hot loadavg at start must regardless of probes."""
    mod = _mod()

    class FakeSentinel(mod.Sentinel):
        def __init__(self, load, before, after):
            self._after = after
            self.loadavg_start = load
            self.calibration = before
            self.py_calibration = 0.1
            self._spark = None

        def finish(self):
            mod.calibrate, orig = (lambda s: self._after), mod.calibrate
            try:
                return super().finish()
            finally:
                mod.calibrate = orig

    assert FakeSentinel(0.5, 0.16, 0.05).finish()["contended"] is False
    assert FakeSentinel(0.5, 0.10, 0.13).finish()["contended"] is True
    assert FakeSentinel(6.9, 0.10, 0.05).finish()["contended"] is True
    # front-loaded contention (round 11): start probe absolutely slow AND
    # far above the after-probe — JIT decay can't explain it
    assert FakeSentinel(0.5, 0.487, 0.111).finish()["contended"] is True
    # ...but a fast start probe with a big ratio is ordinary C2 tiering
    # (r10 measured 0.16 → 0.05), and r10's 0.130 → 0.067 is under both
    # bounds: neither may flag
    assert FakeSentinel(0.5, 0.130, 0.067).finish()["contended"] is False


def test_sentinel_reports_all_fields(spark):
    mod = _mod()
    s = mod.Sentinel(spark)
    flags = s.finish()
    assert set(flags) == {
        "loadavg_start",
        "calibration_sec",
        "calibration_after_sec",
        "py_calibration_sec",
        "py_calibration_after_sec",
        "contended",
    }
    assert flags["calibration_sec"] > 0
    assert flags["py_calibration_sec"] > 0
