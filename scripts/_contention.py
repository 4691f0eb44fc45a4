"""Shared contention sentinel for the sf1/SCALE measurement scripts
(round-10 verdict #5): bench.py grew dual calibration probes + a loadavg
gate in round 10; the scale-factor tables that adjudicate 10× claims must
carry the same self-labeling so future factor rows are readable without
re-running them.

Usage (inside a bench_scale_* script, around the measurement block):

    from _contention import Sentinel
    s = Sentinel(spark)            # samples loadavg + calibration probe
    ... measurements ...
    flags = s.finish()             # second probe + verdict dict
    # cite flags in the SCALE.md table header for the block

The rules mirror bench.py exactly (one source of truth for the thresholds
would be nicer, but bench.py is contractually a standalone driver CLI and
scripts/ must not import from it at runtime; the values are pinned by
test_contention_sentinel_rules_match_bench):
- loadavg gate: 1-min loadavg > 4.0 at block start;
- asymmetric probe drift: the after-probe slower than the before-probe by
  >20% (the JVM only gets FASTER within a run as C2 tiers up, so a
  symmetric rule misfires on every run — r10 measured the probe decaying
  0.16 → 0.05 s across a suite);
- front-loaded load: the before-probe both absolutely slow (>0.2 s) and
  >2.5× the after-probe. The first two rules are blind to load that dies
  DURING the run: loadavg can decay under the gate before the start probe
  fires while the machine is still degraded (round 11 measured a bench
  run reporting contended: false with a 0.487 s start probe and a 130 s
  total on code whose quiet total is ~65 s). JIT tiering alone decays the
  probe ≤~2× from a ≤0.15 s start, so both bounds together separate
  warm-up from contention.
"""

from __future__ import annotations

import os
import statistics
import time

LOADAVG_GATE = 4.0
DRIFT_GATE = 1.2
FRONTLOAD_ABS = 0.2
FRONTLOAD_RATIO = 2.5


def calibrate(spark) -> float:
    """Machine-speed probe: fixed-size whole-stage-codegen range sum,
    independent of repo code or data — identical to bench.py's."""
    cal: list[float] = []
    for i in range(4):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        if i > 0:
            cal.append(time.perf_counter() - t0)
    return round(statistics.median(cal), 3)


def calibrate_python() -> float:
    """Python-kernel speed probe: a fixed int64 numpy matmul (NON-BLAS —
    numpy integer matmul is a compiled loop, like the mutual-kNN /
    hamming kernels' hot path). The JVM probe cannot label drift in the
    Arrow/numpy-bound queries: round 11 measured vec_knn_graph_mutual
    ~1.8× its r10 wall at BOTH SFs on a quiet machine while the JVM probe
    matched r10's (0.13 vs 0.14 s) — the movement was in the Python
    kernel environment, invisible to a codegen probe. Factor rows over
    Arrow kernels cite THIS number alongside the JVM one."""
    import numpy as np

    rng = np.arange(640_000, dtype=np.int64).reshape(800, 800) % 1000
    cal: list[float] = []
    for i in range(3):
        t0 = time.perf_counter()
        (rng @ rng.T).sum()
        if i > 0:
            cal.append(time.perf_counter() - t0)
    return round(statistics.median(cal), 3)


class Sentinel:
    def __init__(self, spark):
        self._spark = spark
        self.loadavg_start = (
            os.getloadavg()[0] if hasattr(os, "getloadavg") else 0.0
        )
        self.calibration = calibrate(spark)
        self.py_calibration = calibrate_python()

    def finish(self) -> dict:
        calibration_after = calibrate(self._spark)
        contended = (
            self.loadavg_start > LOADAVG_GATE
            or (
                self.calibration > 0
                and calibration_after / self.calibration > DRIFT_GATE
            )
            or (
                self.calibration > FRONTLOAD_ABS
                and calibration_after > 0
                and self.calibration / calibration_after > FRONTLOAD_RATIO
            )
        )
        return {
            "loadavg_start": round(self.loadavg_start, 2),
            "calibration_sec": self.calibration,
            "calibration_after_sec": calibration_after,
            "py_calibration_sec": self.py_calibration,
            "py_calibration_after_sec": calibrate_python(),
            "contended": contended,
        }
