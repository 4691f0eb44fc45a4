"""Semantic invariants for breadth-6 (Holt forecast, CUSUM, BPE merges)."""

from __future__ import annotations

import re

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth6 import ALPHA_N, BETA_N, BPE_TOP, FORECAST_H, FP
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_holt_tracks_float_reference(spark, sf_dir):
    """The per-mille fixed point must stay within 1% of the float Holt on
    the same series, and forecast rows must extrapolate linearly."""
    rows = sorted(_run("ts_holt_forecast", spark, sf_dir).collect(), key=lambda r: r.idx)
    fitted = [r for r in rows if r.observed is not None]
    fc = [r for r in rows if r.observed is None]
    assert len(fc) == FORECAST_H
    # float reference
    cs = [fitted[0].level_fp // FP] + [r.observed for r in fitted]  # c0 = init level
    a, b = ALPHA_N / FP, BETA_N / FP
    lf, tf = float(cs[0]), float(cs[1] - cs[0])
    for i, r in enumerate(fitted):
        if i > 0:
            nl = a * r.observed + (1 - a) * (lf + tf)
            tf = b * (nl - lf) + (1 - b) * tf
            lf = nl
        ref = lf + tf
        assert abs(r.one_ahead - ref) <= max(1.0, 0.01 * abs(ref)), (
            f"idx {r.idx}: fp {r.one_ahead} vs float {ref}"
        )
    # linear forecast spacing = terminal trend
    t_term = fc[0].trend_fp / FP
    for p, q in zip(fc, fc[1:]):
        assert abs((q.one_ahead - p.one_ahead) - t_term) < 0.01 + 1e-9


def test_cusum_telescopes_to_zero_with_one_changepoint(spark, sf_dir):
    rows = sorted(_run("ts_cusum_changepoint", spark, sf_dir).collect(), key=lambda r: r.day)
    assert rows
    # Σ (D·c − total) over all days telescopes to exactly 0
    assert rows[-1].cusum == 0
    flags = [r for r in rows if r.changepoint == 1]
    assert len(flags) == 1
    peak = max(abs(r.cusum) for r in rows)
    assert abs(flags[0].cusum) == peak


def test_bpe_top_pair_matches_python(spark, sf_dir):
    rows = _run("tokenize_bpe_top_merges", spark, sf_dir).collect()
    assert rows and len(rows) <= BPE_TOP
    assert all(len(r.pair) == 2 for r in rows)
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    # Python recount
    docs = load(spark, sf_dir, "documents").select("text").collect()
    vocab: dict[str, int] = {}
    for d in docs:
        for t in re.split("[^a-z0-9]+", d.text.lower()):
            if t:
                vocab[t] = vocab.get(t, 0) + 1
    counts: dict[str, int] = {}
    for w, wc in vocab.items():
        for i in range(len(w) - 1):
            counts[w[i : i + 2]] = counts.get(w[i : i + 2], 0) + wc
    best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r.pair, r.n) for r in rows] == best
