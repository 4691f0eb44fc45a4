"""Semantic invariants for the stats-2 batch (HLL, Kaplan-Meier,
bootstrap CI, path mining)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.stats2 import PATH_LEN
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_hll_estimate_tracks_exact(spark, sf_dir):
    rows = _run("sketch_hll_custom", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hll_est > 0
        # m=64 → ~13% standard error; allow 3σ
        assert r.rel_err < 0.4, f"{r.event_type}: est {r.hll_est} vs {r.n_exact}"


def test_kaplan_meier_is_monotone_survival(spark, sf_dir):
    rows = sorted(
        _run("survival_kaplan_meier", spark, sf_dir).collect(), key=lambda r: r.week
    )
    assert rows
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.deaths + r.censored for r in rows) == n_users
    assert rows[0].n_risk == n_users, "everyone is at risk at the first observed week"
    last = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= last + 1e-6, "survival must be non-increasing"
        last = r.survival
        assert r.deaths <= r.n_risk


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    r = _run("agg_bootstrap_ci", spark, sf_dir).collect()[0]
    assert r.ci_lo < r.ci_hi
    assert r.ci_lo <= r.mean_full <= r.ci_hi, (
        "a 90% bootstrap interval missing the full-sample mean at this "
        "sample size would indicate broken resampling"
    )
    # interval width sanity: not degenerate, not absurdly wide
    assert (r.ci_hi - r.ci_lo) / r.mean_full < 0.5


def test_top_paths_are_valid_sequences(spark, sf_dir):
    rows = _run("mine_top_paths", spark, sf_dir).collect()
    assert rows
    types = {
        r.event_type
        for r in load(spark, sf_dir, "events").select("event_type").distinct().collect()
    }
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r.path.split(">")
        assert len(steps) == PATH_LEN
        assert set(steps) <= types


def test_containment_detects_quoted_inclusion(spark, sf_dir):
    """Plant a doc that quotes a slice of another: containment of the
    smaller set must be 1.0 while Jaccard stays low."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.operators.dedup import shingles, words

    body = " ".join(f"word{i} item{i}" for i in range(60))
    big = "alpha beta gamma delta " + body
    quote = "alpha beta gamma delta"
    df = spark.createDataFrame([(1, big), (2, quote)], "doc_id INT, text STRING")
    sh = df.select("doc_id", F.array_distinct(shingles(words("text"), 2)).alias("s"))
    rows = {r.doc_id: set(r.s) for r in sh.collect()}
    inter = len(rows[1] & rows[2])
    assert inter / min(len(rows[1]), len(rows[2])) == 1.0
    assert inter / len(rows[1] | rows[2]) < 0.5


def test_containment_query_ranks_true_pairs_first(spark, sf_dir):
    rows = REG["dedup_containment"].fn(spark, sf_dir).collect()
    assert rows
    cs = [r.containment for r in rows]
    assert cs == sorted(cs, reverse=True)
    for r in rows:
        assert 0.0 <= r.containment <= 1.0
        assert r.n_shared >= 1, "candidates share at least the min shingle"
