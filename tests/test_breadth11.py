"""Invariants for breadth batch 11 (GBDT stumps, ANOVA, ROUGE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.plans.breadth11 import GB_ROUNDS, ROUGE_SCALE
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# ml_gbdt_stump_rounds
# --------------------------------------------------------------------------


def test_gbdt_training_error_is_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        REG["ml_gbdt_stump_rounds"].fn(spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert len(rows) == GB_ROUNDS
    maes = [r.mae_after for r in rows]
    # L2 boosting with shrinkage: each committed stump cannot increase MAE
    # beyond noise; require non-increasing within 5%
    for a, b in zip(maes, maes[1:]):
        assert b <= a * 1.05, f"MAE rose across rounds: {maes}"
    for r in rows:
        assert r.n_left >= 1 and r.n_right >= 1
        assert r.gain > 0


def test_gbdt_is_deterministic(spark, sf_dir):
    a = sorted(
        REG["ml_gbdt_stump_rounds"].fn(spark, sf_dir).collect(), key=lambda r: r.round
    )
    b = sorted(
        REG["ml_gbdt_stump_rounds"].fn(spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --------------------------------------------------------------------------
# stat_anova_f_oneway
# --------------------------------------------------------------------------


def test_anova_partition_of_variance(spark, sf_dir):
    row = REG["stat_anova_f_oneway"].fn(spark, sf_dir).collect()[0]
    assert row.k >= 2
    assert row.n > row.k
    assert row.ssb >= 0
    assert row.ssw > 0
    assert row.f_value >= 0
    assert 0 <= row.eta_sq <= 1
    # SST check against a direct global computation
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.round(F.col("value") * 100).cast("long")
    m = ev.agg(
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents * cents).cast("long").alias("ss"),
        F.count("*").cast("long").alias("n"),
    ).collect()[0]
    sst = m.ss - (m.s / m.n) * m.s
    assert abs((row.ssb + row.ssw) - sst) / sst < 1e-6


# --------------------------------------------------------------------------
# eval_rouge_ngram
# --------------------------------------------------------------------------


def test_rouge_extractive_candidate_has_perfect_precision(spark, sf_dir):
    """The candidate is a verbatim prefix of the reference, so every
    candidate unigram occurs in the reference at least as often:
    clipped overlap = candidate length → precision = 1."""
    rows = REG["eval_rouge_ngram"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.r1_p_1e6 == ROUGE_SCALE
        assert 0 < r.r1_r_1e6 <= ROUGE_SCALE
        assert 0 < r.r1_f1_1e6 <= ROUGE_SCALE
        assert r.r2_f1_1e6 <= r.r1_f1_1e6 + 1  # bigram match ≤ unigram match


def test_rouge_recall_tracks_half_split(spark, sf_dir):
    """Candidate = first ⌈n/2⌉ tokens of the reference ⇒ unigram recall
    ≈ 1/2 exactly when tokens are distinct; with repeats it can only
    exceed that. Bound: recall ∈ [0.4, 1.0]."""
    rows = REG["eval_rouge_ngram"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.r1_r_1e6 >= int(0.4 * ROUGE_SCALE)


# --------------------------------------------------------------------------
# ml_gbdt_two_features
# --------------------------------------------------------------------------


def test_gbdt_two_features_dominates_single_feature(spark, sf_dir):
    """With a strictly larger candidate set per round, the first round's
    committed gain can't be worse than the single-feature trainer's."""
    one = sorted(
        REG["ml_gbdt_stump_rounds"].fn(spark, sf_dir).collect(), key=lambda r: r.round
    )
    two = sorted(
        REG["ml_gbdt_two_features"].fn(spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert len(two) == len(one)
    assert two[0].gain >= one[0].gain
    for r in two:
        assert r.feature in (1, 2)
        assert r.n_left >= 1 and r.n_right >= 1
    maes = [r.mae_after for r in two]
    for a, b in zip(maes, maes[1:]):
        assert b <= a * 1.05
