"""Breadth batch 5 structural/property tests (oracle parity runs in the
driver gate)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import load_all

REGISTRY = load_all()


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_transition_rows_sum_to_one(spark, sf_dir):
    out = _run("session_transitions", spark, sf_dir)
    sums = out.groupBy("from_type").agg(F.sum("p").alias("s")).collect()
    assert sums, "transition matrix is empty"
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-4, r


def test_ema_is_convex_combination(spark, sf_dir):
    """The truncated EMA (weights summing to 1 − 2⁻¹⁶) can never leave the
    [~min, max] envelope of its own 16-observation window."""
    out = _run("ts_ema_fixedpoint", spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-15, 0)
    env = ev.select(
        "event_id",
        F.max("value").over(w).alias("vmax"),
        F.min("value").over(w).alias("vmin"),
    )
    j = out.join(env, "event_id")
    assert j.filter(F.col("ema") > F.col("vmax") + 1e-4).count() == 0
    assert j.filter(F.col("ema") < F.col("vmin") * (1 - 2**-16) - 1e-4).count() == 0
    assert out.count() > 0


def test_cume_dist_bounds_and_completion(spark, sf_dir):
    out = _run("window_cume_dist", spark, sf_dir).cache()
    try:
        assert out.filter((F.col("cd") <= 0) | (F.col("cd") > 1)).count() == 0
        assert out.filter((F.col("pr") < 0) | (F.col("pr") > 1)).count() == 0
        # the largest value in every partition has cume_dist exactly 1
        tops = out.groupBy("event_type").agg(F.max("cd").alias("m")).collect()
        assert all(r["m"] == 1.0 for r in tops)
    finally:
        out.unpersist()


def test_inverted_index_postings_are_bounded_and_consistent(spark, sf_dir):
    out = _run("text_inverted_index", spark, sf_dir).cache()
    try:
        assert out.count() > 0
        assert out.filter(F.size("postings") > 5).count() == 0
        assert out.filter(F.col("n_occ") < F.col("n_docs")).count() == 0
        # every posting is doc:pos with a real doc id
        first = out.select(
            F.split(F.element_at("postings", 1), ":")[0].cast("long").alias("d")
        )
        docs = load(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("d")
        )
        assert first.join(docs, "d", "left_anti").count() == 0
    finally:
        out.unpersist()


def test_cooccurrence_bounded_by_vocab(spark, sf_dir):
    out = _run("text_term_cooccurrence", spark, sf_dir).cache()
    try:
        assert out.count() <= (50 * 49) // 2
        assert out.filter(F.isnan("pmi") | F.col("pmi").isNull()).count() == 0
        # co-occurrence count can never exceed either document frequency:
        # df columns aren't in the output, so check against a recount
        assert out.filter(F.col("n_pair") < 5).count() == 0
    finally:
        out.unpersist()


def test_regression_r2_in_unit_interval(spark, sf_dir):
    out = _run("agg_linear_regression", spark, sf_dir)
    assert out.filter((F.col("r2") < 0) | (F.col("r2") > 1)).count() == 0
    assert out.count() == 5
