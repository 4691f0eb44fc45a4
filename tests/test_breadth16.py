"""Invariants for breadth batch 16 (SPRT, Fleiss κ) + a dynamic-partition-
pruning plan proof (the runtime sibling of the static pruning tests in
test_partitioned_layout.py)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.breadth16 import A_CONV, A_NONC, B_LO, B_UP
from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# stat_sprt_sequential
# --------------------------------------------------------------------------


def test_sprt_llr_is_the_exact_running_sum(spark, sf_dir):
    rows = sorted(
        REG["stat_sprt_sequential"].fn(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    run = 0
    for r in rows:
        run += r.conv * A_CONV + r.nonc * A_NONC
        assert r.llr_1e6 == run
        if r.llr_1e6 >= B_UP:
            assert r.decision == "accept_h1"
        elif r.llr_1e6 <= B_LO:
            assert r.decision == "accept_h0"
        else:
            assert r.decision == "continue"


def test_sprt_stop_day_is_first_boundary_crossing(spark, sf_dir):
    rows = sorted(
        REG["stat_sprt_sequential"].fn(spark, sf_dir).collect(), key=lambda r: r.day
    )
    stops = [r for r in rows if r.is_stop_day == 1]
    crossings = [r for r in rows if r.decision != "continue"]
    if crossings:
        assert len(stops) == 1
        assert stops[0].day == crossings[0].day
    else:
        assert not stops


# --------------------------------------------------------------------------
# eval_fleiss_kappa
# --------------------------------------------------------------------------


def test_fleiss_kappa_bounds_and_agreement_signal(spark, sf_dir):
    row = REG["eval_fleiss_kappa"].fn(spark, sf_dir).collect()[0]
    assert 0 <= row.p_bar <= 1
    assert 0 < row.p_e < 1
    assert row.kappa <= 1
    # raters share a base category with only 15% noise each: agreement
    # must be well above chance
    assert row.kappa > 0.4


def test_fleiss_kappa_collapses_to_one_for_identical_raters(spark, sf_dir):
    """Noise-free raters (the base category thrice) ⇒ P̄ = 1 ⇒ κ = 1; checked
    by rebuilding the metric with the noise clause removed."""
    ev = load(spark, sf_dir, "events")
    base = (
        F.when(F.col("event_type").isin("purchase", "signup"), 0)
        .when(F.col("event_type") == "error", 1)
        .otherwise(2)
    ).cast("long")
    votes = ev.select("event_id", base.alias("cat"))
    longf = votes.unionByName(votes).unionByName(votes)
    per_item = (
        longf.groupBy("event_id", "cat")
        .agg(F.count("*").alias("c"))
        .groupBy("event_id")
        .agg(F.sum(F.col("c") * (F.col("c") - 1)).alias("pairs"))
    )
    tot = per_item.agg(F.count("*").alias("n"), F.sum("pairs").alias("s")).collect()[0]
    assert tot.s == tot.n * 6  # m(m-1) = 6 agreeing pairs per item


# --------------------------------------------------------------------------
# dynamic partition pruning
# --------------------------------------------------------------------------


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dynamic_partition_pruning_on_dim_filtered_join(spark, sf_dir, tmp_path):
    """A fact table partitioned by day, joined to a FILTERED tiny dim on the
    partition column, must prune fact partitions at RUNTIME from the dim's
    build side (Spark DPP) — the 100 TB idiom where the date filter lives
    on the dimension, not the fact scan."""
    out = str(tmp_path / "fact_by_day")
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    fact = spark.read.parquet(out)
    days = [r.day for r in ev.select("day").distinct().orderBy("day").limit(2).collect()]
    dim = spark.createDataFrame(
        [(d, f"label-{i}") for i, d in enumerate(days)], "day STRING, label STRING"
    ).filter(F.col("label") == "label-0")
    joined = fact.join(dim, "day").groupBy("day").agg(F.count("*").alias("n"))
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # partition-column type inference reads `day` back as DATE — stringify
    got = {str(r.day): r.n for r in joined.collect()}
    expect = ev.filter(F.col("day") == days[0]).count()
    assert got == {days[0]: expect}
