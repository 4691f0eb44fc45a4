"""Engine facade verbs over the round-5 kernels: row-identity against the
oracle-checked catalog twins (the test_api discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.api import Engine
from nocouncil_etl_spark.plans.breadth10 import HITS_ITERS, REC_TOPK
from nocouncil_etl_spark.plans.graph_plans import _graph
from nocouncil_etl_spark.plans.mlprep4 import HASH_SPACE, ISO_BINS
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_engine_hits_matches_catalog_twin(spark, sf_dir):
    eng = Engine(spark)
    _, edges, _ = _graph(spark, sf_dir)
    scores = eng.hits(edges.select("src", "dst"), iters=HITS_ITERS)
    top = REG["graph_hits_hubs_auth"].fn(spark, sf_dir)
    joined = top.join(
        scores.select(
            F.col("node"),
            F.col("a").alias("a2"),
            F.col("h").alias("h2"),
        ),
        "node",
    )
    bad = joined.filter(
        (F.col("auth_1e6") != F.col("a2")) | (F.col("hub_1e6") != F.col("h2"))
    ).count()
    assert bad == 0
    scores.unpersist()


def test_engine_covisitation_matches_catalog_twin(spark, sf_dir):
    eng = Engine(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mine = eng.covisitation(li, "l_orderkey", "l_partkey", k=REC_TOPK)
    twin = REG["rec_item_covisitation"].fn(spark, sf_dir)
    assert _rows(mine) == _rows(twin)


def test_engine_isotonic_matches_catalog_twin(spark, sf_dir):
    eng = Engine(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("iso#"), F.col("event_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long") / F.lit(HASH_SPACE)
    scored = ev.select(F.round((2.0 * u + y) / 3.0, 6).alias("p"), y.alias("y"))
    mine = eng.isotonic_calibrate(scored, "p", "y", n_bins=ISO_BINS)
    twin = REG["ml_isotonic_calibration"].fn(spark, sf_dir)
    assert _rows(mine) == _rows(twin)


def test_engine_rouge_matches_catalog_twin(spark, sf_dir):
    eng = Engine(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.col("text").alias("ref_text"),
        F.array_join(
            F.expr(
                "slice(split(text, ' '), 1, greatest(CAST(size(split(text, ' ')) / 2 AS INT), 1))"
            ),
            " ",
        ).alias("cand_text"),
    )
    mine = eng.rouge(toks, "doc_id", "ref_text", "cand_text")
    twin = REG["eval_rouge_ngram"].fn(spark, sf_dir)
    assert _rows(mine) == _rows(twin)


def test_engine_rouge_identical_texts_score_perfect(spark, sf_dir):
    eng = Engine(spark)
    df = spark.createDataFrame(
        [(1, "a b c d", "a b c d"), (2, "x y", "x y")],
        "id BIGINT, ref STRING, cand STRING",
    )
    rows = {r.doc_id: r for r in eng.rouge(df, "id", "ref", "cand").collect()}
    for r in rows.values():
        assert r.r1_p_1e6 == r.r1_r_1e6 == r.r1_f1_1e6 == 1_000_000
