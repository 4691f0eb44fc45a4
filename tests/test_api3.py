"""Row-identity / reconciliation between the round-5 continuation facade
verbs (rrf / mmr / k_anonymize / quantile_normalize) and their
oracle-checked catalog twins — the no-drift contract of test_api2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nocouncil_etl_spark.api import Engine
from nocouncil_etl_spark.registry import load_all

REG = load_all()


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mmr_verb_matches_catalog(eng, spark, sf_dir):
    from nocouncil_etl_spark.plans.pq_plans import QUERY_MOD  # noqa: F401
    from nocouncil_etl_spark.plans.mlprep_plans import CAND_N, LAM, MMR_K

    e = eng.table(sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    verb = eng.mmr(
        e, q, "vec_id", "embedding", cand_n=CAND_N, k=MMR_K, lam=LAM
    )
    twin = REG["search_mmr_rerank"].fn(spark, sf_dir)
    assert _rows(verb) == _rows(twin)


def test_quantile_normalize_verb_matches_catalog(eng, spark, sf_dir):
    docs = eng.table(sf_dir, "documents")
    verb = eng.quantile_normalize(docs, "doc_id", "n_chars", "source")
    twin = REG["curation_quantile_normalize"].fn(spark, sf_dir)
    assert _rows(verb) == _rows(twin)


def test_k_anonymize_reconciles_with_audit(eng, spark, sf_dir):
    from nocouncil_etl_spark.plans.privacy_plans import K_ANON

    cust = eng.table(sf_dir, "customer")
    published = eng.k_anonymize(
        cust, ["c_nationkey", "c_mktsegment"], k=K_ANON
    )
    audit = REG["privacy_k_anonymity"].fn(spark, sf_dir)
    want = audit.agg(F.sum("rows_published")).collect()[0][0]
    assert published.count() == want
    # every published QI group really has >= K members
    small = (
        published.groupBy("c_nationkey", "c_mktsegment")
        .count()
        .filter(F.col("count") < K_ANON)
    )
    assert small.count() == 0


def test_rrf_verb_math_and_absentee_handling(eng, spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, rank long"
    )
    dense = spark.createDataFrame(
        [(2, 1), (4, 2)], "id long, rank long"
    )
    out = {r["id"]: r for r in eng.rrf(
        {"lex": lex, "dense": dense}, "id", k0=60, top=10
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 2: 1/62 + 1/61 (rounded 6dp each); doc 4 dense-only; doc 1 lex-only
    assert out[2]["rrf"] == pytest.approx(
        round(1 / 62, 6) + round(1 / 61, 6), abs=1e-9
    )
    assert out[4]["lex_rank"] is None
    assert out[4]["rrf"] == pytest.approx(round(1 / 62, 6), abs=1e-9)
    assert out[2]["rrf"] > out[1]["rrf"]  # both-lists beats single-list here


def test_pit_join_verb_matches_catalog(eng, spark, sf_dir):
    from nocouncil_etl_spark.plans.featurestore_plans import (
        AS_OF_DAY,
        _features_spark,
    )

    feats, obs = _features_spark(spark, sf_dir)
    verb = eng.pit_join(
        obs,
        feats,
        obs_key="o_orderkey",
        entity_col="o_custkey",
        event_time_col="event_day",
        feat_entity_col="custkey",
        valid_col="valid_from",
        load_col="load_day",
        as_of=AS_OF_DAY,
        value_cols=["version", "feature_cents"],
    ).select("o_orderkey", "o_custkey", "event_day", "version", "feature_cents")
    twin = REG["join_feature_store_pit"].fn(spark, sf_dir)
    assert _rows(verb) == _rows(twin)


def test_cuped_verb_matches_catalog_statistics(eng, spark, sf_dir):
    """The verb over the catalog's own per-user pre/post frame must agree
    with eval_cuped_adjustment's theta and variance_reduction (the verb
    reports raw-cents variances where the catalog scales to currency²—
    compare the scale-free columns)."""
    from nocouncil_etl_spark.plans.experiment_plans import SPLIT_DAY

    ev = eng.table(sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(day < SPLIT_DAY, cents).otherwise(0))
        .cast("long")
        .alias("pre"),
        F.sum(F.when(day >= SPLIT_DAY, cents).otherwise(0))
        .cast("long")
        .alias("post"),
    )
    verb = eng.cuped(per_user, "user_id", "pre", "post").collect()[0]
    twin = REG["eval_cuped_adjustment"].fn(spark, sf_dir).collect()[0]
    assert verb["n_units"] == twin["n_users"]
    assert verb["theta"] == twin["theta"]
    assert verb["variance_reduction"] == twin["variance_reduction"]
