"""Salted band-key LSH (operators/dedup.salted_band_pairs /
lsh_near_duplicates_salted): result-identical to the unsalted join, bounded
per-shard bucket groups under planted pathological skew, no cartesian or
broadcast-nested-loop join anywhere in the pipeline.
"""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.dedup import (
    band_keys_from_signature,
    lsh_near_duplicates,
    lsh_near_duplicates_salted,
    make_shingle_udf,
    minhash_signatures,
    salted_band_pairs,
)
from nocouncil_etl_spark.plans.dedup_plans import (
    BOILER,
    JACCARD_THRESHOLD,
    N_BANDS,
    N_SALT,
    ROWS_PER_BAND,
    SHINGLE_N,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """The dedup_lsh_salted corpus: 10% of docs share one boilerplate
    template (a single pathological band bucket)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit(BOILER + " doc "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).cache()


@pytest.fixture(scope="module")
def banded(spark, planted):
    sh_udf = make_shingle_udf(SHINGLE_N)
    shd = planted.select("doc_id", sh_udf("text").alias("_sh"))
    sig = minhash_signatures(shd, "doc_id", "_sh", N_BANDS * ROWS_PER_BAND)
    return sig.select(
        "doc_id",
        F.explode(band_keys_from_signature(N_BANDS, ROWS_PER_BAND)).alias("band"),
    ).cache()


def test_salted_pairs_identical_to_unsalted(banded):
    """Correctness on ANY corpus, not just small buckets: the replicated
    salt makes every (a, b) pair meet exactly once per shared band."""
    a = banded.select(F.col("doc_id").alias("id_a"), "band")
    b = banded.select(F.col("doc_id").alias("id_b"), "band")
    unsalted = (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    salted = salted_band_pairs(banded, "doc_id", N_SALT)
    assert salted.exceptAll(unsalted).count() == 0
    assert unsalted.exceptAll(salted).count() == 0
    # the planted clique actually exists — this is a real hot bucket
    assert salted.count() >= 100


def test_salted_pipeline_matches_unsalted_pipeline(planted):
    kw = dict(
        id_col="doc_id",
        text_col="text",
        shingle_n=SHINGLE_N,
        n_bands=N_BANDS,
        rows_per_band=ROWS_PER_BAND,
        threshold=JACCARD_THRESHOLD,
    )
    want = lsh_near_duplicates(planted, **kw)
    got = lsh_near_duplicates_salted(planted, n_salt=N_SALT, **kw)
    try:
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        want.unpersist()
        got.unpersist()


def test_salt_bounds_per_shard_group_size(banded):
    """The point of the salt: the hottest (band) bucket's build-side group
    of size B becomes N_SALT (band, salt) groups of ~B/N_SALT each."""
    bucket = banded.groupBy("band").count()
    max_bucket = bucket.agg(F.max("count")).first()[0]
    assert max_bucket >= 40  # the planted bucket is genuinely pathological

    sharded = (
        banded.select(
            "band", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_SALT)).alias("salt")
        )
        .groupBy("band", "salt")
        .count()
    )
    max_shard = sharded.agg(F.max("count")).first()[0]
    # hash salt: shard sizes are ~Binomial(B, 1/N_SALT); assert a ≥3x
    # reduction of the hottest bucket and a 2x-of-mean ceiling
    assert max_shard * 3 <= max_bucket
    assert max_shard <= 2 * math.ceil(max_bucket / N_SALT)


def test_salted_join_plan_has_no_cartesian(banded):
    salted = salted_band_pairs(banded, "doc_id", N_SALT)
    plan = _plan(salted)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
