"""Bucketed-table join co-location (SURVEY.md §4.1 shuffle row): joining two
tables bucketed on the join key must not shuffle either side.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    warehouse = str(tmp_path / "wh")
    try:
        orders = load(spark, sf_dir, "orders")
        li = load(spark, sf_dir, "lineitem")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", f"{warehouse}/orders_b")
            .saveAsTable("orders_b")
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", f"{warehouse}/lineitem_b")
            .saveAsTable("lineitem_b")
        )
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, "bucketed join must be shuffle-free"
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_curated_corpus_publish_rejoins_without_shuffle(spark, sf_dir, tmp_path):
    """The curated-corpus publish layout (Engine.publish_bucketed): curate →
    bucketBy(doc_id) → downstream join-heavy consumers (contamination,
    split, pack) re-read and join WITHOUT an Exchange on either side, and a
    groupBy on the bucket key is shuffle-free too."""
    from nocouncil_etl_spark.api import Engine

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    eng = Engine(spark)
    wh = str(tmp_path / "wh")
    try:
        docs = load(spark, sf_dir, "documents")
        curated = docs.select(
            "doc_id", "source", F.size(F.split("text", " ")).alias("n_words")
        )
        t1 = eng.publish_bucketed(
            curated, "curated_docs_b", f"{wh}/curated_docs_b", "doc_id", buckets=8
        )
        t2 = eng.publish_bucketed(
            docs.select("doc_id", "lang"),
            "doc_lang_b", f"{wh}/doc_lang_b", "doc_id", buckets=8,
        )
        joined = t1.join(t2, "doc_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, "curated-corpus re-join must not shuffle"
        assert joined.count() == docs.count()
        agg = t1.groupBy("doc_id").agg(F.sum("n_words"))
        assert "Exchange" not in _plan(agg), "bucket-key groupBy must not shuffle"
    finally:
        spark.sql("DROP TABLE IF EXISTS curated_docs_b")
        spark.sql("DROP TABLE IF EXISTS doc_lang_b")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
