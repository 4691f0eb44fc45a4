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
