"""Partition-pruning proof (SURVEY.md §4.1 partition-pruning row): a
date-partitioned table layout prunes at the directory level — the engine's
intended layout for segment/summary tables (partition by meeting date).
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


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    days = [r.day for r in ev.select("day").distinct().orderBy("day").limit(2).collect()]
    back = spark.read.parquet(out).filter(F.col("day") == days[0])

    plan = _plan(back)
    assert "PartitionFilters" in plan and "day" in plan
    # pruned scan reads exactly the one partition
    expect = ev.filter(F.col("day") == days[0]).count()
    assert back.count() == expect


def test_partition_pruning_skips_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev2")
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    one_day = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    # number of files touched == files of that one partition directory
    import glob as g

    files_all = len(g.glob(f"{out}/day=*/*.parquet"))
    files_day = len(g.glob(f"{out}/day=2024-01-05/*.parquet"))
    assert files_day < files_all
    assert one_day.count() > 0
