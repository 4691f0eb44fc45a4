"""Table-maintenance layout ops (Engine.compact / Engine.zorder_write):
file-count and data-skipping properties measured on real parquet output.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from nocouncil_etl_spark.api import Engine
from nocouncil_etl_spark.io import load


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_compact_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    eng = Engine(spark)
    small = str(tmp_path / "small")
    ev = load(spark, sf_dir, "events")
    ev.repartition(64).write.parquet(small)  # the post-streaming shape
    assert len(_parquet_files(small)) >= 32

    out = str(tmp_path / "compacted")
    got = eng.compact(small, out, target_files=4)
    assert len(_parquet_files(out)) == 4
    assert got.count() == ev.count()
    cols = ["event_id", "user_id", "event_type"]
    assert got.select(cols).exceptAll(ev.select(cols)).count() == 0


def test_zorder_write_tightens_file_bounding_boxes(spark, sf_dir, tmp_path):
    """The point of Z-order: per-file (min,max) boxes over BOTH key columns
    shrink vs an unclustered layout, so stats-based skipping prunes on
    either predicate. Measured from the actual parquet column stats."""
    import pyarrow.parquet as pq

    eng = Engine(spark)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.floor(F.round("value", 2)).cast("long").alias("vbucket"),
    )

    plain_dir = str(tmp_path / "plain")
    ev.repartition(8).write.parquet(plain_dir)  # round-robin: no locality
    z_dir = str(tmp_path / "zorder")
    eng.zorder_write(ev, z_dir, "user_id", "vbucket", n_files=8)

    def total_box_area(path: str) -> float:
        area = 0.0
        for f in _parquet_files(path):
            md = pq.ParquetFile(f).metadata
            lo = {"user_id": None, "vbucket": None}
            hi = {"user_id": None, "vbucket": None}
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        s = col.statistics
                        lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                        hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
            if lo["user_id"] is None or lo["vbucket"] is None:
                continue
            area += (hi["user_id"] - lo["user_id"] + 1) * (
                hi["vbucket"] - lo["vbucket"] + 1
            )
        return area

    plain_area = total_box_area(plain_dir)
    z_area = total_box_area(z_dir)
    # every round-robin file spans ~the full domain; z-ordered files must
    # cover materially less joint area (=> stats-based skipping works)
    assert z_area < plain_area * 0.6, (z_area, plain_area)

    # and the clustered table still holds exactly the same rows
    got = spark.read.parquet(z_dir)
    assert got.count() == ev.count()
    assert got.exceptAll(ev).count() == 0


def test_sorted_write_files_are_disjoint_ranges(spark, sf_dir, tmp_path):
    """Engine.sorted_write: per-file [min,max] ranges on the sort column
    must not overlap — the property that lets min/max stats prune a point
    lookup to one file."""
    import pyarrow.parquet as pq

    eng = Engine(spark)
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    out = str(tmp_path / "sorted")
    got = eng.sorted_write(ev, out, "event_id", n_files=6)
    assert got.count() == ev.count()

    ranges = []
    for f in _parquet_files(out):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                if col.path_in_schema == "event_id" and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2
    for (pl, ph), (nl, nh) in zip(ranges, ranges[1:]):
        assert ph < nl, f"file ranges overlap: ({pl},{ph}) vs ({nl},{nh})"


def test_publish_versioned_atomic_pointer_swap(spark, sf_dir, tmp_path):
    """Engine.publish_versioned: each publish lands in a new immutable
    version dir and the CURRENT pointer swaps atomically; read_current
    always sees a complete snapshot, and old versions stay readable."""
    eng = Engine(spark)
    root = str(tmp_path / "vtab")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")

    v1 = eng.publish_versioned(docs, root)
    assert v1 == 1
    assert eng.read_current(root).count() == docs.count()

    half = docs.filter(F.col("doc_id") % 2 == 0)
    v2 = eng.publish_versioned(half, root)
    assert v2 == 2
    assert eng.read_current(root).count() == half.count()
    # rollback = the old version is still there, intact
    assert spark.read.parquet(f"{root}/v=1").count() == docs.count()


def test_observation_metrics_track_quality_gate(spark, sf_dir):
    """Pipeline observability: df.observe() accumulates gate metrics AS the
    job runs (no second pass) — the counters a production curation run
    exports to its metrics sink. Observed values must equal recomputed
    ones."""
    from pyspark.sql import Observation

    docs = load(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    obs = Observation("gate")
    gated = (
        docs.withColumn("n_words", n_words)
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.count(F.when(F.col("n_words") < 10, 1)).alias("too_short"),
            F.sum("n_words").alias("tok_in"),
        )
        .filter(F.col("n_words") >= 10)
    )
    kept = gated.count()  # one action drives both the filter and the metrics
    m = obs.get
    assert m["rows_in"] == docs.count()
    assert m["rows_in"] - m["too_short"] == kept
    assert m["tok_in"] == docs.select(F.sum(n_words)).collect()[0][0]


def test_engine_checksum_detects_any_row_change(spark, sf_dir):
    """Engine.checksum: identical frames agree; any dropped, changed, or
    duplicated row flips the (count, xor) pair."""
    eng = Engine(spark)
    docs = load(spark, sf_dir, "documents")
    cols = ["doc_id", "source"]
    a = eng.checksum(docs, cols)
    assert a == eng.checksum(docs.orderBy(F.rand(7)), cols)  # order-free
    assert a != eng.checksum(docs.filter(F.col("doc_id") != 3), cols)
    mutated = docs.withColumn(
        "source",
        F.when(F.col("doc_id") == 3, F.lit("x")).otherwise(F.col("source")),
    )
    assert a != eng.checksum(mutated, cols)
    assert a != eng.checksum(docs.unionByName(docs.limit(1)), cols)
