"""Golden-file tests for the source/sink surface that needs real files
(SURVEY.md §5.2-4): markdown corpus, JSON-array state, binaryFile scan,
JSONL declared-schema read.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

MD_DOC = """---
title: Council Meeting 2024-01-11
source: tribune
published: Thu, 11 Jan 2024 10:00:00 +0000
---
The council discussed the budget.
It was long."""

MD_NO_FM = "no frontmatter here, just body text"

MD_FENCE_IN_BODY = """---
title: tricky
---
body with a fence
---
still the same body"""


def test_markdown_corpus_roundtrip(spark, tmp_path):
    d = tmp_path / "md"
    d.mkdir()
    (d / "a.md").write_text(MD_DOC)
    (d / "b.md").write_text(MD_NO_FM)
    (d / "c.md").write_text(MD_FENCE_IN_BODY)

    from nocouncil_etl_spark.sources.markdown import read_markdown_corpus

    rows = {
        r.path.split("/")[-1]: r
        for r in read_markdown_corpus(spark, str(d)).collect()
    }
    a = rows["a.md"]
    assert a.meta["title"] == "Council Meeting 2024-01-11"
    assert a.meta["source"] == "tribune"
    assert a.body.startswith("The council discussed")
    # no frontmatter → empty meta, body intact
    b = rows["b.md"]
    assert b.body == MD_NO_FM and not b.meta
    # fence inside body: non-greedy block match keeps the body's fence
    c = rows["c.md"]
    assert c.meta["title"] == "tricky"
    assert "still the same body" in c.body


def test_markdown_render_inverse(spark, tmp_path):
    from nocouncil_etl_spark.sources.markdown import (
        frontmatter_body,
        frontmatter_map,
        render_markdown,
    )

    df = spark.createDataFrame([("t1", "bodytext",)], "title string, body string")
    md = df.select(
        render_markdown({"title": F.col("title")}, F.col("body")).alias("raw")
    )
    back = md.select(
        F.element_at(frontmatter_map("raw"), "title").alias("title"),
        frontmatter_body("raw").alias("body"),
    ).collect()[0]
    assert back.title == "t1" and back.body == "bodytext"


def test_json_array_state_roundtrip(spark, tmp_path):
    """S2/K2: whole-file JSON array as catalog state (articles.json)."""
    state = [
        {"id": "abc123", "url": "http://x/1", "title": "one"},
        {"id": "def456", "url": "http://x/2", "title": "two"},
    ]
    p = tmp_path / "articles.json"
    p.write_text(json.dumps(state, indent=2))

    from nocouncil_etl_spark.sources.jsonl import read_json_array

    df = read_json_array(spark, str(p), "id STRING, url STRING, title STRING")
    assert sorted(r.id for r in df.collect()) == ["abc123", "def456"]


def test_jsonl_declared_schema_and_corrupt_rows(spark, tmp_path):
    """S1: JSONL scan with declared schema; malformed lines become nulls
    (PERMISSIVE), never a crash — the reference's skip-and-log analogue."""
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"video": "a.mp4", "n": 1}\n'
        "NOT JSON AT ALL\n"
        '{"video": "b.mp4", "n": 2}\n'
    )
    from nocouncil_etl_spark.sources.jsonl import read_jsonl

    df = read_jsonl(spark, str(p), "video STRING, n BIGINT")
    rows = df.collect()
    assert len(rows) == 3
    assert sorted(r.video for r in rows if r.video) == ["a.mp4", "b.mp4"]


def test_binary_file_scan(spark, tmp_path):
    """S8-adjacent: binaryFile source — the multimodal ingestion path
    (.mp4 artifacts → (path, modificationTime, length, content))."""
    d = tmp_path / "media"
    d.mkdir()
    (d / "clip1.mp4").write_bytes(b"\x00\x01fakevideo")
    (d / "clip2.mp4").write_bytes(b"\x00\x02other")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mp4")
        .load(str(d))
    )
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    assert rows["clip1.mp4"].length == 11
    assert bytes(rows["clip1.mp4"].content)[:2] == b"\x00\x01"


def test_jsonl_write_partitioned(spark, tmp_path):
    """K1/K3: partitioned JSONL sink — one directory per key, the engine's
    version of one-file-per-entity layouts."""
    from nocouncil_etl_spark.sources.jsonl import read_jsonl

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    )
    out = str(tmp_path / "parts")
    df.write.partitionBy("k").mode("overwrite").json(out)
    back = spark.read.schema("v long, k string").json(out)
    assert back.count() == 3
    assert back.filter(F.col("k") == "a").count() == 2


def test_json_array_state_write_is_reference_format(spark, tmp_path):
    """K2 write side: the state file must be ONE pretty-printed JSON array
    (the reference's json.dump of articles.json) — plain json.load must read
    it, not just Spark."""
    import json as _json

    from nocouncil_etl_spark.sources.jsonl import (
        read_json_array,
        write_json_array_state,
    )

    df = spark.createDataFrame(
        [("abc", "http://x/1"), ("def", "http://x/2")], "id string, url string"
    )
    p = str(tmp_path / "articles.json")
    write_json_array_state(df, p)
    raw = _json.load(open(p))
    assert isinstance(raw, list) and len(raw) == 2
    assert {r["id"] for r in raw} == {"abc", "def"}
    back = read_json_array(spark, p, "id STRING, url STRING")
    assert sorted(r.id for r in back.collect()) == ["abc", "def"]


def test_corrupt_parquet_file_degrades_alone(spark, sf_dir, tmp_path):
    """100 TB read posture: one corrupt parquet file in a directory must
    not fail the scan — with ignoreCorruptFiles the valid files' rows
    survive and the poison file degrades alone (the file-level sibling of
    the PERMISSIVE JSONL quarantine)."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.io import load

    out = str(tmp_path / "mixed")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    docs.repartition(4).write.parquet(out)
    import glob
    import os

    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) >= 2
    with open(files[0], "wb") as fh:  # clobber one file's magic + body
        fh.write(b"NOTPARQUET" * 64)

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        got = spark.read.schema("doc_id long, source string").parquet(out)
        n = got.count()
        assert 0 < n < docs.count()
        # surviving rows are genuine rows, not junk
        assert got.join(docs, ["doc_id", "source"], "left_anti").count() == 0
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


def test_fan_out_widens_single_partition_input(spark):
    """io.fan_out must spread a 1-partition frame to the session's shuffle
    width (the explosive-transform contract: parallelism sized to output
    work, not input bytes) and preserve the rows exactly."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.io import fan_out

    df = spark.range(0, 1000, 1, 1).withColumn("v", F.col("id") * 2)
    assert df.rdd.getNumPartitions() == 1
    wide = fan_out(df)
    assert wide.rdd.getNumPartitions() == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert sorted(r.id for r in wide.collect()) == list(range(1000))
    assert fan_out(df, 7).rdd.getNumPartitions() == 7


def test_fan_out_if_narrow_is_noop_at_cluster_widths(spark):
    """io.fan_out_if_narrow: the compute-dense 1:1-map contract — widen a
    single-task local scan, but add NO shuffle when the input already plans
    at least the session's shuffle width (the 100 TB case, where the scan's
    byte-derived splits give ample parallelism)."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.io import fan_out_if_narrow

    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    narrow = spark.range(0, 1000, 1, 1).withColumn("v", F.col("id") * 2)
    widened = fan_out_if_narrow(narrow)
    assert widened.rdd.getNumPartitions() == width
    assert sorted(r.id for r in widened.collect()) == list(range(1000))

    wide = spark.range(0, 1000, 1, width + 3)
    same = fan_out_if_narrow(wide)
    assert same is wide  # structurally unchanged: no repartition node added


def test_fan_out_never_repartitions_down(spark, sf_dir):
    """io.fan_out's width FLOOR (round-10 verdict #1): a frame whose
    planned scan VOLUME already guarantees the target parallelism (stats
    sizeInBytes ≥ 2·target·maxPartitionBytes) comes back untouched —
    identical object, no Exchange — because at 100 TB the parquet scan
    plans far more tasks than shuffle.partitions and a repartition would
    shuffle the full input bytes while REDUCING the explode stage's
    parallelism. Small-volume frames always widen to the session width.
    The decision is byte-based on purpose (round 11): filters/projects
    don't change a scan's partitioning, so scan volume is what determines
    split count at cluster scale, and reading the optimizer statistic
    costs no physical planning (the .rdd probe it replaced cost ~110 ms
    per call site per plan build)."""
    from nocouncil_etl_spark.io import _est_width, fan_out, load

    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = load(spark, sf_dir, "documents")

    # simulate the 100 TB case: shrink the split size so the real parquet
    # file's volume implies far more splits than the session width
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
    try:
        wide = load(spark, sf_dir, "documents")
        assert _est_width(wide) >= 2 * width  # premise: volume-wide frame
        same = fan_out(wide)
        assert same is wide  # no Exchange: the 100 TB scan keeps its width
        assert fan_out(wide, 3) is wide  # smaller explicit target: floored
        # a filter doesn't change the scan's partitioning, so the floor
        # must survive one (Filter passes sizeInBytes through)
        filtered = wide.filter(wide.n_chars >= 0)
        assert fan_out(filtered) is filtered
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    # normal split size: the same scan is small-volume and must widen
    assert _est_width(docs) < 2 * width
    assert fan_out(docs).rdd.getNumPartitions() == width

    narrow = spark.range(0, 1000, 1, 1)
    assert fan_out(narrow).rdd.getNumPartitions() == width
    assert fan_out(narrow, 7).rdd.getNumPartitions() == 7


def test_est_width_tracks_scan_bytes_and_fast_paths_the_probe(
    spark, sf_dir, monkeypatch
):
    """io._est_width is the optimizer's sizeInBytes over maxPartitionBytes:
    for a parquet scan it must track the file's actual size (within the
    parquet-footer slack the optimizer reports), scale with the split-size
    conf, and degrade to 0.0 (= "repartition", the pre-floor behavior) when
    stats are unreachable. And fan_out_if_narrow's stats fast-path must
    SHORT-CIRCUIT the expensive .rdd probe on volume-wide frames — the
    whole point at cluster scale, where the probe itself costs a
    driver-side physical plan + split enumeration."""
    import os

    import nocouncil_etl_spark.io as io

    docs = io.load(spark, sf_dir, "documents")
    file_bytes = os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
    max_pb = float(
        spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
    )
    est = io._est_width(docs)
    # same order of magnitude as bytes/split — the decision only needs that
    assert 0.1 * (file_bytes / max_pb) < est < 10 * (file_bytes / max_pb)

    # conf-scaling: 1/256th the split size ⇒ ~256× the implied width
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(max_pb // 256)))
    try:
        assert io._est_width(io.load(spark, sf_dir, "documents")) > 100 * est

        # fast path: on a volume-wide frame (512-byte splits make the real
        # file imply ≫ 2× session width) fan_out_if_narrow must decide from
        # stats alone — the probe raising proves it was never reached
        spark.conf.set("spark.sql.files.maxPartitionBytes", "512")

        def boom(_df):
            raise AssertionError("probe must not run on a volume-wide frame")

        monkeypatch.setattr(io, "_planned_scan_width", boom)
        wide = io.load(spark, sf_dir, "documents")
        assert io.fan_out_if_narrow(wide) is wide
        assert io.fan_out(wide) is wide
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    # unreachable stats (no JVM frame behind the attribute) ⇒ 0.0, never a
    # raise: fan_out then just repartitions, the pre-floor behavior
    class Husk:
        _jdf = property(lambda self: (_ for _ in ()).throw(RuntimeError()))

    assert io._est_width(Husk()) == 0.0


def test_planned_scan_width_refuses_exchanged_frames(spark):
    """_planned_scan_width only probes scan-rooted plans: narrow chains
    (scan/filter/project/generate/union) report their planned split count;
    anything with an upstream exchange (aggregate, join, repartition)
    returns None — probing .rdd there would finalize the physical plan and
    eagerly execute shuffle stages under AQE (round-10 ADVICE #1). fan_out
    then falls back to the unconditional repartition, and fan_out_if_narrow
    leaves the frame alone (it is already at shuffle width)."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.io import (
        _planned_scan_width,
        fan_out,
        fan_out_if_narrow,
    )

    scan = spark.range(0, 100, 1, 4).withColumn(
        "w", F.explode(F.split(F.lit("a b"), " "))
    )
    assert _planned_scan_width(scan.filter(F.col("id") > 1)) == 4
    assert (
        _planned_scan_width(scan.union(scan)) is not None
    )  # union of scans is still narrow

    agg = spark.range(100).groupBy((F.col("id") % 3).alias("k")).count()
    assert _planned_scan_width(agg) is None
    joined = spark.range(10).join(spark.range(10), "id")
    assert _planned_scan_width(joined) is None

    # behavioral fallbacks on the refused frame
    assert fan_out_if_narrow(agg) is agg
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert fan_out(agg).rdd.getNumPartitions() == n
