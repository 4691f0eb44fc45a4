"""Source/sink queries runnable in the driver gate (S1/S4/K1 without external
fixtures): a JSONL write→read roundtrip through a scratch dir, and a
frontmatter parse over markdown synthesized in-plan. File-based golden tests
for the rest of the source surface live in tests/test_sources.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import rsum, rsum_sql
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query
from nocouncil_etl_spark.sources.jsonl import read_jsonl, write_jsonl
from nocouncil_etl_spark.sources.markdown import frontmatter_body, frontmatter_map


@query(
    "io_jsonl_roundtrip",
    oracle=f"""
SELECT event_type, count(*) AS n, {rsum_sql("value")} AS total,
       min(epoch_us(ts)) AS first_us
FROM events
GROUP BY event_type
""",
)
def io_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+S1: events → JSONL sink → declared-schema JSONL scan → aggregate.
    Matching the direct-parquet oracle proves the write/read path is
    lossless. Timestamps cross as epoch micros (JSON has no timestamp type —
    the engine's interchange convention)."""
    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "events_jsonl"
    )
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    write_jsonl(ev, out)
    back = read_jsonl(
        spark, out, "event_id BIGINT, ts_us BIGINT, event_type STRING, value DOUBLE"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rsum("value").alias("total"),
        F.min("ts_us").alias("first_us"),
    )


@query(
    "source_frontmatter_parse",
    oracle="""
WITH md AS (
  SELECT doc_id,
         '---' || chr(10) || 'title: doc ' || doc_id || chr(10) ||
         'lang: ' || lang || chr(10) || '---' || chr(10) || text AS raw
  FROM documents
)
SELECT doc_id,
       regexp_extract(regexp_extract(raw, '(?s)^---\\n(.*?)\\n---\\n?', 1),
                      'title: ([^\\n]*)', 1) AS title,
       regexp_extract(regexp_extract(raw, '(?s)^---\\n(.*?)\\n---\\n?', 1),
                      'lang: ([^\\n]*)', 1) AS lang_meta,
       regexp_replace(raw, '(?s)^---\\n.*?\\n---\\n?', '') AS body
FROM md
""",
)
def source_frontmatter_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: frontmatter split into typed columns + body
    (article_vectorize.py:75-103). Markdown is synthesized in-plan so the
    oracle sees the identical corpus; the file-based path (S3 wholetext scan)
    is golden-tested in tests/test_sources.py."""
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("---\ntitle: doc "),
        F.col("doc_id"),
        F.lit("\nlang: "),
        F.col("lang"),
        F.lit("\n---\n"),
        F.col("text"),
    )
    md = docs.select("doc_id", raw.alias("raw"))
    meta = frontmatter_map("raw")
    return md.select(
        "doc_id",
        F.element_at(meta, "title").alias("title"),
        F.element_at(meta, "lang").alias("lang_meta"),
        frontmatter_body("raw").alias("body"),
    )


@query(
    "io_json_array_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def io_json_array_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+S2: catalog table → whole-file JSON-array state write → multiLine
    read-back with a declared schema (the articles.json state cycle at
    newscrawler.py:90-145). Matching the direct-parquet oracle proves the
    state write/read is lossless."""
    from nocouncil_etl_spark.sources.jsonl import read_json_array, write_json_array_state

    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "nation_state.json"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    write_json_array_state(n, out)
    return read_json_array(
        spark, out, "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    ).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "vec_index_upsert",
    oracle="""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
state AS (SELECT id, 1 AS version, v FROM e),
updates AS (
  SELECT id, 2 AS version, list_transform(v, x -> x * 2.0) AS v
  FROM e WHERE id < 50
),
merged AS (
  SELECT id, version, v FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY version DESC) AS rn
    FROM (SELECT * FROM state UNION ALL SELECT * FROM updates)
  ) WHERE rn = 1
)
SELECT id, version, round(v[1], 6) AS e0 FROM merged
""",
)
def vec_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 in the driver gate: keep-latest upsert into the vector table
    ("duplicates will be updated", article_vectorize.py:361-363) — rows with
    a newer version replace the stored embedding, everything else survives."""
    from nocouncil_etl_spark.functions.vectors import as_double, scale
    from nocouncil_etl_spark.operators.vector_index import upsert_vectors

    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), as_double("embedding").alias("v")
    )
    state = e.withColumn("version", F.lit(1))
    updates = e.filter(F.col("id") < 50).select(
        "id", scale("v", F.lit(2.0)).alias("v"), F.lit(2).alias("version")
    )
    merged = upsert_vectors(state, updates, id_col="id", version_col="version")
    return merged.select(
        "id", "version", F.round(F.element_at("v", 1), 6).alias("e0")
    )


@query(
    "io_markdown_roundtrip",
    oracle="""
SELECT doc_id, lang, source, text AS body
FROM documents WHERE doc_id % 100 = 0
""",
)
def io_markdown_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3+S3+S4 as one oracle-checked loop: render sampled documents to
    frontmatter markdown (newscrawler.py:313-325), write ONE FILE PER RECORD
    (partitionBy doc_id — the per-article file layout), whole-file scan the
    corpus back and parse the frontmatter in codegen
    (article_vectorize.py:75-154). Matching the direct-parquet oracle proves
    the render → per-file write → glob scan → fence parse loop is lossless.
    Sampled 1-in-100: the per-record-file layout is the contract under test,
    not small-file throughput (SCALE.md: compact first at real scale)."""
    import os
    import tempfile

    from nocouncil_etl_spark.sources.markdown import (
        read_markdown_corpus,
        render_markdown,
    )

    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "md_corpus"
    )
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    md = docs.select(
        "doc_id",
        render_markdown(
            {
                "doc_id": F.col("doc_id").cast("string"),
                "lang": F.col("lang"),
                "source": F.col("source"),
            },
            F.col("text"),
        ).alias("value"),
    )
    md.write.mode("overwrite").partitionBy("doc_id").text(out)
    corpus = read_markdown_corpus(spark, f"{out}/doc_id=*/")
    return corpus.select(
        F.col("meta")["doc_id"].cast("long").alias("doc_id"),
        F.col("meta")["lang"].alias("lang"),
        F.col("meta")["source"].alias("source"),
        # the text sink appends one trailing line separator per record
        F.regexp_replace("body", r"\n$", "").alias("body"),
    )


@query(
    "io_jsonl_corrupt_quarantine",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_good,
       CAST(count(*) FILTER (WHERE doc_id % 50 = 0) AS BIGINT) AS n_corrupt,
       CAST(sum(n_chars) AS BIGINT) AS chars_good
FROM documents
""",
)
def io_jsonl_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 under dirty input: PERMISSIVE JSONL scan with a corrupt-record
    quarantine column — the 100 TB posture where one mangled line must
    degrade alone, never fail the scan (the engine twin of the reference's
    per-item try/except around json.loads, newscrawler.py state reads).
    Malformed lines are synthesized deterministically (every 50th document
    also emits its JSON truncated mid-token), so the oracle can count the
    quarantine exactly: all 1/50 extras land in _corrupt_record with every
    typed column null, and every well-formed row parses — proven by n_good
    and chars_good matching the direct-parquet oracle."""
    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "events_dirty_jsonl"
    )
    docs = load(spark, sf_dir, "documents")
    j = F.to_json(F.struct("doc_id", "source", "n_chars"))
    good = docs.select(j.alias("value"))
    broken = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.substring(j, 1, 12).alias("value")  # '{"doc_id":..' — unclosed
    )
    good.unionByName(broken).write.mode("overwrite").text(out)

    parsed = (
        spark.read.schema(
            "doc_id LONG, source STRING, n_chars LONG, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    quarantined = F.col("_corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.when(~quarantined, 1)).alias("n_good"),
        F.count(F.when(quarantined, 1)).alias("n_corrupt"),
        F.sum(F.when(~quarantined, F.col("n_chars"))).alias("chars_good"),
    )


@query(
    "io_csv_roundtrip",
    oracle="""
SELECT doc_id, text, lang, source, n_chars FROM documents
""",
)
def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S/K surface for the one interchange format every warehouse still
    speaks: documents → header'd, quoted CSV sink → declared-schema CSV scan
    → identity. Matching the direct-parquet oracle proves quoting/escaping
    survives the word-soup text column (embedded delimiters, quotes) — the
    failure mode that silently corrupts naive CSV pipelines.

    Scale shape: both write and scan are partition-parallel; the scan scans
    with a DECLARED schema (no inferSchema pass — schema inference reads the
    data twice and types drift run-to-run)."""
    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "documents_csv"
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    (
        docs.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(out)
    )
    return (
        spark.read.schema(
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
        )
        .option("header", True)
        .option("escape", '"')
        .csv(out)
    )


@query(
    "io_orc_roundtrip",
    oracle="""
SELECT event_type, count(*) AS n, min(event_id) AS first_id, max(event_id) AS last_id
FROM events
GROUP BY event_type
""",
)
def io_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S/K surface for ORC — the other columnar interchange format (Hive
    ecosystems): events → ORC sink → declared-schema ORC scan → aggregate
    matching the direct-parquet oracle. Timestamps cross as epoch-µs longs
    (same interchange convention as JSONL) so the roundtrip is precision-
    independent of the writer.

    Scale shape: columnar write/scan, partition-parallel both ways; the
    aggregate proves row fidelity without driver-side row transfer."""
    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "events_orc"
    )
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    ev.write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "event_id BIGINT, ts_us BIGINT, event_type STRING, value DOUBLE"
    ).orc(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
    )


@query(
    "io_schema_evolution",
    oracle="""
SELECT lang,
       count(*) AS n,
       count(quality) AS n_with_quality,
       CAST(round(sum(CAST(coalesce(quality, 0.0) AS DECIMAL(18,6))), 4) AS DOUBLE) AS q_total
FROM (
  SELECT lang, NULL::DOUBLE AS quality FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT lang, round(n_chars / 1000.0, 4) FROM documents WHERE doc_id % 2 = 1
)
GROUP BY lang
""",
)
def io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations under one prefix —
    v1 (doc_id, lang) and v2 with an added `quality` column — scanned as one
    table via mergeSchema; v1 rows surface NULL quality. This is how a
    long-lived 100 TB lake actually looks (columns accrete over time;
    rewriting history is off the table), and the declared-union oracle pins
    the exact fill-with-null semantics.

    Scale shape: footer-schema merge is metadata-only; each file still reads
    only its own columns."""
    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "documents_evolving"
    )
    docs = load(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.round(F.col("n_chars") / 1000.0, 4).alias("quality")
    )
    v1.write.mode("overwrite").parquet(f"{out}/gen=1")
    v2.write.mode("overwrite").parquet(f"{out}/gen=2")
    merged = spark.read.option("mergeSchema", True).parquet(
        f"{out}/gen=1", f"{out}/gen=2"
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("quality").alias("n_with_quality"),
        F.round(F.sum(F.coalesce(F.col("quality"), F.lit(0.0)).cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("q_total"),
    )


@query(
    "io_jsonl_gzip_roundtrip",
    oracle="""
SELECT doc_id, source, n_chars FROM documents
""",
)
def io_jsonl_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/S1 under compression: JSONL written with the gzip codec, read
    back with a declared schema — identity against the direct-parquet
    oracle proves the compressed sink/scan path end-to-end (at 100 TB the
    wire format is always compressed; a codec mismatch or partial-flush
    bug shows up as lost/garbled rows here). Splittability note: gzip
    files are single-reader — at scale prefer zstd/bzip2 or many smaller
    files, which is exactly what the partitioned write produces."""
    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "docs_jsonl_gz"
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    (
        docs.select(F.to_json(F.struct("doc_id", "source", "n_chars")).alias("value"))
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(out)
    )
    return (
        spark.read.schema("doc_id long, source string, n_chars long")
        .json(out)
    )


@query(
    "io_fixed_width_roundtrip",
    oracle="""
SELECT o_orderkey,
       o_custkey,
       o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS order_day,
       o_orderpriority
FROM orders
""",
)
def io_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S/K surface for the mainframe-era format that still feeds real
    warehouses: orders → fixed-width text lines (zero-padded numerics,
    space-padded strings, declared column offsets — no delimiters at all)
    → text sink → substring-parse back to typed columns matching the
    direct-parquet oracle. Money crosses as integer cents and dates as
    epoch days, so the roundtrip is format-exact with no float or
    timezone hazard.

    Scale shape: render and parse are narrow per-row expressions; the text
    sink/scan are partition-parallel. Parsing by DECLARED offsets (like
    the declared-schema CSV scan) — never by guessing."""
    out = os.path.join(
        tempfile.gettempdir(), "nocouncil_etl_spark_scratch", "orders_fixedw"
    )
    o = load(spark, sf_dir, "orders")
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("o_custkey").cast("string"), 12, "0"),
        F.rpad(F.col("o_orderstatus"), 1, " "),
        F.lpad(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            14,
            "0",
        ),
        F.lpad(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("string"),
            7,
            "0",
        ),
        F.rpad(F.col("o_orderpriority"), 15, " "),
    )
    o.select(line.alias("value")).write.mode("overwrite").text(out)
    raw = spark.read.text(out)
    v = F.col("value")
    return raw.select(
        F.substring(v, 1, 12).cast("long").alias("o_orderkey"),
        F.substring(v, 13, 12).cast("long").alias("o_custkey"),
        F.trim(F.substring(v, 25, 1)).alias("o_orderstatus"),
        F.substring(v, 26, 14).cast("long").alias("cents"),
        F.substring(v, 40, 7).cast("long").alias("order_day"),
        F.rtrim(F.substring(v, 47, 15)).alias("o_orderpriority"),
    )
