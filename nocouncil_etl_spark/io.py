"""Declared-schema readers for the synthetic tables (TESTDATA.md).

The reference infers every schema at read time (``pd.read_json(...,
lines=True)`` at transcribe_council.py:96, summarize.py:165, vectorize.py:72);
the engine declares schemas instead (SURVEY.md §1.3-1.4) so plans are stable
and scans prune columns. Parquet already embeds the schema; ``load`` keeps a
single chokepoint where we can assert it and where partition layout / bucketing
decisions would live at 100 TB (partition segments by meeting date, bucket fact
tables by join key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Spark DDL per table (FIXTURES.md §A) — asserted in tests, relied on by plans.
DDL: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
    "c_acctbal DOUBLE, c_mktsegment STRING",
    "supplier": "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "part": "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
    "p_size INT, p_retailprice DOUBLE",
    "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
    "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
    "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
    "l_linestatus STRING, l_shipdate TIMESTAMP",
    "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING",
    "documents": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ahead of an EXPLOSIVE transform (n-gram /
    shingle / token explode), where output volume is orders of magnitude
    larger than input bytes.

    Scan parallelism follows input bytes (`spark.sql.files.maxPartitionBytes`)
    — correct for scans, wrong for a 50 kB-compressed doc batch about to
    explode into millions of gram rows: the whole explode lands in however
    few tasks the scan produced (locally: ONE for a single small parquet
    file; at 100 TB: one straggler per oversized text file). One cheap
    shuffle of the compact input buys full-cluster parallelism for the
    expensive stage. Default width = the session's shuffle parallelism."""
    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return df.repartition(n)


def fan_out_if_narrow(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Conditional fan_out for COMPUTE-DENSE 1:1 maps (heavy per-row
    HOF/regex passes with NO output amplification — readability, PII
    redaction, lang-id, Gopher rules).

    These are not fan_out's contract (nothing explodes), but their cost per
    input byte dwarfs the scan's, so byte-derived scan parallelism still
    under-schedules them LOCALLY: a single small parquet file plans one
    task and the interpreted pass serializes (round 9 measured 6.5 s → 0.8 s
    at sf1 for the lang-id cohort). At 100 TB the same scan already plans
    ~one task per 128 MB split — ample parallelism — and a full-corpus
    round-robin shuffle would be pure overhead. So: repartition ONLY when
    the planned scan parallelism is below the session target; at cluster
    scan widths this is a no-op and the map stays narrow/zero-shuffle."""
    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one synthetic table. Scans stay columnar/pushdown-friendly."""
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; expected one of {TABLES}")
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to µs TIMESTAMP regardless of how
    the writer encoded it. The synthetic generator has shipped both
    TIMESTAMP(NANOS) (surfaces as long nanos under session.RUNTIME_CONFS) and
    plain µs TIMESTAMP/NTZ files across rounds; every reader — batch and
    streaming — must go through this one chokepoint so both agree with
    DuckDB's read of the same file."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) read as long nanos; truncate to micros —
        # identical to DuckDB's read of the same file.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # µs-precision files from other writers surface as NTZ; the
        # session tz is pinned UTC, so the wall-clock cast is lossless
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
