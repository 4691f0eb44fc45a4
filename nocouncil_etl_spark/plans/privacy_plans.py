"""Privacy-release batch: k-anonymity and l-diversity audits — the checks a
pipeline runs BEFORE publishing a curated dataset containing people
(reference analogue: the engine already has the differentially-private
release counts in dpo_pipeline; these are the syntactic-privacy siblings
used when row-level data, not counts, must ship).

- ``privacy_k_anonymity`` — group the table by its quasi-identifier tuple
  (nation, market segment); any group smaller than K re-identifies its
  members and must be suppressed. Emits the per-segment audit sheet:
  groups, suppressed groups, rows published vs suppressed, and the
  smallest published group (the realized k).
- ``privacy_l_diversity`` — k-anonymous groups can still leak when every
  member shares the sensitive value; each published group must carry ≥ L
  distinct sensitive values (balance band). Emits per-segment violation
  counts over the k-published groups.

Both are pure hash-aggregates — the audit costs one shuffle of the QI
tuple at any scale, and the publish gate derived from them is a semi-join
against the passing group list (never a row-level collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

K_ANON = 10
L_DIV = 4

# sensitive attribute: account-balance band (2000-currency-unit bands over
# exact cents — engine-portable integer arithmetic, no float banding)
_BAND_SQL = "CAST(round(c_acctbal * 100) AS BIGINT) // 200000"
_QI_SQL = "c_nationkey, c_mktsegment"


@query(
    "privacy_k_anonymity",
    oracle=f"""
WITH grp AS (
  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS sz
  FROM customer GROUP BY {_QI_SQL}
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN sz < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed_groups,
       CAST(sum(CASE WHEN sz >= {K_ANON} THEN sz ELSE 0 END) AS BIGINT) AS rows_published,
       CAST(sum(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT) AS rows_suppressed,
       CAST(min(CASE WHEN sz >= {K_ANON} THEN sz END) AS BIGINT) AS realized_k
FROM grp GROUP BY c_mktsegment
""",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit for publishing customers keyed by the
    quasi-identifier (nation, market segment): a group of size < {K_ANON}
    is suppressed (its members are re-identifiable by the QI tuple alone).
    Per segment: group counts, suppressed groups, rows published vs
    suppressed, and realized k = the smallest group that ships (NULL when a
    segment publishes nothing — both engines agree).

    Scale shape: one hash-agg on the QI tuple, one on the segment — the
    audit is two shuffles regardless of table size; the actual publish
    filter is a broadcast semi-join of the passing QI list."""
    c = load(spark, sf_dir, "customer")
    grp = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    small = F.col("sz") < K_ANON
    return grp.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0))
        .cast("long")
        .alias("n_suppressed_groups"),
        F.sum(F.when(~small, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("rows_published"),
        F.sum(F.when(small, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("rows_suppressed"),
        F.min(F.when(~small, F.col("sz")))
        .cast("long")
        .alias("realized_k"),
    )


@query(
    "privacy_l_diversity",
    oracle=f"""
WITH grp AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(count(*) AS BIGINT) AS sz,
         CAST(count(DISTINCT {_BAND_SQL}) AS BIGINT) AS n_bands
  FROM customer GROUP BY {_QI_SQL}
),
pub AS (SELECT * FROM grp WHERE sz >= {K_ANON})
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_published_groups,
       CAST(sum(CASE WHEN n_bands < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT) AS n_l_violations,
       CAST(min(n_bands) AS BIGINT) AS min_diversity,
       CAST(sum(CASE WHEN n_bands < {L_DIV} THEN sz ELSE 0 END) AS BIGINT) AS rows_at_risk
FROM pub GROUP BY c_mktsegment
""",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the k-published groups of
    ``privacy_k_anonymity``: a group where fewer than {L_DIV} distinct
    sensitive values (2000-unit balance bands on exact cents) appear leaks
    the sensitive attribute by membership alone (homogeneity attack), even
    though it is k-anonymous. Per segment: published groups, violating
    groups, the minimum realized diversity, and rows at risk.

    Scale shape: one hash-agg with a distinct-count on the QI tuple
    (Spark plans countDistinct as a two-phase expand-agg — still one
    logical shuffle), then the segment rollup; same two-shuffle audit cost
    as the k-anonymity pass."""
    c = load(spark, sf_dir, "customer")
    grp = c.select(
        "c_mktsegment",
        "c_nationkey",
        F.expr(
            "CAST(round(c_acctbal * 100) AS BIGINT) div 200000"
        ).alias("band"),
    ).groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.countDistinct("band").cast("long").alias("n_bands"),
    )
    pub = grp.filter(F.col("sz") >= K_ANON)
    viol = F.col("n_bands") < L_DIV
    return pub.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_published_groups"),
        F.sum(F.when(viol, 1).otherwise(0))
        .cast("long")
        .alias("n_l_violations"),
        F.min("n_bands").cast("long").alias("min_diversity"),
        F.sum(F.when(viol, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
    )


# --------------------------------------------------------------------------
# Autocorrelation of the daily value series
# --------------------------------------------------------------------------

ACF_MAX_LAG = 7


@query(
    "ts_autocorrelation",
    oracle=f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS ss
  FROM daily
),
lags AS (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag),
pairs AS (
  SELECT l.lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(d1.x * d2.x) AS BIGINT) AS cross_sum,
         CAST(sum(d1.x) AS BIGINT) AS s_head,
         CAST(sum(d2.x) AS BIGINT) AS s_tail
  FROM lags l
  JOIN daily d1 ON true
  JOIN daily d2 ON d2.day = d1.day + l.lag
  GROUP BY l.lag
)
SELECT p.lag, p.n_pairs,
       round(
         (CAST(p.cross_sum AS DOUBLE)
          - (CAST(t.s AS DOUBLE) / t.n) * (p.s_head + p.s_tail)
          + p.n_pairs * (CAST(t.s AS DOUBLE) / t.n) * (CAST(t.s AS DOUBLE) / t.n))
         / (CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n),
         6) AS acf
FROM pairs p CROSS JOIN tot t
""",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily revenue series at lags 1..{ACF_MAX_LAG}:
    r_k = Σ(x_t−x̄)(x_{{t+k}}−x̄) / Σ(x_t−x̄)², expanded so every sum is an
    exact BIGINT over integer cents (cross products, head/tail sums, total
    moments) and the mean appears only in the final scalar double
    expression — identical on both engines, rounded 6dp. The diagnostic
    that picks seasonal lags for ts_seasonal_decompose / ts_holt_forecast.

    Scale shape: the raw stream collapses to one row per day first; the
    lag self-join runs on the daily table (span-bounded, not row-bounded)
    with the lag list broadcast; moments are a 1-row agg. At 100 TB the
    only data-sized stage is the first hash-agg."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily.persist()
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    d1 = daily.select(F.col("day").alias("day1"), F.col("x").alias("x1"))
    d2 = daily.select(F.col("day").alias("day2"), F.col("x").alias("x2"))
    pairs = (
        d1.crossJoin(F.broadcast(lags))
        .join(
            d2,
            F.col("day2") == F.col("day1") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("x1") * F.col("x2")).cast("long").alias("cross_sum"),
            F.sum("x1").cast("long").alias("s_head"),
            F.sum("x2").cast("long").alias("s_tail"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    return pairs.crossJoin(F.broadcast(tot)).select(
        "lag",
        "n_pairs",
        F.round(
            (
                F.col("cross_sum").cast("double")
                - mean * (F.col("s_head") + F.col("s_tail"))
                + F.col("n_pairs") * mean * mean
            )
            / (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            ),
            6,
        ).alias("acf"),
    )


# --------------------------------------------------------------------------
# t-closeness audit (EMD between group and global sensitive distributions)
# --------------------------------------------------------------------------

TC_BUCKET = 100          # sensitive attribute: n_chars div 100
TC_FLAG_1E6 = 120_000    # flag groups with normalized EMD > 0.12


@query(
    "privacy_t_closeness",
    oracle=f"""
WITH src AS (
  SELECT source, n_chars // {TC_BUCKET} AS sv FROM documents
),
buckets AS (SELECT DISTINCT sv FROM src),
groups AS (SELECT source, CAST(count(*) AS BIGINT) AS n_g FROM src GROUP BY source),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST((SELECT count(*) FROM buckets) AS BIGINT) AS nb
  FROM src
),
gcnt AS (
  SELECT source, sv, CAST(count(*) AS BIGINT) AS c
  FROM src GROUP BY source, sv
),
dense AS (
  SELECT g.source, b.sv, coalesce(c.c, 0) AS c
  FROM groups g CROSS JOIN buckets b
  LEFT JOIN gcnt c ON c.source = g.source AND c.sv = b.sv
),
cums AS (
  SELECT source, sv,
         CAST(sum(c) OVER (PARTITION BY source ORDER BY sv) AS BIGINT) AS cum_g
  FROM dense
),
gl AS (
  SELECT sv, CAST(count(*) AS BIGINT) AS c FROM src GROUP BY sv
),
glc AS (
  SELECT sv, CAST(sum(c) OVER (ORDER BY sv) AS BIGINT) AS cum_all FROM gl
),
emd AS (
  SELECT c.source,
         CAST(sum(abs(c.cum_g * (SELECT n FROM meta)
                      - g.cum_all * gr.n_g)) AS BIGINT) AS emd_num
  FROM cums c
  JOIN glc g ON c.sv = g.sv
  JOIN groups gr ON gr.source = c.source
  GROUP BY c.source
)
SELECT e.source, gr.n_g, e.emd_num,
       gr.n_g * (SELECT n FROM meta) * ((SELECT nb FROM meta) - 1) AS denom,
       CAST((e.emd_num * 1000000)
            // (gr.n_g * (SELECT n FROM meta) * ((SELECT nb FROM meta) - 1))
            AS BIGINT) AS t_1e6,
       (e.emd_num * 1000000)
         // (gr.n_g * (SELECT n FROM meta) * ((SELECT nb FROM meta) - 1))
         > {TC_FLAG_1E6} AS flagged
FROM emd e JOIN groups gr ON gr.source = e.source
""",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the distributional upgrade of k-anonymity /
    l-diversity (privacy_k_anonymity, privacy_l_diversity): a
    quasi-identifier group leaks if its SENSITIVE-attribute distribution
    differs from the global one, measured as Earth Mover's Distance over
    the ordered sensitive buckets (EMD for ordered histograms = sum of
    |cumulative differences|). Computed as pure integers on the common
    denominator n_g·N — EMD_num = Σ_v |cum_g(v)·N − cum_all(v)·n_g| —
    then normalized to 1e-6 units by the max-EMD denominator
    n_g·N·(buckets−1); groups above t = {TC_FLAG_1E6}/1e6 are flagged.

    Scale shape: per-(group, bucket) hash agg; the dense grid is
    groups × buckets (both value-domain-sized); the only single-partition
    window is the GLOBAL cumulative over the bucket histogram —
    bucket-count rows, post-aggregation. Group cumulatives are windows
    PARTITIONED by group."""
    src = load(spark, sf_dir, "documents").select(
        "source", F.expr(f"n_chars div {TC_BUCKET}").alias("sv")
    )
    buckets = src.select("sv").distinct()
    groups = src.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    n = src.count()  # scalars: table size + bucket count, not data
    nb = buckets.count()
    gcnt = src.groupBy("source", "sv").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    dense = (
        groups.crossJoin(F.broadcast(buckets))
        .join(gcnt, ["source", "sv"], "left")
        .select("source", "sv", F.coalesce("c", F.lit(0)).alias("c"), "n_g")
    )
    from pyspark.sql import Window

    wg = Window.partitionBy("source").orderBy("sv")
    cums = dense.select(
        "source",
        "sv",
        "n_g",
        F.sum("c").over(wg).cast("long").alias("cum_g"),
    )
    gl = src.groupBy("sv").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wa = Window.orderBy("sv")
    glc = gl.select("sv", F.sum("c").over(wa).cast("long").alias("cum_all"))
    emd = (
        cums.join(F.broadcast(glc), "sv")
        .groupBy("source", "n_g")
        .agg(
            F.sum(
                F.abs(F.col("cum_g") * n - F.col("cum_all") * F.col("n_g"))
            )
            .cast("long")
            .alias("emd_num")
        )
    )
    denom = F.col("n_g") * n * (nb - 1)
    return emd.select(
        "source",
        "n_g",
        "emd_num",
        denom.alias("denom"),
        F.expr(f"CAST((emd_num * 1000000) div (n_g * {n} * {nb - 1}) AS BIGINT)").alias(
            "t_1e6"
        ),
        (
            F.expr(f"(emd_num * 1000000) div (n_g * {n} * {nb - 1})")
            > TC_FLAG_1E6
        ).alias("flagged"),
    )
