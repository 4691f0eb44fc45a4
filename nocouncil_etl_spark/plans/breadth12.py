"""Breadth batch 12: data-mixture temperature, market concentration,
cluster quality vs labels.

- ``curation_mixture_temperature`` — α=0.5 temperature-scaled source
  rebalancing: per-source keep-rates derived FROM the corpus (weight ∝
  √n_s, the standard up-sample-the-tail mixture rule multilingual /
  multi-source pretraining uses) under a fixed total document budget,
  then deterministic hash-bucket sampling at those rates. The
  data-driven sibling of sample_stratified_mix's fixed rates.
- ``agg_hhi_concentration`` — Herfindahl-Hirschman concentration of
  customer spend per nation: exact integer spend moments, HHI and its
  normalized form as round-6 doubles. The antitrust-style "is this
  market dominated" screen, beside Gini (inequality) and entropy
  (diversity) in the concentration family.
- ``cluster_kmeans_purity`` — label purity of the trained k-means
  clusters: per cluster, the majority embedding label and its share in
  exact millionths — the external-validity check of cluster_kmeans_fixed
  (inertia says clusters are tight; purity says they mean something).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.kmeans import assign_l2, kmeans_fit, quantize_vectors
from nocouncil_etl_spark.plans.clustering import ITERS, K, kmeans_cte, quantize_sql
from nocouncil_etl_spark.registry import query

MIX_BUDGET_DEN = 2  # keep N/2 docs overall, redistributed by temperature
MIX_SALT = "mix#"

PUR_SCALE = 1_000_000


def _bucket_bp(col: Column) -> Column:
    """Deterministic 0-9999 basis-point bucket, salted so this sampler is
    independent of the other hash samplers over the same ids."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(MIX_SALT), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 10000
    )


_BUCKET_BP_SQL = (
    f"(('0x' || substr(md5('{MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " % 10000)"
)


# --------------------------------------------------------------------------
# 1. Temperature-scaled mixture
# --------------------------------------------------------------------------


@query(
    "curation_mixture_temperature",
    oracle=f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
wts AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000) AS BIGINT) AS w_1e3
  FROM per
),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n, CAST(sum(w_1e3) AS BIGINT) AS w FROM wts
),
plan AS (
  SELECT w.source, w.n_docs, w.w_1e3,
         ((SELECT n FROM tot) // {MIX_BUDGET_DEN} * w.w_1e3) // (SELECT w FROM tot)
           AS target_docs
  FROM wts w
),
rates AS (
  SELECT source, n_docs, w_1e3, target_docs,
         least(10000, (target_docs * 10000) // n_docs) AS rate_bp
  FROM plan
),
kept AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE {_BUCKET_BP_SQL} < r.rate_bp
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.w_1e3, CAST(r.target_docs AS BIGINT) AS target_docs,
       CAST(r.rate_bp AS BIGINT) AS rate_bp,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.source = k.source
""",
)
def curation_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature mixture over sources: weight each source √n_s
    (floor-millis of the IEEE sqrt — exact on both engines), split a
    total budget of N/{MIX_BUDGET_DEN} docs proportionally to the weights,
    convert to per-source basis-point keep-rates (capped at 100%), and
    keep docs whose salted hash bucket clears the rate. Small sources are
    up-sampled relative to proportional mixing, big heads down-sampled —
    the standard tail-preserving mixture rule, with every rate derived
    in-engine and the realized keep counts reported beside the targets.

    Scale shape: one count per source (map-side combine), arithmetic on
    the source dimension (broadcast-sized), then ONE corpus scan with a
    narrow hash filter — rates change without reshuffling history, and
    the sampler composes with the other hash samplers because the bucket
    is salted."""
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    wts = per.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000)
        .cast("long")
        .alias("w_1e3"),
    )
    tot = wts.agg(
        F.sum("n_docs").cast("long").alias("tn"),
        F.sum("w_1e3").cast("long").alias("tw"),
    )
    rates = (
        wts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "w_1e3",
            F.expr(f"(tn div {MIX_BUDGET_DEN} * w_1e3) div tw")
            .cast("long")
            .alias("target_docs"),
        )
        .select(
            "source",
            "n_docs",
            "w_1e3",
            "target_docs",
            F.least(
                F.lit(10000), F.expr("(target_docs * 10000) div n_docs")
            )
            .cast("long")
            .alias("rate_bp"),
        )
    )
    kept = (
        docs.join(F.broadcast(rates.select("source", "rate_bp")), "source")
        .filter(_bucket_bp(F.col("doc_id")) < F.col("rate_bp"))
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_kept"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "w_1e3",
        "target_docs",
        "rate_bp",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


# --------------------------------------------------------------------------
# 2. Herfindahl-Hirschman concentration
# --------------------------------------------------------------------------


@query(
    "agg_hhi_concentration",
    oracle="""
WITH spend AS (
  SELECT n.n_name, o.o_custkey,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100
           AS units
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, o.o_custkey
),
mkt AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_firms,
         CAST(sum(units) AS BIGINT) AS total,
         CAST(sum(units * units) AS BIGINT) AS ssq
  FROM spend GROUP BY n_name
)
SELECT n_name, n_firms,
       round(CAST(ssq AS DOUBLE) / (CAST(total AS DOUBLE) * total), 6) AS hhi,
       round((CAST(ssq AS DOUBLE) / (CAST(total AS DOUBLE) * total)
              - 1.0 / n_firms) / (1.0 - 1.0 / n_firms), 6) AS hhi_norm
FROM mkt WHERE n_firms > 1 AND total > 0
""",
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of customer-spend concentration per
    nation: H = Σ share², assembled from exact integer unit moments
    (Σ spend, Σ spend² — both far inside BIGINT) with ONE final double
    division, plus the n-adjusted normalized form (H − 1/n)/(1 − 1/n).
    H → 1 means one buyer dominates the market; beside Gini and entropy
    this completes the concentration triad.

    Scale shape: one keyed spend agg, a broadcast dim chain to nation,
    then moments per market — the canonical moments-only aggregate."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    spend = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "o_custkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
                " div 100"
            )
            .cast("long")
            .alias("units")
        )
    )
    mkt = spend.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_firms"),
        F.sum("units").cast("long").alias("total"),
        F.sum(F.col("units") * F.col("units")).cast("long").alias("ssq"),
    )
    hhi = F.col("ssq").cast("double") / (F.col("total").cast("double") * F.col("total"))
    return (
        mkt.filter((F.col("n_firms") > 1) & (F.col("total") > 0))
        .select(
            "n_name",
            "n_firms",
            F.round(hhi, 6).alias("hhi"),
            F.round(
                (hhi - 1.0 / F.col("n_firms")) / (1.0 - 1.0 / F.col("n_firms")), 6
            ).alias("hhi_norm"),
        )
    )


# --------------------------------------------------------------------------
# 3. k-means cluster purity vs labels
# --------------------------------------------------------------------------


@query(
    "cluster_kmeans_purity",
    oracle=f"""
WITH base AS (
  SELECT vec_id, {quantize_sql("embedding::DOUBLE[]")} AS xq FROM embeddings
),
{kmeans_cte("base", K, ITERS)},
lab AS (
  SELECT a.cid, e.label, CAST(count(*) AS BIGINT) AS n
  FROM asg_final a JOIN embeddings e ON a.vid = e.vec_id
  GROUP BY a.cid, e.label
),
tot AS (SELECT cid, CAST(sum(n) AS BIGINT) AS n_points FROM lab GROUP BY cid),
major AS (
  SELECT cid, label AS major_label, n AS n_major FROM (
    SELECT cid, label, n,
           row_number() OVER (PARTITION BY cid ORDER BY n DESC, label) AS rn
    FROM lab
  ) WHERE rn = 1
)
SELECT t.cid AS cluster_id, t.n_points,
       CAST(m.major_label AS BIGINT) AS major_label,
       m.n_major,
       CAST((m.n_major * {PUR_SCALE}) // t.n_points AS BIGINT) AS purity_1e6
FROM tot t JOIN major m ON t.cid = m.cid
""",
)
def cluster_kmeans_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label purity of the trained k-means clustering (same seeds, grid
    and iterations as cluster_kmeans_fixed): per cluster, the majority
    ground-truth label (ties → lowest label) and its share of the cluster
    in exact millionths. Inertia certifies geometric tightness; purity
    certifies the clusters track the label structure — the external
    validity half of the clustering eval.

    Scale shape: the k-means passes are the documented O(n·k) Arrow
    assignments (k fixed); purity adds one (cluster, label) combine-agg
    and a k-row window — nothing new crosses the shuffle at scale."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    eq = quantize_vectors(e, "v", "xq").select("vec_id", "label", "xq").persist()
    try:
        cent_ids, cm = kmeans_fit(eq.select("vec_id", "xq"), K, ITERS)
        asg = assign_l2(eq.select("vec_id", "xq"), cent_ids, cm, with_dist=False)
        lab = (
            asg.join(eq.select("vec_id", "label"), "vec_id")
            .groupBy("cid", "label")
            .agg(F.count("*").cast("long").alias("n"))
        )
        tot = lab.groupBy("cid").agg(F.sum("n").cast("long").alias("n_points"))
        w = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
        major = (
            lab.select(
                "cid", "label", "n", F.row_number().over(w).alias("rn")
            )
            .filter(F.col("rn") == 1)
            .select(
                "cid",
                F.col("label").cast("long").alias("major_label"),
                F.col("n").alias("n_major"),
            )
        )
        out = tot.join(major, "cid").select(
            F.col("cid").alias("cluster_id"),
            "n_points",
            "major_label",
            "n_major",
            F.expr(f"(n_major * {PUR_SCALE}) div n_points")
            .cast("long")
            .alias("purity_1e6"),
        )
        out = out.persist()
        out.count()
        return out
    finally:
        eq.unpersist()
