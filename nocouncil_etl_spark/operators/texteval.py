"""Generation-eval kernels shared by plans/breadth11.py and Engine.rouge.

ROUGE-N clipped-overlap counting over arbitrary (reference, candidate)
string columns — the production form takes the model seam's summaries
(operators/backends.py llm backends) as candidates; the catalog query
feeds a deterministic extractive candidate so the kernel is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out
from nocouncil_etl_spark.operators.dedup import make_shingle_udf

ROUGE_SCALE = 1_000_000


def rouge_counts(
    df: DataFrame, id_col: str, ref_col: str, cand_col: str, n: int
) -> DataFrame:
    """Clipped n-gram multiset overlap per row: returns (id, ov, nref,
    ncand) where ov = Σ_gram min(count_cand, count_ref) — the numerator of
    ROUGE-N precision/recall; rows whose reference or candidate has no
    n-gram are dropped (metric undefined there, identically on callers).

    Scale shape: explode → map-side-combined (id, gram) counts on both
    sides, one keyed clip join, one combine per id — linear in gram
    instances, never a cross join.

    Cache lifecycle: the corpus-sized shingle frame is persisted (three
    consumers), the small per-doc result is materialized, then the shingle
    cache drops — the lsh_near_duplicates discipline. The RETURNED frame is
    persisted; the caller owns that entry (``.unpersist()`` when done)."""
    g = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        make_shingle_udf(n)(ref_col).alias("gr"),
        make_shingle_udf(n)(cand_col).alias("gc"),
    )
    g = g.persist()
    ref = (
        g.select("doc_id", F.explode("gr").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("long").alias("cr"))
    )
    cand = (
        g.select("doc_id", F.explode("gc").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("long").alias("cc"))
    )
    ov = (
        ref.join(cand, ["doc_id", "gram"])
        .groupBy("doc_id")
        .agg(F.sum(F.least("cr", "cc")).cast("long").alias("ov"))
    )
    tot = g.select(
        "doc_id",
        F.size("gr").cast("long").alias("nref"),
        F.size("gc").cast("long").alias("ncand"),
    )
    out = (
        tot.join(ov, "doc_id", "left")
        .filter((F.col("nref") > 0) & (F.col("ncand") > 0))
        .select(
            "doc_id",
            F.coalesce("ov", F.lit(0)).cast("long").alias("ov"),
            "nref",
            "ncand",
        )
        .persist()
    )
    out.count()  # materialize the per-doc counts so the shingle cache can drop
    g.unpersist()
    return out


def rouge_scores(
    df: DataFrame, id_col: str, ref_col: str, cand_col: str, scale: int = ROUGE_SCALE
) -> DataFrame:
    """ROUGE-1 + ROUGE-2 P/R/F1 in exact integer 1/scale units per row —
    the full metric table over any (reference, candidate) pair of string
    columns (F1 = 2·ov/(|c|+|r|): exact, no float division). ROUGE-2
    P/R are NULL→0-free only where a doc has ≥1 bigram on both sides;
    rows dropped by the bigram pass surface as overlap/P/R/F1 = 0.

    Cache lifecycle: consumes the two persisted rouge_counts frames,
    materializes the joined metric table, drops the inputs; the RETURNED
    frame is persisted and caller-owned (the pagerank/hits contract)."""
    m1 = rouge_counts(df, id_col, ref_col, cand_col, 1)
    m2raw = rouge_counts(df, id_col, ref_col, cand_col, 2)
    m2 = m2raw.select(
        "doc_id",
        F.col("ov").alias("ov2"),
        F.col("nref").alias("nref2"),
        F.col("ncand").alias("ncand2"),
    )
    out = (
        m1.join(m2, "doc_id", "left")
        .select(
            "doc_id",
            F.col("ov").alias("r1_overlap"),
            F.expr(f"(ov * {scale}) div ncand").cast("long").alias("r1_p_1e6"),
            F.expr(f"(ov * {scale}) div nref").cast("long").alias("r1_r_1e6"),
            F.expr(f"(2 * ov * {scale}) div (ncand + nref)")
            .cast("long")
            .alias("r1_f1_1e6"),
            F.coalesce("ov2", F.lit(0)).cast("long").alias("r2_overlap"),
            F.coalesce(
                F.expr(f"(ov2 * {scale}) div ncand2"), F.lit(0)
            )
            .cast("long")
            .alias("r2_p_1e6"),
            F.coalesce(
                F.expr(f"(ov2 * {scale}) div nref2"), F.lit(0)
            )
            .cast("long")
            .alias("r2_r_1e6"),
            F.coalesce(
                F.expr(f"(2 * ov2 * {scale}) div (ncand2 + nref2)"), F.lit(0)
            )
            .cast("long")
            .alias("r2_f1_1e6"),
        )
        .persist()
    )
    out.count()
    m1.unpersist()
    m2raw.unpersist()
    return out
