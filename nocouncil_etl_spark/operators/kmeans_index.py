"""Trained-IVF ANN index artifact: publish once, serve many, upsert in place.

The trained sibling of operators/ann_index.py (whose coarse cells are
data-independent LSH signatures). Here the coarse quantizer is a fixed-k
integer k-means trained on the corpus (operators/kmeans.py), and the whole
artifact is pinned to storage — the reference's build-nightly/serve-always
split (vectorize.py:119-123 builds the HNSW once; sample_cron_job.sh:10
ships it):

  {path}/index/         parquet (vec_id, v array<double>, cid) — each vector
                        with its PINNED coarse cell
  {path}/kcentroids/    parquet (cid, cv array<long>) — the quantized
                        centroid matrix (k rows)
  {path}/manifest.json  corpus fingerprint + {k, iters}

Because cells are pinned after training, incremental upserts assign the
INCOMING batch against the stored centroids (one Arrow pass over the batch
alone) and append — existing assignments never move, exactly the property
that makes ann_index upserts cheap, now with data-adaptive cell boundaries.
Search quantizes the (tiny) query side, ranks the pinned cells by exact
integer L2, probes the top-nprobe, and cosine-ranks inside probed cells via
a cell-keyed equi-join — the corpus is never re-signed, never rescanned
outside probed cells.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.vectors import cosine
from nocouncil_etl_spark.operators.centroid_artifact import (
    corpus_fingerprint,
    read_manifest,
    write_manifest,
)
from nocouncil_etl_spark.operators.kmeans import (
    MAX_CENTROIDS,
    assign_l2,
    assign_l2_topn,
    kmeans_fit,
    quantize_vectors,
)

# Floor for auto-sized nlist: below this the probe set is a table scan
# anyway and the training cost isn't worth it.
MIN_NLIST = 8


def auto_nlist(n: int) -> int:
    """Corpus-size-adaptive IVF cell count: the FAISS nlist ≈ √n rule,
    bucketed to a power of two so the manifest pins a stable value (small
    corpus growth does not thrash rebuilds), clamped to
    [MIN_NLIST, MAX_CENTROIDS].

    This enforces what SCALE.md's "Trained-IVF nlist must track corpus
    size" incident documented: with nlist pinned at 8, probed-candidate
    volume per query is ~nprobe·n/nlist, so total search cost grows
    ∝ n²/nlist — at sf1 (500k vectors) the 8-cell index degraded to
    near-brute-force (40 s). √n keeps per-cell population ≈ √n, so the
    probe volume per query grows as √n instead of n."""
    if n <= MIN_NLIST * MIN_NLIST:
        return MIN_NLIST
    return int(min(MAX_CENTROIDS, 2 ** round(math.log2(math.sqrt(n)))))


def publish_kmeans_index(
    e: DataFrame,
    k: int | None,
    iters: int,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> int:
    """Full build: quantize, train the coarse quantizer, pin every vector's
    cell, write index + centroid sidecar, manifest last. ``e`` carries
    (id_col, vec_col array<double>). ``k=None`` sizes nlist from the
    corpus count at build time (auto_nlist ≈ √n, power-of-two bucketed);
    the manifest records both the resolved k and the auto flag so serving
    can validate. Returns the resolved k."""
    spark = e.sparkSession
    eq = quantize_vectors(e, vec_col, "xq").select(id_col, "xq").persist()
    try:
        auto = k is None
        if auto:
            k = auto_nlist(eq.count())
        cent_ids, cm = kmeans_fit(eq, k, iters, id_col=id_col)
        cells = assign_l2(eq, cent_ids, cm, id_col=id_col)
        e.join(cells, id_col).write.mode("overwrite").parquet(f"{path}/index")
        spark.createDataFrame(
            [(int(c), [int(x) for x in cm[i]]) for i, c in enumerate(cent_ids)],
            "cid long, cv array<long>",
        ).write.mode("overwrite").parquet(f"{path}/kcentroids")
        write_manifest(
            path,
            {
                "fp": corpus_fingerprint(e, id_col),
                "k": k,
                "iters": iters,
                "auto": auto,
            },
        )
        return k
    finally:
        eq.unpersist()


def read_kmeans_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """(stored index frame, cent_ids, k×dim centroid matrix) straight from
    the artifact — the centroid side is k rows (MAX_CENTROIDS-bounded)."""
    stored = spark.read.parquet(f"{path}/index")
    rows = sorted(
        spark.read.parquet(f"{path}/kcentroids").collect(), key=lambda r: r["cid"]
    )
    ids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cm = np.array([r["cv"] for r in rows], dtype=np.int64)
    return stored, ids, cm


def serve_kmeans_index(
    e: DataFrame,
    k: int | None,
    iters: int,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Publish-if-absent: manifest hit → pure artifact read (no training,
    no corpus signature pass); miss → build and publish. Warm calls are the
    100 TB serving number. With ``k=None`` the artifact must have been
    auto-sized (manifest ``auto`` flag) — the fingerprint match implies the
    same corpus count, hence the same auto_nlist, so a warm serve never
    recounts, never retrains."""
    fp = corpus_fingerprint(e, id_col)
    mf = read_manifest(path)
    k_ok = mf is not None and (
        mf.get("auto", False) if k is None else mf.get("k") == k
    )
    if not (
        mf is not None
        and mf.get("fp") == fp
        and k_ok
        and mf.get("iters") == iters
    ):
        publish_kmeans_index(e, k, iters, path, id_col=id_col, vec_col=vec_col)
    return read_kmeans_index(e.sparkSession, path)


def upsert_kmeans_index(
    incoming: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> None:
    """Incremental growth: assign ONLY the incoming batch against the
    STORED centroids (cells are pinned — existing rows never move) and
    append to the index parquet. The expensive step touches the batch
    alone; at 100 TB this is one narrow Arrow pass over the delta.
    Note: append-only by design (the epoch-idempotent merge discipline
    lives in the caller's foreachBatch, see streaming tests); keep-latest
    dedup by id composes on read if ids can repeat across batches."""
    spark = incoming.sparkSession
    _, ids, cm = read_kmeans_index(spark, path)
    inq = quantize_vectors(incoming, vec_col, "xq").select(id_col, "xq")
    cells = assign_l2(inq, ids, cm, id_col=id_col)
    incoming.join(cells, id_col).select(id_col, vec_col, "cid").write.mode(
        "append"
    ).parquet(f"{path}/index")


def search_kmeans_index(
    queries: DataFrame,
    path: str,
    nprobe: int,
    topk: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Top-k against the pinned artifact: quantize the query side only,
    integer-L2 rank the stored centroids, probe top-nprobe cells, cosine
    rank inside probed cells. Emits (q_id, c_id, sim, rk).

    r12 opt (guide §4.2): in-cell scoring is the blocked numpy kernel —
    the (query, probed-cell) pairs are collected once (bounded:
    nq·nprobe rows, MAX_BLOCKED_QUERIES-guarded) and each Arrow batch of
    the stored index scores against its cell's query matrix with one
    matmul, replacing the per-candidate interpreted-HOF cosine() of the
    broadcast equi-join (knn_partitioned's substitution — same documented
    ~1-ulp evaluation-order tolerance, same HALF_UP rounding, nulls rank
    last with the same c_id tie-break). A data-sized query set falls back
    to the equi-join + expression-cosine shape, which never collects."""
    from nocouncil_etl_spark.operators.similarity import (
        MAX_BLOCKED_QUERIES,
        _blocked_candidates_by_part,
        _query_matrix,
    )

    spark = queries.sparkSession
    stored, ids, cm = read_kmeans_index(spark, path)
    qq = quantize_vectors(queries, vec_col, "xq").select(id_col, "xq")
    probes = assign_l2_topn(qq, ids, cm, nprobe, id_col=id_col).select(
        F.col(id_col).alias("q_id"), "cid"
    )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    p_rows = (
        probes.join(F.broadcast(q), "q_id")
        .select("cid", "q_id", "q_vec")
        .limit(MAX_BLOCKED_QUERIES + 1)
        .collect()
    )
    if len(p_rows) > MAX_BLOCKED_QUERIES:
        return _search_kmeans_joined(stored, probes, q, topk, id_col, vec_col)
    by_cell: dict = {}
    for r in p_rows:
        by_cell.setdefault(r["cid"], []).append(r)
    per_part = {
        cell: _query_matrix(rows, "q_id", "q_vec")
        for cell, rows in by_cell.items()
    }
    candidates = _blocked_candidates_by_part(
        stored, per_part, topk, "cid", id_col, vec_col, "q_id"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc_nulls_last(), F.asc(id_col)
    )
    return (
        candidates.filter(F.col("q_id") != F.col(id_col))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= topk)
        .select("q_id", F.col(id_col).alias("c_id"), "sim", "rk")
    )


def _search_kmeans_joined(
    stored: DataFrame,
    probes: DataFrame,
    q: DataFrame,
    topk: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Distributed fallback for a data-sized query side: cell-keyed
    equi-join + JVM expression cosine (the pre-r12 shape; never collects)."""
    cand = (
        stored.join(F.broadcast(probes), "cid")
        .filter(F.col(id_col) != F.col("q_id"))
        .join(F.broadcast(q), "q_id")
    )
    scored = cand.select(
        "q_id",
        F.col(id_col).alias("c_id"),
        F.round(cosine("q_vec", vec_col), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("int")).filter(
        F.col("rk") <= topk
    )
