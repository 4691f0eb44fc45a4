"""Materialized ANN index (SURVEY.md §2.2 K4 grown up; north-star similarity
search at scale).

The reference persists its HNSW index once and ships the artifact to serving
(vectorize.py:119-123 builds the chroma collection; sample_cron_job.sh:10
tars ``chroma_db`` for deployment). At 100 TB the index build is the
expensive step, so it must be write-once: signatures, norms, and
coarse-quantizer assignments are computed when a vector ENTERS the index —
never at query time. The artifact is two parquet tables:

  index/      (id, vec, norm, bucket, buckets, ivf_part, version)
  centroids/  (ivf_part, cv)            -- coarse-cell means, the sidecar

- ``bucket``   single-table LSH signature (similarity.HYPERPLANES)
- ``buckets``  L multi-table signatures ('t#bits', OR-amplified recall)
- ``ivf_part`` coarse quantizer cell (the single-table signature doubles as
  the coarse cell — a deterministic, data-independent quantizer, so
  incremental upserts never invalidate existing assignments the way
  re-trained k-means centroids would)
- ``norm``     L2 norm, so query-time scoring is one dot product per pair

``knn_from_index`` computes signatures for the QUERY side only (tiny) and
equi-joins against the precomputed columns — the corpus is never rescanned
and no signature is recomputed (asserted by plan in tests). Incremental
growth is ``upsert_vector_index``: index only the incoming batch, then
keep-latest merge by id (the engine twin of collection.add upsert semantics
at article_vectorize.py:262-266).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import numpy as np
import pandas as pd

from nocouncil_etl_spark.functions.numeric import ravg
from nocouncil_etl_spark.functions.vectors import as_double, cosine, dot, l2_norm
from nocouncil_etl_spark.operators.similarity import (
    _MULTI_MAT,
    _PLANES_MAT,
    attach_signature,
    bits_key,
    multi_bucket_keys,
)

INDEX_COLS = ["id", "vec", "norm", "bucket", "buckets", "ivf_part", "version"]

# Both signature kinds from ONE matmul: single-table planes stacked on top of
# the L multi-table planes.
_ALL_PLANES = np.vstack([_PLANES_MAT, _MULTI_MAT])
_N_SINGLE = _PLANES_MAT.shape[0]


def _index_sig_map(batches):
    for pdf in batches:
        if len(pdf) == 0:
            pdf["bucket"] = []
            pdf["buckets"] = []
            yield pdf
            continue
        mat = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        signs = mat @ _ALL_PLANES.T >= 0
        pdf["bucket"] = [bits_key(row[:_N_SINGLE]) for row in signs]
        pdf["buckets"] = [multi_bucket_keys(row, offset=_N_SINGLE) for row in signs]
        yield pdf


def index_vectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    version: int = 0,
    meta_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Index one batch: all per-vector derived columns in a single narrow
    pass — ONE Arrow exchange computes both signature kinds via one stacked
    matmul; norm stays the JVM fold expression (oracle-exact).

    ``meta_cols`` are carried through into the artifact unchanged (source,
    label, lang, ...) so hybrid filtered search can push the predicate into
    the index parquet scan instead of joining back to the corpus."""
    metas = [df.schema[c] for c in meta_cols]
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        as_double(vec_col).alias("vec"),
        *[F.col(f.name) for f in metas],
    )
    schema = ", ".join(
        ["id long", "vec array<double>"]
        + [f"{f.name} {f.dataType.simpleString()}" for f in metas]
        + ["bucket string", "buckets array<string>"]
    )
    signed = base.mapInPandas(_index_sig_map, schema)
    return (
        signed.withColumn("norm", l2_norm("vec"))
        .withColumn("ivf_part", F.col("bucket"))
        .withColumn("version", F.lit(version).cast("long"))
    )


def build_centroids(index: DataFrame) -> DataFrame:
    """Coarse-cell mean vectors. Exact decimal per-dim means rounded 6dp
    (combine-order-independent — same kernel as knn_ivf_probe), so a rebuilt
    sidecar is bit-identical regardless of partitioning."""
    return (
        index.select("ivf_part", F.posexplode("vec").alias("pos", "x"))
        .groupBy("ivf_part", "pos")
        .agg(ravg("x", 6).alias("m"))
        .groupBy("ivf_part")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
            ).alias("cv")
        )
    )


def build_vector_index(
    corpus: DataFrame, id_col: str = "c_id", vec_col: str = "c_vec", version: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Full build: (index, centroids)."""
    index = index_vectors(corpus, id_col, vec_col, version)
    return index, build_centroids(index)


def upsert_vector_index(
    index: DataFrame,
    incoming: DataFrame,
    id_col: str,
    vec_col: str,
    version: int,
    meta_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Incremental growth: index ONLY the incoming batch (the expensive
    signature pass touches new vectors alone), then keep-latest merge by id.
    One hash-partitioned window over (id) — no corpus re-signature. Rebuild
    the centroid sidecar with build_centroids when drift matters; cell
    membership itself never changes (data-independent quantizer)."""
    fresh = index_vectors(incoming, id_col, vec_col, version, meta_cols)
    cols = [c for c in INDEX_COLS if c in index.columns] + list(meta_cols)
    merged = index.select(*cols).unionByName(fresh.select(*cols))
    w = Window.partitionBy("id").orderBy(F.col("version").desc())
    return (
        merged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def publish_vector_index(index: DataFrame, path: str) -> tuple[DataFrame, DataFrame]:
    """Write-once publish: the index parquet lands first, then the centroid
    sidecar is derived from the PUBLISHED files — so the signature pass runs
    exactly once regardless of how many readers the lineage has (writing
    index and centroids from the same unpersisted lineage would sign the
    corpus twice). Returns the stored (index, centroids)."""
    spark = index.sparkSession
    index.write.mode("overwrite").parquet(f"{path}/index")
    stored = spark.read.parquet(f"{path}/index")
    build_centroids(stored).write.mode("overwrite").parquet(f"{path}/centroids")
    return stored, spark.read.parquet(f"{path}/centroids")


def read_vector_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{path}/index"),
        spark.read.parquet(f"{path}/centroids"),
    )


def _corpus_fingerprint(corpus: DataFrame, id_col: str) -> dict:
    """Cheap freshness probe: one single-column aggregate (count + id sum/max
    over parquet footers/one narrow column). Production pins an artifact
    VERSION instead (the reference ships a dated tarball —
    sample_cron_job.sh:10); the probe exists so the correctness gate can
    never serve a stale artifact when the underlying test corpus changes."""
    row = corpus.select(
        F.count("*").alias("n"),
        F.sum(F.col(id_col).cast("long")).alias("s"),
        F.max(F.col(id_col).cast("long")).alias("m"),
    ).first()
    return {"n": row["n"], "s": int(row["s"] or 0), "m": int(row["m"] or 0)}


def serve_vector_index(
    corpus: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    meta_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Publish-if-absent serving: the nightly-build / query-time split of the
    reference's cron (build chroma_db once, serve from the artifact). First
    call pays the signature pass and writes the artifact + a manifest;
    subsequent calls validate the manifest against a cheap corpus
    fingerprint and serve straight from parquet — the vectors are never
    re-signed."""
    import json
    import os

    spark = corpus.sparkSession
    fp = _corpus_fingerprint(corpus, id_col)
    mf_path = os.path.join(path, "manifest.json")
    if os.path.isfile(mf_path):
        try:
            with open(mf_path) as fh:
                stored_fp = json.load(fh)
        except (OSError, ValueError):
            stored_fp = None
        if stored_fp == fp:
            return read_vector_index(spark, path)
    idx, cent = publish_vector_index(
        index_vectors(corpus, id_col, vec_col, meta_cols=meta_cols), path
    )
    tmp = mf_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(fp, fh)
    os.replace(tmp, mf_path)
    return idx, cent


def _topk(scored: DataFrame, k: int, q_id: str) -> DataFrame:
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col("c_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def knn_from_index(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 5,
    strategy: str = "lsh",
    nprobe: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """Top-k against the materialized index. Signature/norm work happens on
    the query side only; the index side is a pure parquet scan pruned to
    (id, vec, <join key>). Results are identical to the corresponding
    corpus-side strategy (knn_lsh / knn_lsh_multi / knn_ivf_probe), so the
    same oracles apply.

    r12 opt (guide §4.2): candidate scoring is the blocked numpy kernel —
    the (bounded) query side is collected keyed by its probe key and each
    Arrow batch of the index scores against its key's query matrix with
    one matmul, replacing the per-candidate interpreted-HOF dot() of the
    broadcast equi-join (same documented ~1-ulp evaluation-order tolerance
    and HALF_UP rounding as knn_partitioned's identical substitution; the
    stored norm column is no longer read on this path — norms fold inside
    the kernel). A query set above MAX_BLOCKED_QUERIES falls back to the
    equi-join + expression shape, which never collects."""
    from nocouncil_etl_spark.operators.similarity import (
        MAX_BLOCKED_QUERIES,
        _blocked_candidates_by_part,
        _query_matrix,
    )

    if strategy == "lsh":
        q = attach_signature(queries, q_vec)
        q_keyed = q.select("bucket", q_id, q_vec)
        c_keyed, key = index, "bucket"
        dedup = False
    elif strategy == "lsh_multi":
        q = attach_signature(queries, q_vec, multi=True)
        q_keyed = q.select(F.explode("buckets").alias("bucket"), q_id, q_vec)
        c_keyed = index.select(
            "id", "vec", "norm", F.explode("buckets").alias("bucket")
        )
        key = "bucket"
        dedup = True
    elif strategy == "ivf":
        if centroids is None:
            raise ValueError("strategy='ivf' needs the centroids sidecar")
        q_keyed = (
            queries.crossJoin(F.broadcast(centroids))
            .withColumn("_csim", F.round(cosine(q_vec, "cv"), 6))
            .withColumn(
                "_crk",
                F.row_number().over(
                    Window.partitionBy(q_id).orderBy(
                        F.col("_csim").desc_nulls_last(), F.col("ivf_part")
                    )
                ),
            )
            .filter(F.col("_crk") <= nprobe)
            .select("ivf_part", q_id, q_vec)
        )
        c_keyed, key = index, "ivf_part"
        dedup = False
    else:
        raise ValueError(
            f"unknown index strategy {strategy!r}; expected lsh | lsh_multi | ivf"
        )

    q_rows = q_keyed.limit(MAX_BLOCKED_QUERIES + 1).collect()
    if len(q_rows) > MAX_BLOCKED_QUERIES:
        return _knn_from_index_joined(
            q_keyed, c_keyed, key, k, dedup, q_id, q_vec
        )
    by_key: dict = {}
    for r in q_rows:
        by_key.setdefault(r[key], []).append(r)
    per_part = {p: _query_matrix(rows, q_id, q_vec) for p, rows in by_key.items()}
    candidates = _blocked_candidates_by_part(
        c_keyed, per_part, k, key, "id", "vec", q_id
    )
    if dedup:
        # OR over tables: a pair colliding in several (exploded) index rows
        # scores identically; dedup before the rank window
        candidates = candidates.dropDuplicates([q_id, "id"])
    w = Window.partitionBy(q_id).orderBy(
        F.col("sim").desc_nulls_last(), F.col("id")
    )
    return (
        candidates.filter(F.col(q_id) != F.col("id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(q_id, F.col("id").alias("c_id"), "sim", "rk")
    )


def _knn_from_index_joined(
    q_keyed: DataFrame,
    c_keyed: DataFrame,
    key: str,
    k: int,
    dedup: bool,
    q_id: str,
    q_vec: str,
) -> DataFrame:
    """Distributed fallback for a data-sized query side: broadcast key
    equi-join + JVM expression cosine over the stored norm column (the
    pre-r12 shape; never collects)."""
    q = q_keyed.withColumn("_qn", l2_norm(q_vec))
    pairs = c_keyed.join(F.broadcast(q), on=key).filter(F.col(q_id) != F.col("id"))
    if dedup:
        pairs = pairs.dropDuplicates([q_id, "id"])
    sim = F.when(
        F.col("_qn") * F.col("norm") != 0,
        dot(q_vec, "vec") / (F.col("_qn") * F.col("norm")),
    )
    scored = pairs.select(
        q_id, F.col("id").alias("c_id"), F.round(sim, 6).alias("sim")
    )
    return _topk(scored, k, q_id)
