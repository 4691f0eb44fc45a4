"""User-facing engine facade — the surface a reference user programs against.

The reference user today runs scripts that scan JSONL, dedup by hash, filter
by keywords, chunk-summarize, embed, and query a vector collection. This
facade exposes those capabilities as one object over any DataFrame:

    from nocouncil_etl_spark.api import Engine

    eng = Engine()                          # or Engine(existing_spark)
    docs = eng.table("/data/sf0.1", "documents")

    eng.dedup_exact(docs, "text", "doc_id")
    eng.near_duplicates(docs, "doc_id", "text", threshold=0.6)
    eng.embed(docs, "text")
    eng.search(index, query_vec_df, k=10, strategy="lsh")
    eng.run("pricing_summary", "/data/sf0.1")   # anything in the catalog
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nocouncil_etl_spark import io as engine_io
from nocouncil_etl_spark.registry import load_all
from nocouncil_etl_spark.session import get_session, tune


class Engine:
    """Thin facade binding the operator library to one SparkSession."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = tune(spark) if spark is not None else get_session()

    # --- catalog ------------------------------------------------------------

    def table(self, sf_dir: str, name: str) -> DataFrame:
        return engine_io.load(self.spark, sf_dir, name)

    def queries(self) -> list[str]:
        return sorted(load_all())

    def run(self, name: str, sf_dir: str) -> DataFrame:
        return load_all()[name].fn(self.spark, sf_dir)

    # --- dedup --------------------------------------------------------------

    def dedup_exact(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        from nocouncil_etl_spark.operators.dedup import exact_dedup

        return exact_dedup(df, text_col, id_col)

    def near_duplicates(
        self,
        df: DataFrame,
        id_col: str,
        text_col: str,
        threshold: float = 0.5,
        shingle_n: int = 3,
        n_bands: int = 2,
        rows_per_band: int = 2,
    ) -> DataFrame:
        from nocouncil_etl_spark.operators.dedup import lsh_near_duplicates

        return lsh_near_duplicates(
            df, id_col, text_col, shingle_n, n_bands, rows_per_band, threshold
        )

    # --- vectors ------------------------------------------------------------

    def embed(
        self, df: DataFrame, text_col: str, backend: str | None = None
    ) -> DataFrame:
        """E1 embedding; backend = 'hash' (deterministic default) or
        'sentence_transformers' (MiniLM-384 production twin), resolved from
        session conf spark.nocouncil_etl_spark.embedBackend when not given.
        The Spark plan is identical across backends (operators/backends.py)."""
        from nocouncil_etl_spark.operators.backends import (
            EMBED_HASH,
            make_embed_udf,
            resolve_backend,
        )
        from nocouncil_etl_spark.operators.vector_index import add_embeddings

        if backend is None:
            backend = resolve_backend(self.spark, "embedBackend", EMBED_HASH)
        return add_embeddings(df, text_col, make_embed_udf(backend))

    def search(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        k: int = 10,
        strategy: str = "blocked",
        **cols,
    ) -> DataFrame:
        """Top-k similarity with the strategy ladder: 'exact' (expression),
        'blocked' (Arrow matmul), 'lsh' (one signature table), 'lsh_multi'
        (OR-amplified, L tables — the high-recall ANN), 'ivf' (centroid
        probing; pass part_col=..., nprobe=...) — SURVEY §4.2-1's API-level
        strategy switch."""
        from nocouncil_etl_spark.operators import similarity as S

        fn = {
            "exact": S.knn_exact,
            "blocked": S.knn_exact_blocked,
            "lsh": S.knn_lsh,
            "lsh_multi": S.knn_lsh_multi,
            "ivf": S.knn_ivf_probe,
        }[strategy]
        return fn(queries, corpus, k, **cols)

    # --- text ---------------------------------------------------------------

    def text_quality(self, df: DataFrame, text_col: str) -> DataFrame:
        from pyspark.sql import functions as F

        from nocouncil_etl_spark.functions.text import quality_score

        ws = F.split(text_col, " ")
        return df.withColumn("quality", F.round(quality_score(text_col, ws), 4))

    # --- pipelines ----------------------------------------------------------

    def council_index(self, sf_dir: str) -> DataFrame:
        from nocouncil_etl_spark.pipelines.council import council_pipeline

        return council_pipeline(self.spark, sf_dir)

    def articles_index(self, sf_dir: str, seen: DataFrame | None = None) -> DataFrame:
        from nocouncil_etl_spark.pipelines.articles import articles_pipeline

        return articles_pipeline(self.spark, sf_dir, seen=seen)
