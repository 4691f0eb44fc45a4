"""Facade smoke: the user-facing Engine surface works end to end."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_engine_facade(spark, sf_dir):
    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    assert "pricing_summary" in eng.queries()
    assert eng.run("pricing_summary", sf_dir).count() > 0

    docs = eng.table(sf_dir, "documents")
    assert eng.dedup_exact(docs, "text", "doc_id").count() == docs.count()

    nd = eng.near_duplicates(docs.limit(50), "doc_id", "text", threshold=0.9)
    assert nd.columns == ["id_a", "id_b", "jaccard"]

    emb = eng.embed(docs.limit(5), "text")
    assert "embedding" in emb.columns
    assert len(emb.first().embedding) > 0

    e = eng.table(sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    for strategy in ("exact", "blocked", "lsh"):
        hits = eng.search(corpus, queries, k=3, strategy=strategy)
        assert hits.count() <= 2 * 3

    scored = eng.text_quality(docs.limit(3), "text")
    assert all(0.0 <= r.quality <= 1.0 for r in scored.collect())


def test_engine_curation_surface(spark, sf_dir):
    """The facade's curation verbs: deterministic sample/split/pack and
    pair→cluster — same kernels the oracle-checked queries use."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    docs = eng.table(sf_dir, "documents")

    s1 = eng.sample(docs, "doc_id", 10).count()
    assert 0 < s1 < docs.count()
    assert eng.sample(docs, "doc_id", 10).count() == s1  # deterministic

    splits = dict(
        eng.split(docs, "doc_id").groupBy("split").count().collect()
    )
    assert set(splits) == {"train", "val", "test"}
    assert splits["train"] > splits["val"]

    packed = eng.pack(
        docs.withColumn("n_tok", F.size(F.split("text", " "))),
        group_col="source", order_col="doc_id", tokens_col="n_tok",
    )
    per_pack = packed.groupBy("source", "pack_id").agg(
        F.sum("n_tok").alias("t")
    )
    assert per_pack.count() > 0

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    comp = {r.node: r.comp for r in eng.cluster_duplicates(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1}


def test_engine_llm_and_extraction_surface(spark, sf_dir):
    """Round-3 facade verbs: summarize / extract_entities / tree_summarize
    (stub backends — same kernels the oracle-checked queries pin) and
    extract_html through the cascade seam."""
    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    docs = eng.table(sf_dir, "documents").limit(5)

    summ = eng.summarize(docs)
    assert summ.columns == ["doc_id", "summary", "quotes", "n_words", "error"]
    assert summ.filter(F.col("error").isNotNull()).count() == 0

    ents = eng.extract_entities(docs)
    assert ents.columns == ["doc_id", "dockets", "error"]

    ev = eng.table(sf_dir, "events").limit(200)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    items = ev.select(
        "user_id", (F.row_number().over(w) - 1).alias("pos"),
        F.col("event_type").alias("val"),
    )
    reduced = eng.tree_summarize(items, key="user_id", pos="pos", value="val")
    assert reduced.count() == ev.select("user_id").distinct().count()

    html = docs.select(
        "doc_id", F.concat(F.lit("<p>"), "text", F.lit("</p>")).alias("html")
    )
    out = eng.extract_html(html)
    assert out.filter(F.col("extractor") == "none").count() == 0


def test_engine_index_surface(spark, sf_dir, tmp_path):
    """build_index publishes the parquet artifact; search_index serves from
    it without touching the corpus."""
    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    e = eng.table(sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    path = str(tmp_path / "idx")
    idx, cent = eng.build_index(corpus, "c_id", "c_vec", path)
    assert idx.count() == corpus.count() and cent.count() > 0

    queries = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    for strategy in ("lsh", "lsh_multi", "ivf"):
        hits = eng.search_index(queries, path, k=3, strategy=strategy)
        assert {"q_id", "c_id", "sim", "rk"} <= set(hits.columns)
        assert hits.count() <= 2 * 3


def test_engine_hybrid_serve_surface(spark, sf_dir, tmp_path):
    """serve_index is publish-if-absent; search_index(where=...) restricts
    candidates to matching index metadata — hybrid filtered search."""
    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    e = eng.table(sf_dir, "embeddings")
    corpus = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"), "label"
    )
    path = str(tmp_path / "hidx")
    idx, _ = eng.serve_index(corpus, "c_id", "c_vec", path, meta_cols=("label",))
    idx2, _ = eng.serve_index(corpus, "c_id", "c_vec", path, meta_cols=("label",))
    assert idx.count() == idx2.count() == corpus.count()

    queries = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    hits = eng.search_index(queries, path, k=5, where="label = 0")
    allowed = {r.c_id for r in idx.filter("label = 0").select(F.col("id").alias("c_id")).collect()}
    got = {r.c_id for r in hits.collect()}
    assert got <= allowed


def test_engine_semantic_dedup_and_pagerank(spark, sf_dir):
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    emb = eng.table(sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # a corpus with its exact copy must pair up: union shifted ids
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 10_000_000).alias("vec_id"), "v")
    )
    pairs = eng.semantic_dedup(doubled, "vec_id", "v", threshold=0.999)
    found = pairs.filter(F.col("id_dup") == F.col("id_keep") + 10_000_000).count()
    n = emb.count()
    assert found >= n * 0.9  # exact copies, boundary misses only

    docs = eng.table(sf_dir, "documents").select(F.col("doc_id").alias("src"))
    edges = docs.select("src", ((F.col("src") * 31 + 7) % 97).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    ranks = eng.pagerank(edges, iters=4)
    assert ranks.filter(F.col("r") <= 0).count() == 0
    ranks.unpersist()


def test_engine_funnel_and_gapfill(spark, sf_dir):
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.api import Engine

    eng = Engine(spark)
    ev = eng.table(sf_dir, "events")
    out = eng.funnel(
        ev,
        "user_id",
        "ts",
        [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
    )
    rows = {r.stage: r.n_keys for r in out.collect()}
    assert rows["view"] >= rows["click"] >= rows["purchase"] > 0
    # generic verb reproduces the plan query exactly
    from nocouncil_etl_spark.registry import load_all

    plan_rows = {
        r.stage: r.n_users
        for r in load_all()["funnel_conversion"].fn(spark, sf_dir).collect()
    }
    assert rows == plan_rows

    filled = eng.gapfill(ev, "user_id", "ts", "value", bucket="hour")
    assert filled.filter(F.col("filled_v").isNull()).count() == 0
    # generic verb ≡ the oracle-checked plan query on the same inputs
    plan = load_all()["ts_gapfill_interpolate"].fn(spark, sf_dir)
    a = {(r.user_id, r.bucket_us): r.filled_v for r in plan.collect()}
    b = {
        (r.user_id, int(r.bucket_start.timestamp() * 1_000_000)): r.filled_v
        for r in filled.collect()
    }
    assert a == b
