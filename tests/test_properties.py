"""Property tests (SURVEY.md §5.2-3): order-sensitivity, idempotence,
tie-break determinism — the reference's implicit-order traps, made explicit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import load_all

REGISTRY = load_all()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ordered_agg_is_input_order_invariant(spark, sf_dir):
    """G2: shuffling the input must not change the ordered string agg —
    ordering comes from the explicit (ts, event_id) sort key, not file order."""
    q = REGISTRY["ordered_string_agg"]
    base = _rows(q.fn(spark, sf_dir))

    ev = load(spark, sf_dir, "events").orderBy(F.rand(seed=7))
    ev.createOrReplaceTempView("events_osa")  # the query reads this view
    shuffled = _rows(
        spark.sql(
            """
            SELECT user_id,
                   listagg(event_type, ' ') WITHIN GROUP (ORDER BY ts, event_id) AS activity,
                   listagg(CASE WHEN value < 100 THEN event_type END, ' ')
                     WITHIN GROUP (ORDER BY ts, event_id) AS quiet_activity
            FROM events_osa GROUP BY user_id
            """
        )
    )
    assert base == shuffled


def test_incremental_anti_join_idempotent(spark, sf_dir):
    """T1/T2: running the memoized ingest twice adds nothing the second time."""
    ev = load(spark, sf_dir, "events")
    first = ev.join(ev.limit(0), "event_id", "left_anti")  # empty seen-set
    assert first.count() == ev.count()
    processed = ev.select("event_id")  # everything processed
    second = ev.join(processed, "event_id", "left_anti")
    assert second.count() == 0


def test_first_match_tiebreak_deterministic(spark, sf_dir):
    """J6: repeated runs give identical first-match rows."""
    q = REGISTRY["join_first_match"]
    assert _rows(q.fn(spark, sf_dir)) == _rows(q.fn(spark, sf_dir))


def test_tree_reduce_fan_in_invariant(spark, sf_dir):
    """E8: bounded-fan-in tree reduce equals single-pass ordered reduce for
    every fan-in (associative order-preserving combiner)."""
    from pyspark.sql import Window
    from nocouncil_etl_spark.operators.treereduce import tree_reduce

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    items = ev.select(
        "user_id",
        (F.row_number().over(w) - 1).alias("pos"),
        F.col("event_type").alias("val"),
    )
    results = {
        fan_in: _rows(tree_reduce(items, "user_id", "pos", "val", fan_in=fan_in))
        for fan_in in (2, 4, 16)
    }
    assert results[2] == results[4] == results[16]


def test_lsh_neardup_recall(spark, sf_dir):
    """E5: every synthesized mutated copy is detected by the MinHash+LSH
    pipeline (its jaccard with the original is far above threshold and LSH
    banding catches it)."""
    q = REGISTRY["dedup_minhash_lsh"]
    pairs = {(r.id_a, r.id_b) for r in q.fn(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents")
    expected = {
        (r.doc_id, r.doc_id + 100000)
        for r in docs.filter(F.col("doc_id") % 4 == 0).select("doc_id").collect()
    }
    missed = expected - pairs
    # banding with 2 bands x 2 rows has < 100% candidate recall by design;
    # require the verified-pair set to cover the vast majority
    assert len(missed) <= len(expected) * 0.15, f"missed {len(missed)}/{len(expected)}"


def test_knn_lsh_is_subset_of_exact_scores(spark, sf_dir):
    """E3: LSH top-k similarity values can never exceed the exact top-k."""
    exact = {
        (r.q_id, r.c_id): r.sim
        for r in REGISTRY["vec_knn_exact"].fn(spark, sf_dir).collect()
    }
    best_exact = {}
    for (q_id, _), sim in exact.items():
        best_exact[q_id] = max(best_exact.get(q_id, -2.0), sim)
    for r in REGISTRY["vec_knn_lsh"].fn(spark, sf_dir).collect():
        assert r.sim <= best_exact[r.q_id] + 1e-9


def test_embedding_udf_matches_kernel(spark, sf_dir):
    """E1: the Arrow pandas_udf path reproduces the pure-python kernel."""
    from nocouncil_etl_spark.operators.models import hash_projection_embed

    docs = load(spark, sf_dir, "documents").limit(5).collect()
    q = REGISTRY["model_embed_hashproj"]
    got = {r.doc_id: (r.e0, r.e1, r.e2, r.e3) for r in q.fn(spark, sf_dir).collect()}
    for row in docs:
        vec = hash_projection_embed(row.text)
        expect = tuple(round(x, 6) for x in vec[:4])
        assert got[row.doc_id] == expect


def test_lsh_multi_table_recall_amplification(spark, sf_dir):
    """OR-amplification must lift near-duplicate recall ≥0.9 where the
    single 8-plane table sits lower (~0.76-0.78 on this corpus): a planted
    near-dup (cosine ≈ 0.995) collides per table w.p. ~0.955^planes, so
    L=4 six-plane tables give 1-(1-0.758)^4 ≈ 0.997 vs 0.955^8 ≈ 0.69.
    Deterministic (fixed seeds, fixed data) — no flake margin needed."""
    from pyspark.sql import functions as F

    from nocouncil_etl_spark.io import load
    from nocouncil_etl_spark.operators.similarity import (
        knn_lsh,
        knn_lsh_multi,
        perturb,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("q_id"),
        perturb("v", 0.1, F.lit(63)).alias("q_vec"),
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    n_q = queries.count()

    def recall(fn):
        top = fn(queries, corpus, 3).collect()
        return sum(1 for r in top if r.c_id == r.q_id - 100000) / n_q

    single, multi = recall(knn_lsh), recall(knn_lsh_multi)
    assert single < 0.9  # the gap amplification exists to close
    assert multi >= 0.9
    assert multi > single


def test_chunk_overlap_reconstruction(spark, tmp_path):
    """Chunking invariants on hand-built edge lengths (1, OVERLAP, OVERLAP+1,
    STRIDE, CHUNK, CHUNK+1, 2*STRIDE+OVERLAP, one past it, empty string):
    (a) every doc yields >= 1 chunk; (b) dropping the first OVERLAP tokens of
    every chunk after the first and concatenating reconstructs the document
    exactly — no token lost, none duplicated; (c) every chunk after the
    first has more than OVERLAP tokens (the formula never emits a
    redundant tail)."""
    from nocouncil_etl_spark.plans.text_corpus_plans import (
        CHUNK,
        OVERLAP,
        text_chunk_overlap,
    )

    lengths = [1, OVERLAP, OVERLAP + 1, CHUNK - OVERLAP, CHUNK, CHUNK + 1,
               CHUNK + (CHUNK - OVERLAP), CHUNK + (CHUNK - OVERLAP) + 1, 257]
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(n)))
            for i, n in enumerate(lengths)]
    rows.append((len(rows), ""))  # empty text -> [''] token
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = text_chunk_overlap(spark, str(tmp_path)).collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {r[0] for r in rows}
    for doc_id, text in rows:
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        toks = [c.chunk_text.split(" ") for c in chunks]
        assert all(len(t) > OVERLAP for t in toks[1:])
        rebuilt = toks[0] + [w for t in toks[1:] for w in t[OVERLAP:]]
        assert rebuilt == text.split(" ")
