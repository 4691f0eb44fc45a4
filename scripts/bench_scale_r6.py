"""Round-6 sf0.1 vs sf1 scaling measurement (SCALE.md protocol: best-of-2,
count() for big-output queries, quiet machine)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# big-output queries: count() so the harness doesn't measure driver-side
# row serialization (the join_lookup caveat in SCALE.md)
BIG = {
    "curation_curriculum_order", "eval_span_f1", "model_bigram_lm_ppl",
    "text_keyphrase_rake", "sample_hard_negatives", "dedup_golden_record",
    "curation_quantile_normalize_grid", "dedup_lsh_salted",
}
NAMES = sys.argv[1:] or [
    "join_bloom_pruned", "text_phrase_search", "layout_minmax_pruning",
    "cep_pattern_match", "stream_cep_pattern", "eval_lsh_recall_grid",
    "sample_hard_negatives", "curation_curriculum_order",
    "pack_length_buckets", "dedup_golden_record", "model_bigram_lm_ppl",
    "graph_ppr_seeded", "privacy_t_closeness", "sketch_bitmap_distinct",
    "contamination_bloom_gate", "text_keyphrase_rake",
    "curation_dataset_card", "ml_kmeans_elbow", "stream_topk_heavy_hitters",
    "vec_knn_hamming_packed", "attribution_shapley",
    "curation_mix_waterfill", "eval_span_f1",
]

def main():
    from nocouncil_etl_spark.registry import load_all
    from nocouncil_etl_spark.session import get_session
    reg = load_all()
    spark = get_session("r6-scale-bench")
    for sf_dir in ("/root/testdata/sf0.1", os.path.join(REPO, ".scratch/sf1")):
        reg["pricing_summary"].fn(spark, sf_dir).collect()  # warm
        for name in NAMES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = reg[name].fn(spark, sf_dir)
                n = df.count() if name in BIG else len(df.collect())
                best = min(best, time.perf_counter() - t0)
            print(f"{os.path.basename(sf_dir):>6} {name:32s} {best:7.2f}s rows={n}", flush=True)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    spark.stop()

main()
