"""Round-5 sf0.1 vs sf1 scaling measurement (SCALE.md protocol: best-of-2,
count() for big-output queries, quiet machine)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BIG = {"dedup_span_ngrams", "join_fuzzy_dedup", "merge_upsert_cdc", "join_record_linkage_fs",
       "ts_gapfill_interpolate", "sample_quantile_strata"}
NAMES = sys.argv[1:] or [
    "cluster_kmeans_fixed", "dedup_semantic_centroid",
    "curation_incremental_e2e", "join_fuzzy_dedup", "agg_approx_sketches",
    "pipeline_rag_e2e", "curation4_e2e", "dedup_span_ngrams",
]

def main():
    from nocouncil_etl_spark.registry import load_all
    from nocouncil_etl_spark.session import get_session
    reg = load_all()
    spark = get_session("r5-scale-bench")
    for sf_dir in ("/root/testdata/sf0.1", os.path.join(REPO, ".scratch/sf1")):
        reg["pricing_summary"].fn(spark, sf_dir).collect()  # warm
        for name in NAMES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = reg[name].fn(spark, sf_dir)
                n = df.count() if name in BIG else len(df.collect())
                best = min(best, time.perf_counter() - t0)
            print(f"{os.path.basename(sf_dir):>6} {name:30s} {best:7.2f}s rows={n}", flush=True)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    spark.stop()

main()
