"""Breadth batch 54: time-decay attribution, k-fold CV, KPSS, volume
anomaly, revenue retention, multipart ETag."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth54 import CV_K, ETAG_PART
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_time_decay_credit_conserves_per_conversion_shares(spark, sf_dir):
    rows = REG["attribution_time_decay"].fn(spark, sf_dir).collect()
    assert {r.channel for r in rows} <= {"click", "view"}
    assert rows
    # total credit across channels ≈ 1e6 per attributed conversion
    total_credit = sum(r.credit_ppm_total for r in rows)
    n_touches = sum(r.n_touches for r in rows)
    assert total_credit > 0
    # floor rounding loses at most 1 ppm per touch
    n_convs_upper = total_credit // (1_000_000 - 1) + 1
    assert total_credit <= n_convs_upper * 1_000_000
    assert total_credit >= (total_credit // 1_000_000) * 1_000_000 - n_touches


def test_kfold_cv_pooled_matches_folds(spark, sf_dir):
    rows = REG["ml_kfold_cv"].fn(spark, sf_dir).collect()
    assert len(rows) == CV_K
    pooled = {r.pooled_acc_ppm for r in rows}
    assert len(pooled) == 1
    n = sum(r.n_test for r in rows)
    c = sum(r.n_correct for r in rows)
    assert pooled.pop() == (c * 1_000_000) // n
    for r in rows:
        assert 0 <= r.acc_ppm <= 1_000_000


def test_kpss_statistic_is_positive(spark, sf_dir):
    rows = REG["ts_kpss_level"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kpss_micro > 0
        assert (r.kpss_micro > 463000) == (r.reject_stationary == 1)


def test_volume_anomaly_flags_follow_the_band(spark, sf_dir):
    rows = REG["dq_volume_anomaly"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        out = (
            r.n * 100 > r.med_trailing * 115 or r.n * 100 < r.med_trailing * 85
        )
        assert out == (r.anomaly == 1)
        assert r.med_trailing > 0


def test_revenue_retention_bridge_identity(spark, sf_dir):
    r = REG["agg_revenue_retention_bridge"].fn(spark, sf_dir).first()
    # existing-base second-period revenue = retained + expansion
    assert r.existing_rev2 == r.retained + r.expansion
    # the base decomposes into retained + contraction + churned
    assert r.base_rev1 == r.retained + r.contraction + r.churned
    assert r.grr_ppm <= 1_000_000
    assert r.grr_ppm <= r.nrr_ppm  # GRR caps what NRR can recover


def test_multipart_etag_shape_and_part_count(spark, sf_dir):
    from nocouncil_etl_spark.io import load
    from pyspark.sql import functions as F

    rows = REG["multimodal_multipart_etag"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.n
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r.etag.endswith(f"-{r.n_parts}")
        h = r.etag.split("-")[0]
        assert len(h) == 32 and all(c in "0123456789abcdef" for c in h)
        assert r.n_parts == (docs[r.doc_id] + ETAG_PART - 1) // ETAG_PART
