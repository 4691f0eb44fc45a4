"""Batch 36: concurrency sweep, SNM, cascade, McNemar, vacuum, masking."""

from __future__ import annotations

import collections
import os
import tempfile

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_max_concurrency_matches_bruteforce(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    row = REG["agg_max_concurrency"].fn(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("fs")
    )
    ivs = [
        (min(r.od, r.fs), max(r.od, r.fs))
        for r in orders.join(ship, orders.o_orderkey == ship.l_orderkey)
        .select(F.to_date("o_orderdate").alias("od"), "fs")
        .collect()
    ]
    assert row.n_intervals == len(ivs)
    deltas = collections.Counter()
    import datetime

    for lo, hi in ivs:
        deltas[lo] += 1
        deltas[hi + datetime.timedelta(days=1)] -= 1
    run, best, peak = 0, 0, None
    for d in sorted(deltas):
        run += deltas[d]
        if run > best:
            best, peak = run, d
    assert row.max_concurrent == best
    assert row.peak_date == peak


def test_snm_candidate_count_linear(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    row = REG["dedup_sorted_neighborhood"].fn(spark, sf_dir).collect()[0]
    n = load(spark, sf_dir, "part").count()
    # window w=3: exactly (n-1) + (n-2) + (n-3) candidate pairs
    assert row.n_candidates == 3 * n - 6
    assert 0 <= row.n_matches <= row.n_candidates
    assert row.min_dist >= 0


def test_cascade_rounds_monotone_reach(spark, sf_dir):
    rows = sorted(
        REG["graph_influence_cascade"].fn(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [1, 2, 3]
    total = rows[0].total_activated
    assert all(r.total_activated == total for r in rows)
    assert total == 1 + sum(r.n_new for r in rows)


def test_mcnemar_counts_consistent(spark, sf_dir):
    row = REG["eval_mcnemar"].fn(spark, sf_dir).collect()[0]
    assert row.n > 0
    b, c = row.b_only_wrong, row.a_only_wrong
    assert b + c > 0
    assert abs(row.mcnemar_chi2 - round((b - c) ** 2 / (b + c), 6)) < 1e-9


def test_vacuum_removes_old_snapshot_keeps_current(spark, sf_dir):
    rows = {
        r.event_type: r
        for r in REG["io_snapshot_vacuum"].fn(spark, sf_dir).collect()
    }
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"vacuum_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    assert not os.path.isdir(os.path.join(base, "v1"))
    assert os.path.isdir(os.path.join(base, "v2"))
    with open(os.path.join(base, "CURRENT")) as f:
        assert f.read().strip() == "v2"
    src = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    )
    for r in src:
        mult = 3 if r.event_type == "purchase" else 1
        assert rows[r.event_type].cents == mult * r.cents


def test_masking_rate_and_reassembly(spark, sf_dir):
    import pandas as pd

    rows = REG["curation_span_corruption"].fn(spark, sf_dir).collect()
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    orig = dict(zip(texts["doc_id"], texts["text"]))
    total_tokens = total_masked = 0
    for r in rows:
        toks = orig[r.doc_id].split(" ")
        assert r.n_tokens == len(toks)
        out = r.masked_text.split(" ")
        assert len(out) == len(toks)
        # every non-masked position is byte-identical to the source
        for a, b in zip(toks, out):
            assert b == a or b == "[MASK]"
        assert out.count("[MASK]") == r.n_masked
        total_tokens += r.n_tokens
        total_masked += r.n_masked
    rate = total_masked / total_tokens
    assert 0.12 < rate < 0.18  # 15% +/- sampling noise
