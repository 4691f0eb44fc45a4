"""Batch 33: matrix profile, JSON schema, JT test, Poisson bootstrap,
k-truss, Page-Hinkley."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _daily(spark, sf_dir, agg):
    from nocouncil_etl_spark.io import load

    rows = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(agg.alias("x"))
        .collect()
    )
    out = collections.defaultdict(list)
    for r in rows:
        out[r.event_type].append((r.d, r.x))
    return {k: [x for _, x in sorted(v)] for k, v in out.items()}


def test_matrix_profile_matches_bruteforce(spark, sf_dir):
    series = _daily(
        spark, sf_dir, F.sum(F.round("value").cast("long")).cast("long")
    )
    got = {
        (r.event_type, r.i): r
        for r in REG["ts_matrix_profile_lite"].fn(spark, sf_dir).collect()
    }
    for et, xs in series.items():
        n = len(xs)
        nw = n - 7 + 1
        for i in range(1, nw + 1):
            best = min(
                (
                    (
                        sum(
                            (xs[i - 1 + k] - xs[j - 1 + k]) ** 2
                            for k in range(7)
                        ),
                        j,
                    )
                    for j in range(1, nw + 1)
                    if abs(i - j) >= 4
                ),
            )
            r = got[(et, i)]
            assert (r.d2, r.nn_j) == best


def test_json_schema_covers_all_keys(spark, sf_dir):
    rows = REG["io_json_schema_infer"].fn(spark, sf_dir).collect()
    by_key = {(r.key_name, r.json_type): r for r in rows}
    assert ("id", "number") in by_key
    assert ("status", "string") in by_key
    assert ("price", "number") in by_key
    assert ("rush", "boolean") in by_key
    assert by_key[("id", "number")].coverage_1e6 == 1000000
    # price on ~1/3, rush on ~1/5 of records
    assert 300000 < by_key[("price", "number")].coverage_1e6 < 365000
    assert 180000 < by_key[("rush", "boolean")].coverage_1e6 < 215000


def test_jt_matches_bruteforce_pairs(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    row = REG["stat_jonckheere_terpstra"].fn(spark, sf_dir).collect()[0]
    data = collections.defaultdict(list)
    for r in (
        load(spark, sf_dir, "orders")
        .select(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("g"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .collect()
    ):
        data[r.g].append(r.v)
    gs = sorted(data)
    jt2 = 0
    for ai in range(len(gs)):
        for bi in range(ai + 1, len(gs)):
            va = sorted(data[gs[ai]])
            import bisect

            for x in data[gs[bi]]:
                lt = bisect.bisect_left(va, x)
                eq = bisect.bisect_right(va, x) - lt
                jt2 += 2 * lt + eq
    assert row.jt2 == jt2
    n = sum(len(v) for v in data.values())
    assert row.mean2 == (n * n - sum(len(v) ** 2 for v in data.values())) // 2


def test_poisson_bootstrap_replicates_cluster_around_truth(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    rows = REG["sample_poisson_bootstrap"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    ev = load(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    agg = ev.agg(F.count("*").alias("n"), F.avg("c").alias("mean")).collect()[0]
    for r in rows:
        # Poisson(1) keeps n_eff within a few percent of n
        assert abs(r.n_eff - agg.n) < 0.1 * agg.n + 50
        assert abs(r.mean_milli / 1000 - agg.mean) < 0.05 * agg.mean + 10


def test_ktruss_rounds_monotone(spark, sf_dir):
    rows = sorted(
        REG["graph_ktruss_rounds"].fn(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [1, 2]
    # peeling only removes edges
    assert rows[1].n_edges <= rows[0].n_edges
    for r in rows:
        assert r.total_support >= 2 * r.n_edges or r.n_edges == 0


def test_page_hinkley_alarm_consistent_with_recompute(spark, sf_dir):
    series = _daily(
        spark, sf_dir, F.sum(F.round("value").cast("long")).cast("long")
    )
    got = {
        r.event_type: r
        for r in REG["ts_page_hinkley_drift"].fn(spark, sf_dir).collect()
    }
    for et, xs in series.items():
        mu = sum(xs[:10]) // 10
        delta = mu // 100
        m = 0
        mmin = 10**18
        alarms = []
        for t, x in enumerate(xs, start=1):
            m += x - mu - delta
            mmin = min(mmin, m)
            alarms.append(1 if m - mmin > mu else 0)
        r = got[et]
        assert r.n_days == len(xs)
        assert r.n_alarm_days == sum(alarms)
        first = next((t for t, a in enumerate(alarms, start=1) if a), 0)
        assert r.first_alarm_t == first
