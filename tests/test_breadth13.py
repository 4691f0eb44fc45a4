"""Invariants for breadth batch 13 (boilerplate, FIFO, XML, semver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nocouncil_etl_spark.registry import load_all

REG = load_all()


# --------------------------------------------------------------------------
# curation_boilerplate_strip
# --------------------------------------------------------------------------


def test_boilerplate_planted_lines_are_stripped_and_body_survives(spark, sf_dir):
    out = REG["curation_boilerplate_strip"].fn(spark, sf_dir)
    rows = out.collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        assert r.n_lines == 3  # header + body + footer
        assert "copyright" not in r.cleaned
        assert "newsletter" not in r.cleaned
        # the body line survives verbatim (word-soup lines are unique)
        assert r.cleaned == docs[r.doc_id]
        assert r.n_kept == 1


# --------------------------------------------------------------------------
# fn_fifo_allocation
# --------------------------------------------------------------------------


def test_fifo_allocation_conserves_budget_per_customer(spark, sf_dir):
    out = REG["fn_fifo_allocation"].fn(spark, sf_dir)
    per_cust = (
        out.groupBy("o_custkey")
        .agg(
            F.sum("alloc_cents").alias("allocated"),
            F.sum("amount_cents").alias("billed"),
        )
        .collect()
    )
    budgets = {
        r.c_custkey: max(round(r.c_acctbal * 100), 0)
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    assert per_cust
    for r in per_cust:
        b = budgets[r.o_custkey]
        assert 0 <= r.allocated <= min(b, r.billed)
        # budget exhausted OR everything paid
        assert r.allocated == min(b, r.billed) or r.allocated >= b - 0


def test_fifo_statuses_partition_correctly(spark, sf_dir):
    rows = REG["fn_fifo_allocation"].fn(spark, sf_dir).collect()
    n_partial_per_cust: dict[int, int] = {}
    for r in rows:
        if r.status == "paid":
            assert r.alloc_cents == r.amount_cents
        elif r.status == "partial":
            assert 0 < r.alloc_cents < r.amount_cents
            n_partial_per_cust[r.o_custkey] = (
                n_partial_per_cust.get(r.o_custkey, 0) + 1
            )
        else:
            assert r.alloc_cents == 0
    # FIFO waterfall: at most ONE partial invoice per customer
    assert all(v == 1 for v in n_partial_per_cust.values())


# --------------------------------------------------------------------------
# fn_xml_xpath_roundtrip / fn_semver_order
# --------------------------------------------------------------------------


def test_xml_roundtrip_is_lossless_vs_source(spark, sf_dir):
    out = {r.o_orderkey: r for r in REG["fn_xml_xpath_roundtrip"].fn(spark, sf_dir).collect()}
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    assert len(out) == len(src)
    for s in src[:50]:
        r = out[s.o_orderkey]
        assert r.status == s.o_orderstatus
        assert r.total_cents == round(s.o_totalprice * 100)
        assert r.priority == s.o_orderpriority


def test_semver_release_outranks_its_prerelease(spark, sf_dir):
    rows = sorted(
        REG["fn_semver_order"].fn(spark, sf_dir).collect(), key=lambda r: r.rk
    )
    assert rows
    keys = [(-r.major, -r.minor, -r.patch, -r.is_release, r.p_partkey) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert ("-rc" in r.ver) == (r.is_release == 0)
