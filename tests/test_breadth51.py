"""Breadth batch 51: isolation depth, hash chain, packing waste,
bridge allocation, James-Stein, SymSpell."""

from __future__ import annotations

from nocouncil_etl_spark.plans.breadth51 import ISO_MAXL, ISO_TOP, PACK_W, SS_NQ
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_isolation_depth_report_is_sorted_and_bounded(spark, sf_dir):
    rows = REG["ml_isolation_depth"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= ISO_TOP
    ordered = sorted(rows, key=lambda r: r.rk)
    for a, b in zip(ordered, ordered[1:]):
        assert a.iso_depth <= b.iso_depth
    for r in rows:
        assert 1 <= r.iso_depth <= ISO_MAXL + 1


def test_hash_chain_detects_the_planted_tamper(spark, sf_dir):
    rows = REG["io_hash_chain_ledger"].fn(spark, sf_dir).collect()
    assert len(rows) >= 6
    hashes = [r.chain_hash8 for r in rows]
    assert len(set(hashes)) == len(hashes)  # every link distinct
    assert all(r.tamper_detected == 1 for r in rows)


def test_packing_waste_is_a_real_fraction(spark, sf_dir):
    r = REG["curation_pack_attention_waste"].fn(spark, sf_dir).first()
    assert r.n_chunks > 0
    assert r.total_pairs == r.n_chunks * (PACK_W * (PACK_W + 1) // 2)
    assert 0 < r.cross_pairs < r.total_pairs
    assert 0 < r.waste_ppm < 1_000_000
    assert r.max_docs_per_chunk >= 2  # chunks really mix documents


def test_bridge_allocation_conserves_every_cent(spark, sf_dir):
    rows = REG["join_bridge_allocation"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.residual == 0
        assert r.allocated_cents == r.total_cents
        assert r.alloc_min <= r.alloc_max


def test_james_stein_pulls_toward_the_grand_mean(spark, sf_dir):
    rows = REG["stat_james_stein"].fn(spark, sf_dir).collect()
    assert len(rows) >= 4
    shrinks = {r.shrink_ppm for r in rows}
    assert len(shrinks) == 1
    c = shrinks.pop()
    assert 0 <= c <= 1_000_000
    # shrunk estimates sit between raw and the grand mean
    grand = sum(r.raw_mean_milli for r in rows) / len(rows)
    for r in rows:
        lo, hi = sorted((r.raw_mean_milli, grand))
        assert lo - 2 <= r.js_mean_milli <= hi + 2


def test_symspell_reconstructs_every_planted_typo(spark, sf_dir):
    rows = REG["search_symspell_correct"].fn(spark, sf_dir).collect()
    assert len(rows) == SS_NQ
    for r in rows:
        assert r.query != r.original  # a letter really was dropped
        assert r.corrected == 1  # ...and the join got it back
        assert r.n_candidates >= 1
