"""Synthesize an sf1-scale dataset (~10× sf0.1) for scaling benchmarks.

Replicates each scaling table 10× with key-domain offsets that preserve every
join relationship (orderkey/custkey/suppkey/partkey/event_id/doc_id/vec_id
all shift together per replica); region/nation stay fixed like TPC-H. Value
columns are untouched, so group-by cardinalities on attribute columns
(returnflag, mktsegment, event_type, ...) stay constant while data volume
scales — the shape a real 10× data-growth has.

Usage: python scripts/make_sf1.py [out_dir] [copies]
(default .scratch/sf1 under the repo, 10 copies)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"

# key columns sharing a domain shift per table: (table, {col: domain})
KEYED = {
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    # user_id scales WITH sf in the driver's generator (15/150/1500 distinct
    # at sf0.001/0.01/0.1, ~66 events/user constant) — shift it like a key,
    # or per-user density inflates 10x and every user-keyed join measures
    # quadratically heavier than a faithful 10x scale-up (caught in r9).
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scratch", "sf1")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # per-domain offsets = max(key)+1 within the source, so replicas never collide
    spans: dict[str, int] = {}
    for table, keys in KEYED.items():
        for col, dom in keys.items():
            mx = con.execute(
                f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchone()[0]
            spans[dom] = max(spans.get(dom, 0), int(mx) + 1)

    for table in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")

    for table, keys in KEYED.items():
        cols = con.execute(
            f"SELECT * FROM read_parquet('{SRC}/{table}.parquet') LIMIT 0"
        ).df().columns
        select = ", ".join(
            f"{c} + i.i * {spans[keys[c]]} AS {c}"
            if c in keys
            # events.ts is TIMESTAMP(NANOS) in the source layout (Spark reads
            # it as long nanos via io.load); keep the replica faithful
            else (f"{c}::TIMESTAMP_NS AS {c}" if (table, c) == ("events", "ts") else c)
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({copies})) AS i) i) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
