"""Breadth batch 13: boilerplate stripping, FIFO allocation, XML xpath,
semver ordering.

- ``curation_boilerplate_strip`` — line-frequency boilerplate removal
  (the C4/RefinedWeb discipline): lines appearing in ≥ half of a
  source's documents are boilerplate (footers, nav, legal) and are
  stripped; per-source boilerplate lines are PLANTED in-query (the
  synthesized-fixture discipline of the dedup family) so ground truth
  is exact and both engines rebuild the identical cleaned text.
- ``fn_fifo_allocation`` — waterfall allocation of each customer's
  account balance across their orders oldest-first (the payments-to-
  invoices / lots-to-fills kernel): alloc = clamp(budget − prior, 0,
  amount) from ONE running-sum window, no iteration.
- ``fn_xml_xpath_roundtrip`` — render order records as XML strings and
  parse them back with Spark's xpath functions (attribute + element +
  numeric extraction); the oracle recomputes the expected fields
  directly, so the parse is verified field-exact. The XML sibling of
  the JSON/CSV/ORC/fixed-width roundtrip family.
- ``fn_semver_order`` — semantic-version parsing and total ordering
  (major.minor.patch with release > prerelease at equal triples) over
  synthesized versions; the package-feed ingest ordering primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.registry import query

BP_MIN_SHARE_PCT = 50  # a line in >= half the source's docs is boilerplate

SEMVER_TOP = 25


# --------------------------------------------------------------------------
# 1. Boilerplate strip
# --------------------------------------------------------------------------


@query(
    "curation_boilerplate_strip",
    oracle=f"""
WITH built AS (
  SELECT doc_id, source,
         'copyright ' || source || ' press' || chr(10)
           || text || chr(10)
           || 'subscribe to the ' || source || ' newsletter' AS raw
  FROM documents
),
lines AS (
  SELECT doc_id, source, unnest(string_split(raw, chr(10))) AS line,
         generate_subscripts(string_split(raw, chr(10)), 1) AS i
  FROM built
),
per_src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM built GROUP BY source),
freq AS (
  SELECT l.source, l.line, CAST(count(DISTINCT l.doc_id) AS BIGINT) AS n_with
  FROM lines l GROUP BY l.source, l.line
),
bp AS (
  SELECT f.source, f.line
  FROM freq f JOIN per_src p ON f.source = p.source
  WHERE f.n_with * 100 >= p.n_docs * {BP_MIN_SHARE_PCT}
),
kept AS (
  SELECT l.doc_id, l.line, l.i
  FROM lines l LEFT JOIN bp b ON l.source = b.source AND l.line = b.line
  WHERE b.line IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS cleaned,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(string_split(b.raw, chr(10))) AS BIGINT) AS n_lines,
       r.n_kept, r.cleaned
FROM built b JOIN rebuilt r ON b.doc_id = r.doc_id
""",
)
def curation_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-frequency boilerplate removal: each document is wrapped with a
    planted per-source header and footer line; any line present in
    ≥ {BP_MIN_SHARE_PCT}% of its source's documents is classified
    boilerplate and stripped, and the cleaned text is rebuilt in original
    line order. The planted lines appear in 100% of their source (must be
    stripped); the body lines are word-soup-unique (must survive) — exact
    ground truth, string-exact output.

    Scale shape: line explode → distinct-doc count per (source, line)
    (one map-side-combined agg — the n-gram mining shape), a broadcast-
    sized boilerplate dictionary joined back on (source, line), and one
    ordered string-agg per doc. Frequency thresholds are per-source
    ratios, so the detector needs no tuning as the corpus grows."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    built = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("copyright "), F.col("source"), F.lit(" press\n"),
            F.col("text"), F.lit("\n"),
            F.lit("subscribe to the "), F.col("source"), F.lit(" newsletter"),
        ).alias("raw"),
    )
    lines = built.select(
        "doc_id",
        "source",
        F.posexplode(F.split("raw", "\n")).alias("i0", "line"),
    ).select("doc_id", "source", (F.col("i0") + 1).alias("i"), "line")
    per_src = built.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    freq = lines.groupBy("source", "line").agg(
        F.countDistinct("doc_id").cast("long").alias("n_with")
    )
    bp = (
        freq.join(per_src, "source")
        .filter(F.col("n_with") * 100 >= F.col("n_docs") * BP_MIN_SHARE_PCT)
        .select("source", F.col("line").alias("bp_line"))
    )
    kept = lines.join(
        F.broadcast(bp),
        (lines["source"] == bp["source"]) & (lines["line"] == bp["bp_line"]),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("cleaned"),
        F.count("*").cast("long").alias("n_kept"),
    )
    return (
        built.select(
            "doc_id", F.size(F.split("raw", "\n")).cast("long").alias("n_lines")
        )
        .join(rebuilt, "doc_id")
        .select("doc_id", "n_lines", "n_kept", "cleaned")
    )


# --------------------------------------------------------------------------
# 2. FIFO waterfall allocation
# --------------------------------------------------------------------------


@query(
    "fn_fifo_allocation",
    oracle="""
WITH inv AS (
  SELECT o.o_orderkey, o.o_custkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS amount_cents,
         o.o_orderdate AS odate
  FROM orders o
),
bud AS (
  SELECT c_custkey, greatest(CAST(round(c_acctbal * 100) AS BIGINT), 0) AS budget
  FROM customer
),
run AS (
  SELECT i.o_orderkey, i.o_custkey, i.amount_cents, b.budget,
         CAST(coalesce(sum(i.amount_cents) OVER (
           PARTITION BY i.o_custkey ORDER BY i.odate, i.o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS prior_cents
  FROM inv i JOIN bud b ON i.o_custkey = b.c_custkey
)
SELECT o_orderkey, o_custkey, amount_cents,
       CAST(greatest(least(budget - prior_cents, amount_cents), 0) AS BIGINT)
         AS alloc_cents,
       CASE WHEN greatest(least(budget - prior_cents, amount_cents), 0)
                 = amount_cents THEN 'paid'
            WHEN greatest(least(budget - prior_cents, amount_cents), 0) > 0
                 THEN 'partial'
            ELSE 'unpaid' END AS status
FROM run
""",
)
def fn_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO waterfall: allocate each customer's (non-negative) account
    balance across their orders oldest-first — alloc = clamp(budget −
    Σ prior amounts, 0, amount), all exact cents, with a paid / partial /
    unpaid status per order. The payments-to-invoices (and tax-lot)
    kernel: an inherently sequential ledger walk expressed as ONE
    running-sum window, no iteration.

    Scale shape: one keyed window per customer ordered by date — a single
    shuffle on the customer key; the budget join is against the customer
    dimension."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    inv = o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amount_cents"),
        F.col("o_orderdate").alias("odate"),
    )
    bud = c.select(
        F.col("c_custkey"),
        F.greatest(
            F.round(F.col("c_acctbal") * 100).cast("long"), F.lit(0)
        ).alias("budget"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("odate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = inv.join(bud, inv["o_custkey"] == bud["c_custkey"]).select(
        "o_orderkey",
        "o_custkey",
        "amount_cents",
        "budget",
        F.coalesce(F.sum("amount_cents").over(w), F.lit(0))
        .cast("long")
        .alias("prior_cents"),
    )
    alloc = F.greatest(
        F.least(F.col("budget") - F.col("prior_cents"), F.col("amount_cents")),
        F.lit(0),
    )
    return run.select(
        "o_orderkey",
        "o_custkey",
        "amount_cents",
        alloc.cast("long").alias("alloc_cents"),
        F.when(alloc == F.col("amount_cents"), "paid")
        .when(alloc > 0, "partial")
        .otherwise("unpaid")
        .alias("status"),
    )


# --------------------------------------------------------------------------
# 3. XML render → xpath parse roundtrip
# --------------------------------------------------------------------------


@query(
    "fn_xml_xpath_roundtrip",
    oracle="""
SELECT o_orderkey, o_orderstatus AS status,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       o_orderpriority AS priority
FROM orders
""",
)
def fn_xml_xpath_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render each order as an XML record and parse every field back with
    the native ``from_xml`` — attribute (``_id``), element string,
    numeric element, nested struct — then emit the PARSED values. The
    oracle recomputes the expected fields straight from the table, so any
    render/parse asymmetry value-hash-fails. The XML leg of the
    interchange-roundtrip family (JSONL, JSON array, CSV, ORC,
    fixed-width, markdown, gzip).

    Scale shape: render and parse are narrow per-row expressions with ONE
    XML parse per record — the Hive ``xpath_*`` UDFs re-parse the DOM per
    CALL (4 parses/row here) and measured 28 s at sf0.1 vs ~1 s for
    from_xml; at 100 TB that per-call re-parse is the difference between
    a scan and a cluster-sized waste."""
    o = load(spark, sf_dir, "orders")
    xml = o.select(
        F.concat(
            F.lit('<order id="'), F.col("o_orderkey"), F.lit('">'),
            F.lit("<status>"), F.col("o_orderstatus"), F.lit("</status>"),
            F.lit("<total>"),
            F.round(F.col("o_totalprice") * 100).cast("long"),
            F.lit("</total>"),
            F.lit("<meta><priority>"), F.col("o_orderpriority"),
            F.lit("</priority></meta>"),
            F.lit("</order>"),
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x",
            "_id BIGINT, status STRING, total BIGINT, meta STRUCT<priority: STRING>",
        ).alias("p")
    )
    return parsed.select(
        F.col("p._id").alias("o_orderkey"),
        F.col("p.status").alias("status"),
        F.col("p.total").alias("total_cents"),
        F.col("p.meta.priority").alias("priority"),
    )


# --------------------------------------------------------------------------
# 4. Semantic-version ordering
# --------------------------------------------------------------------------


@query(
    "fn_semver_order",
    oracle=f"""
WITH v AS (
  SELECT p_partkey,
         CAST(p_partkey % 5 AS VARCHAR) || '.' || CAST(p_partkey % 20 AS VARCHAR)
           || '.' || CAST(p_partkey % 50 AS VARCHAR)
           || CASE WHEN p_partkey % 7 = 0 THEN '-rc.1' ELSE '' END AS ver
  FROM part
),
parsed AS (
  SELECT p_partkey, ver,
         CAST(string_split(string_split(ver, '-')[1], '.')[1] AS BIGINT) AS major,
         CAST(string_split(string_split(ver, '-')[1], '.')[2] AS BIGINT) AS minor,
         CAST(string_split(string_split(ver, '-')[1], '.')[3] AS BIGINT) AS patch,
         CASE WHEN ver LIKE '%-%' THEN 0 ELSE 1 END AS is_release
  FROM v
)
SELECT p_partkey, ver, major, minor, patch, CAST(is_release AS INT) AS is_release, rk
FROM (
  SELECT *, CAST(row_number() OVER (
    ORDER BY major DESC, minor DESC, patch DESC, is_release DESC, p_partkey
  ) AS INT) AS rk
  FROM parsed
) WHERE rk <= {SEMVER_TOP}
""",
)
def fn_semver_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-version parse + total order: versions synthesized from part
    keys (every 7th carries an ``-rc.1`` prerelease tag), parsed into
    (major, minor, patch, is_release) and ranked newest-first with the
    semver rule that a release outranks its own prerelease. Top-
    {SEMVER_TOP} with a deterministic key tie-break — the package-feed
    "latest version" primitive.

    Scale shape: narrow split/cast projections + one TakeOrdered."""
    p = load(spark, sf_dir, "part")
    v = p.select(
        "p_partkey",
        F.concat(
            (F.col("p_partkey") % 5).cast("string"), F.lit("."),
            (F.col("p_partkey") % 20).cast("string"), F.lit("."),
            (F.col("p_partkey") % 50).cast("string"),
            F.when(F.col("p_partkey") % 7 == 0, "-rc.1").otherwise(""),
        ).alias("ver"),
    )
    core = F.split(F.split("ver", "-").getItem(0), "\\.")
    parsed = v.select(
        "p_partkey",
        "ver",
        core.getItem(0).cast("long").alias("major"),
        core.getItem(1).cast("long").alias("minor"),
        core.getItem(2).cast("long").alias("patch"),
        F.when(F.col("ver").contains("-"), 0).otherwise(1).alias("is_release"),
    )
    w = Window.orderBy(
        F.desc("major"), F.desc("minor"), F.desc("patch"), F.desc("is_release"),
        F.asc("p_partkey"),
    )
    return (
        parsed.select(
            "p_partkey",
            "ver",
            "major",
            "minor",
            "patch",
            F.col("is_release").cast("int").alias("is_release"),
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= SEMVER_TOP)
    )
