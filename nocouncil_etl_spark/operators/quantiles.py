"""Exact quantile-normalization kernels, shared by the oracle-checked plans
(normalization_plans.curation_quantile_normalize, stats6 grid twin) and the
Engine facade verb — one implementation of the index arithmetic (the
shared-operator contract from the gapfill advice item).

Two normalization forms plus the round-7 scan toolbox:

- ``quantile_normalize_frame`` — per-row pooled order statistics; since
  r7 the pooled rank rides the range-partitioned two-phase scan (no
  single-partition window anywhere).
- ``quantile_normalize_grid`` — rows map to a FIXED G-point quantile
  grid; the grid's pooled order statistics come from the Fenwick prefix
  decomposition ("count of rows ≤ v" = an equi-join of O(log D) aligned
  blocks per distinct value).
- the scan toolbox every rank/cumsum/lag query in the catalog stands on:
  ``prefix_sums``/``cumulate`` (Fenwick cumulative sums, domain-sized
  levels), ``with_below``/``midrank2``/``with_global_rank``/
  ``ntile_from_rank`` (rank statistics), ``cummax_exclusive`` (Fenwick
  running max), ``dense_cumsum`` (two-phase scan for contiguous
  generated ranges), and ``ranged_rank_cumsum`` (range-partitioned
  two-phase scan: rank/sums/max/lag for near-unique domains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize_frame(
    df: DataFrame, id_col: str, value_col: str, group_col: str
) -> DataFrame:
    """Map each row's within-group rank onto the pooled order statistic:
    target index = ((rn−1)·(N−1)) div (n_g−1) + 1 (1 when the group is a
    singleton) — pure integer arithmetic over (value, id) total orders.
    Returns (id_col, group_col, orig, normalized), both BIGINT.

    Scale (r7): one window sort per group; the pooled order statistics
    come from the range-partitioned two-phase scan (ranged_rank_cumsum —
    no global sort, no single-partition stage) + an equi-join on the
    index."""
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("long").alias("_v"),
    )
    ranked = src.select(
        "_id",
        "_g",
        "_v",
        F.row_number()
        .over(Window.partitionBy("_g").orderBy("_v", "_id"))
        .cast("long")
        .alias("_rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("_g"))
        .cast("long")
        .alias("_ns"),
    )
    pooled = ranged_rank_cumsum(
        src.select(F.col("_v").alias("_pv"), F.col("_id").alias("_poolid")),
        "_pv",
        "_poolid",
        rank_col="_prow",
    ).select("_pv", "_prow")
    n = src.count()  # one scalar — the table size, not data
    idx = ranked.select(
        "_id",
        "_g",
        "_v",
        F.when(F.col("_ns") == 1, F.lit(1).cast("long"))
        .otherwise(F.expr(f"((_rn - 1) * ({n} - 1)) div (_ns - 1) + 1"))
        .alias("_target"),
    )
    return idx.join(pooled, F.col("_target") == F.col("_prow")).select(
        F.col("_id").alias(id_col),
        F.col("_g").alias(group_col),
        F.col("_v").alias("orig"),
        F.col("_pv").alias("normalized"),
    )


GRID_LEVELS = 31  # binary prefix levels — covers any non-negative v < 2^31


def prefix_counts(hist: DataFrame, value_col: str = "_v", cnt_col: str = "_c",
                  levels: int = GRID_LEVELS) -> DataFrame:
    """cle(v) = #rows with value ≤ v, for every distinct value, WITHOUT a
    cumulative window: per-level aligned block counts (block of size 2^L
    containing w is floor(w / 2^L)) are one explode(levels)+groupBy over the
    DISTINCT-VALUE histogram; each value's prefix [0, v] then decomposes
    into its ≤``levels`` Fenwick blocks — for u = v+1, level L contributes
    iff bit L of u is set, with block index 2·(u >> (L+1)) — and one
    equi-join + sum reassembles the exact cumulative count. Everything is
    hash-partitioned aggregate + equi-join; nothing is sorted globally.

    Requires 0 ≤ value < 2^levels (filter/shift negatives upstream)."""
    blocks = (
        hist.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(L).alias("lv"),
                            F.shiftright(F.col(value_col), L).alias("blk"),
                        )
                        for L in range(levels)
                    ]
                )
            ).alias("k"),
            F.col(cnt_col),
        )
        .groupBy("k.lv", "k.blk")
        .agg(F.sum(cnt_col).alias("_bc"))
    )
    u = F.col(value_col) + F.lit(1)
    dec_terms = [
        F.when(
            F.shiftright(u, L).bitwiseAND(F.lit(1)) == 1,
            F.struct(
                F.lit(L).alias("lv"),
                (F.shiftright(u, L + 1) * 2).alias("blk"),
            ),
        )
        for L in range(levels)
    ]
    dec = hist.select(
        value_col,
        F.explode(F.array_compact(F.array(*dec_terms))).alias("k"),
    ).select(value_col, "k.lv", "k.blk")
    return (
        dec.join(blocks, ["lv", "blk"])
        .groupBy(value_col)
        .agg(F.sum("_bc").cast("long").alias("cle"))
    )


def quantile_normalize_grid(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str,
    n_grid: int = 64,
) -> DataFrame:
    """Grid quantile normalization: each row's within-group rank maps to a
    grid cell g = ((rn−1)·G) div (n_g−1) ∈ [0, G] (singletons → 0), and the
    pooled value at grid rank pr_g = 1 + ((N−1)·g) div G replaces the raw
    score. Returns (id_col, group_col, orig, grid_q, normalized), BIGINTs.

    Exactly the quantile_normalize_frame recipe with the pooled side
    REPLACED by G+1 exact order statistics computed shuffle-only:
    per-group windows stay hash-partitioned; the pooled side is
    histogram → prefix_counts (equi-joins, no global sort) → a broadcast
    non-equi join against the G+1-row grid (cle ≥ pr → min value), i.e.
    the only "sort-free inverse CDF" the plan needs. At 100 TB nothing
    single-partition touches row-scale data: the histogram is
    value-domain-sized, the grid is 65 rows."""
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("long").alias("_v"),
    )
    ranked = src.select(
        "_id",
        "_g",
        "_v",
        F.row_number()
        .over(Window.partitionBy("_g").orderBy("_v", "_id"))
        .cast("long")
        .alias("_rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("_g"))
        .cast("long")
        .alias("_ns"),
    )
    gq = ranked.select(
        "_id",
        "_g",
        "_v",
        F.when(F.col("_ns") == 1, F.lit(0).cast("long"))
        .otherwise(F.expr(f"((_rn - 1) * {n_grid}) div (_ns - 1)"))
        .alias("_gq"),
    )
    n = src.count()  # one scalar — the table size, not data
    hist = src.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    cum = prefix_counts(hist)
    spark = df.sparkSession
    grid = spark.range(0, n_grid + 1).select(
        F.col("id").cast("long").alias("_grid"),
        (F.lit(1) + F.expr(f"(({n} - 1) * id) div {n_grid}")).cast("long").alias("_pr"),
    )
    gridvals = (
        cum.join(F.broadcast(grid), F.col("cle") >= F.col("_pr"))
        .groupBy("_grid")
        .agg(F.min("_v").alias("_gval"))
    )
    return gq.join(
        F.broadcast(gridvals), F.col("_gq") == F.col("_grid")
    ).select(
        F.col("_id").alias(id_col),
        F.col("_g").alias(group_col),
        F.col("_v").alias("orig"),
        F.col("_gq").alias("grid_q"),
        F.col("_gval").alias("normalized"),
    )


def prefix_sums(
    hist: DataFrame,
    value_col: str = "_v",
    measure_cols: tuple[str, ...] = ("_c",),
    levels: int = GRID_LEVELS,
) -> DataFrame:
    """Cumulative sums in value order WITHOUT a global window: for every
    distinct value v and every measure m, cum_m(v) = Σ_{w ≤ v} m(w) —
    the multi-measure generalization of prefix_counts (same Fenwick block
    decomposition: per-level aligned block sums via one explode+groupBy
    over the distinct-value histogram, then ≤``levels`` equi-joined block
    lookups per value). Returns (value_col, cum_<m> for each measure),
    all hash-partitioned aggregates + keyed joins; nothing sorted
    globally, nothing single-partition.

    This is the at-scale replacement for
    ``sum(m) OVER (ORDER BY v)`` — the ECDF / rank-statistic /
    Lorenz-curve shape. Requires 0 ≤ value < 2^levels (shift upstream);
    measures must be integral (exactness contract: BIGINT sums).
    """
    blocks = (
        hist.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(L).alias("lv"),
                            F.shiftright(F.col(value_col), L).alias("blk"),
                        )
                        for L in range(levels)
                    ]
                )
            ).alias("k"),
            *measure_cols,
        )
        .groupBy("k.lv", "k.blk")
        .agg(*[F.sum(m).alias(f"_b_{m}") for m in measure_cols])
    )
    u = F.col(value_col) + F.lit(1)
    dec_terms = [
        F.when(
            F.shiftright(u, L).bitwiseAND(F.lit(1)) == 1,
            F.struct(
                F.lit(L).alias("lv"),
                (F.shiftright(u, L + 1) * 2).alias("blk"),
            ),
        )
        for L in range(levels)
    ]
    dec = hist.select(
        value_col,
        F.explode(F.array_compact(F.array(*dec_terms))).alias("k"),
    ).select(value_col, "k.lv", "k.blk")
    return (
        dec.join(blocks, ["lv", "blk"])
        .groupBy(value_col)
        .agg(
            *[
                F.sum(f"_b_{m}").cast("long").alias(f"cum_{m}")
                for m in measure_cols
            ]
        )
    )


def _domain_shift(byv: DataFrame, value_col: str) -> tuple[int, int]:
    """(min, levels) for a Fenwick pass over ``value_col``: one 2-scalar
    aggregate crosses the driver (the engine's documented single-scalar-
    normalizer contract), sizing the block decomposition to the ACTUAL
    domain span instead of the worst-case 63 levels — on a cents-grid
    histogram that is ~15 levels instead of 63, a 4× cut in the explode
    volume that dominates the pass."""
    row = byv.agg(
        F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
    ).first()
    if row.mn is None:
        return 0, 1
    return int(row.mn), max(1, int(int(row.mx) - int(row.mn) + 1).bit_length())


def cumulate(
    byv: DataFrame,
    value_col: str,
    measure_cols: tuple[str, ...],
    levels: int | None = None,
) -> DataFrame:
    """Attach inclusive cumulative sums (in ``value_col`` order) of each
    measure to a distinct-value frame — ``sum(m) OVER (ORDER BY v)``
    with NO window at all: the domain is min-shifted to non-negative,
    then prefix_sums (Fenwick equi-joins) reassembles each cumulative
    total. Returns the input columns + ``cum_<m>`` BIGINTs. Exact at any
    scale; every distributed node is a hash aggregate or keyed join.
    levels=None (default) sizes the decomposition to the actual domain
    span via one 2-scalar driver aggregate (_domain_shift); pass an
    explicit level count to avoid that extra tiny job when the domain is
    known."""
    if levels is None:
        mn_v, levels = _domain_shift(byv, value_col)
        sh = byv.withColumn(
            "_sv", (F.col(value_col) - F.lit(mn_v)).cast("long")
        )
    else:
        mn = byv.agg(F.min(value_col).alias("_mn"))
        sh = byv.crossJoin(F.broadcast(mn)).withColumn(
            "_sv", (F.col(value_col) - F.col("_mn")).cast("long")
        ).drop("_mn")
    cums = prefix_sums(
        sh.select(F.col("_sv").alias("_v"), *measure_cols),
        "_v",
        tuple(measure_cols),
        levels=levels,
    )
    return sh.join(cums, sh["_sv"] == cums["_v"]).drop("_v", "_sv")


def midrank2(
    byv: DataFrame, value_col: str = "val", cnt_col: str = "c"
) -> DataFrame:
    """Doubled midranks per distinct value — the exact rank-statistic
    primitive: r2(v) = 2·(#below v) + c(v) + 1 = 2·cum_c(v) − c(v) + 1,
    an exact BIGINT (the ×2 absorbs the .5-granular tie midrank).
    Computed via cumulate/prefix_sums — no global window, no sort.
    Returns (value_col, cnt_col, r2)."""
    cum = cumulate(byv, value_col, (cnt_col,))
    return cum.select(
        value_col,
        cnt_col,
        (2 * F.col(f"cum_{cnt_col}") - F.col(cnt_col) + 1)
        .cast("long")
        .alias("r2"),
    )


def with_below(
    byv: DataFrame, value_col: str = "v", cnt_col: str = "c"
) -> DataFrame:
    """Attach ``below`` (= #rows with value strictly less) to a
    distinct-value histogram — the `sum(c) OVER (ORDER BY v ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING)` shape, computed windowless via
    Fenwick prefix sums. Returns the input columns + below (BIGINT)."""
    cum = cumulate(byv, value_col, (cnt_col,))
    return cum.select(
        *byv.columns,
        (F.col(f"cum_{cnt_col}") - F.col(cnt_col)).cast("long").alias("below"),
    )


def with_global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    rank_col: str = "rk",
) -> DataFrame:
    """row_number() over the (value, id) total order WITHOUT a global
    sort: rank = (#rows with smaller value) + (position by id within the
    value's tie block). The first term is Fenwick prefix counts over the
    distinct-value histogram (with_below); the second is a PARTITIONED
    window (hash by value) — every stage is hash-partitioned, so the
    plan survives any row count (per-partition work is one tie block;
    heavy ties distribute across values). Identical output to
    ``row_number().over(Window.orderBy(value_col, id_col))`` for
    NON-NULL value_col; NULL values are a contract violation (the Fenwick
    arithmetic has no NULL slot) and raise at execution time instead of
    silently vanishing through the inner equi-join.
    Returns the input columns + rank_col (BIGINT)."""
    df = df.withColumn(
        value_col,
        F.when(
            F.col(value_col).isNull(),
            F.raise_error(
                F.lit(
                    f"with_global_rank: NULL {value_col} unsupported — "
                    "filter or coalesce NULLs first"
                )
            ).cast(df.schema[value_col].dataType),
        ).otherwise(F.col(value_col)),
    )
    byv = df.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("long").alias("_grc")
    )
    bel = with_below(byv, value_col, "_grc").select(value_col, "below")
    j = F.row_number().over(
        Window.partitionBy(value_col).orderBy(id_col)
    )
    return (
        df.join(bel, value_col)
        .withColumn(rank_col, (F.col("below") + j).cast("long"))
        .drop("below")
    )


def ntile_from_rank(rank_col: str, n_col: str, k: int):
    """Spark ntile(k) as arithmetic on a precomputed global rank: with n
    rows, the first n % k buckets hold ⌈n/k⌉ rows and the rest ⌊n/k⌋ —
    so the bucket is a closed form of (rank, n) and needs NO window once
    the rank exists (with_global_rank). Returns a BIGINT Column."""
    r, n = F.col(rank_col), F.col(n_col)
    big = F.expr(f"{n_col} div {k} + 1")
    small = F.expr(f"{n_col} div {k}")
    cut = (n % k) * big
    return (
        F.when(r <= cut, F.ceil(r / big))
        .otherwise((n % k) + F.ceil((r - cut) / small))
        .cast("long")
    )


def cummax_exclusive(
    byv: DataFrame,
    value_col: str,
    measure_col: str,
    levels: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running max in value order — max(m) over all rows with
    strictly smaller value — via the same Fenwick block decomposition as
    prefix_sums (max is associative; the exclusive prefix [0, v)
    decomposes on u = v instead of v+1). Rows with no smaller value get
    NULL (matching a window max over an empty preceding frame). Returns
    (value_col, below_max). No global sort anywhere. levels=None sizes
    the decomposition to the actual domain span (_domain_shift)."""
    if levels is None:
        mn_v, levels = _domain_shift(byv, value_col)
        sh = byv.withColumn(
            "_sv", (F.col(value_col) - F.lit(mn_v)).cast("long")
        )
    else:
        mn = byv.agg(F.min(value_col).alias("_mn"))
        sh = byv.crossJoin(F.broadcast(mn)).withColumn(
            "_sv", (F.col(value_col) - F.col("_mn")).cast("long")
        )
    blocks = (
        sh.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(L).alias("lv"),
                            F.shiftright(F.col("_sv"), L).alias("blk"),
                        )
                        for L in range(levels)
                    ]
                )
            ).alias("k"),
            F.col(measure_col),
        )
        .groupBy("k.lv", "k.blk")
        .agg(F.max(measure_col).alias("_bm"))
    )
    u = F.col("_sv")  # exclusive prefix [0, v)
    dec_terms = [
        F.when(
            F.shiftright(u, L).bitwiseAND(F.lit(1)) == 1,
            F.struct(
                F.lit(L).alias("lv"),
                (F.shiftright(u, L + 1) * 2).alias("blk"),
            ),
        )
        for L in range(levels)
    ]
    dec = sh.select(
        value_col,
        "_sv",
        F.explode(F.array_compact(F.array(*dec_terms))).alias("k"),
    ).select(value_col, "k.lv", "k.blk")
    maxes = (
        dec.join(blocks, ["lv", "blk"])
        .groupBy(value_col)
        .agg(F.max("_bm").alias("below_max"))
    )
    return sh.select(value_col).join(maxes, value_col, "left").select(
        value_col, "below_max"
    )


def dense_cumsum(
    df: DataFrame, value_col: str, measure_col: str, cum_col: str = "cum"
) -> DataFrame:
    """Inclusive running sum over a DENSELY, MONOTONICALLY partitioned
    frame (spark.range output: each partition holds one contiguous value
    interval): the classic two-phase distributed scan — per-partition
    local running sums via a PARTITION-ID-keyed window (never a global
    sort), per-partition totals collected as a #partitions-sized offset
    table (bounded driver state, the single-scalar-normalizer contract)
    and broadcast back. O(n) with no Fenwick explode — the right shape
    for generated sequences like log-factorial tables; use cumulate for
    arbitrary (shuffled) value domains. The _pid tag is evaluated by TWO
    actions (the offset collect and the final join), so the input plan is
    pinned with localCheckpoint — without it, only deterministic narrow
    plans would assign the same partition ids twice."""
    d = df.withColumn("_pid", F.spark_partition_id())
    d = d.localCheckpoint(eager=False)  # pin partition ids across actions
    offs_rows = (
        d.groupBy("_pid")
        .agg(F.sum(measure_col).alias("_ps"), F.min(value_col).alias("_mn"))
        .collect()
    )
    offs_rows.sort(key=lambda r: r["_mn"])
    run = 0
    table = []
    for r in offs_rows:
        table.append((int(r["_pid"]), run))
        run += int(r["_ps"])
    spark = df.sparkSession
    offs = spark.createDataFrame(table, "_pid int, _off long")
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offs), "_pid")
        .withColumn(
            cum_col,
            (F.col("_off") + F.sum(measure_col).over(wloc)).cast("long"),
        )
        .drop("_pid", "_off")
    )


def ranged_rank_cumsum(
    df: DataFrame,
    value_col: str,
    id_col: str,
    measure_cols: tuple[str, ...] = (),
    rank_col: str = "rk",
    n_partitions: int | None = None,
    max_cols: tuple[str, ...] = (),
    lag_col: str | None = None,
    max_cols_exclusive: tuple[str, ...] = (),
) -> DataFrame:
    """Global rank (row_number over the (value, id) total order) and
    inclusive running sums via the canonical RANGE-PARTITIONED two-phase
    scan: repartitionByRange + sortWithinPartitions (a distributed sort —
    every partition holds one contiguous key interval, no single task
    ever sees more than its slice), partition-LOCAL windows for the local
    rank/cumsums, then a #partitions-sized offset table (collected —
    bounded driver state under the single-scalar-normalizer contract)
    broadcast back. Output is identical to
    ``row_number()/sum() OVER (ORDER BY value, id)``.

    This is the cheap-constant sibling of with_global_rank/cumulate for
    NEAR-UNIQUE domains (microsecond timestamps, near-distinct prices),
    where a Fenwick pass pays an O(levels) explode per distinct value;
    on histogram-shaped domains prefer the Fenwick form (no range
    shuffle, no second action). Partition boundaries come from range
    sampling and affect only placement, never the ranks/sums; empty
    partitions are skipped in the offset walk. String keys are supported
    (range partitioning is type-generic) with one caveat: the driver-side
    offset ordering uses Python comparison, which matches Spark's binary
    UTF-8 string order for ASCII keys — map non-ASCII keys to an integer
    surrogate first. NULL keys (range-partitioned first by Spark) and
    float NaN keys (ordered last, above +inf, by Spark) are normalized to
    matching driver-side sort tiers, so both are safe.

    Optional extras ride the same two phases: ``max_cols`` adds
    inclusive running maxima (``cummax_<m>``: partition-local window max
    ⊔ the exclusive prefix max of per-partition maxima); ``lag_col``
    adds ``prev_<col>`` (partition-local lag, with each partition's
    first row taking the previous partition's LAST value via max_by in
    the offset table — NULL on the global first row);
    ``max_cols_exclusive`` adds ``cummax_excl_<m>`` (running max over
    STRICTLY preceding rows, NULL on the global first row — the skyline
    shape)."""
    spark = df.sparkSession
    nparts = n_partitions or max(
        2, int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    d = (
        df.repartitionByRange(nparts, F.col(value_col), F.col(id_col))
        .sortWithinPartitions(value_col, id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    d = d.localCheckpoint(eager=False)  # pin the partitioning for both phases
    aggs = [
        F.count(F.lit(1)).cast("long").alias("_pc"),
        # the TRUE min composite key per partition — min(struct) compares
        # lexicographically exactly like the range partitioner, so sorting
        # the offset table by it reconstructs partition order even when a
        # value tie block spans a boundary and the later partition also
        # holds a larger value with a smaller id (min(value), min(id)
        # computed separately got that case wrong — r7 advice, high)
        F.min(
            F.struct(
                F.col(value_col).alias("v"), F.col(id_col).alias("i")
            )
        ).alias("_pmin"),
    ] + [F.sum(m).cast("long").alias(f"_ps_{m}") for m in measure_cols]
    aggs += [
        F.max(m).alias(f"_pm_{m}")
        for m in dict.fromkeys(max_cols + max_cols_exclusive)
    ]
    if lag_col is not None:
        aggs.append(
            F.max_by(
                lag_col, F.struct(F.col(value_col), F.col(id_col))
            ).alias("_plast")
        )
    offs_rows = d.groupBy("_pid").agg(*aggs).collect()

    # Driver-side ordering wrapper matching Spark's total order exactly:
    # NULL keys range-partition FIRST (Python cannot compare None with
    # int/str), and float NaN orders LAST (greater than +inf in Spark;
    # unordered under Python comparison, so raw list.sort would silently
    # mis-order — r8 advice, low).
    def nf(x):
        if x is None:
            return (0,)
        if isinstance(x, float) and x != x:  # NaN
            return (2,)
        return (1, x)

    offs_rows.sort(key=lambda r: (nf(r["_pmin"]["v"]), nf(r["_pmin"]["i"])))
    allmax = tuple(dict.fromkeys(max_cols + max_cols_exclusive))
    run_c = 0
    runs_m = {m: 0 for m in measure_cols}
    runmax = {m: None for m in allmax}
    prev_last = None
    table = []
    for r in offs_rows:
        table.append(
            (int(r["_pid"]), run_c)
            + tuple(runs_m[m] for m in measure_cols)
            + tuple(runmax[m] for m in allmax)
            + ((prev_last,) if lag_col is not None else ())
        )
        run_c += int(r["_pc"])
        for m in measure_cols:
            runs_m[m] += int(r[f"_ps_{m}"])
        for m in allmax:
            v = r[f"_pm_{m}"]
            if v is not None:
                runmax[m] = v if runmax[m] is None else max(runmax[m], v)
        if lag_col is not None:
            prev_last = r["_plast"]
    schema = (
        "_pid int, _off_c long"
        + "".join(f", _off_{m} long" for m in measure_cols)
        + "".join(f", _mx_{m} long" for m in allmax)
        + (", _prevlast long" if lag_col is not None else "")
    )
    offs = spark.createDataFrame(table, schema)
    wloc = Window.partitionBy("_pid").orderBy(value_col, id_col)
    wrun = wloc.rowsBetween(Window.unboundedPreceding, 0)
    out = d.join(F.broadcast(offs), "_pid").withColumn(
        rank_col,
        (F.col("_off_c") + F.row_number().over(wloc)).cast("long"),
    )
    for m in measure_cols:
        out = out.withColumn(
            f"cum_{m}",
            (F.col(f"_off_{m}") + F.sum(m).over(wrun)).cast("long"),
        )
    for m in max_cols:
        out = out.withColumn(
            f"cummax_{m}",
            F.greatest(
                F.coalesce(F.col(f"_mx_{m}"), F.max(m).over(wrun)),
                F.max(m).over(wrun),
            ).cast("long"),
        )
    for m in max_cols_exclusive:
        loc_excl = F.max(m).over(
            wloc.rowsBetween(Window.unboundedPreceding, -1)
        )
        out = out.withColumn(
            f"cummax_excl_{m}",
            F.greatest(F.col(f"_mx_{m}"), loc_excl).cast("long"),
        )
    if lag_col is not None:
        out = out.withColumn(
            f"prev_{lag_col}",
            F.coalesce(
                F.lag(lag_col).over(wloc), F.col("_prevlast")
            ).cast("long"),
        )
    return out.drop(
        "_pid",
        "_off_c",
        *[f"_off_{m}" for m in measure_cols],
        *[f"_mx_{m}" for m in allmax],
        *((["_prevlast"]) if lag_col is not None else []),
    )


def ranged_group_rank_cumsum(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    measure_cols: tuple[str, ...] = (),
    rank_col: str = "rk",
    n_partitions: int | None = None,
) -> DataFrame:
    """PER-GROUP rank (row_number over (value, id) within each group) and
    inclusive running sums, with NO per-group single-task sort: the
    grouped sibling of ``ranged_rank_cumsum``. A plain
    ``Window.partitionBy(group).orderBy(value)`` puts each group's WHOLE
    frame in one task — fine for high-cardinality keys, fatal when a
    handful of groups carry the corpus (3 return flags over 100 TB).

    Range-partition on (group, value, id) — every partition holds one
    contiguous slice of the composite order, so a group larger than a
    partition spans SEVERAL partitions and no task ever sees more than
    its slice. Per-(partition, group) counts/sums collect to a driver
    offset table bounded by #partitions + #groups rows (contiguity: a
    partition can only start/continue one group mid-slice per neighbor),
    walked independently per group in (min(value), min(id)) order with
    the same composite-min + None-first/NaN-last machinery as the
    ungrouped scan. Output identical to
    ``row_number()/sum() OVER (PARTITION BY group ORDER BY value, id)``.
    """
    spark = df.sparkSession
    nparts = n_partitions or max(
        2, int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    d = (
        df.repartitionByRange(
            nparts, F.col(group_col), F.col(value_col), F.col(id_col)
        )
        .sortWithinPartitions(group_col, value_col, id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    d = d.localCheckpoint(eager=False)  # pin partitioning for both phases
    aggs = [
        F.count(F.lit(1)).cast("long").alias("_pc"),
        F.min(
            F.struct(F.col(value_col).alias("v"), F.col(id_col).alias("i"))
        ).alias("_pmin"),
    ] + [F.sum(m).cast("long").alias(f"_ps_{m}") for m in measure_cols]
    offs_rows = d.groupBy("_pid", group_col).agg(*aggs).collect()

    def nf(x):
        if x is None:
            return (0,)
        if isinstance(x, float) and x != x:  # NaN orders last in Spark
            return (2,)
        return (1, x)

    by_group: dict = {}
    for r in offs_rows:
        by_group.setdefault(r[group_col], []).append(r)
    table = []
    for g, rows in by_group.items():
        rows.sort(key=lambda r: (nf(r["_pmin"]["v"]), nf(r["_pmin"]["i"])))
        run_c = 0
        runs_m = {m: 0 for m in measure_cols}
        for r in rows:
            table.append(
                (int(r["_pid"]), g, run_c)
                + tuple(runs_m[m] for m in measure_cols)
            )
            run_c += int(r["_pc"])
            for m in measure_cols:
                runs_m[m] += int(r[f"_ps_{m}"])
    gtype = df.schema[group_col].dataType.simpleString()
    schema = f"_pid int, {group_col} {gtype}, _off_c long" + "".join(
        f", _off_{m} long" for m in measure_cols
    )
    offs = spark.createDataFrame(table, schema)
    wloc = Window.partitionBy("_pid", group_col).orderBy(value_col, id_col)
    wrun = wloc.rowsBetween(Window.unboundedPreceding, 0)
    out = d.join(F.broadcast(offs), ["_pid", group_col]).withColumn(
        rank_col,
        (F.col("_off_c") + F.row_number().over(wloc)).cast("long"),
    )
    for m in measure_cols:
        out = out.withColumn(
            f"cum_{m}",
            (F.col(f"_off_{m}") + F.sum(m).over(wrun)).cast("long"),
        )
    return out.drop(
        "_pid", "_off_c", *[f"_off_{m}" for m in measure_cols]
    )
