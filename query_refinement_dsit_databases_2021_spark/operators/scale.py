"""Scale-out join/aggregation patterns: salting and bucketing.

The reference is single-process (SURVEY §3.1: everything after
``getData`` is one Python thread), so none of this exists there —
these are the patterns a 1000-executor deployment of this engine needs
when AQE's runtime skew handling isn't enough or when a join key's
layout can be fixed at write time:

- **Salted join**: a heavy-hitter key on the probe side hashes every
  matching row to ONE reducer; salting re-keys the shuffle on
  ``(key, salt)`` so a hot key spreads over ``n_salts`` reducers, at
  the price of replicating the (small) build side ``n_salts``×.
- **Salted exact count-distinct**: two-phase distinct where phase 1
  partitions the VALUE space by hash — partial distinct-counts are
  disjoint, so their sum is exact, and no single reducer ever sees a
  hot group's full value set.
- **Bucketed tables**: co-partitioned + co-sorted layouts written once
  (``bucketBy``/``sortBy``), letting every later equi-join on the
  bucket key run shuffle-free (SortMergeJoin with no Exchange).

All salts are deterministic (xxhash64 of row content, no rand()) so
results are replay-stable and oracle-checkable.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_SALTS = 16
_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Equi-join where ``skewed`` (the large, hot-keyed side) is salted
    and ``other`` (the small side) is replicated across all salt values.

    The physical shuffle keys become ``on + [salt]``: rows of one hot
    key land on up to ``n_salts`` reducers instead of one. Semantics
    are exactly ``skewed.join(other, on, how)`` for how in
    {inner, left}; the replicated side must be the build side, so
    right/full joins are rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    overlap = set(skewed.columns) & set(other.columns) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns: {sorted(overlap)}")
    # deterministic per-row salt from the probe side's full row content
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("int")
    probe = skewed.withColumn(_SALT, salt)
    build = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return probe.join(build, [*on, _SALT], how).drop(_SALT)


def salted_count_distinct(
    df: DataFrame,
    group_key: str,
    value: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Exact ``count(DISTINCT value) GROUP BY group_key`` that never
    funnels one group's whole value set through a single reducer.

    Phase 1 groups by ``(group_key, hash(value) % n_salts)`` — the
    value space is partitioned by the salt, so the per-salt distinct
    counts are disjoint and their sum (phase 2) is exact. Returns
    ``(group_key, n_distinct)``.
    """
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).cast("int")
    partial = (
        df.select(group_key, value)
        .withColumn(_SALT, salt)
        .groupBy(group_key, _SALT)
        .agg(F.count_distinct(F.col(value)).alias("pc"))
    )
    return partial.groupBy(group_key).agg(F.sum("pc").alias("n_distinct"))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table — the write-time layout that makes every later equi-join on
    ``key`` shuffle-free. One shuffle now, zero per query after."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written by :func:`write_bucketed`
    with the same key and bucket count. Catalyst sees the matching
    ``HashPartitioning(bucket key)`` output partitionings and elides
    both Exchanges; with sorted buckets the SortMergeJoin needs no
    sort either."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


# ---------------------------------------------------------------------------
# driver workloads: salted formulations must be row-identical to the
# plain SQL the oracle runs (event_type is the skewed key: few distinct
# values over the whole events table)
ZORDER_BITS = 16


def zorder_key(x, y, bits: int = ZORDER_BITS):
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    integer columns — the multi-dimensional clustering key. Sorting or
    range-partitioning a table by this key keeps rows that are close in
    BOTH dimensions in the same files, so min/max file statistics prune
    range predicates on either column (a lexicographic sort only prunes
    the leading one).

    Unrolled shift/mask arithmetic — pure whole-stage-codegen integer
    ops, no UDF, and the identical expression is evaluated by the
    DuckDB oracle (same shifts, same masks, bit-exact).
    """
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return acc


def zorder_sql(x_expr: str, y_expr: str, bits: int = ZORDER_BITS) -> str:
    """The oracle-side transliteration of :func:`zorder_key` — the same
    unrolled interleave as portable SQL bit arithmetic."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) & {mask}) >> {i} & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) & {mask}) >> {i} & 1) << {2 * i + 1})")
    return "CAST(" + " | ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame, x: str, y: str, n_files: int, bits: int = ZORDER_BITS
) -> DataFrame:
    """Range-partition ``df`` by its Z-order key into ``n_files``
    write tasks — the standard OPTIMIZE-ZORDER layout step before a
    parquet write. Each output file covers one contiguous Z-curve
    segment, i.e. a compact rectangle-ish region of (x, y) space, so
    min/max stats prune on both columns. One range shuffle (sampled
    boundaries), no global sort."""
    keyed = df.withColumn("__z", zorder_key(F.col(x), F.col(y), bits))
    return keyed.repartitionByRange(n_files, "__z").drop("__z")


# ---------------------------------------------------------------------------

HILBERT_BITS = 8


def hilbert_key_df(
    df: DataFrame, x: str, y: str, bits: int = HILBERT_BITS, out: str = "hkey"
) -> DataFrame:
    """Hilbert-curve distance of ``(x, y)`` (low ``bits`` bits each) —
    the space-filling clustering key with strictly better range
    locality than the Morton key (:func:`zorder_key`): consecutive
    Hilbert addresses are ALWAYS grid neighbors, so a file covering a
    contiguous key range covers one connected region with no Z-shape
    diagonal jumps, tightening min/max pruning on both dimensions.

    The classic per-level transform (quadrant digit + conditional
    reflect/swap) is unrolled into ``bits`` chained projections — each
    level is constant-size integer CASE arithmetic referencing the
    previous level's columns, so whole-stage codegen evaluates the
    whole thing in one pass and the DuckDB oracle mirrors it as
    chained CTEs. Pure integer ops, bit-exact on both engines.
    """
    mask = (1 << bits) - 1
    cur = df.withColumn("_hx", F.col(x).cast("long").bitwiseAND(F.lit(mask)))
    cur = cur.withColumn("_hy", F.col(y).cast("long").bitwiseAND(F.lit(mask)))
    cur = cur.withColumn("_hd", F.lit(0).cast("long"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(F.col("_hx").bitwiseAND(s) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(s) > 0, 1).otherwise(0)
        cur = (
            cur.withColumn("_rx", rx)
            .withColumn("_ry", ry)
            .withColumn(
                "_hd",
                F.col("_hd")
                + F.lit(s) * F.lit(s)
                * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
            )
        )
        # rotate/reflect the quadrant so the next level sees canonical
        # orientation: when ry == 0 -> (maybe reflect) then swap x/y
        nx = F.when(
            F.col("_ry") == 0,
            F.when(
                F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")
            ).otherwise(F.col("_hy")),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            F.col("_ry") == 0,
            F.when(
                F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")
            ).otherwise(F.col("_hx")),
        ).otherwise(F.col("_hy"))
        cur = (
            cur.withColumn("_nx", nx)
            .withColumn("_ny", ny)
            .withColumn("_hx", F.col("_nx"))
            .withColumn("_hy", F.col("_ny"))
        )
    return cur.withColumn(out, F.col("_hd")).drop(
        "_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny"
    )


def hilbert_oracle_sql(
    source: str, keys: str, x: str, y: str, bits: int = HILBERT_BITS
) -> str:
    """Chained-CTE transliteration of :func:`hilbert_key_df` (same
    per-level arithmetic, same orientation handling). ``source`` is a
    FROM-able relation, ``keys`` the projected passthrough columns."""
    mask = (1 << bits) - 1
    parts = [
        f"h{bits} AS (SELECT {keys}, CAST(({x}) & {mask} AS BIGINT) AS hx,"
        f" CAST(({y}) & {mask} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM {source})"
    ]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        prev = f"h{level + 1}"
        parts.append(
            f"""h{level} AS (
  SELECT {keys},
         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN {s - 1} - hy ELSE hy END
              ELSE hx END AS hx,
         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN {s - 1} - hx ELSE hx END
              ELSE hy END AS hy,
         hd + {s * s} * xor(3 * rx, ry) AS hd
  FROM (SELECT {keys}, hx, hy, hd,
               CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM {prev}) t)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT {keys}, CAST(hd AS BIGINT) AS hkey FROM h0"
    )


def hilbert_layout(
    df: DataFrame, x: str, y: str, n_files: int, bits: int = HILBERT_BITS
) -> DataFrame:
    """Range-partition ``df`` by its Hilbert key into ``n_files`` write
    tasks — :func:`zorder_layout` with the better curve: each output
    file covers one CONNECTED (x, y) region (no Z-shape diagonal
    jumps), so per-file min/max stats are tighter on both dimensions
    at identical write cost."""
    keyed = hilbert_key_df(df, x, y, bits, out="__h")
    return keyed.repartitionByRange(n_files, "__h").drop("__h")


def _wl_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    li = spark.table("lineitem").where(F.col("l_orderkey") < 2000)
    return hilbert_key_df(
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        "l_partkey",
        "l_suppkey",
    ).select("l_orderkey", "l_linenumber", "hkey")


ORACLE_HILBERT_KEY = (
    hilbert_oracle_sql(
        "(SELECT * FROM lineitem WHERE l_orderkey < 2000)",
        "l_orderkey, l_linenumber",
        "l_partkey",
        "l_suppkey",
    )
    + "\nORDER BY l_orderkey, l_linenumber"
)


DRIFT_BUCKET = 50  # value-histogram bucket width
DRIFT_SPLIT_DAY = 15  # first half = day-of-month < 15


def distribution_drift(events: DataFrame) -> DataFrame:
    """Distribution-drift monitor: per key, the total-variation
    distance between the value histogram of the first half of the
    month and the second — the ML-ops check that catches a silent
    upstream change (new client version, schema default flip) before
    it poisons training data. TV = ½·Σ_buckets |p_i − q_i| ∈ [0, 1];
    unlike PSI/KL it needs NO logarithm, so it is exactly computable
    in integers: with half-sizes N, M and bucket counts n_i, m_i,

        tv_ppm = (1e6 · Σ|n_i·M − m_i·N|) DIV (2·N·M)

    — every term int64 (headroom N·M·2e6 ⇒ halves up to ~10⁹ rows
    before pre-scaling). Keys with an empty half are dropped (drift
    vs nothing is undefined).

    Plan: ONE map-combinable groupBy(key, bucket) with conditional
    half-sums over the scan; half totals re-aggregate from the same
    frame; everything after the first shuffle is histogram-sized.

    Returns ``(key, n_a, n_b, tv_ppm)`` ordered by key.
    """
    half_a = F.expr("day(CAST(ts AS TIMESTAMP))") < DRIFT_SPLIT_DAY
    b = events.select(
        F.col("event_type").alias("key"),
        F.expr(
            f"CAST(floor(value * 100 + 0.5) AS BIGINT) DIV {DRIFT_BUCKET * 100}"
        ).alias("bucket"),
        half_a.alias("is_a"),
    )
    hist = b.groupBy("key", "bucket").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("m"),
    )
    tot = hist.groupBy("key").agg(
        F.sum("n").alias("n_a"), F.sum("m").alias("n_b")
    )
    return (
        hist.join(tot, "key")
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy("key", "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(F.col("n") * F.col("n_b") - F.col("m") * F.col("n_a"))
            ).alias("num")
        )
        .select(
            "key",
            "n_a",
            "n_b",
            F.expr("(1000000 * num) DIV (2 * n_a * n_b)")
            .cast("long")
            .alias("tv_ppm"),
        )
        .orderBy("key")
    )


ORACLE_DRIFT = f"""
WITH b AS (
  SELECT event_type AS key,
         CAST(floor(value * 100 + 0.5) AS BIGINT) // {DRIFT_BUCKET * 100}
           AS bucket,
         (day(ts) < {DRIFT_SPLIT_DAY}) AS is_a
  FROM events),
hist AS (
  SELECT key, bucket,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n,
         CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM b GROUP BY key, bucket),
tot AS (
  SELECT key, CAST(sum(n) AS BIGINT) AS n_a, CAST(sum(m) AS BIGINT) AS n_b
  FROM hist GROUP BY key)
SELECT h.key, t.n_a, t.n_b,
       CAST((1000000 * sum(abs(h.n * t.n_b - h.m * t.n_a)))
            // (2 * t.n_a * t.n_b) AS BIGINT) AS tv_ppm
FROM hist h JOIN tot t USING (key)
WHERE t.n_a > 0 AND t.n_b > 0
GROUP BY h.key, t.n_a, t.n_b
ORDER BY key"""


def _wl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return distribution_drift(spark.table("events"))


def skew_profile(df: DataFrame, key: str, top_k: int = 20) -> DataFrame:
    """Join-key skew diagnostics: the measurement that decides whether
    a key needs :func:`salted_join` / AQE skew handling at all. Returns
    the ``top_k`` heaviest key values with their absolute count and
    corpus share — the "does one reducer eat this shuffle" report.

    Plan: ONE map-combinable groupBy(key) (the per-key count is tiny
    after partial aggregation no matter how hot the key), top-k via
    orderBy+limit (TakeOrderedAndProject — never a global sort of the
    key space), the corpus total as a 1-row broadcast joined in (no
    separate driver-side count job), and the rank window runs over the
    ≤ top_k surviving rows only. Shares are integer parts-per-million
    (``cnt * 1e6 DIV total`` — exact while cnt < 2^63/1e6 ≈ 9e12 rows
    per key; beyond that divide first). Returns
    ``(rnk, k, cnt, share_ppm)``.
    """
    counts = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("cnt"))
    # grand total as count(*) over the INPUT, not sum over `counts`: the
    # latter duplicates the groupBy subtree (two hash exchanges); this
    # form is a zero-column scan (parquet answers it from footer
    # metadata) + a map-side partial-count gather — no shuffle at all
    total = df.agg(F.count("*").alias("_total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("k").asc())
        .limit(top_k)
        .join(F.broadcast(total))
    )
    rnk = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), F.col("k").asc())
    )
    return top.select(
        rnk.alias("rnk"),
        "k",
        "cnt",
        F.expr("cnt * 1000000 DIV _total").alias("share_ppm"),
    )


def _wl_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return skew_profile(spark.table("events"), "user_id", top_k=20)


ORACLE_SKEW_PROFILE = """
WITH counts AS (
  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, k) AS INTEGER) AS rnk,
       k, cnt, cnt * 1000000 // total AS share_ppm
FROM counts, tot
ORDER BY cnt DESC, k LIMIT 20
"""


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column statistics — the stats a cost-based
    optimizer (or a layout decision: bucket count, Z-order dims,
    partition key choice) is fed: per-column min/max (integer cents),
    exact distinct count, and null count, in ONE pass.

    Plan: a single aggregate computes every column's four stats; the
    exact NDVs make Spark expand the input once per distinct-column
    (the standard Expand plan) — the honest cost of exact NDV. At
    100 TB swap ``countDistinct`` for ``approx_count_distinct`` (HLL,
    map-combinable, one pass, ~2% error) — the layout decisions this
    feeds don't need exact cardinalities; exact is kept here because
    the oracle contract demands determinism. Output is unpivoted to
    one row per column via ``stack`` on the 1-row aggregate (driver-
    side cost: |cols| rows).

    Returns ``(col, lo_c, hi_c, ndv, n_nulls)`` ordered by col.
    """
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    aggs = []
    for c in cols:
        aggs += [
            F.min(cents(c)).alias(f"_lo_{c}"),
            F.max(cents(c)).alias(f"_hi_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _lo_{c}, _hi_{c}, _nd_{c}, _nn_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col, lo_c, hi_c, ndv, n_nulls)"
    ).orderBy("col")


def _wl_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return column_stats(
        spark.table("lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _column_stats_oracle(cols: list[str]) -> str:
    parts = [
        f"""SELECT '{c}' AS col,
       floor(min({c}) * 100 + 0.5)::BIGINT AS lo_c,
       floor(max({c}) * 100 + 0.5)::BIGINT AS hi_c,
       CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
FROM lineitem"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + "\nORDER BY col"


ORACLE_COLUMN_STATS = _column_stats_oracle(
    ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
)


def corr_matrix(df: DataFrame, cols_scales: list[tuple[str, int]]) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric columns — the
    profiling companion to :func:`column_stats` (feeds Z-order dimension
    choice: correlated dimensions waste interleaved bits, SCALE.md).

    Determinism: each column is quantized to integers at a per-column
    scale chosen so the five Pearson sums stay inside int64 (the
    ``cross_correlation`` idiom); only the final closed form is float —
    one identical IEEE expression per pair, floor-quantized at 6 dp.

    Plan: ONE map-combinable aggregate computes every n/sum/sum-of-
    squares/cross-product (|cols| + |cols|² terms, all partial-agg
    friendly), then the |pairs| output rows unpivot from the 1-row
    result. Int64 headroom applies to the moment SUMS
    (sum(x²) <= n·(scale·max)²; at 10^12 rows keep scale·max under
    ~3·10^3); the closed-form products run 128-bit on both engines
    (decimal(38,0) ↔ HUGEINT) so they never overflow first. Returns ``(col_a, col_b, n, r)``.
    """
    qs = {c: F.floor(F.col(c) * s + F.lit(0.5)).cast("long") for c, s in cols_scales}
    cols = [c for c, _ in cols_scales]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(qs[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(qs[c] * qs[c]).alias(f"_ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(qs[a] * qs[b]).alias(f"_sp_{a}_{b}"))
    one = df.agg(*aggs)
    outs = []
    # the closed-form products (n*sxy, n*sxx, sx*sy) overflow int64 at
    # real row counts even when the moment SUMS fit — mirror DuckDB's
    # HUGEINT arithmetic with decimal(38,0): both are 128-bit exact, so
    # the single CAST AS DOUBLE sees the identical integer on both
    # engines and rounds identically (IEEE nearest)
    D = "decimal(38,0)"

    def _d(name: str):
        return F.col(name).cast(D)

    for a, b in pairs:
        num = (
            _d("_n") * _d(f"_sp_{a}_{b}") - _d(f"_s_{a}") * _d(f"_s_{b}")
        ).cast("double")
        den = F.sqrt(
            (_d("_n") * _d(f"_ss_{a}") - _d(f"_s_{a}") * _d(f"_s_{a}")).cast(
                "double"
            )
        ) * F.sqrt(
            (_d("_n") * _d(f"_ss_{b}") - _d(f"_s_{b}") * _d(f"_s_{b}")).cast(
                "double"
            )
        )
        r6 = F.floor(num / den * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        outs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("_n").alias("n"),
                r6.alias("r"),
            )
        )
    return (
        one.select(F.explode(F.array(*outs)).alias("e"))
        .select("e.col_a", "e.col_b", "e.n", "e.r")
        .orderBy("col_a", "col_b")
    )


_CORR_COLS = [
    ("l_quantity", 100),
    ("l_extendedprice", 1),
    ("l_discount", 100),
    ("l_tax", 100),
]


def _wl_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return corr_matrix(spark.table("lineitem"), _CORR_COLS)


def _corr_matrix_oracle(cols_scales: list[tuple[str, int]]) -> str:
    q = {c: f"floor({c} * {s} + 0.5)::BIGINT" for c, s in cols_scales}
    cols = [c for c, _ in cols_scales]
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for c in cols:
        sums.append(f"CAST(sum({q[c]}) AS BIGINT) AS s_{c}")
        sums.append(f"CAST(sum({q[c]} * {q[c]}) AS BIGINT) AS ss_{c}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        sums.append(f"CAST(sum({q[a]} * {q[b]}) AS BIGINT) AS sp_{a}_{b}")
    # HUGEINT closed form (the Spark side mirrors with decimal(38,0))
    sel = " UNION ALL ".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b, n,
       floor(CAST(CAST(n AS HUGEINT) * sp_{a}_{b}
                  - CAST(s_{a} AS HUGEINT) * s_{b} AS DOUBLE)
             / (sqrt(CAST(CAST(n AS HUGEINT) * ss_{a}
                          - CAST(s_{a} AS HUGEINT) * s_{a} AS DOUBLE))
                * sqrt(CAST(CAST(n AS HUGEINT) * ss_{b}
                            - CAST(s_{b} AS HUGEINT) * s_{b} AS DOUBLE)))
             * 1000000 + 0.5) / 1000000.0 AS r
FROM m"""
        for a, b in pairs
    )
    return (
        f"WITH m AS (SELECT {', '.join(sums)} FROM lineitem)\n"
        + sel
        + "\nORDER BY col_a, col_b"
    )


ORACLE_CORR_MATRIX = _corr_matrix_oracle(_CORR_COLS)


def _wl_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events").select("event_id", "event_type")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("type_n"))
    return salted_join(ev, dim, ["event_type"], n_salts=8).select(
        "event_id", "event_type", "type_n"
    )


ORACLE_SALTED_JOIN = """
WITH dim AS (SELECT event_type, count(*) AS type_n FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, d.type_n
FROM events e JOIN dim d USING (event_type)
"""


def _wl_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return salted_count_distinct(
        spark.table("events"), "event_type", "user_id", n_salts=8
    ).orderBy("event_type")


ORACLE_SALTED_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


def _wl_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    li = spark.table("lineitem").where(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key(F.col("l_partkey"), F.col("l_suppkey")).alias("zkey"),
    )


ORACLE_ZORDER_KEY = f"""
SELECT l_orderkey, l_linenumber,
       {zorder_sql('l_partkey', 'l_suppkey')} AS zkey
FROM lineitem WHERE l_orderkey < 2000
ORDER BY l_orderkey, l_linenumber"""


COMPACTION_TARGET_BYTES = 65_536


def compaction_plan(
    events: DataFrame, target_bytes: int = COMPACTION_TARGET_BYTES
) -> DataFrame:
    """Small-file compaction PLANNER — the metadata half of
    :func:`sources.columnar.compact_small_files` (which executes a
    plan): given the lake's file manifest, assign files to rewrite
    groups of roughly ``target_bytes`` each, largest files first, so
    one rewrite job turns N small files into ~``ceil(total/target)``
    right-sized ones.

    Files are simulated from ``events`` as one per ``(day,
    event_type)`` partition with exact integer byte sizes
    (``octet_length(props)`` payload + 32 B/row envelope — both
    engines count UTF-8 bytes identically). The assignment rule is
    next-fit over the size-descending file list: ``group =
    floor(running_total_before_this_file / target_bytes)`` — one
    window cumsum over a fully tie-broken order ``(bytes DESC, day,
    event_type)``, deterministic on both engines.

    Scale: the manifest is METADATA (one row per file — ~10^6 rows
    for a 100 TB lake of 100 MB files), so the single-partition
    cumsum window is fine; the data-plane rewrite that consumes this
    plan shuffles on ``grp`` and writes each group with one task.
    Returns ``(grp, n_files, total_bytes, max_file_bytes)``.
    """
    files = (
        events.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        ).agg(
            (
                F.sum(F.octet_length("props"))
                + 32 * F.count(F.lit(1))
            ).alias("bytes")
        )
    )
    w = Window.orderBy(F.desc("bytes"), "day", "event_type").rowsBetween(
        Window.unboundedPreceding, -1
    )
    planned = files.select(
        "bytes",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / F.lit(target_bytes)
        ).alias("grp"),
    )
    return (
        planned.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("total_bytes"),
            F.max("bytes").alias("max_file_bytes"),
        )
        .orderBy("grp")
    )


def _wl_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return compaction_plan(spark.table("events"))


ORACLE_COMPACTION_PLAN = f"""
WITH files AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         -- DuckDB strlen = UTF-8 BYTE length (= Spark octet_length);
         -- its octet_length only binds to BLOB/BIT
         CAST(sum(strlen(props)) + 32 * count(*) AS BIGINT) AS bytes
  FROM events GROUP BY 1, 2),
planned AS (
  SELECT bytes,
         CAST(floor(coalesce(sum(bytes) OVER (
                 ORDER BY bytes DESC, day, event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {COMPACTION_TARGET_BYTES}) AS BIGINT) AS grp
  FROM files)
SELECT grp, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(max(bytes) AS BIGINT) AS max_file_bytes
FROM planned GROUP BY grp ORDER BY grp"""


# Bloom pre-filter: portable two-hash filter over a shared bit space.
# The hashes are plain int64 arithmetic (multiplicative mixing mod a
# prime table size) so BOTH engines — and any engine — compute the
# identical bit set; Spark's built-in bloom_filter_agg would be opaque
# bytes, useless for a cross-engine contract.
BLOOM_BITS = 16381  # prime < 2^14
BLOOM_H1_MUL = 2_654_435_761  # Knuth multiplicative constant
BLOOM_H2_MUL = 0x9E3779B1  # golden-ratio constant
BLOOM_H2_ADD = 101_159


def bloom_prefilter_stats(
    build: DataFrame,
    build_key: str,
    probe: DataFrame,
    probe_key: str,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """Runtime-filter join reduction, measured: build a two-hash Bloom
    filter from ``build``'s keys, pre-filter ``probe`` with it, and
    report exactly how much of the probe side the filter admits vs the
    true semi-join — the decision data for whether a runtime filter
    pays at a given selectivity.

    The filter's set-bit positions are two small DataFrames (distinct
    ``h1`` / distinct ``h2`` over the build keys, ≤ ``bits`` rows
    each); the probe "consults" the filter with two broadcast
    LEFT SEMI joins — the same dataflow Spark's AQE runtime bloom
    filter injects, but with an engine-portable hash so the oracle
    reproduces it bit-for-bit. Hash values stay far inside int64
    (key · 2654435761 ≤ 9.2e18 for keys ≤ 3.4e9; larger key spaces
    pre-fold with a mod).

    Returns one row: ``(n_probe, n_pass, n_true, n_false_pos)``.
    False positives admitted by the filter are the cost of skipping
    the full semi-join shuffle; a downstream exact join removes them,
    so correctness never depends on the filter.
    """
    k = F.col(probe_key)
    h1 = (k * F.lit(BLOOM_H1_MUL)) % F.lit(bits)
    h2 = (k * F.lit(BLOOM_H2_MUL) + F.lit(BLOOM_H2_ADD)) % F.lit(bits)
    bk = F.col(build_key)
    bits1 = build.select(((bk * F.lit(BLOOM_H1_MUL)) % F.lit(bits)).alias("b1")).distinct()
    bits2 = build.select(
        ((bk * F.lit(BLOOM_H2_MUL) + F.lit(BLOOM_H2_ADD)) % F.lit(bits)).alias("b2")
    ).distinct()
    keys = build.select(bk.alias("__true_key")).distinct()
    probed = (
        probe.select(
            k.alias("__k"), h1.alias("__h1"), h2.alias("__h2")
        )
        .join(F.broadcast(bits1.withColumn("__m1", F.lit(1))),
              F.col("__h1") == F.col("b1"), "left")
        .join(F.broadcast(bits2.withColumn("__m2", F.lit(1))),
              F.col("__h2") == F.col("b2"), "left")
        .join(F.broadcast(keys.withColumn("__mt", F.lit(1))),
              F.col("__k") == F.col("__true_key"), "left")
    )
    passed = (F.col("__m1").isNotNull() & F.col("__m2").isNotNull()).cast("long")
    true_hit = F.col("__mt").isNotNull().cast("long")
    return probed.groupBy().agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(passed).alias("n_pass"),
        F.sum(true_hit).alias("n_true"),
        F.sum(passed * (1 - true_hit)).alias("n_false_pos"),
    )


def _wl_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    build = spark.table("customer").where("c_acctbal >= 9000")
    return bloom_prefilter_stats(build, "c_custkey", spark.table("orders"), "o_custkey")


ORACLE_BLOOM_PREFILTER = f"""
WITH build AS (SELECT c_custkey FROM customer WHERE c_acctbal >= 9000),
b1 AS (SELECT DISTINCT (c_custkey * {BLOOM_H1_MUL}) % {BLOOM_BITS} AS b FROM build),
b2 AS (SELECT DISTINCT (c_custkey * {BLOOM_H2_MUL} + {BLOOM_H2_ADD}) % {BLOOM_BITS} AS b FROM build),
probed AS (
  SELECT o_custkey,
         CASE WHEN (o_custkey * {BLOOM_H1_MUL}) % {BLOOM_BITS} IN (SELECT b FROM b1)
               AND (o_custkey * {BLOOM_H2_MUL} + {BLOOM_H2_ADD}) % {BLOOM_BITS} IN (SELECT b FROM b2)
              THEN 1 ELSE 0 END AS pass,
         CASE WHEN o_custkey IN (SELECT c_custkey FROM build)
              THEN 1 ELSE 0 END AS hit
  FROM orders)
SELECT CAST(count(*) AS BIGINT) AS n_probe,
       CAST(sum(pass) AS BIGINT) AS n_pass,
       CAST(sum(hit) AS BIGINT) AS n_true,
       CAST(sum(pass * (1 - hit)) AS BIGINT) AS n_false_pos
FROM probed"""


# layout advisor thresholds (documented contract, not tunables-by-magic)
ADVISOR_PART_MIN_NDV = 2
ADVISOR_PART_MAX_NDV = 1000
ADVISOR_PART_MAX_TOP1_PPM = 500_000
ADVISOR_BUCKET_MIN_NDV = 1000


def layout_advisor(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE → ADVISE: recommend a write layout (partition column,
    bucket column + count, Z-order columns) for a table from one
    stats pass over the candidate columns — the decision
    `write_partitioned` / `write_bucketed` / `zorder_layout` then
    execute.

    Stats: the candidates are cast to string, unpivoted, and counted
    with ONE shuffle on ``(col, value)`` (NULL counts as a value);
    per-column NDV / row count / hottest-value share fall out of the
    second, col-sized aggregation. Deterministic integer rules:

    - **partition**: NDV in [{pmin}, {pmax}] and top-1 share ≤ 50%
      (no mega-partition); highest NDV wins (ties: name) — most
      selective pruning without small-file explosion.
    - **bucket**: among the rest, NDV > {bmin}; highest NDV wins —
      the join-key-shaped column. Bucket count: power-of-2 ladder on
      ``ndv DIV 1024``, clamped to [8, 4096].
    - **zorder**: top-2 remaining columns with NDV ≥ 2 — secondary
      predicate columns worth min/max clustering.

    Returns ``(role, column, ndv, top1_ppm, n_buckets)`` (n_buckets
    NULL except for the bucket row), ordered by (role, column).
    Shares are exact integer ppm (int64 ``DIV``).
    """
    vals = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "col", "val")
    per_val = vals.groupBy("col", "val").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_val.groupBy("col").agg(
        F.count(F.lit(1)).alias("ndv"),
        F.sum("cnt").alias("n"),
        F.max("cnt").alias("top1"),
    )
    stats = stats.select(
        "col", "ndv",
        F.expr("top1 * 1000000 DIV n").alias("top1_ppm"),
    )
    part_w = Window.orderBy(F.desc("ndv"), "col")
    part = (
        stats.where(
            (F.col("ndv") >= ADVISOR_PART_MIN_NDV)
            & (F.col("ndv") <= ADVISOR_PART_MAX_NDV)
            & (F.col("top1_ppm") <= ADVISOR_PART_MAX_TOP1_PPM)
        )
        .withColumn("rn", F.row_number().over(part_w))
        .where("rn = 1")
        .select(F.lit("partition").alias("role"), "col", "ndv", "top1_ppm",
                F.lit(None).cast("long").alias("n_buckets"))
    )
    rest = stats.join(part.select(F.col("col").alias("pc")),
                      stats.col == F.col("pc"), "left_anti")
    bucket = (
        rest.where(F.col("ndv") > ADVISOR_BUCKET_MIN_NDV)
        .withColumn("rn", F.row_number().over(part_w))
        .where("rn = 1")
        .select(
            F.lit("bucket").alias("role"), "col", "ndv", "top1_ppm",
            F.expr(
                """CASE WHEN ndv DIV 1024 <= 8 THEN 8
                        WHEN ndv DIV 1024 <= 16 THEN 16
                        WHEN ndv DIV 1024 <= 32 THEN 32
                        WHEN ndv DIV 1024 <= 64 THEN 64
                        WHEN ndv DIV 1024 <= 128 THEN 128
                        WHEN ndv DIV 1024 <= 256 THEN 256
                        WHEN ndv DIV 1024 <= 512 THEN 512
                        WHEN ndv DIV 1024 <= 1024 THEN 1024
                        WHEN ndv DIV 1024 <= 2048 THEN 2048
                        ELSE 4096 END"""
            ).cast("long").alias("n_buckets"),
        )
    )
    taken = part.select("col").union(bucket.select("col"))
    zorder = (
        stats.join(taken.withColumnRenamed("col", "tc"),
                   stats.col == F.col("tc"), "left_anti")
        .where(F.col("ndv") >= 2)
        .withColumn("rn", F.row_number().over(part_w))
        .where("rn <= 2")
        .select(F.lit("zorder").alias("role"), "col", "ndv", "top1_ppm",
                F.lit(None).cast("long").alias("n_buckets"))
    )
    return part.unionByName(bucket).unionByName(zorder).orderBy("role", "col")


CMS_W = 1024  # count-min width (buckets per hash row)
CMS_HASHES = (
    (2_654_435_761, 0),
    (2_246_822_519, 101_159),
    (3_266_489_917, 9_876_543),
)


def countmin_estimate(
    stream: DataFrame, key: str, queries_df: DataFrame, qkey: str
) -> DataFrame:
    """Count-Min sketch with engine-portable hashes, certified by
    replay: build the d×w counter array from ``stream`` (one shuffle
    on ``(row, bucket)`` after a 3-row explode), then estimate each
    query key's frequency as ``min`` over rows — the classic
    heavy-hitter sketch, here with multiplicative mod-prime hashes so
    the oracle can rebuild the identical array in SQL.

    CMS guarantees estimate ≥ truth (overestimate only); joining the
    exact counts alongside exposes the error the sketch actually made
    at this (d, w) — the attestation pattern
    (`dedup.minhash_estimate_error`) applied to frequency sketching.

    Returns ``(key, est, ...)`` — one row per query key with the CMS
    estimate; join truth downstream.
    """
    rows = []
    for i, (mul, add) in enumerate(CMS_HASHES):
        rows.append(
            stream.select(
                F.lit(i).alias("row"),
                ((F.col(key) * F.lit(mul) + F.lit(add)) % F.lit(CMS_W)).alias(
                    "bucket"
                ),
            )
        )
    cells = rows[0]
    for r in rows[1:]:
        cells = cells.unionByName(r)
    counters = cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    q = queries_df
    for i, (mul, add) in enumerate(CMS_HASHES):
        probe = counters.where(F.col("row") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("cnt").alias(f"c{i}")
        )
        q = q.join(
            F.broadcast(probe),
            ((F.col(qkey) * F.lit(mul) + F.lit(add)) % F.lit(CMS_W))
            == F.col(f"b{i}"),
            "left",
        ).drop(f"b{i}")
    return q.select(
        *queries_df.columns,
        F.least(
            *[F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(len(CMS_HASHES))]
        ).alias("est"),
    )


def _wl_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    orders = spark.table("orders")
    truth = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "o_custkey")
        .limit(10)
    )
    est = countmin_estimate(orders, "o_custkey", truth, "o_custkey")
    return est.select(
        "o_custkey",
        "true_cnt",
        "est",
        (F.col("est") - F.col("true_cnt")).alias("overcount"),
    ).orderBy(F.desc("true_cnt"), "o_custkey")


def _cms_oracle() -> str:
    cell_selects = " UNION ALL ".join(
        f"SELECT {i} AS row, (o_custkey * {mul} + {add}) % {CMS_W} AS bucket "
        f"FROM orders"
        for i, (mul, add) in enumerate(CMS_HASHES)
    )
    probes = []
    for i, (mul, add) in enumerate(CMS_HASHES):
        probes.append(
            f"""coalesce((SELECT cnt FROM counters c
         WHERE c.row = {i}
           AND c.bucket = (t.o_custkey * {mul} + {add}) % {CMS_W}), 0)"""
        )
    least = f"least({', '.join(probes)})"
    return f"""
WITH cells AS ({cell_selects}),
counters AS MATERIALIZED (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY row, bucket),
truth AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS true_cnt
  FROM orders GROUP BY o_custkey
  ORDER BY true_cnt DESC, o_custkey LIMIT 10)
SELECT t.o_custkey, t.true_cnt,
       CAST({least} AS BIGINT) AS est,
       CAST({least} - t.true_cnt AS BIGINT) AS overcount
FROM truth t ORDER BY t.true_cnt DESC, t.o_custkey"""


ORACLE_COUNTMIN = _cms_oracle()


def _wl_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    orders = spark.table("orders").withColumn(
        "o_ordermonth", F.substring(F.col("o_orderdate").cast("string"), 1, 7)
    )
    return layout_advisor(
        orders,
        ["o_ordermonth", "o_orderstatus", "o_orderpriority", "o_custkey"],
    )


ORACLE_LAYOUT_ADVISOR = f"""
WITH vals AS (
  SELECT col, val FROM (
    SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS o_ordermonth,
           CAST(o_orderstatus AS VARCHAR) AS o_orderstatus,
           CAST(o_orderpriority AS VARCHAR) AS o_orderpriority,
           CAST(o_custkey AS VARCHAR) AS o_custkey
    FROM orders) t
  UNPIVOT (val FOR col IN (o_ordermonth, o_orderstatus, o_orderpriority,
                           o_custkey))),
per_val AS (SELECT col, val, count(*) AS cnt FROM vals GROUP BY col, val),
stats AS (
  SELECT col, CAST(count(*) AS BIGINT) AS ndv,
         CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT) AS top1_ppm
  FROM per_val GROUP BY col),
part AS (
  SELECT 'partition' AS role, col, ndv, top1_ppm,
         CAST(NULL AS BIGINT) AS n_buckets
  FROM (SELECT *, row_number() OVER (ORDER BY ndv DESC, col) AS rn
        FROM stats
        WHERE ndv BETWEEN {ADVISOR_PART_MIN_NDV} AND {ADVISOR_PART_MAX_NDV}
          AND top1_ppm <= {ADVISOR_PART_MAX_TOP1_PPM}) q
  WHERE rn = 1),
bucket AS (
  SELECT 'bucket' AS role, col, ndv, top1_ppm,
         CAST(CASE WHEN ndv // 1024 <= 8 THEN 8
                   WHEN ndv // 1024 <= 16 THEN 16
                   WHEN ndv // 1024 <= 32 THEN 32
                   WHEN ndv // 1024 <= 64 THEN 64
                   WHEN ndv // 1024 <= 128 THEN 128
                   WHEN ndv // 1024 <= 256 THEN 256
                   WHEN ndv // 1024 <= 512 THEN 512
                   WHEN ndv // 1024 <= 1024 THEN 1024
                   WHEN ndv // 1024 <= 2048 THEN 2048
                   ELSE 4096 END AS BIGINT) AS n_buckets
  FROM (SELECT *, row_number() OVER (ORDER BY ndv DESC, col) AS rn
        FROM stats
        WHERE ndv > {ADVISOR_BUCKET_MIN_NDV}
          AND col NOT IN (SELECT col FROM part)) q
  WHERE rn = 1),
zorder AS (
  SELECT 'zorder' AS role, col, ndv, top1_ppm,
         CAST(NULL AS BIGINT) AS n_buckets
  FROM (SELECT *, row_number() OVER (ORDER BY ndv DESC, col) AS rn
        FROM stats
        WHERE ndv >= 2
          AND col NOT IN (SELECT col FROM part)
          AND col NOT IN (SELECT col FROM bucket)) q
  WHERE rn <= 2)
SELECT role, col, ndv, top1_ppm, n_buckets FROM (
  SELECT * FROM part UNION ALL
  SELECT * FROM bucket UNION ALL
  SELECT * FROM zorder) u
ORDER BY role, col"""

layout_advisor.__doc__ = layout_advisor.__doc__.format(
    pmin=ADVISOR_PART_MIN_NDV,
    pmax=ADVISOR_PART_MAX_NDV,
    bmin=ADVISOR_BUCKET_MIN_NDV,
)


# HyperLogLog: m registers (power of two), one multiplicative
# mod-prime hash; alpha_64 = 0.709 (Flajolet et al. 2007, m = 64).
# HLL_C = alpha * m^2 * 2^HLL_R precomputed so the estimate is ONE
# IEEE division of a shared literal by an exact integer.
HLL_M = 64
HLL_P = 2147483647  # 2^31 - 1 (prime)
HLL_MUL, HLL_ADD = 1103515245, 12345
# second, QUADRATIC round: an affine hash alone maps consecutive keys
# onto an arithmetic lattice mod P whose trailing-zero ranks are
# skewed (measured +40% bias on TPC-H custkeys); squaring breaks the
# linearity. Termwise mod keeps every intermediate < 3*2^31.
HLL_MUL2, HLL_ADD2 = 784588716, 997755331
HLL_R = 40  # common-denominator exponent: rho <= 26 << R
HLL_C = 3193052135805681.5  # 0.709 * 64^2 * 2^40, exact double literal


def hll_distinct(stream: DataFrame, key: str, grp: str) -> DataFrame:
    """HyperLogLog distinct-count sketch, certified by replay — the
    cardinality companion of :func:`countmin_estimate` (frequency):
    an engine-portable mod-prime hash (affine round + quadratic
    scramble, see HLL_MUL2 note), so the DuckDB oracle rebuilds the
    identical 64-register array in SQL and the whole sketch is
    bit-reproducible, not just statistically similar.

    All register math is EXACT integer: ``reg = h % 64``, ``w = h
    div 64``, and the rank is trailing-zero-count + 1 via the two's-
    complement lowbit trick ``bit_count((w & -w) - 1) + 1`` (no
    float log2, whose libm rounding differs across engines; ``w = 0``
    maps to the max rank 26 since ``w < 2^25``). The harmonic-mean
    denominator is lifted to a common denominator — ``S = Σ_regs
    2^(40 − rho)``, an int64 ≤ 64·2^40 — so the final estimate
    ``floor(HLL_C / S)`` is one IEEE division of a shared double
    literal by an exact integer: deterministic on both engines.
    (The small-range linear-counting correction needs ``ln``, which
    is NOT correctly-rounded-portable; below 2.5·m distinct the raw
    estimator biases high, so ``zero_regs`` is reported for honesty.)

    Scale: one groupBy((grp, reg)) max-agg over the stream — map-side
    combinable, 64 rows per group out; the empty-register grid is a
    groups×64 broadcast. Joining exact truth alongside exposes the
    error the sketch actually made — the attestation pattern.

    Returns ``(grp, zero_regs, est)`` — one row per group.
    """
    h1 = f"(({key} * {HLL_MUL}L + {HLL_ADD}L) % {HLL_P}L)"
    h2 = (
        f"(({h1} * {h1}) % {HLL_P}L + ({HLL_MUL2}L * {h1}) % {HLL_P}L"
        f" + {HLL_ADD2}L) % {HLL_P}L"
    )
    # integral div, not floor(h/64.0): keeps w exact past double's
    # 53-bit window at larger key domains, and the oracle uses //
    hashed = stream.select(
        F.col(grp).alias("g"),
        F.expr(f"{h2} % {HLL_M}L").alias("reg"),
        F.expr(f"{h2} div {HLL_M}L").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(26)).otherwise(
        F.expr("bit_count((w & -w) - 1) + 1")
    )
    regs = hashed.select("g", "reg", rho.alias("rho")).groupBy("g", "reg").agg(
        F.max("rho").alias("rho")
    )
    grid = (
        stream.select(F.col(grp).alias("g"))
        .distinct()
        .crossJoin(F.broadcast(stream.sparkSession.range(HLL_M)).select(
            F.col("id").alias("reg")
        ))
    )
    filled = grid.join(regs, ["g", "reg"], "left").select(
        "g", "reg", F.coalesce(F.col("rho"), F.lit(0)).alias("rho")
    )
    term = F.expr(f"shiftleft(1L, cast({HLL_R} - rho as int))")
    return (
        filled.groupBy("g")
        .agg(
            F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zero_regs"),
            F.sum(term).alias("s"),
        )
        .select(
            F.col("g").alias(grp),
            "zero_regs",
            F.floor(F.lit(HLL_C) / F.col("s")).cast("long").alias("est"),
        )
    )


def _wl_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    orders = spark.table("orders")
    est = hll_distinct(orders, "o_custkey", "o_orderpriority")
    truth = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("true_distinct")
    )
    rel = (F.col("est") - F.col("true_distinct")) * F.lit(1000000.0) / F.col(
        "true_distinct"
    )
    return (
        est.join(truth, "o_orderpriority")
        .select(
            "o_orderpriority",
            "true_distinct",
            "est",
            "zero_regs",
            (F.floor(rel + F.lit(0.5)) / F.lit(1000000.0)).alias("rel_err"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_HLL = f"""
WITH hashed AS (
  SELECT o_orderpriority AS g,
         h % {HLL_M} AS reg,
         h // {HLL_M} AS w
  FROM (SELECT o_orderpriority,
               ((h1 * h1) % {HLL_P} + ({HLL_MUL2} * h1) % {HLL_P}
                + {HLL_ADD2}) % {HLL_P} AS h
        FROM (SELECT o_orderpriority,
                     (o_custkey * {HLL_MUL} + {HLL_ADD}) % {HLL_P} AS h1
              FROM orders))),
regs AS (
  SELECT g, reg,
         max(CASE WHEN w = 0 THEN 26
                  ELSE bit_count((w & -w) - 1) + 1 END) AS rho
  FROM hashed GROUP BY 1, 2),
grid AS (
  SELECT g, r.range AS reg
  FROM (SELECT DISTINCT o_orderpriority AS g FROM orders)
  CROSS JOIN range(0, {HLL_M}) r),
filled AS (
  SELECT grid.g, grid.reg, coalesce(regs.rho, 0) AS rho
  FROM grid LEFT JOIN regs USING (g, reg)),
sketch AS (
  SELECT g,
         CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_regs,
         CAST(sum(1::BIGINT << ({HLL_R} - rho)) AS BIGINT) AS s
  FROM filled GROUP BY 1),
truth AS (
  SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT)
           AS true_distinct
  FROM orders GROUP BY 1)
SELECT t.o_orderpriority, t.true_distinct,
       CAST(floor({HLL_C!r} / sk.s) AS BIGINT) AS est,
       sk.zero_regs,
       floor((CAST(floor({HLL_C!r} / sk.s) AS BIGINT) - t.true_distinct)
             * 1000000.0 / t.true_distinct + 0.5) / 1000000.0 AS rel_err
FROM truth t JOIN sketch sk ON sk.g = t.o_orderpriority
ORDER BY t.o_orderpriority"""


# KMV (bottom-k / k-minimum-values) sketch size — 64 hashes per group,
# matching HLL's 64 registers so the two cardinality sketches are
# comparable at equal state
KMV_K = 64


def kmv_distinct(stream: DataFrame, key: str, grp: str, k: int = KMV_K) -> DataFrame:
    """KMV (bottom-k) distinct-count sketch — the ORDER-STATISTIC
    cardinality estimator next to :func:`hll_distinct`'s register
    form, sharing the exact same engine-portable mod-prime hash so
    both sketches see identical hash streams. Estimate: with ``h_k``
    the k-th smallest DISTINCT hash over a domain of ``HLL_P`` values,
    ``D̂ = (k−1)·P div h_k`` — all-integer ((k−1)·P < 2^37, one int64
    floor division), no float anywhere. A group with fewer than k
    distinct hashes keeps them all and the estimate is EXACT (= the
    kept count) — the sketch degrades to exact counting below its
    capacity, which HLL cannot do (its small-range correction needs a
    non-portable ``ln``).

    Scale/mergeability: the per-group STATE is k int64s, and the
    bottom-k of a union is the bottom-k of the combined bottom-k sets
    — shard sketches merge without rescanning (pinned by the merge
    unit test). The build here is one exchange of distinct (grp, hash)
    pairs + a per-group rank window; at 100 TB the incremental form
    keeps standing per-shard bottom-k arrays and merges them,
    shard-sized work per ingest.

    Returns ``(g, n_kept, est)`` — one row per group.
    """
    h1 = f"(({key} * {HLL_MUL}L + {HLL_ADD}L) % {HLL_P}L)"
    h2 = (
        f"(({h1} * {h1}) % {HLL_P}L + ({HLL_MUL2}L * {h1}) % {HLL_P}L"
        f" + {HLL_ADD2}L) % {HLL_P}L"
    )
    hashed = stream.select(F.col(grp).alias("g"), F.expr(h2).alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    bottom = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= int(k)
    )
    return (
        bottom.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("hk"))
        .select(
            "g",
            "n_kept",
            F.when(F.col("n_kept") < int(k), F.col("n_kept"))
            .otherwise(F.expr(f"(({int(k)} - 1) * {HLL_P}L) div hk"))
            .cast("long")
            .alias("est"),
        )
    )


def _wl_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    orders = spark.table("orders")
    est = kmv_distinct(orders, "o_custkey", "o_orderpriority")
    truth = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("true_distinct")
    )
    rel = (F.col("est") - F.col("true_distinct")) * F.lit(1000000.0) / F.col(
        "true_distinct"
    )
    return (
        est.join(truth, F.col("g") == F.col("o_orderpriority"))
        .select(
            "o_orderpriority",
            "true_distinct",
            "est",
            "n_kept",
            (F.floor(rel + F.lit(0.5)) / F.lit(1000000.0)).alias("rel_err"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_KMV = f"""
WITH hashed AS (
  SELECT DISTINCT o_orderpriority AS g,
         ((h1 * h1) % {HLL_P} + ({HLL_MUL2} * h1) % {HLL_P}
          + {HLL_ADD2}) % {HLL_P} AS h
  FROM (SELECT o_orderpriority,
               (o_custkey * {HLL_MUL} + {HLL_ADD}) % {HLL_P} AS h1
        FROM orders)),
bottom AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM hashed) t WHERE rn <= {KMV_K}),
sketch AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS hk
  FROM bottom GROUP BY g),
est AS (
  SELECT g, n_kept,
         CAST(CASE WHEN n_kept < {KMV_K} THEN n_kept
              ELSE (({KMV_K} - 1)::BIGINT * {HLL_P}::BIGINT) // hk
              END AS BIGINT) AS est
  FROM sketch),
truth AS (
  SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT)
           AS true_distinct
  FROM orders GROUP BY 1)
SELECT t.o_orderpriority, t.true_distinct, e.est, e.n_kept,
       floor((e.est - t.true_distinct) * 1000000.0 / t.true_distinct + 0.5)
         / 1000000.0 AS rel_err
FROM truth t JOIN est e ON e.g = t.o_orderpriority
ORDER BY t.o_orderpriority"""


def kmv_set_ops(
    stream: DataFrame,
    key: str,
    side_expr: str,
    k: int = KMV_K,
) -> DataFrame:
    """KMV sketch SET ALGEBRA — the reason bottom-k beats HLL as the
    lake's standing cardinality sketch: two KMV sketches support
    union, intersection, and Jaccard estimates WITHOUT rescanning
    either input (Beyer et al. 2007). ``side_expr`` must evaluate to
    'A'/'B'; the estimator is:

    - union sketch = bottom-k of (sketch_A ∪ sketch_B) hashes, so
      ``U_est = (k-1)·P div h_k`` (exact when the merged sketch is
      below capacity — the same graceful degradation as
      :func:`kmv_distinct`);
    - ``jacc_ppm = 1e6 · |{h ∈ merged-k : h ∈ A-sketch ∧ h ∈
      B-sketch}| div |merged-k|`` — the merged bottom-k is a uniform
      sample of the union, so the member-of-both fraction estimates
      Jaccard;
    - ``inter_est = jacc_ppm · U_est div 1e6``.

    All-integer end to end (the shared mod-prime hash, int64 floor
    divisions), so the estimates are bit-identical across engines and
    partitionings. Scale: each side's state is k int64s built with one
    distinct-shuffle + per-side rank window; everything downstream
    operates on ≤ 2k rows — at 100 TB the sketches are standing
    per-shard arrays merged without touching data.

    Returns ONE row ``(n_a_kept, n_b_kept, union_est, inter_est,
    jacc_ppm)``.
    """
    h1 = f"(({key} * {HLL_MUL}L + {HLL_ADD}L) % {HLL_P}L)"
    h2 = (
        f"(({h1} * {h1}) % {HLL_P}L + ({HLL_MUL2}L * {h1}) % {HLL_P}L"
        f" + {HLL_ADD2}L) % {HLL_P}L"
    )
    hashed = (
        stream.select(F.expr(side_expr).alias("side"), F.expr(h2).alias("h"))
        .where(F.col("side").isin("A", "B"))
        .distinct()
    )
    w = Window.partitionBy("side").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .select("side", "h")
    )
    merged = (
        sk.groupBy("h")
        .agg(
            F.max(F.when(F.col("side") == "A", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("side") == "B", 1).otherwise(0)).alias("in_b"),
        )
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("h"))
        )  # bounded: <= 2k rows
        .where(F.col("rn") <= int(k))
    )
    stats = merged.agg(
        F.count(F.lit(1)).alias("m_kept"),
        F.max("h").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    sides = sk.groupBy().pivot("side", ["A", "B"]).count()
    return (
        stats.crossJoin(sides)
        .select(
            F.coalesce(F.col("A"), F.lit(0)).cast("long").alias("n_a_kept"),
            F.coalesce(F.col("B"), F.lit(0)).cast("long").alias("n_b_kept"),
            F.when(F.col("m_kept") < int(k), F.col("m_kept"))
            .otherwise(F.expr(f"(({int(k)} - 1) * {HLL_P}L) div hk"))
            .cast("long")
            .alias("union_est"),
            F.expr(f"(1000000 * n_both) div m_kept").alias("jp"),
        )
        .select(
            "n_a_kept",
            "n_b_kept",
            "union_est",
            F.expr("(jp * union_est) div 1000000").cast("long").alias(
                "inter_est"
            ),
            F.col("jp").cast("long").alias("jacc_ppm"),
        )
    )


def _wl_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap without rescanning: customers who place URGENT
    orders vs customers who place LOW orders, union/intersection/
    Jaccard estimated purely from the two 64-hash KMV sketches, with
    the exact truths joined alongside so the gate certifies estimator
    AND attestation together."""
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    orders = spark.table("orders")
    side = (
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 'A' "
        "WHEN o_orderpriority = '5-LOW' THEN 'B' ELSE 'X' END"
    )
    est = kmv_set_ops(orders, "o_custkey", side)
    a = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    b = orders.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    truth = (
        a.unionByName(b)
        .distinct()
        .agg(F.count(F.lit(1)).alias("true_union"))
        .crossJoin(
            a.distinct()
            .join(b.distinct(), "o_custkey", "leftsemi")
            .agg(F.count(F.lit(1)).alias("true_inter"))
        )
    )
    return est.crossJoin(truth).select(
        "n_a_kept",
        "n_b_kept",
        "union_est",
        "inter_est",
        "jacc_ppm",
        F.col("true_union").cast("long").alias("true_union"),
        F.col("true_inter").cast("long").alias("true_inter"),
    )


ORACLE_KMV_SETOPS = f"""
WITH hashed AS (
  SELECT DISTINCT side,
         ((h1 * h1) % {HLL_P} + ({HLL_MUL2} * h1) % {HLL_P}
          + {HLL_ADD2}) % {HLL_P} AS h
  FROM (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'A'
                    WHEN o_orderpriority = '5-LOW' THEN 'B' END AS side,
               (o_custkey * {HLL_MUL} + {HLL_ADD}) % {HLL_P} AS h1
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW'))),
sk AS (
  SELECT side, h FROM (
    SELECT side, h, row_number() OVER (PARTITION BY side ORDER BY h) AS rn
    FROM hashed) t WHERE rn <= {KMV_K}),
merged AS (
  SELECT h, in_a, in_b FROM (
    SELECT h, max(CASE WHEN side = 'A' THEN 1 ELSE 0 END) AS in_a,
           max(CASE WHEN side = 'B' THEN 1 ELSE 0 END) AS in_b,
           row_number() OVER (ORDER BY h) AS rn
    FROM sk GROUP BY h) t WHERE rn <= {KMV_K}),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS m_kept, max(h) AS hk,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both
  FROM merged),
sides AS (
  SELECT CAST(sum(CASE WHEN side = 'A' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a_kept,
         CAST(sum(CASE WHEN side = 'B' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b_kept
  FROM sk),
est AS (
  SELECT n_a_kept, n_b_kept,
         CAST(CASE WHEN m_kept < {KMV_K} THEN m_kept
              ELSE (({KMV_K} - 1)::BIGINT * {HLL_P}::BIGINT) // hk
              END AS BIGINT) AS union_est,
         (1000000 * n_both) // m_kept AS jp
  FROM stats, sides),
truth AS (
  SELECT (SELECT count(DISTINCT o_custkey) FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW'))::BIGINT
           AS true_union,
         (SELECT count(*) FROM
            (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderpriority = '1-URGENT') a
          WHERE EXISTS (SELECT 1 FROM orders b
                        WHERE b.o_orderpriority = '5-LOW'
                          AND b.o_custkey = a.o_custkey))::BIGINT
           AS true_inter)
SELECT n_a_kept, n_b_kept, union_est,
       CAST((jp * union_est) // 1000000 AS BIGINT) AS inter_est,
       CAST(jp AS BIGINT) AS jacc_ppm,
       true_union, true_inter
FROM est, truth"""


EQUIDEPTH_BUCKETS = 8


def equidepth_hist(
    df: DataFrame, value_col: str, n_buckets: int = EQUIDEPTH_BUCKETS
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram WITHOUT a global sort —
    the depth companion of :func:`value_histogram`'s equi-width form
    and the ANALYZE statistic optimizers actually want for skewed
    columns. The n−1 inner boundaries come from ONE
    ``percentile_disc`` aggregate (the certified cross-engine index
    convention, `ts_percentiles`), broadcast back as a 1-row dim;
    bucket id = 1 + count of boundaries strictly below the value.
    Ties sit in the LOWER bucket (values equal to a boundary do not
    split), so duplicate-heavy columns yield uneven depths — the
    deterministic discrete semantics, vs a true equal split that
    would have to break ties arbitrarily. The global-ntile form this
    replaces is exactly the sort this avoids.

    Plan: one map-combinable percentile aggregate + one broadcast
    (1-row) join + one hash agg. Returns ``(bucket, n, lo, hi)``.
    """
    n = int(n_buckets)
    v = F.col(value_col)
    bounds = df.agg(
        *[
            F.expr(
                f"percentile_disc({i / n!r}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias(f"_b{i}")
            for i in range(1, n)
        ]
    )
    over = functools.reduce(
        operator.add,
        [(v > F.col(f"_b{i}")).cast("int") for i in range(1, n)],
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select((F.lit(1) + over).cast("long").alias("bucket"), v.alias("v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


def selfjoin_profile(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Self-equi-join blow-up profile on ``key`` — the exact planning
    statistic behind every posting-cap decision in the dedup family
    (``ngram_jaccard_capped``'s ``max_posting``, the LSH band joins,
    edit-distance blocking): candidate pairs = Σ_k c_k·(c_k−1)/2 over
    per-key counts, with the top keys' contributions and shares. Run
    it BEFORE a self-join to know whether a cap/salt is needed and
    which keys force it.

    All-integer: c·(c−1) is always even so the halving div is exact;
    shares are int64 ppm floor divs. One map-combinable count agg +
    one scalar broadcast. Returns the ``top_k`` keys by (pairs DESC,
    key) with ``(key, c, pairs, share_ppm, total_pairs, n_keys)``.
    """
    counts = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    per = counts.select(
        "k", "c", F.expr("(c * (c - 1)) div 2").alias("pairs")
    )
    tot = per.agg(
        F.sum("pairs").alias("total_pairs"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        per.orderBy(F.desc("pairs"), "k")
        .limit(top_k)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias(key),
            "c",
            "pairs",
            F.expr("(1000000 * pairs) div total_pairs").alias("share_ppm"),
            "total_pairs",
            "n_keys",
        )
        .orderBy(F.desc("pairs"), key)
    )


def grouping_skew_gini(df: DataFrame, key: str) -> DataFrame:
    """Gini coefficient of GROUP SIZES — the one-number inequality
    fingerprint next to :func:`skew_profile`'s top-k heavy hitters and
    :func:`selfjoin_profile`'s pair counts: 0 = perfectly uniform
    groups, →1 = one group holds everything. The closed form over
    sizes x_1 ≤ … ≤ x_n (ranked ascending, ties broken by key):

        ``G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)``

    reported as floor ppm. Σ i·x_i is NOT computed by ranking each
    group (a global row_number over the group frame funnels NDV(key)
    rows through one partition — corpus-scale on a high-NDV key).
    Within a run of tied sizes the rank sum is closed-form, so fold
    the group frame to its COUNT-OF-COUNTS histogram first: with m_x
    groups of size x and C_x = #groups of smaller size,

        ``Σ i·x_i = Σ_x x · (m_x·C_x + m_x(m_x+1)/2)``

    — exactly the tie-broken rank sum (equal values make the within-run
    permutation irrelevant). The only global window runs over the size
    histogram, whose row count is bounded by the number of DISTINCT
    group sizes ≤ √(2·rowcount) (d distinct sizes need ≥ d(d+1)/2
    rows): ≤ ~1.4e6 rows even for a 1e12-row table — inside the
    single-partition-comfort band regardless of key NDV. The products
    run 128-bit on both engines (decimal(38,0) ↔ HUGEINT — the
    corr_matrix idiom) because n·Σx overflows int64 at real table
    sizes, while the ppm QUOTIENT is ≤ 1e6 and lands exactly in BIGINT
    on both (verified: identical 128-bit floor quotients).

    Returns one row: ``(n_groups, total, gini_ppm)``.
    """
    counts = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("x")
    )
    D = "decimal(38,0)"
    hist = counts.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    w_lt = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "c_lt", F.coalesce(F.sum("m").over(w_lt), F.lit(0))
    )
    # m(m+1)/2 stays in pure integer arithmetic: halve whichever of
    # m, m+1 is even in BIGINT, then take the product in decimal —
    # no decimal division (which widens scale and rounds)
    tri = F.expr(
        f"CAST(CASE WHEN m % 2 = 0 THEN m div 2 ELSE m END AS {D}) * "
        f"CAST(CASE WHEN m % 2 = 0 THEN m + 1 ELSE (m + 1) div 2 END AS {D})"
    )
    run_six = F.col("x").cast(D) * (
        F.col("m").cast(D) * F.col("c_lt").cast(D) + tri
    )
    agg = ranked.agg(
        F.sum("m").alias("n_groups"),
        F.sum(F.col("x") * F.col("m")).alias("total"),
        F.sum(run_six).alias("six"),
    )
    gini = (
        f"CAST((CAST(1000000 AS {D}) * "
        f"(CAST(2 AS {D}) * six "
        f"- (CAST(n_groups AS {D}) + CAST(1 AS {D})) * CAST(total AS {D}))) "
        f"DIV (CAST(n_groups AS {D}) * CAST(total AS {D})) AS BIGINT)"
    )
    return agg.select(
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("total").cast("long").alias("total"),
        F.expr(gini).alias("gini_ppm"),
    )


def _wl_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return grouping_skew_gini(spark.table("orders"), "o_custkey")


ORACLE_GINI = """
WITH counts AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM counts),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(x) AS BIGINT) AS total,
         sum(i::HUGEINT * x::HUGEINT) AS six
  FROM ranked)
SELECT n_groups, total,
       CAST((1000000::HUGEINT
             * (2::HUGEINT * six - (n_groups::HUGEINT + 1) * total::HUGEINT))
            // (n_groups::HUGEINT * total::HUGEINT) AS BIGINT) AS gini_ppm
FROM agg"""


# shuffle advisor targets: in-memory partition budget and the skew
# share above which a key needs salting / AQE skew-join
SHUFFLE_TARGET_PARTITION_BYTES = 128 * 1024 * 1024
SHUFFLE_SKEW_TOP1_PPM = 200_000
# per-cell width model: 8 bytes for every numeric/temporal cell; string
# cells cost their measured average length + 4 (offset). Deliberately
# the UNCOMPRESSED in-memory row shape — shuffle spill sizing cares
# about the deserialized width, not the parquet-encoded one.
_FIXED_CELL_BYTES = 8


def shuffle_advisor(
    df: DataFrame,
    key: str,
    target_bytes: int = SHUFFLE_TARGET_PARTITION_BYTES,
) -> DataFrame:
    """Size the shuffle BEFORE running it — the "would this partition
    fit in executor memory at the target SF" decision as a measured
    query instead of a guess: one stats pass estimates the
    deserialized table bytes (fixed 8 B per numeric/temporal cell +
    measured average string lengths), divides by the per-partition
    budget for the recommended ``spark.sql.shuffle.partitions``, and
    profiles the shuffle key's heaviest group so the salting / AQE
    skew-join call is part of the same answer (a recommended partition
    count is useless if ONE key owns 20 % of the rows).

    Everything integer: byte estimates are exact sums, the
    recommendation is a ceiling division, the skew share is ppm.
    Plan: ONE row-level agg (string lengths) + ONE groupBy(key) for
    the skew profile + 1-row broadcast combine.

    Returns ONE row: ``(n_rows, est_bytes, target_partition_bytes,
    recommended_partitions, skew_key_top1_ppm, needs_salting)``.
    """
    str_cols = [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    other_n = len(df.schema.fields) - len(str_cols)
    row_bytes = F.lit(other_n * _FIXED_CELL_BYTES).cast("long")
    for c in str_cols:
        row_bytes = row_bytes + F.coalesce(
            F.length(F.col(c)).cast("long"), F.lit(0)
        ) + F.lit(4)
    size = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_bytes).alias("est_bytes"),
    )
    skew = (
        df.groupBy(F.col(key).alias("_k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("top1"), F.sum("c").alias("n"))
        .select(
            F.expr("top1 * 1000000 DIV n").alias("skew_key_top1_ppm")
        )
    )
    return size.crossJoin(F.broadcast(skew)).select(
        "n_rows",
        "est_bytes",
        F.lit(target_bytes).cast("long").alias("target_partition_bytes"),
        F.expr(
            f"greatest(1L, (est_bytes + {target_bytes} - 1) DIV {target_bytes})"
        ).alias("recommended_partitions"),
        "skew_key_top1_ppm",
        (F.col("skew_key_top1_ppm") > SHUFFLE_SKEW_TOP1_PPM).alias(
            "needs_salting"
        ),
    )


def _wl_shuffle_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return shuffle_advisor(spark.table("lineitem"), "l_orderkey")


# lineitem: 9 non-string cols (8 numeric + 1 timestamp) + 2 string
# cols (flag, status) — the oracle's 9 multiplier matches that count
ORACLE_SHUFFLE_ADVISOR = f"""
WITH size AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(9 * {_FIXED_CELL_BYTES}
                  + length(l_returnflag) + 4
                  + length(l_linestatus) + 4) AS BIGINT) AS est_bytes
  FROM lineitem),
skew AS (
  SELECT CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS skew_key_top1_ppm
  FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey))
SELECT n_rows, est_bytes,
       CAST({SHUFFLE_TARGET_PARTITION_BYTES} AS BIGINT)
         AS target_partition_bytes,
       CAST(greatest(1, (est_bytes + {SHUFFLE_TARGET_PARTITION_BYTES} - 1)
                        // {SHUFFLE_TARGET_PARTITION_BYTES}) AS BIGINT)
         AS recommended_partitions,
       skew_key_top1_ppm,
       skew_key_top1_ppm > {SHUFFLE_SKEW_TOP1_PPM} AS needs_salting
FROM size CROSS JOIN skew"""


# zone-map skip simulation: file/predicate grid sizes. 64 files x 16
# range predicates = a 1024-row dim-sized grid regardless of table size.
PRUNE_FILES = 64
PRUNE_PREDS = 16


def zone_map_skip_sim(
    df: DataFrame,
    layout_name: str,
    order_col,
    value_col,
    n_files: int = PRUNE_FILES,
    n_preds: int = PRUNE_PREDS,
) -> DataFrame:
    """MEASURE a candidate layout's min/max pruning power instead of
    guessing it — the missing evaluation half of
    :func:`layout_advisor` / :func:`zorder_layout` (they *choose* a
    layout; this says what a choice buys). Simulates the parquet
    zone-map mechanics end to end:

    1. rows are assigned to ``n_files`` equal-width "files" by their
       position in the layout's ordering column (pure integer
       arithmetic off the broadcast 1-row min/max — no global sort,
       no unpartitioned window);
    2. each file's zone map (min/max of ``value_col``) comes from ONE
       groupBy(file_id) — the table's only shuffle;
    3. an ``n_preds``-range predicate workload covering the value
       span is tested against every zone map (a files × preds grid,
       dim-sized) and the skipped fraction is reported.

    All arithmetic is int64 ``DIV`` so Spark and the oracle agree
    bit-exactly. Returns ONE row: ``(layout, n_files, n_preds,
    pairs_scanned, skip_ppm)`` — ``skip_ppm`` is the fraction of
    (file, predicate) reads min/max stats eliminate, the number a
    table-layout decision at 100 TB actually turns on."""
    t = df.select(
        order_col.cast("long").alias("o"), value_col.cast("long").alias("v")
    )
    b = t.agg(
        F.min("o").alias("omn"),
        F.max("o").alias("omx"),
        F.min("v").alias("vmn"),
        F.max("v").alias("vmx"),
    )
    zones = (
        t.crossJoin(F.broadcast(b))
        .select(
            F.expr(f"(o - omn) * {n_files} DIV (omx - omn + 1)").alias(
                "file_id"
            ),
            "v",
        )
        .groupBy("file_id")
        .agg(F.min("v").alias("zmn"), F.max("v").alias("zmx"))
    )
    spark = df.sparkSession
    preds = (
        spark.range(n_preds)
        .select(F.col("id").alias("p"))
        .crossJoin(F.broadcast(b))
        .select(
            F.expr(f"vmn + p * (vmx - vmn + 1) DIV {n_preds}").alias("plo"),
            F.expr(
                f"vmn + (p + 1) * (vmx - vmn + 1) DIV {n_preds} - 1"
            ).alias("phi"),
        )
    )
    hit = (F.col("zmx") >= F.col("plo")) & (F.col("zmn") <= F.col("phi"))
    return (
        zones.crossJoin(F.broadcast(preds))
        .agg(
            F.count(F.lit(1)).alias("pairs_total"),
            F.sum(hit.cast("long")).alias("scanned"),
        )
        .select(
            F.lit(layout_name).alias("layout"),
            F.lit(n_files).cast("long").alias("n_files"),
            F.lit(n_preds).cast("long").alias("n_preds"),
            F.col("scanned").cast("long").alias("pairs_scanned"),
            F.expr(
                "(pairs_total - scanned) * 1000000 DIV pairs_total"
            ).alias("skip_ppm"),
        )
    )


def _wl_pruning_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem's shipdate pruning under two write layouts: natural
    (orderkey ingestion order — shipdates land everywhere, zone maps
    are useless) vs clustered-by-shipdate (each file owns a narrow
    date band — most files skip for any date-range predicate). The
    side-by-side number is the case FOR running the re-layout."""
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    l = spark.table("lineitem").select(
        "l_orderkey",
        F.datediff(
            F.col("l_shipdate"), F.to_date(F.lit("1992-01-01"))
        ).alias("sd"),
    )
    nat = zone_map_skip_sim(l, "natural_orderkey", F.col("l_orderkey"), F.col("sd"))
    clu = zone_map_skip_sim(l, "clustered_shipdate", F.col("sd"), F.col("sd"))
    return nat.unionByName(clu).orderBy("layout")


def _pruning_oracle_layout(
    name: str,
    ord_expr: str,
    val_expr: str = "date_diff('day', DATE '1992-01-01', l_shipdate)",
) -> str:
    nf, np_ = PRUNE_FILES, PRUNE_PREDS
    return f"""
SELECT '{name}' AS layout, CAST({nf} AS BIGINT) AS n_files,
       CAST({np_} AS BIGINT) AS n_preds,
       CAST(sum(CASE WHEN zmx >= plo AND zmn <= phi THEN 1 ELSE 0 END)
            AS BIGINT) AS pairs_scanned,
       CAST((count(*) - sum(CASE WHEN zmx >= plo AND zmn <= phi
                                 THEN 1 ELSE 0 END)) * 1000000 // count(*)
            AS BIGINT) AS skip_ppm
FROM (
  WITH t AS (
    SELECT {ord_expr} AS o,
           {val_expr} AS v
    FROM lineitem),
  b AS (SELECT min(o) AS omn, max(o) AS omx,
               min(v) AS vmn, max(v) AS vmx FROM t),
  zones AS (
    SELECT (t.o - b.omn) * {nf} // (b.omx - b.omn + 1) AS file_id,
           min(t.v) AS zmn, max(t.v) AS zmx
    FROM t CROSS JOIN b GROUP BY 1),
  preds AS (
    SELECT b.vmn + pp.p * (b.vmx - b.vmn + 1) // {np_} AS plo,
           b.vmn + (pp.p + 1) * (b.vmx - b.vmn + 1) // {np_} - 1 AS phi
    FROM (SELECT unnest(range(0, {np_})) AS p) pp CROSS JOIN b)
  SELECT * FROM zones CROSS JOIN preds)"""


ORACLE_PRUNING_SIM = (
    _pruning_oracle_layout("natural_orderkey", "l_orderkey")
    + "\nUNION ALL\n"
    + _pruning_oracle_layout(
        "clustered_shipdate", "date_diff('day', DATE '1992-01-01', l_shipdate)"
    )
    + "\nORDER BY layout"
)


def _wl_pruning_sim_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2-D layout decision measured: a lexicographic sort on
    (x, y) prunes predicates on the LEADING column only; the Z-order
    interleave trades some of that for real pruning on BOTH columns.
    Four simulator rows — {lex, zorder} × {x-predicates,
    y-predicates} — make the trade quantitative (the number
    `zorder_layout` deployments are justified by)."""
    from functools import reduce as _reduce

    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    l = spark.table("lineitem").select(
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"),
    )
    lex = l.withColumn("o", F.col("x") * 256 + F.col("y"))
    zed = l.withColumn("o", zorder_key(F.col("x"), F.col("y"), 8))
    parts = [
        zone_map_skip_sim(lex, "lex_xy|pred_x", F.col("o"), F.col("x")),
        zone_map_skip_sim(lex, "lex_xy|pred_y", F.col("o"), F.col("y")),
        zone_map_skip_sim(zed, "zorder|pred_x", F.col("o"), F.col("x")),
        zone_map_skip_sim(zed, "zorder|pred_y", F.col("o"), F.col("y")),
    ]
    return _reduce(lambda a, b: a.unionByName(b), parts).orderBy("layout")


_ZX = "(l_partkey % 256)"
_ZY = "(l_suppkey % 256)"

ORACLE_PRUNING_SIM_ZORDER = (
    _pruning_oracle_layout("lex_xy|pred_x", f"{_ZX} * 256 + {_ZY}", _ZX)
    + "\nUNION ALL\n"
    + _pruning_oracle_layout("lex_xy|pred_y", f"{_ZX} * 256 + {_ZY}", _ZY)
    + "\nUNION ALL\n"
    + _pruning_oracle_layout("zorder|pred_x", zorder_sql(_ZX, _ZY, 8), _ZX)
    + "\nUNION ALL\n"
    + _pruning_oracle_layout("zorder|pred_y", zorder_sql(_ZX, _ZY, 8), _ZY)
    + "\nORDER BY layout"
)


def _wl_selfjoin_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return selfjoin_profile(spark.table("lineitem"), "l_partkey")


ORACLE_SELFJOIN_PROFILE = """
WITH counts AS (
  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1),
per AS (SELECT k, c, (c * (c - 1)) // 2 AS pairs FROM counts),
tot AS (SELECT CAST(sum(pairs) AS BIGINT) AS total_pairs,
               CAST(count(*) AS BIGINT) AS n_keys FROM per)
SELECT k AS l_partkey, c, pairs,
       CAST((1000000 * pairs) // total_pairs AS BIGINT) AS share_ppm,
       total_pairs, n_keys
FROM (SELECT * FROM per ORDER BY pairs DESC, k LIMIT 10), tot
ORDER BY pairs DESC, l_partkey"""


def _wl_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    cents = spark.table("orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents")
    )
    return equidepth_hist(cents, "price_cents")


ORACLE_EQUIDEPTH = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders),
bounds AS (
  SELECT {", ".join(
      f"percentile_disc({i / EQUIDEPTH_BUCKETS!r}) WITHIN GROUP (ORDER BY v)"
      f" AS b{i}" for i in range(1, EQUIDEPTH_BUCKETS))}
  FROM cents)
SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       min(v) AS lo, max(v) AS hi
FROM (
  SELECT CAST(1 + {" + ".join(
      f"CASE WHEN v > b{i} THEN 1 ELSE 0 END"
      for i in range(1, EQUIDEPTH_BUCKETS))} AS BIGINT) AS bucket, v
  FROM cents, bounds)
GROUP BY bucket ORDER BY bucket"""


RL_BAL_CENTS = 10_000  # account balances within $100 agree
RL_MATCH_AT = 3  # blocking survivors with score >= this are matches


def record_linkage(customer: DataFrame) -> DataFrame:
    """Record linkage / entity resolution over tabular records — the
    blocking + pairwise-agreement dataflow every MDM/dedup-of-entities
    pipeline runs, distinct from the TEXT dedup family: candidate
    pairs come only from shared BLOCKING keys (here (nation, market
    segment)), so the quadratic explosion is bounded by block size,
    never table size; survivors are scored by integer field-agreement
    weights (balance within RL_BAL_CENTS → +2, same name suffix digit
    → +1) and pairs at RL_MATCH_AT+ are declared matches.

    All-integer scoring (cents lift, char equality), so the match set
    is bit-stable; transitive closure of matches is
    :func:`~.graph.connected_components` downstream (same composition
    as the dedup clusters). A skewed block (one segment dominating a
    nation) takes the ngram-jaccard posting cap. Returns ``(cust_a,
    cust_b, score, bal_diff_cents)`` under a total order.
    """
    c = customer.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal"),
        F.substring(F.col("c_name"), -1, 1).alias("sfx"),
    )
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    diff = F.abs(F.col("a_bal") - F.col("b_bal"))
    score = (
        F.when(diff <= RL_BAL_CENTS, 2).otherwise(0)
        + F.when(F.col("a_sfx") == F.col("b_sfx"), 1).otherwise(0)
    )
    return (
        a.join(
            b,
            (F.col("a_c_nationkey") == F.col("b_c_nationkey"))
            & (F.col("a_c_mktsegment") == F.col("b_c_mktsegment"))
            & (F.col("a_c_custkey") < F.col("b_c_custkey")),
        )
        .select(
            F.col("a_c_custkey").alias("cust_a"),
            F.col("b_c_custkey").alias("cust_b"),
            score.alias("score"),
            diff.alias("bal_diff_cents"),
        )
        .where(F.col("score") >= RL_MATCH_AT)
        .orderBy("cust_a", "cust_b")
    )


def _wl_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return record_linkage(spark.table("customer"))


ORACLE_RECORD_LINKAGE = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         floor(c_acctbal * 100 + 0.5)::BIGINT AS bal,
         substr(c_name, length(c_name), 1) AS sfx
  FROM customer)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       CAST(CASE WHEN abs(a.bal - b.bal) <= {RL_BAL_CENTS} THEN 2 ELSE 0 END
            + CASE WHEN a.sfx = b.sfx THEN 1 ELSE 0 END AS INTEGER) AS score,
       CAST(abs(a.bal - b.bal) AS BIGINT) AS bal_diff_cents
FROM c a JOIN c b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE CASE WHEN abs(a.bal - b.bal) <= {RL_BAL_CENTS} THEN 2 ELSE 0 END
      + CASE WHEN a.sfx = b.sfx THEN 1 ELSE 0 END >= {RL_MATCH_AT}
ORDER BY cust_a, cust_b"""


def bitmap_index_and(
    facts: DataFrame,
    key: str,
    pred_a,
    pred_b,
) -> DataFrame:
    """Bitmap-index construction and conjunctive query — the OLAP
    engine internal (Druid/Pinot/ClickHouse-style) expressed as
    DataFrame algebra: each predicate's qualifying keys pack
    32-per-word (``word = key div 32``, ``bit = key mod 32``,
    ``mask = bit_or(1 << bit)``), and the AND query is a word-aligned
    join + bitwise ``&`` + ``bit_count`` popcount — set intersection
    at 32 keys per integer operation, never a row-level join. Packing
    stops at bit 31 because DuckDB's overflow-CHECKED shift rejects
    ``1 << 63``; a 64-per-word layout needs an unchecked-shift dialect
    on both engines (the artifact is 2× the words until then).

    The result carries the DIRECT row-level count alongside, so the
    workload attests the bitmap path against the naive one in the
    same result — equal by construction or the index build is broken.

    Scale: one groupBy(word) per predicate (map-side combinable; the
    bitmap is ~|keyspace|/32 words — the compressed standing artifact
    a real engine mmaps), one word equi-join for the AND. Returns one
    row ``(words_a, words_b, and_words, bitmap_count, direct_count)``.
    """

    def bitmap(pred):
        return (
            facts.where(pred)
            .select(
                F.expr(f"{key} div 32").alias("word"),
                F.expr(f"shiftleft(1L, cast({key} % 32 as int))").alias("m"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(m)").alias("mask"))
        )

    ba = bitmap(pred_a)
    bb = bitmap(pred_b).select(
        "word", F.col("mask").alias("mask_b")
    )
    anded = ba.join(bb, "word").select(
        "word", F.expr("mask & mask_b").alias("am")
    )
    # LAZY 1-row agg (not .count()): the workload contract returns an
    # unexecuted plan, and a literal count would snapshot the source
    # earlier than the bitmap side
    direct = facts.where(pred_a & pred_b).agg(
        F.count(F.lit(1)).alias("direct_count")
    )
    return (
        anded.agg(
            F.count(F.lit(1)).alias("and_words"),
            F.sum(F.expr("bit_count(am)")).alias("bitmap_count"),
        )
        .crossJoin(
            ba.agg(F.count(F.lit(1)).alias("words_a")).crossJoin(
                bb.agg(F.count(F.lit(1)).alias("words_b"))
            )
        )
        .crossJoin(direct)
        .select(
            "words_a",
            "words_b",
            "and_words",
            "bitmap_count",
            "direct_count",
        )
    )


def _wl_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    o = spark.table("orders")
    return bitmap_index_and(
        o,
        "o_orderkey",
        F.col("o_orderstatus") == "F",
        F.col("o_orderpriority") == "1-URGENT",
    )


ORACLE_BITMAP = """
WITH ba AS (
  SELECT o_orderkey // 32 AS word,
         bit_or(1::BIGINT << CAST(o_orderkey % 32 AS INTEGER)) AS mask
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
bb AS (
  SELECT o_orderkey // 32 AS word,
         bit_or(1::BIGINT << CAST(o_orderkey % 32 AS INTEGER)) AS mask_b
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
anded AS (
  SELECT ba.word, ba.mask & bb.mask_b AS am
  FROM ba JOIN bb USING (word)),
direct AS (
  SELECT CAST(count(*) AS BIGINT) AS direct_count FROM orders
  WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT')
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ba) AS words_a,
       (SELECT CAST(count(*) AS BIGINT) FROM bb) AS words_b,
       CAST(count(*) AS BIGINT) AS and_words,
       CAST(sum(bit_count(am)) AS BIGINT) AS bitmap_count,
       (SELECT direct_count FROM direct) AS direct_count
FROM anded"""


KANON_K = 5  # groups smaller than this violate k-anonymity
KANON_TOP = 10  # worst (smallest) groups reported


def k_anonymity_audit(customer: DataFrame) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the privacy
    check a release pipeline runs before publishing "de-identified"
    records: any QI group with fewer than k members re-identifies its
    members by intersection with outside knowledge. QI here =
    (nation, market segment, $1000 balance band); one map-combinable
    groupBy, then the worst (smallest) groups under a total order
    with the per-group violation verdict.

    Scale: the audit is ONE aggregation — group count is bounded by
    the QI domain product, not the table; generalization loops
    (coarsen the band until k holds) re-run the same agg per rung.
    Returns the KANON_TOP smallest groups as ``(c_nationkey,
    c_mktsegment, bal_band, group_n, violates)``.
    """
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    groups = (
        customer.select("c_nationkey", "c_mktsegment", band.alias("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("group_n"))
    )
    return (
        groups.select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "group_n",
            (F.col("group_n") < KANON_K).cast("int").alias("violates"),
        )
        .orderBy("group_n", "c_nationkey", "c_mktsegment", "bal_band")
        .limit(KANON_TOP)
    )


def _wl_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return k_anonymity_audit(spark.table("customer"))


ORACLE_KANON = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(count(*) AS BIGINT) AS group_n
  FROM customer GROUP BY 1, 2, 3)
SELECT c_nationkey, c_mktsegment, bal_band, group_n,
       CAST(CASE WHEN group_n < {KANON_K} THEN 1 ELSE 0 END AS INTEGER)
         AS violates
FROM groups
ORDER BY group_n, c_nationkey, c_mktsegment, bal_band
LIMIT {KANON_TOP}"""


def ab_ztest(
    events: DataFrame,
    unit: str = "user_id",
    success_type: str = "purchase",
) -> DataFrame:
    """Two-proportion z-test — the experimentation-platform readout:
    units split into arms by a deterministic function of the unit id
    (the same never-reassigns property as :func:`sampling.hash_split`,
    so late-arriving events land in the same arm), per-arm conversion
    = the unit emitted MORE ``success_type`` events than error events
    (a rate-independent criterion, so the test is well-posed at every
    SF — "ever purchased" saturates to 100% on a dense corpus and
    zeroes the pooled variance), and the pooled z statistic decides
    significance.

    Determinism: counts are exact ints; the z formula is a fixed
    chain of IEEE ops on them (sqrt is 754-exact), floor-quantized at
    6 dp before the 1.96 comparison — same protocol as
    :func:`timeseries.mann_kendall`. Two map-combinable aggs (per-unit
    conversion, per-arm rollup); the test itself is a 2-row frame.

    Returns ONE row ``(n_a, conv_a, n_b, conv_b, z, significant)``.
    """
    per_unit = (
        events.groupBy(unit)
        .agg(
            F.sum((F.col("event_type") == success_type).cast("int")).alias(
                "n_s"
            ),
            F.sum((F.col("event_type") == "error").cast("int")).alias("n_e"),
        )
        .select(
            (F.col(unit) % 2 == 0).cast("int").alias("arm"),
            (F.col("n_s") > F.col("n_e")).cast("int").alias("conv"),
        )
    )
    arms = per_unit.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    a = arms.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a")
    )
    b = arms.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b")
    )
    j = a.crossJoin(b)
    p1 = F.col("conv_a") / F.col("n_a")
    p2 = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    z = (p1 - p2) / F.sqrt(
        pp * (1 - pp) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    z6 = F.floor(z * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000.0)
    return j.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        z6.alias("z"),
        (F.abs(z6) > 1.96).cast("int").alias("significant"),
    )


def _wl_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return ab_ztest(spark.table("events"))


ORACLE_AB_ZTEST = """
WITH per_unit AS (
  SELECT CAST(user_id % 2 = 0 AS INTEGER) AS arm,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              > sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS INTEGER) AS conv
  FROM events GROUP BY user_id),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
  FROM per_unit GROUP BY arm),
j AS (
  SELECT a.n AS n_a, a.c AS conv_a, b.n AS n_b, b.c AS conv_b
  FROM (SELECT n, c FROM arms WHERE arm = 0) a,
       (SELECT n, c FROM arms WHERE arm = 1) b),
z AS (
  SELECT n_a, conv_a, n_b, conv_b,
         floor((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
               / sqrt((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)
                      * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / n_a + 1.0 / n_b))
               * 1000000 + 0.5) / 1000000.0 AS z
  FROM j)
SELECT n_a, conv_a, n_b, conv_b, z,
       CAST(abs(z) > 1.96 AS INTEGER) AS significant
FROM z"""


SLO_BUDGET_PPM = 220_000  # error budget: 22% of events may be errors
SLO_TOP = 20


def slo_burn_rate(events: DataFrame) -> DataFrame:
    """SLO burn-rate readout — the SRE paging signal: per hour, the
    error fraction relative to the error budget (``burn = err_rate /
    budget``; burn 1e6 ppm = consuming budget exactly at the sustain
    rate, >1e6 = burning toward exhaustion). Multi-window burn alerts
    compose this same frame at two widths; here the audit reports the
    worst hours.

    Integer end to end: err and total counts per hour, burn_ppm =
    ``err·1e12 div (total·budget_ppm)`` — one integral division, no
    float near the paging threshold. One map-combinable groupBy(hour);
    output is the SLO_TOP worst hours under a total order.

    Returns ``(hour_epoch, n_events, n_errors, burn_ppm, paging)``.
    """
    hour = F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
    hourly = (
        events.select(
            hour.alias("hour_epoch"),
            (F.col("event_type") == "error").cast("int").alias("is_err"),
        )
        .groupBy("hour_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_err").alias("n_errors"),
        )
    )
    burn = F.expr(
        f"n_errors * 1000000000000L div (n_events * {SLO_BUDGET_PPM}L)"
    )
    return (
        hourly.select(
            "hour_epoch",
            "n_events",
            "n_errors",
            burn.alias("burn_ppm"),
            (burn > 1_000_000).cast("int").alias("paging"),
        )
        .orderBy(F.desc("burn_ppm"), "hour_epoch")
        .limit(SLO_TOP)
    )


def _wl_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return slo_burn_rate(spark.table("events"))


ORACLE_SLO_BURN = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_epoch,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1)
SELECT hour_epoch, n_events, n_errors,
       CAST(n_errors * 1000000000000 // (n_events * {SLO_BUDGET_PPM})
            AS BIGINT) AS burn_ppm,
       CAST(n_errors * 1000000000000 // (n_events * {SLO_BUDGET_PPM})
            > 1000000 AS INTEGER) AS paging
FROM hourly
ORDER BY burn_ppm DESC, hour_epoch
LIMIT {SLO_TOP}"""


def scale_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload("ops_salted_join", _wl_salted_join, ORACLE_SALTED_JOIN),
        Workload("ops_salted_distinct", _wl_salted_distinct, ORACLE_SALTED_DISTINCT),
        Workload("ops_zorder_key", _wl_zorder_key, ORACLE_ZORDER_KEY),
        Workload("ops_hilbert_key", _wl_hilbert_key, ORACLE_HILBERT_KEY),
        Workload("ops_skew_profile", _wl_skew_profile, ORACLE_SKEW_PROFILE),
        Workload("ops_column_stats", _wl_column_stats, ORACLE_COLUMN_STATS),
        Workload("ops_corr_matrix", _wl_corr_matrix, ORACLE_CORR_MATRIX),
        Workload(
            "ops_compaction_plan", _wl_compaction_plan, ORACLE_COMPACTION_PLAN
        ),
        Workload(
            "ops_bloom_prefilter", _wl_bloom_prefilter, ORACLE_BLOOM_PREFILTER
        ),
        Workload(
            "ops_layout_advisor", _wl_layout_advisor, ORACLE_LAYOUT_ADVISOR
        ),
        Workload("ops_countmin_est", _wl_countmin, ORACLE_COUNTMIN),
        Workload("ops_distribution_drift", _wl_drift, ORACLE_DRIFT),
        Workload("ops_hll_distinct", _wl_hll, ORACLE_HLL),
        Workload("ops_kmv_distinct", _wl_kmv, ORACLE_KMV),
        Workload("ops_kmv_setops", _wl_kmv_setops, ORACLE_KMV_SETOPS),
        Workload("ops_equidepth_hist", _wl_equidepth, ORACLE_EQUIDEPTH),
        Workload(
            "ops_selfjoin_profile", _wl_selfjoin_profile, ORACLE_SELFJOIN_PROFILE
        ),
        Workload("ops_gini_skew", _wl_gini, ORACLE_GINI),
        Workload("ops_pruning_sim", _wl_pruning_sim, ORACLE_PRUNING_SIM),
        Workload(
            "ops_shuffle_advisor", _wl_shuffle_advisor, ORACLE_SHUFFLE_ADVISOR
        ),
        Workload(
            "ops_pruning_sim_zorder",
            _wl_pruning_sim_zorder,
            ORACLE_PRUNING_SIM_ZORDER,
        ),
        Workload(
            "ops_record_linkage", _wl_record_linkage, ORACLE_RECORD_LINKAGE
        ),
        Workload("ops_bitmap_index", _wl_bitmap, ORACLE_BITMAP),
        Workload("ops_k_anonymity", _wl_kanon, ORACLE_KANON),
        Workload("ops_ab_ztest", _wl_ab_ztest, ORACLE_AB_ZTEST),
        Workload("ops_slo_burn_rate", _wl_slo_burn, ORACLE_SLO_BURN),
    ]
