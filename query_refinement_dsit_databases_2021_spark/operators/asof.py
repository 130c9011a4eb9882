"""As-of (most-recent-match) join — a temporal join the reference
lacks entirely (SURVEY §2.3 notes as-of joins absent) but any
time-series / training-data pipeline needs: for every left row, the
single right row with the greatest timestamp <= the left timestamp
(direction="backward") or the smallest timestamp >= it ("forward"),
within the same `by` group.

Spark-first formulation: **union + ordered window**, not a join.
A naive range join is O(|L| x |R|) per group before the per-row
argmax; the sort-merge formulation below is the classic scalable
as-of pattern:

1. tag right rows (side=0) and left rows (side=1) and union them;
2. one shuffle: ``Window.partitionBy(by).orderBy(ts, side, seq)``;
3. ``last(right_payload, ignoreNulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries the most
   recent right row forward onto each left row.

Cost: ONE shuffle of |L|+|R| rows on the group key (exactly what a
sort-merge equi-join would pay), no candidate blow-up, no skew from
wide time ranges. At 100 TB the window runs per user/group partition;
right-side rows at equal ts sort before left rows (side 0 < 1), so
the boundary timestamp is matched inclusively — same contract as
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``, which the workload oracle
uses. Forward direction mirrors the frame
(``first(...) over following``) with left rows sorting before right
rows at equal ts.

Determinism: among right rows tied on (group, ts) the one with the
largest tie-break key wins (``seq`` orders the frame); left rows with
no admissible right row keep NULL payloads (left-outer contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SENTINEL = "__asof"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    tie_break: str | None = None,
) -> DataFrame:
    """Left-outer as-of join: every `left` row, plus `value_cols`
    from the nearest `right` row at-or-before (backward) /
    at-or-after (forward) its `ts` within the same `by` group.

    Matched columns are suffixed ``_matched``. ``tie_break`` (a right
    column, default the first value col) resolves right rows tied on
    (by, ts): largest wins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    value_cols = list(value_cols)
    tie = tie_break or value_cols[0]

    payload = F.struct(
        F.col(tie).alias("__tie"), *[F.col(c).alias(c) for c in value_cols]
    )
    # side orders boundary ties: the right row must fall inside the
    # frame when timestamps are equal (inclusive match on both
    # directions), so right<left for backward, left<right for forward.
    r_side, l_side = (0, 1) if direction == "backward" else (1, 0)
    r = right.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        payload.alias(_SENTINEL),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(r.schema[_SENTINEL].dataType).alias(_SENTINEL),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    tie_col = F.col(f"{_SENTINEL}.__tie")
    w = Window.partitionBy(*by).orderBy(
        F.col("__ts").asc(),
        F.col("__side").asc(),
        # largest tie-break wins in both directions: last() scans the
        # frame forward (asc puts the largest last), first() backward
        tie_col.asc() if direction == "backward" else tie_col.desc(),
    )
    if direction == "backward":
        carried = F.last(_SENTINEL, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        carried = F.first(_SENTINEL, ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    out = (
        r.unionByName(l)
        .withColumn("__m", carried)
        .where(F.col("__side") == l_side)
    )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"{c}_matched") for c in value_cols],
    )


# ---------------------------------------------------------------------------
# Workload: each 'error' event joined to the user's most recent
# 'click' at-or-before it (events table; left-outer, gap in seconds)
# ---------------------------------------------------------------------------


def _wl_asof(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    # events.ts arrives as TIMESTAMP or TIMESTAMP_NTZ depending on how
    # the parquet was written (nanos-as-long conversion vs native
    # micros). unix_micros below requires LTZ; the NTZ->LTZ cast shifts
    # both sides by the same session-tz offset, which cancels in the
    # gap subtraction, so the cast is safe for any session timezone.
    ev = spark.table("events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    joined = asof_join(
        errors,
        clicks,
        ts="ts",
        by=["user_id"],
        value_cols=["click_id", "value", "ts"],
        direction="backward",
        tie_break="click_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("click_id_matched").alias("click_id"),
        F.round("value_matched", 2).alias("click_value"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_matched")))
        .alias("gap_us"),
    )


ASOF_ORACLE = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
clicks AS (
  SELECT user_id, ts, event_id AS click_id, value FROM events
  WHERE event_type = 'click')
SELECT e.event_id, e.user_id, c.click_id,
       round(c.value, 2) AS click_value,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM errors e ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


# ops_range_bucket_join: clicks landing inside a 2-hour window after
# each error event of the same user — a point-in-interval join with a
# 45-minute bucket (every interval spans 3-4 buckets, exercising the
# multi-bucket explode).
RANGE_WINDOW_US = 2 * 3600 * 1_000_000
RANGE_BUCKET_US = 45 * 60 * 1_000_000

RANGE_ORACLE = f"""
WITH clicks AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts
  FROM events WHERE event_type = 'click'),
wins AS (
  SELECT event_id AS error_id, user_id, epoch_us(ts) AS start,
         epoch_us(ts) + {RANGE_WINDOW_US} AS "end"
  FROM events WHERE event_type = 'error')
SELECT c.click_id, c.user_id, w.error_id,
       CAST(c.ts - w.start AS BIGINT) AS offset_us
FROM clicks c JOIN wins w
  ON c.user_id = w.user_id AND c.ts BETWEEN w.start AND w."end"
ORDER BY click_id, error_id"""


def _wl_range_bucket(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events").withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts"),
    )
    wins = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("start"),
        (F.unix_micros(F.col("ts")) + RANGE_WINDOW_US).alias("end"),
    )
    joined = range_bucket_join(
        clicks, wins, by=["user_id"], bucket_width=RANGE_BUCKET_US
    )
    return (
        joined.select(
            "click_id",
            "user_id",
            "error_id",
            (F.col("ts") - F.col("start")).alias("offset_us"),
        )
        .orderBy("click_id", "error_id")
    )


def _wl_asof_forward(spark, sf_dir):
    """Forward as-of: each error's NEXT purchase by the same user —
    the error-to-conversion recovery lag. Exercises the operator's
    ``direction="forward"`` leg (only backward was gated before).
    The oracle uses an explicit fully-tie-broken row_number window
    rather than DuckDB's ASOF JOIN, per the repo's deterministic
    argmax convention (ASOF's pick between equal timestamps is
    engine-defined)."""
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events").withColumn("ts", F.col("ts").cast("timestamp"))
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = asof_join(
        errors,
        purchases,
        ts="ts",
        by=["user_id"],
        value_cols=["purchase_id", "ts"],
        direction="forward",
        tie_break="purchase_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("purchase_id_matched").alias("purchase_id"),
        (F.unix_micros(F.col("ts_matched")) - F.unix_micros(F.col("ts")))
        .alias("lag_us"),
    )


ASOF_FORWARD_ORACLE = """
WITH errors AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts FROM events
  WHERE event_type = 'error'),
purchases AS (
  SELECT user_id, epoch_us(ts) AS ts, event_id AS purchase_id FROM events
  WHERE event_type = 'purchase'),
ranked AS (
  SELECT e.event_id, e.user_id, p.purchase_id, p.ts - e.ts AS lag_us,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY p.ts, p.purchase_id) AS rn
  FROM errors e JOIN purchases p
    ON p.user_id = e.user_id AND p.ts >= e.ts)
SELECT e.event_id, e.user_id, r.purchase_id, r.lag_us
FROM errors e LEFT JOIN ranked r
  ON r.event_id = e.event_id AND r.rn = 1
ORDER BY e.event_id"""


def asof_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload("ops_asof_join", _wl_asof, ASOF_ORACLE, headline=False),
        Workload(
            "ops_asof_forward", _wl_asof_forward, ASOF_FORWARD_ORACLE,
            headline=False,
        ),
        Workload(
            "ops_range_bucket_join", _wl_range_bucket, RANGE_ORACLE, headline=False
        ),
    ]


def range_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_width: int = 1,
) -> DataFrame:
    """Point-in-interval join (the TSDB/range-join staple Spark has no
    native band-join optimization for), as a composition of existing
    ops: each interval EXPLODES to the buckets it covers
    (floor(start/w)..floor(end/w)), each point maps to exactly ONE
    bucket (floor(ts/w)), and an EQUI-join on (by..., bucket) plus the
    exact ``start <= ts <= end`` filter yields every containment pair —
    at most once per pair, because an interval covers the point's
    bucket exactly once, so no post-join dedup.

    Why not the naive theta join: a range predicate alone gives
    BroadcastNestedLoopJoin (|points| x |intervals| comparisons). The
    bucketed form is shuffle-partitionable and AQE-skew-splittable;
    work is |points| + sum(interval_len / w) bucket rows, with
    ``bucket_width`` trading interval duplication (small w) against
    per-bucket fanout (large w) — size it near the median interval
    length (SCALE.md). ``ts``/``start``/``end`` are integer columns
    (e.g. unix micros); inclusive on both ends.
    """
    bw = int(bucket_width)
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bw).cast("long"),
                F.floor(F.col(end) / bw).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_bucket", F.floor(F.col(ts) / bw).cast("long"))
    cond = [pts[c] == ivals[c] for c in by] + [pts["_bucket"] == ivals["_bucket"]]
    out = (
        pts.join(ivals, cond)
        .where((pts[ts] >= ivals[start]) & (pts[ts] <= ivals[end]))
        .drop(ivals["_bucket"])
        .drop(pts["_bucket"])
    )
    for c in by:
        out = out.drop(ivals[c])
    return out
