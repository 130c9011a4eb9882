"""Structured Streaming extension (SURVEY.md §2.10 / §7.4).

The reference is purely batch; these operators extend the engine to
unbounded event streams with the standard Spark semantics:

- event-time tumbling / sliding window aggregation with a watermark
  bounding state and admitting late data up to the bound;
- session windows (gap-based grouping per key);
- a custom stateful operator via ``applyInPandasWithState`` (per-key
  running aggregates with timeout-based state expiry) — the escape
  hatch for semantics the built-in windows can't express.

All transformations are source-agnostic: they take any streaming (or
batch — the plans are identical) DataFrame with ``(ts, event_type,
user_id, value)``. Tests drive them through a file source and a
memory sink and cross-check against the equivalent batch aggregation
on the same files, which IS the correctness contract for Structured
Streaming's incremental execution.

Scale notes: windowed aggregation state is partitioned by (window,
key) across executors; the watermark bounds state size; per-key
skew in ``applyInPandasWithState`` follows the key partitioning, so
hot keys should be pre-salted upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of events parquet — the
    test/dev source; swap for kafka/rate in production, the
    downstream plans are identical."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_rollup(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed aggregation per event_type: count and
    value sum per (window, type). ``slide`` < ``window`` makes it a
    sliding window; the watermark admits data up to that much late
    and lets Spark drop completed window state."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "15 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. State per open session, bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("mx", DoubleType())]
)
RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_so_far", LongType()),
        StructField("max_value", DoubleType()),
    ]
)


def running_max_by_type(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful operator: per event_type, emit the running
    event count and max value after each micro-batch — the
    ``applyInPandasWithState`` pattern for aggregates the built-in
    windows can't express (here: cross-batch running extremes with
    optional processing-time state expiry)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_so_far": [n], "max_value": [mx]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream event-time interval join: pair each left event
    with right events of the same user arriving within ``max_lag``
    after it. Both sides carry a watermark so Spark can bound the
    join state (left rows are evicted once the right watermark
    passes ``ts + max_lag``; the retention window is derived from
    the time-range condition). Inner joins emit eagerly on match,
    so append mode needs no window close. Works identically on
    batch inputs (watermark is a no-op there).

    State scales with events per user inside the lag window per
    partition — the join shuffles both sides by ``user_id``, so hot
    users should be pre-salted upstream if skewed."""
    c = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("left_user"),
        F.col("ts").alias("left_ts"),
    )
    p = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("right_id"),
        "user_id",
        F.col("ts").alias("right_ts"),
    )
    cond = (
        (F.col("left_user") == F.col("user_id"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") < F.col("left_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return c.join(p, cond, "inner").select("left_id", "right_id", "user_id")


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the conversion-
    accounting form of :func:`interval_join`: every left event emits,
    paired with each in-window right event or null-padded if none
    arrives. In streaming, the null-padded row can only be emitted
    once the right watermark passes ``left_ts + max_lag`` (the engine
    must prove no match can still arrive), so unmatched results trail
    by the lag + watermark delay — the price of a correct "never
    converted" verdict on an unbounded stream. Batch input gives the
    same rows eagerly (the oracle's form).

    State/shuffle shape is identical to the inner form (hash on
    user_id, watermark-bounded state); ``converted`` is an int flag so
    downstream rollups are map-combinable sums."""
    c = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("left_user"),
        F.col("ts").alias("left_ts"),
    )
    p = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("right_id"),
        "user_id",
        F.col("ts").alias("right_ts"),
    )
    cond = (
        (F.col("left_user") == F.col("user_id"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") < F.col("left_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return c.join(p, cond, "left_outer").select(
        "left_id",
        F.col("left_user").alias("user_id"),
        "right_id",
        F.col("right_id").isNotNull().cast("int").alias("converted"),
    )


def windowed_uniques(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Distinct users per tumbling window — the DAU/WAU-style rollup.
    Streaming engines cannot run COUNT(DISTINCT) directly (distinct
    aggregation needs unbounded per-group state); the standard shape
    is dedup-then-count: watermarked ``dropDuplicates`` on
    ``(window_start, user_id)`` (state bounded by the watermark)
    feeding an ordinary windowed count. Batch input produces the same
    rows eagerly, which is what the oracle checks.

    Shuffle shape: the dedup and the count hash on the same
    (window_start[, user]) keys — two map-combinable exchanges, state
    bounded by uniques-per-window inside the watermark horizon.
    Returns ``(window_start, n_users)``.
    """
    wstart = F.window(F.col("ts"), window).start
    keyed = events.withWatermark("ts", watermark).select(
        wstart.alias("window_start"), "user_id", "ts"
    )
    deduped = keyed.dropDuplicates(["window_start", "user_id"])
    return deduped.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_users")
    )


ORACLE_WINDOWED_UNIQUES = """
SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY 1"""


def _wl_windowed_uniques(spark, sf_dir):
    return windowed_uniques(_events(spark, sf_dir)).orderBy("window_start")


def trending_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event counts per type — the streamable half of a
    trending-topics query. Each event lands in ``window/slide``
    overlapping windows; with the watermark, completed windows emit in
    append mode and their state is dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def rank_topk_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank the top-``k`` types inside each closed window, fully
    tie-broken (n desc, type asc) so the k-set is deterministic.

    A global rank over a streaming aggregate is not expressible in
    append mode (the rank could change until the window closes), so in
    a live pipeline this step runs per micro-batch in ``foreachBatch``
    over the CLOSED windows the upstream watermark emits — at which
    point it is exactly this batch plan. The unified batch/stream test
    asserts that equivalence."""
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.col("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("window_start", "window_end", "event_type", "n", "rk")
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "35 days",
) -> DataFrame:
    """Streaming deduplication with bounded state: first event per
    key is emitted, later duplicates are dropped while the key's
    state lives; state is reclaimed once the watermark passes its
    first-seen timestamp plus the delay. With a delay covering the
    whole input span this equals batch ``dropDuplicates`` on the
    keys — the equivalence the tests assert. Streaming-only API
    (batch raises); the batch analogue for oracles is a plain
    key-projection + dropDuplicates."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


# ---------------------------------------------------------------------------
# Batch-analogue workloads: Spark's unified model runs the SAME plans
# on batch input, so the driver's DuckDB oracle can check the window
# semantics (the incremental/streaming execution is covered by
# tests/test_streaming.py against these same batch results).
# ---------------------------------------------------------------------------

ORACLE_WINDOWED_ROLLUP = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
           AS window_end,
       event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3"""

# gaps-and-islands transliteration of session_window: a new session
# starts when the event is >= gap after the previous one (Spark merges
# strictly-before-end events); session end = last event + gap
ORACLE_SESSIONIZED = """
WITH o AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events),
g AS (
  SELECT user_id, ts, value,
         sum(CASE WHEN prev IS NULL OR ts >= prev + INTERVAL '15 minutes'
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '15 minutes' AS session_end,
       user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM g GROUP BY user_id, sid"""


# batch analogue of interval_join (click -> purchase within 2 h); the
# DuckDB self-join states the identical time-range condition
ORACLE_INTERVAL_JOIN = """
SELECT c.event_id AS left_id, p.event_id AS right_id, c.user_id
FROM events c
JOIN events p ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '2 hours'
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY left_id, right_id"""

# left-outer interval join: each click with its in-window purchases,
# or one null-padded row if none. Cross-engine NULL ordering is safe
# because a left_id group is either all-non-null or a single null row —
# NULLS FIRST/LAST never reorders within a group.
ORACLE_INTERVAL_JOIN_OUTER = """
SELECT c.event_id AS left_id, c.user_id, p.event_id AS right_id,
       (p.event_id IS NOT NULL)::INT AS converted
FROM events c
LEFT JOIN events p ON c.user_id = p.user_id AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '2 hours'
WHERE c.event_type = 'click'
ORDER BY left_id, right_id"""

# batch analogue of dedup_within_watermark with a span-covering delay:
# the surviving key set is exactly DISTINCT over the keys
ORACLE_DEDUP_KEYS = """
SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type"""

# sliding 10-min/5-min windows: every event belongs to exactly two
# epoch-aligned starts — time_bucket(5min) and that minus 5min — the
# same assignment Spark's window(ts, 10m, 5m) expansion makes
ORACLE_TRENDING_TOPK = """
WITH e AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts)
           - i * INTERVAL '5 minutes' AS window_start,
         event_type
  FROM events, unnest([0, 1]) u(i)),
c AS (
  SELECT window_start, event_type, count(*) AS n
  FROM e GROUP BY window_start, event_type),
r AS (
  SELECT window_start, window_start + INTERVAL '10 minutes' AS window_end,
         event_type, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type) AS rk
  FROM c)
SELECT window_start, window_end, event_type, n, CAST(rk AS INTEGER) AS rk
FROM r WHERE rk <= 3 ORDER BY window_start, rk"""


def _events(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return spark.table("events")


def _wl_windowed_rollup(spark, sf_dir):
    return windowed_rollup(_events(spark, sf_dir))


def _wl_sessionized(spark, sf_dir):
    return sessionized(_events(spark, sf_dir))


def _wl_interval_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return interval_join(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'purchase'"),
        max_lag="2 hours",
    ).orderBy("left_id", "right_id")


def _wl_interval_join_outer(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return interval_join_outer(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'purchase'"),
        max_lag="2 hours",
    ).orderBy("left_id", "right_id")


def enrich_with_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: every micro-batch equi-joins the
    (unbounded) stream against a bounded dimension table — no state, no
    watermark needed; Spark broadcasts the static side per batch. The
    standard lookup/enrichment pattern (type metadata, customer dims);
    works identically on batch input, which is what the oracle checks.

    At scale the dim is refreshed by re-reading its table per trigger
    (Delta/parquet static sides re-resolve files each batch), so
    enrichment follows slowly-changing dims without restarting the
    query."""
    return events.join(F.broadcast(dim), "event_type").select(
        "event_id", "event_type", "type_share_pct", "value"
    )


def type_share_dim(events_batch: DataFrame) -> DataFrame:
    """A bounded dimension derived from a batch snapshot: per type, its
    integer share of events in parts-per-hundred (exact integer
    arithmetic — the enrichment value the oracle recomputes)."""
    total = events_batch.count()
    return (
        events_batch.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            F.floor(F.col("n") * 100 / F.lit(total)).cast("long").alias(
                "type_share_pct"
            ),
        )
    )


ORACLE_ENRICH_STATIC = """
WITH dim AS (
  SELECT event_type,
         CAST(floor(count(*) * 100 / (SELECT count(*) FROM events)) AS BIGINT)
           AS type_share_pct
  FROM events GROUP BY event_type)
SELECT event_id, event_type, type_share_pct, value
FROM events JOIN dim USING (event_type) ORDER BY event_id"""


def _wl_enrich_static(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return enrich_with_static(ev, type_share_dim(ev))


def _wl_trending_topk(spark, sf_dir):
    # unified batch/stream model: the identical plan (counts + the
    # foreachBatch-side rank) evaluated on the batch view
    return rank_topk_per_window(trending_counts(_events(spark, sf_dir)))


def _wl_dedup_keys(spark, sf_dir):
    # batch path: dropDuplicatesWithinWatermark is streaming-only, and
    # with the span-covering delay used here its key set equals plain
    # dropDuplicates (test_streaming.py asserts that equivalence)
    return (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates()
        .orderBy("user_id", "event_type")
    )


def lateness_profile(events: DataFrame) -> DataFrame:
    """Per-key event-time lateness audit — the observability query that
    tunes ``withWatermark``: for each key, how far behind its own
    event-time high-water-mark do events arrive?

    Arrival order is the ``event_id`` sequence (the ingestion log's
    offset); an event is LATE when its event time is behind the
    maximum event time the key has already seen. Lateness is measured
    in exact epoch-µs int64 arithmetic, aggregated per ``event_type``:
    ``(event_type, n, n_late, max_late_us, sum_late_us)`` — pick the
    watermark delay as the tail of ``max_late_us`` across types.

    One window sort per key partition (user_id) ordered by arrival;
    the running max carries a single int64. At 100 TB the sort
    parallelism follows key cardinality exactly like
    ``anomaly_zscore``; a global (un-keyed) watermark profile instead
    aggregates these per-key marks — never a global sort.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_late = events.select(
        "event_type",
        F.greatest(
            F.lit(0), F.coalesce(F.max(us).over(w), F.lit(0)) - us
        ).alias("late_us"),
    )
    return (
        with_late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("late_us") > 0).cast("long")).alias("n_late"),
            F.max("late_us").alias("max_late_us"),
            F.sum("late_us").alias("sum_late_us"),
        )
        .orderBy("event_type")
    )


ORACLE_LATENESS = """
WITH marked AS (
  SELECT event_type,
         greatest(0, coalesce(max(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           - epoch_us(ts)) AS late_us
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(max(late_us) AS BIGINT) AS max_late_us,
       CAST(sum(late_us) AS BIGINT) AS sum_late_us
FROM marked GROUP BY event_type ORDER BY event_type"""


def _wl_lateness_profile(spark, sf_dir):
    return lateness_profile(_events(spark, sf_dir))


CDC_BATCH_WEEK_US = 7 * 86_400 * 1_000_000


def cdc_apply_fold(events: DataFrame) -> DataFrame:
    """Streaming CDC apply: the state evolution a ``foreachBatch``
    merge sink produces — micro-batches are consecutive EVENT-TIME
    weeks, each applied into the running snapshot with
    :func:`cdc.merge_upsert` (the same function a production
    ``writeStream.foreachBatch(lambda b, _: merge_upsert(state, b))``
    sink calls per trigger). Because the week partition is a global
    time order, a later batch's rows are strictly newer per key, so
    the fold's "updates replace base" rule composes to exactly
    latest-per-key overall — the exactly-once merge invariant
    ``apply(batches) ≡ recompute(all)`` that the one-shot DuckDB
    oracle certifies externally.

    Plan per batch: one window over the (small) batch + one left-anti
    join against the state keyed on user_id — with the state table
    bucketed by key the anti join is exchange-free on its side
    (cdc.merge_upsert docstring); ``localCheckpoint`` truncates the
    fold lineage exactly as the iterative graph ops do. The distinct
    week list is a bounded plan-time collect (one row per micro-batch
    boundary, ~weeks of history — never data-sized).

    Returns the final snapshot ``(user_id, ts, value)`` by user_id.
    """
    from query_refinement_dsit_databases_2021_spark.operators.cdc import (
        merge_upsert,
    )

    wk = F.expr(
        f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {CDC_BATCH_WEEK_US}"
    )
    ev = events.select("user_id", "ts", "value", "event_id", wk.alias("_wk"))
    weeks = sorted(r["_wk"] for r in ev.select("_wk").distinct().collect())
    state = ev.select("user_id", "ts", "value").limit(0)
    for w_ in weeks:
        batch = ev.where(F.col("_wk") == w_).select(
            "user_id", "ts", "value", "event_id"
        )
        state = merge_upsert(state, batch).localCheckpoint()
    return state.orderBy("user_id")


ORACLE_CDC_APPLY = """
SELECT user_id, ts, value FROM (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 ORDER BY user_id"""


def _wl_cdc_apply(spark, sf_dir):
    return cdc_apply_fold(_events(spark, sf_dir))


ALERT_Z10 = 20  # 2.0 sigma, in tenths
ALERT_WINDOW = "10 minutes"  # shared by engine AND oracle (advice r06)


def type_baseline(
    history: DataFrame, window: str = ALERT_WINDOW, z10: int = ALERT_Z10
) -> DataFrame:
    """Static per-type alert thresholds from a HISTORY table: the mean
    and deviation of per-window cent totals, threshold =
    mean + (z10/10)·σ. Integer-exact: totals are cents, the variance
    numerator is the n·Σx²−S² closed form (int64), and σ enters
    through ``floor(sqrt(int))`` — IEEE-754 sqrt is correctly rounded,
    so the floor is bit-stable across engines. Returns
    ``(event_type, thr_cents)`` — a dim-sized frame."""
    win = F.window("ts", window)
    totals = (
        history.groupBy(win.alias("w"), "event_type")
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("c")
        )
    )
    return (
        totals.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.expr("c * c")).alias("ss"),
        )
        .select(
            "event_type",
            F.expr(
                f"s DIV n + ({z10} * CAST(floor(sqrt(n * ss - s * s)) AS BIGINT))"
                f" DIV (10 * n)"
            ).alias("thr_cents"),
        )
    )


def windowed_alerts(
    events: DataFrame,
    baseline: DataFrame,
    window: str = ALERT_WINDOW,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming windowed anomaly alerts: per (event-time window,
    type) cent totals, joined against the STATIC per-type thresholds
    of :func:`type_baseline` — the alerting composition of
    :func:`windowed_rollup` + the stream-static enrich pattern
    (chained aggregations are illegal in one streaming query, so the
    baseline is a batch artifact refreshed out-of-band, exactly how a
    production detector holds its thresholds). Emits ONLY the alert
    rows. Integer cents end-to-end → the alert set is bit-stable.

    Returns ``(window_start, event_type, total_cents, thr_cents)``.
    """
    win = F.window("ts", window)
    totals = (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents")
        )
    )
    return (
        totals.join(F.broadcast(baseline), "event_type")
        .where(F.col("total_cents") > F.col("thr_cents"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "total_cents",
            "thr_cents",
        )
    )


def _wl_windowed_alerts(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return windowed_alerts(ev, type_baseline(ev)).orderBy(
        "window_start", "event_type"
    )


# Parameterized on ALERT_Z10 / ALERT_WINDOW so changing a default in
# type_baseline/windowed_alerts cannot silently desynchronize the
# oracle (advice r06) — same pattern as ORACLE_ZIPF et al.
ORACLE_WINDOWED_ALERTS = f"""
WITH totals AS (
  SELECT time_bucket(INTERVAL '{ALERT_WINDOW}', ts) AS window_start,
         event_type,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
  FROM events GROUP BY 1, 2),
base AS (
  SELECT event_type,
         CAST(s // n + ({ALERT_Z10} * CAST(floor(sqrt(CAST(n * ss - s * s AS DOUBLE)))
                                  AS BIGINT)) // (10 * n) AS BIGINT)
             AS thr_cents
  FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(total_cents) AS BIGINT) AS s,
               CAST(sum(total_cents * total_cents) AS BIGINT) AS ss
        FROM totals GROUP BY 1))
SELECT t.window_start, t.event_type, t.total_cents, b.thr_cents
FROM totals t JOIN base b USING (event_type)
WHERE t.total_cents > b.thr_cents
ORDER BY window_start, event_type"""


def streaming_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload(
            "stream_windowed_rollup", _wl_windowed_rollup, ORACLE_WINDOWED_ROLLUP, True
        ),
        Workload("stream_sessionized", _wl_sessionized, ORACLE_SESSIONIZED, False),
        Workload("stream_interval_join", _wl_interval_join, ORACLE_INTERVAL_JOIN, False),
        Workload(
            "stream_interval_join_outer",
            _wl_interval_join_outer,
            ORACLE_INTERVAL_JOIN_OUTER,
            False,
        ),
        Workload("stream_dedup_keys", _wl_dedup_keys, ORACLE_DEDUP_KEYS, False),
        Workload(
            "stream_windowed_uniques",
            _wl_windowed_uniques,
            ORACLE_WINDOWED_UNIQUES,
            False,
        ),
        Workload(
            "stream_trending_topk", _wl_trending_topk, ORACLE_TRENDING_TOPK, False
        ),
        Workload(
            "stream_enrich_static", _wl_enrich_static, ORACLE_ENRICH_STATIC, False
        ),
        Workload(
            "stream_lateness_profile", _wl_lateness_profile, ORACLE_LATENESS, False
        ),
        Workload("stream_cdc_apply", _wl_cdc_apply, ORACLE_CDC_APPLY, False),
        Workload(
            "stream_windowed_alerts",
            _wl_windowed_alerts,
            ORACLE_WINDOWED_ALERTS,
            False,
        ),
        Workload(
            "stream_admission_sim",
            _wl_admission_sim,
            ORACLE_ADMISSION_SIM,
            False,
        ),
    ]


ADMISSION_BATCH_ROWS = 1000  # arrival rows per simulated trigger
ADMISSION_DELAY_MS = 5 * 60_000
ADMISSION_WINDOW_MS = 10 * 60_000


def admission_sim(
    events: DataFrame,
    batch_rows: int = ADMISSION_BATCH_ROWS,
    delay_ms: int = ADMISSION_DELAY_MS,
    window_ms: int = ADMISSION_WINDOW_MS,
) -> DataFrame:
    """Watermark-admission accounting as a BATCH replay of Spark's
    trigger-granular rule — the oracle-checkable face of
    :func:`late_drop_audit` (which needs a real checkpoint): arrival
    order is the ``event_id`` ingestion offset, rows group into
    simulated triggers of ``batch_rows``, the watermark in force for a
    trigger is the max event time of all EARLIER triggers minus the
    delay (exactly the re-derivation rule
    :func:`planned_watermarks_ms` self-checks against the offsets
    log), and a row is admitted iff its tumbling ``window_ms`` window
    END is above that watermark. All arithmetic is integer epoch-ms.

    Returns one row per ``event_type``: ``(event_type, n, n_admitted,
    n_dropped_late)``, ordered by type.

    Plan: ONE map-combinable per-trigger max, a running max over the
    bounded trigger frame (|triggers| = n/batch_rows rows — the only
    window sort, never corpus-scale), broadcast back, then one
    map-side admission flag + groupBy(event_type). No corpus-scale
    sort, no skew: at 100 TB the trigger frame is still metadata-sized
    relative to the events scan."""
    ms = (F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast("long")
    ev = events.select(
        "event_type",
        ms.alias("ms"),
        F.expr(f"event_id div {batch_rows}").alias("b"),
    )
    bmax = ev.groupBy("b").agg(F.max("ms").alias("mx"))
    w_prev = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = bmax.select(
        "b",
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.max("mx").over(w_prev) - delay_ms, F.lit(0)),
        ).alias("wm"),
    )
    win_end = (F.expr(f"ms div {window_ms}") + 1) * window_ms
    admitted = (win_end > F.col("wm")).cast("long")
    return (
        ev.join(F.broadcast(wm), "b")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(admitted).alias("n_admitted"),
            (F.count(F.lit(1)) - F.sum(admitted)).alias("n_dropped_late"),
        )
        .orderBy("event_type")
    )


ORACLE_ADMISSION_SIM = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 1000 AS ms,
         event_id // {ADMISSION_BATCH_ROWS} AS b
  FROM events),
bmax AS (SELECT b, max(ms) AS mx FROM ev GROUP BY b),
wm AS (
  SELECT b, greatest(0, coalesce(max(mx) OVER (
           ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - {ADMISSION_DELAY_MS}, 0)) AS wm
  FROM bmax)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN (ms // {ADMISSION_WINDOW_MS} + 1)
                          * {ADMISSION_WINDOW_MS} > wm
                THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(count(*) - sum(CASE WHEN (ms // {ADMISSION_WINDOW_MS} + 1)
                                    * {ADMISSION_WINDOW_MS} > wm
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_late
FROM ev JOIN wm USING (b)
GROUP BY event_type ORDER BY event_type"""


def _wl_admission_sim(spark, sf_dir):
    return admission_sim(_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Late-data audit: reconstruct what the watermark dropped from the
# checkpoint logs (r08 verdict item 8). The built-in
# `numRowsDroppedByWatermark` metric counts ONLY state-operator drops;
# the map-side late filter (the pre-shuffle twin Spark plants in front
# of the shuffle) drops most late rows WITHOUT incrementing it — the
# measured undercount on the 2M-event harness was ~680× (2,128
# reported vs 1,446,087 reconstructed bit-exactly,
# stream_late_drop.csv). These operators make the offsets-log
# reconstruction — the ONLY trustworthy late-data accounting — a
# first-class library surface instead of a one-off harness.
# ---------------------------------------------------------------------------


def checkpoint_file_batches(checkpoint_dir: str) -> dict[str, int]:
    """File-source checkpoint log → {file path: batchId that consumed
    it}. The log COMPACTS every 10 batches (plain digit files replaced
    by ``N.compact`` holding the union, each entry carrying its
    original ``batchId``) — both forms are parsed, else every 10th
    batch's files silently vanish from the mapping."""
    import glob as _glob
    import json as _json
    import os as _os

    out: dict[str, int] = {}
    for p in _glob.glob(_os.path.join(checkpoint_dir, "sources", "0", "*")):
        name = _os.path.basename(p)
        base = name[: -len(".compact")] if name.endswith(".compact") else name
        if not base.isdigit():
            continue
        b = int(base)
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("v"):
                    continue
                entry = _json.loads(line)
                out[entry["path"]] = int(entry.get("batchId", b))
    return out


def checkpoint_batch_watermarks_ms(checkpoint_dir: str) -> dict[int, int]:
    """Offsets log → {batchId: batchWatermarkMs} — the watermark
    PLANNED for batch b (computed from data through b−1; used for
    state eviction in b). The late-events filter in batch b uses the
    PREVIOUS batch's value (Spark's two-watermark design, SPARK-24634)
    — consumers shift by one. The log retains only the last ~100
    batches; :func:`planned_watermarks_ms` re-derives the full history
    and self-checks against whatever IS retained."""
    import glob as _glob
    import json as _json
    import os as _os

    out: dict[int, int] = {}
    for p in _glob.glob(_os.path.join(checkpoint_dir, "offsets", "*")):
        name = _os.path.basename(p)
        if not name.isdigit():
            continue
        with open(p) as fh:
            lines = fh.read().splitlines()
        if len(lines) >= 2:
            out[int(name)] = int(
                _json.loads(lines[1]).get("batchWatermarkMs", 0)
            )
    return out


def planned_watermarks_ms(
    batch_max_event_ms: dict[int, int],
    delay_ms: int,
    logged: dict[int, int] | None = None,
) -> dict[int, int]:
    """Re-derive the planned watermark per batch from per-batch max
    event time (ms — Spark's event-time stats floor micros to millis):
    exactly Spark's update rule, ``wm(b) = max event-time ms through
    b−1, minus delay, floored at 0``. When ``logged`` (retained
    offsets entries) is given, every overlapping batch is checked
    bit-for-bit — a mismatch raises, because a silently wrong
    watermark history would fabricate the audit."""
    batches = sorted(batch_max_event_ms)
    planned: dict[int, int] = {}
    running = 0
    for b in batches:
        planned[b] = max(0, running - delay_ms) if running else 0
        running = max(running, batch_max_event_ms[b])
    if batches:
        planned[batches[-1] + 1] = max(0, running - delay_ms)
    if logged:
        bad = {
            b: (logged[b], planned.get(b))
            for b in logged
            if b in planned and logged[b] != planned[b]
        }
        if bad:
            raise ValueError(
                f"watermark re-derivation disagrees with offsets log: {bad}"
            )
    return planned


def _delay_to_ms(delay: str | int) -> int:
    if isinstance(delay, int):
        return delay
    qty, unit = delay.split(None, 1)
    unit = unit.strip().rstrip("s")
    scale = {"millisecond": 1, "second": 1000, "minute": 60_000,
             "hour": 3_600_000, "day": 86_400_000}[unit]
    return int(qty) * scale


def admitted_events(
    events: DataFrame,
    checkpoint_dir: str,
    delay: str | int,
    window_duration: str,
    time_col: str = "ts",
) -> DataFrame:
    """The rows a file-source windowed-aggregation stream ADMITTED —
    exact, not approximated: ``events`` is the same source path read
    as a batch frame; each row maps to its consuming trigger through
    the checkpoint's file→batch log, and is admitted iff its window
    END exceeds the late-events watermark of that trigger (the
    watermark planned for the previous batch — the L=1 shift the
    harness fitted 112/112 bit-exact). File-URI spellings are
    normalized on both sides (``input_file_name`` and the checkpoint
    log can disagree on ``file:/`` vs ``file:///``).

    The mapping side is one bounded |files|-row local build broadcast
    into the join; the events side never shuffles — at 100 TB this is
    a map-only filter over the source scan."""
    import re as _re

    spark = events.sparkSession
    delay_ms = _delay_to_ms(delay)
    f2b = {
        _re.sub("^file:/+", "/", p): b
        for p, b in checkpoint_file_batches(checkpoint_dir).items()
    }
    if not f2b:
        raise ValueError(f"no file-source log under {checkpoint_dir!r}")
    ev = events.withColumn(
        "_file", F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    )
    # per-file max event time in ms: bounded |files|-row collect
    per_file_max = {
        r["_file"]: int(r["mx"])
        for r in ev.groupBy("_file")
        .agg(
            (F.max(F.unix_micros(F.col(time_col).cast("timestamp"))) / 1000)
            .cast("long")
            .alias("mx")
        )
        .collect()
    }
    bmax: dict[int, int] = {}
    for p, b in f2b.items():
        if p in per_file_max:
            bmax[b] = max(bmax.get(b, 0), per_file_max[p])
    planned = planned_watermarks_ms(
        bmax, delay_ms, logged=checkpoint_batch_watermarks_ms(checkpoint_dir)
    )
    rows = [(p, b, planned.get(b - 1, 0)) for p, b in f2b.items()]
    m = spark.createDataFrame(
        rows, "_file string, _batch int, _wm_ms long"
    )
    win_end = F.window(F.col(time_col), window_duration).end
    return (
        ev.join(F.broadcast(m), "_file")
        .where(win_end > F.timestamp_millis(F.col("_wm_ms")))
        .drop("_file", "_batch", "_wm_ms")
    )


def late_drop_audit(
    events: DataFrame,
    checkpoint_dir: str,
    delay: str | int,
    window_duration: str,
    time_col: str = "ts",
) -> DataFrame:
    """ONE-row late-data accounting for a finished (or quiesced)
    file-source windowed stream: how many source rows the watermark
    actually dropped, reconstructed from the checkpoint logs — the
    number ``numRowsDroppedByWatermark`` undercounts ~680× because the
    map-side late filter is invisible to it. Returns
    ``(n_files, n_batches, final_watermark_ms, rows_total,
    rows_admitted, rows_dropped_late)``; production guidance is to run
    this after every stream epoch and alert on drift, never to trust
    the metric."""
    import re as _re

    spark = events.sparkSession
    f2b = checkpoint_file_batches(checkpoint_dir)
    adm = admitted_events(
        events, checkpoint_dir, delay, window_duration, time_col
    )
    final_wm = max(
        checkpoint_batch_watermarks_ms(checkpoint_dir).values() or [0]
    )
    files = spark.createDataFrame(
        [(_re.sub("^file:/+", "/", p),) for p in f2b], "_file string"
    )
    ev = events.withColumn(
        "_file", F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    ).join(F.broadcast(files), "_file")
    totals = ev.agg(F.count(F.lit(1)).alias("rows_total"))
    admitted = adm.agg(F.count(F.lit(1)).alias("rows_admitted"))
    return (
        totals.crossJoin(F.broadcast(admitted))
        .select(
            F.lit(len(f2b)).alias("n_files"),
            F.lit(len(set(f2b.values()))).alias("n_batches"),
            F.lit(final_wm).cast("long").alias("final_watermark_ms"),
            "rows_total",
            "rows_admitted",
            (F.col("rows_total") - F.col("rows_admitted")).alias(
                "rows_dropped_late"
            ),
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
):
    """Drive a streaming DataFrame into an in-memory table until all
    available input is processed; returns the stopped query. Test/dev
    sink — production uses kafka/parquet/delta sinks unchanged."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
