"""Change-data operators: MERGE-style upsert and SCD2 history.

The reference's storage is load-once (reference:src/client.py loads a
CSV into Postgres and never mutates it); a lake deployment ingests
change streams. Two standard shapes, both as pure DataFrame algebra
(the MERGE here is the *computation* — pair it with an atomic
table/partition swap for the commit, same contract as
``sources.columnar.compact_small_files``):

- :func:`merge_upsert` — latest-wins key merge of an updates batch
  into a base snapshot (inserts + updates in one pass).
- :func:`scd2_history` — collapse a changelog into slowly-changing-
  dimension type-2 validity intervals (valid_from / valid_to, NULL =
  current), emitting one row per *change* of the tracked value.

Determinism: "latest" is total-ordered by (ts, tiebreak), never by
arrival; every comparison the operators make is on exact values.

Scale: both are one hash exchange on the entity key (window or
groupBy); no global sort, no driver state. Skewed entities follow the
usual salting advice (operators/scale.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """MERGE: per ``key``, the latest updates row (by ``ts, tiebreak``)
    replaces the base row; keys only in updates are inserts; keys only
    in base pass through. Returns ``(key, ts, value)`` — the new
    snapshot.

    Physical shape: updates collapsed to latest-per-key (one window
    over the updates batch — typically tiny next to base), then base
    LEFT ANTI updates ∪ latest-updates. Base is scanned once and never
    shuffled on anything but the key; with base bucketed by the key
    the anti join is exchange-free on its side.
    """
    w = Window.partitionBy(key).orderBy(F.desc(ts), F.desc(tiebreak))
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(key, ts, value)
    )
    untouched = base.select(key, ts, value).join(
        latest.select(key), key, "left_anti"
    )
    return untouched.unionByName(latest)


def scd2_history(
    changelog: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """SCD2: collapse a changelog into validity intervals. Consecutive
    rows (in ``ts, tiebreak`` order per key) with the SAME value merge
    into one version; each version gets ``valid_from`` = its first
    event time and ``valid_to`` = the next version's start (NULL for
    the current version).

    One window partitioning does everything: change detection
    (``lag(value)``), version numbering (running sum of change flags),
    then a groupBy on (key, version) and a lead for valid_to — the
    second window rides the same hash partitioning, so the whole
    history build is ONE exchange on the key.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    lag_v = F.lag("v").over(w)
    flagged = (
        changelog.select(key, ts, tiebreak, F.col(value).alias("v"))
        .withColumn("_chg", F.when(lag_v.eqNullSafe(F.col("v")), 0).otherwise(1))
        .withColumn(
            "_ver",
            F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    versions = flagged.groupBy(key, "_ver").agg(
        F.min(ts).alias("valid_from"),
        # every row in a version carries the SAME value by construction
        # (a change starts a new version), so min == the version value
        F.min("v").alias("value"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy(key).orderBy("_ver")
    return versions.select(
        key,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "value",
        "n_events",
    )


def rollup_aggregate(events: DataFrame, key: str = "event_type") -> DataFrame:
    """The mergeable per-key rollup state: count, integer-cent value
    sum (order-free exact), and min/max — every component is
    re-aggregable, which is what makes the rollup incrementally
    maintainable."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return events.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("sum_cents"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


def incremental_rollup(base_agg: DataFrame, delta: DataFrame, key: str = "event_type") -> DataFrame:
    """Incremental materialized-rollup maintenance: merge a standing
    aggregate with a new batch's aggregate instead of recomputing
    history — at 100 TB the standing agg is keys-sized while history is
    petabytes, so this turns a full-history job into a delta-sized one.

    Works because every component is a commutative monoid merge
    (count/sum add, min/max fold). The workload's oracle recomputes the
    rollup FROM SCRATCH over the full table — a genuinely different
    computation path whose equality IS the maintenance invariant.
    """
    merged = base_agg.unionByName(rollup_aggregate(delta, key))
    return merged.groupBy(key).agg(
        F.sum("n").alias("n"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


# ---------------------------------------------------------------------------
# Workloads: base = event_id % 3 < 2 snapshot (latest per user),
# updates = the rest; SCD2 over the full per-user value changelog.
# ---------------------------------------------------------------------------

def snapshot_diff(
    base: DataFrame,
    revised: DataFrame,
    key: str = "k",
    cols: tuple[str, ...] = ("ts_us", "v_mills"),
) -> DataFrame:
    """Table-diff between two keyed snapshots — the audit op behind
    every incremental pipeline ("what did this ingest actually
    change?"): each key classified as ``added`` (only in revised),
    ``removed`` (only in base), or ``changed`` (present in both with
    any compared column differing). Unchanged keys are dropped — the
    diff is change-sized, not table-sized.

    Plan: ONE full-outer equi-join on the key; the classification is a
    codegen CASE over null-ness and column equality. Compared columns
    should be exact types (integers, epoch-µs) — float state should be
    quantized first, the repo-wide convention — and non-null: the
    difference test is deliberately NOT null-safe (NULL <> NULL is
    NULL, i.e. "not a change") and both engines share that three-valued
    logic; presence itself is keyed on the first compared column. At
    100 TB both sides bucketed by key make this exchange-free
    (``scale.write_bucketed``).

    Returns ``(k, change)``.
    """
    a = base.select(
        F.col(key).alias("k"), *[F.col(c).alias(f"a_{c}") for c in cols]
    )
    b = revised.select(
        F.col(key).alias("k"), *[F.col(c).alias(f"b_{c}") for c in cols]
    )
    j = a.join(b, "k", "full_outer")
    in_a = F.col(f"a_{cols[0]}").isNotNull()
    in_b = F.col(f"b_{cols[0]}").isNotNull()
    differs = None
    for c in cols:
        d = F.col(f"a_{c}") != F.col(f"b_{c}")
        differs = d if differs is None else (differs | d)
    change = (
        F.when(~in_a & in_b, F.lit("added"))
        .when(in_a & ~in_b, F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.select("k", change.alias("change"))
        .where(F.col("change").isNotNull())
        .orderBy("k")
    )


def _wl_snapshot_diff(spark, sf_dir):
    ev = _events(spark, sf_dir)

    def latest(df):
        return (
            df.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.desc("ts"), F.desc("event_id")
                    )
                ),
            )
            .where("_rn = 1")
            .select(
                F.col("user_id").alias("k"),
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                F.floor(F.col("value") * 1000 + F.lit(0.5))
                .cast("long")
                .alias("v_mills"),
            )
        )

    # snapshots engineered to exercise all three classes: A lacks the
    # %13 users (-> added), B lacks the %17 users (-> removed), and A
    # sees only the first slice of events (-> changed latest states)
    snap_a = latest(ev.where("event_id % 4 != 3")).where("k % 13 != 0")
    snap_b = latest(ev).where("k % 17 != 0")
    return snapshot_diff(snap_a, snap_b)


ORACLE_SNAPSHOT_DIFF = """
WITH la AS (
  SELECT user_id AS k, epoch_us(ts) AS ts_us,
         floor(value * 1000 + 0.5)::BIGINT AS v_mills
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 4 != 3) t
  WHERE rn = 1 AND user_id % 13 != 0),
lb AS (
  SELECT user_id AS k, epoch_us(ts) AS ts_us,
         floor(value * 1000 + 0.5)::BIGINT AS v_mills
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
  WHERE rn = 1 AND user_id % 17 != 0),
j AS (
  SELECT coalesce(la.k, lb.k) AS k,
         CASE WHEN la.k IS NULL THEN 'added'
              WHEN lb.k IS NULL THEN 'removed'
              WHEN la.ts_us <> lb.ts_us OR la.v_mills <> lb.v_mills
                THEN 'changed' END AS change
  FROM la FULL OUTER JOIN lb ON la.k = lb.k)
SELECT k, change FROM j WHERE change IS NOT NULL ORDER BY k"""


ORACLE_MERGE_UPSERT = """
WITH base AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 3 < 2) WHERE rn = 1),
upd AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 3 = 2) WHERE rn = 1)
SELECT user_id, ts, value FROM base ANTI JOIN upd USING (user_id)
UNION ALL
SELECT user_id, ts, value FROM upd
ORDER BY user_id"""


ORACLE_SCD2 = """
WITH c AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(value) OVER w IS NOT DISTINCT FROM value
              THEN 0 ELSE 1 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
v AS (
  SELECT user_id, ts, event_id, value,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS ver
  FROM c),
g AS (
  SELECT user_id, ver, min(ts) AS valid_from,
         min(value) AS value,
         CAST(count(*) AS BIGINT) AS n_events
  FROM v GROUP BY user_id, ver)
SELECT user_id, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver) AS valid_to,
       value, n_events
FROM g ORDER BY user_id, valid_from"""


def _events(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return spark.table("events")


def _wl_merge_upsert(spark, sf_dir):
    ev = _events(spark, sf_dir)
    base_latest = (
        ev.where("event_id % 3 < 2")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .where("_rn = 1")
        .select("user_id", "ts", "value")
    )
    return merge_upsert(base_latest, ev.where("event_id % 3 = 2"))


def _wl_scd2(spark, sf_dir):
    return scd2_history(_events(spark, sf_dir))


# the oracle recomputes from scratch; the Spark side maintains:
# agg(first 2/3) merged with the last 1/3 delta
ORACLE_INCR_ROLLUP = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(floor(value * 100 + 0.5)::BIGINT) AS BIGINT) AS sum_cents,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY event_type ORDER BY event_type"""


def _wl_incr_rollup(spark, sf_dir):
    ev = _events(spark, sf_dir)
    base_agg = rollup_aggregate(ev.where("event_id % 3 < 2"))
    return incremental_rollup(base_agg, ev.where("event_id % 3 = 2"))


def partition_manifest(
    events: DataFrame, ts: str = "ts", value: str = "value"
) -> DataFrame:
    """Per-partition (per-day) integrity manifest — the backfill/
    replication validator: row count, exact integer-cents value sum,
    and an order-independent xor digest of per-row signatures. Two
    replicas of a day match iff all three match; a silently dropped or
    duplicated row flips the count AND the digest, a corrupted value
    flips the sum AND the digest.

    Row signature = ``(event_id * 1000003 + cents) % HASH_P`` — pure
    int64 arithmetic, identical on both engines; xor is commutative so
    the digest is partition-order-free. ONE map-combinable groupBy(day);
    at 100 TB this is the per-partition companion of the corpus-level
    :func:`textops.corpus_manifest`.

    Returns ``(day, n, sum_cents, xor_sig)``.
    """
    from query_refinement_dsit_databases_2021_spark.operators.textops import HASH_P

    cents = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("long")
    sig = (F.col("event_id") * 1000003 + cents) % HASH_P
    return (
        events.select(
            F.to_date(ts).alias("day"), cents.alias("_c"), sig.alias("_s")
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_c").alias("sum_cents"),
            F.expr("bit_xor(_s)").alias("xor_sig"),
        )
        .orderBy("day")
    )


def _wl_partition_manifest(spark, sf_dir):
    return partition_manifest(_events(spark, sf_dir))


def _oracle_partition_manifest() -> str:
    from query_refinement_dsit_databases_2021_spark.operators.textops import HASH_P

    return f"""
SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(floor(value * 100 + 0.5)::BIGINT) AS BIGINT) AS sum_cents,
       CAST(bit_xor((event_id * 1000003 + floor(value * 100 + 0.5)::BIGINT)
                    % {HASH_P}) AS BIGINT) AS xor_sig
FROM events GROUP BY 1 ORDER BY 1"""


def fk_integrity(
    checks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit — the post-ingest data-quality gate
    a lake runs before publishing a snapshot: for each (child, fk) →
    (parent, pk) relation, count the child rows whose key has no
    parent (orphans). Emits one row per relation so a single job
    validates the whole schema.

    ``checks`` is ``[(relation_name, child_df, fk_col, parent_df,
    pk_col), ...]``. Orphans are counted with a LEFT ANTI join against
    the parent's distinct keys — the shuffle carries only the key
    columns, and AQE broadcasts the parent key set when it is small.
    At 100 TB, pre-filter the child with a Bloom filter built from the
    parent keys (or the parent's min/max when keys are dense) so the
    anti-join only sees candidate orphans; counts are exact either way
    because the Bloom filter admits false positives only.

    Returns ``(relation, n_child, n_orphans)`` ordered by relation.
    """
    outs = []
    for name, child, fk, parent, pk in checks:
        keys = parent.select(F.col(pk).alias(fk)).distinct()
        n_child = child.select(F.col(fk)).groupBy().agg(
            F.count(F.lit(1)).alias("n_child")
        )
        n_orph = (
            child.select(F.col(fk))
            .join(keys, fk, "left_anti")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        outs.append(
            n_child.crossJoin(n_orph).select(
                F.lit(name).alias("relation"), "n_child", "n_orphans"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("relation")


def _wl_fk_integrity(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    # simulate a partial snapshot: some parents dropped -> real orphans
    orders_snap = spark.table("orders").where("o_orderkey % 97 != 0")
    cust_snap = spark.table("customer").where("c_custkey % 53 != 0")
    return fk_integrity(
        [
            (
                "lineitem->orders",
                spark.table("lineitem"),
                "l_orderkey",
                orders_snap,
                "o_orderkey",
            ),
            (
                "orders->customer",
                spark.table("orders"),
                "o_custkey",
                cust_snap,
                "c_custkey",
            ),
        ]
    )


ORACLE_FK_INTEGRITY = """
SELECT 'lineitem->orders' AS relation,
       (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey
                            AND o.o_orderkey % 97 != 0)) AS n_orphans
UNION ALL
SELECT 'orders->customer' AS relation,
       (SELECT count(*) FROM orders) AS n_child,
       (SELECT count(*) FROM orders r
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = r.o_custkey
                            AND c.c_custkey % 53 != 0)) AS n_orphans
ORDER BY relation"""


SNAPSHOT_VERSION = 12


def delta_log_replay(
    adds: DataFrame, removes: DataFrame, version: int
) -> DataFrame:
    """Table-format transaction-log replay (the Delta/Iceberg
    time-travel primitive): reconstruct the live file set AS OF
    ``version`` from a log of add/remove file actions, without any
    stored snapshot.

    ``adds`` is ``(file_id, bytes, ver)``; ``removes`` is
    ``(file_id, ver)``. A file is live at V iff it was added at or
    before V and not removed at or before V. The replay is one LEFT
    ANTI join of the version-filtered adds against the
    version-filtered removes — the shuffle carries ``file_id`` only
    (the manifest is metadata-scale: ~10^6 rows per 100 TB of 100 MB
    files), and AQE broadcasts the remove set when it is small, so
    time travel costs a metadata join, never a data pass.

    Returns the per-add-version profile of the live snapshot
    ``(ver, n_files, total_bytes)`` — the manifest a reader would
    plan its scan from.
    """
    live = (
        adds.where(F.col("ver") <= version)
        .join(
            removes.where(F.col("ver") <= version).select("file_id"),
            "file_id",
            "left_anti",
        )
    )
    return (
        live.groupBy("ver")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("total_bytes"),
        )
        .orderBy("ver")
    )


def _wl_delta_log_replay(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    # simulate a transaction log from orders: every order adds a file
    # at version o_orderkey % 16; fulfilled orders remove theirs again
    # 1..5 versions later (possibly after the snapshot -> still live)
    o = spark.table("orders")
    adds = o.select(
        F.col("o_orderkey").alias("file_id"),
        F.floor("o_totalprice").cast("long").alias("bytes"),
        (F.col("o_orderkey") % 16).alias("ver"),
    )
    removes = o.where("o_orderstatus = 'F'").select(
        F.col("o_orderkey").alias("file_id"),
        (F.col("o_orderkey") % 16 + 1 + F.col("o_orderkey") % 5).alias("ver"),
    )
    return delta_log_replay(adds, removes, SNAPSHOT_VERSION)


ORACLE_DELTA_LOG_REPLAY = f"""
WITH adds AS (
  SELECT o_orderkey AS file_id,
         CAST(floor(o_totalprice) AS BIGINT) AS bytes,
         o_orderkey % 16 AS ver
  FROM orders),
removes AS (
  SELECT o_orderkey AS file_id,
         o_orderkey % 16 + 1 + o_orderkey % 5 AS ver
  FROM orders WHERE o_orderstatus = 'F')
SELECT ver, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes
FROM adds a
WHERE a.ver <= {SNAPSHOT_VERSION}
  AND NOT EXISTS (SELECT 1 FROM removes r
                  WHERE r.file_id = a.file_id
                    AND r.ver <= {SNAPSHOT_VERSION})
GROUP BY ver ORDER BY ver"""


MV_DELTA_MOD = 17  # orders with o_orderkey % 17 == 0 arrive "late"


def mv_join_delta(
    base_orders: DataFrame, delta_orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Incremental maintenance of a JOIN view: the standing
    materialized view ``revenue by (mktsegment, month)`` =
    orders ⋈ customer rollup, maintained under a late-arriving orders
    batch by joining ONLY the delta against the dimension and folding
    the delta-aggregate into the standing aggregate —
    ``MV(base) ⊕ agg(Δ ⋈ dim) ≡ MV(base ∪ Δ)``, the ΔA⋈B leg of
    classic incremental view maintenance (the no-join leg is
    :func:`incremental_rollup`). Revenue is exact integer cents so ⊕
    is a true monoid merge.

    Plan: the standing view is group-count-sized; the maintenance job
    touches |Δ| rows + one broadcast dim join + a view-sized merge —
    never the petabyte history. The oracle recomputes the view FROM
    SCRATCH over base ∪ Δ; equality IS the maintenance invariant.

    Returns ``(mktsegment, month, n_orders, revenue_cents)``.
    """

    def view(orders: DataFrame) -> DataFrame:
        j = orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        return j.groupBy(
            F.col("c_mktsegment").alias("mktsegment"),
            F.expr("month(CAST(o_orderdate AS TIMESTAMP))").alias("month"),
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents"),
        )

    merged = view(base_orders).unionByName(view(delta_orders))
    return (
        merged.groupBy("mktsegment", "month")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
        .orderBy("mktsegment", "month")
    )


def _wl_mv_join_delta(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    o = spark.table("orders")
    return mv_join_delta(
        o.where(f"o_orderkey % {MV_DELTA_MOD} != 0"),
        o.where(f"o_orderkey % {MV_DELTA_MOD} = 0"),
        spark.table("customer"),
    )


# the oracle is the FULL recompute over base ∪ delta = all orders —
# a genuinely different computation path whose equality is the
# incremental-maintenance invariant
ORACLE_MV_JOIN_DELTA = """
SELECT c.c_mktsegment AS mktsegment,
       month(o.o_orderdate) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment, month(o.o_orderdate)
ORDER BY mktsegment, month"""


VACUUM_RETENTION_VERSIONS = 4  # tombstones younger than this stay


def vacuum_plan(
    adds: DataFrame,
    removes: DataFrame,
    version: int,
    retention: int = VACUUM_RETENTION_VERSIONS,
) -> DataFrame:
    """Vacuum planning over the same transaction log
    :func:`delta_log_replay` replays: a physical file is reclaimable
    once its REMOVE tombstone is older than the retention horizon
    (``remove.ver <= version - retention``) — younger tombstones must
    stay so time travel within the retention window still resolves
    (the Delta/Iceberg VACUUM contract). Reports what a vacuum at
    ``version`` would delete, grouped by tombstone version.

    Plan: one metadata-scale equi-join (version-filtered removes ×
    adds on file_id, both manifest-sized) and an output-sized groupBy
    — planning a 100 TB vacuum never touches data files, only the
    log. The deletion itself is an out-of-band storage op driven by
    this plan's file list.

    Returns ``(removed_ver, n_files, reclaim_bytes)``.
    """
    cutoff = version - retention
    vac = (
        removes.where(F.col("ver") <= cutoff)
        .select("file_id", F.col("ver").alias("removed_ver"))
        .join(adds.select("file_id", "bytes"), "file_id")
    )
    return (
        vac.groupBy("removed_ver")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("reclaim_bytes"),
        )
        .orderBy("removed_ver")
    )


def _wl_vacuum_plan(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    # same simulated transaction log as ops_delta_log_replay
    o = spark.table("orders")
    adds = o.select(
        F.col("o_orderkey").alias("file_id"),
        F.floor("o_totalprice").cast("long").alias("bytes"),
        (F.col("o_orderkey") % 16).alias("ver"),
    )
    removes = o.where("o_orderstatus = 'F'").select(
        F.col("o_orderkey").alias("file_id"),
        (F.col("o_orderkey") % 16 + 1 + F.col("o_orderkey") % 5).alias("ver"),
    )
    return vacuum_plan(adds, removes, SNAPSHOT_VERSION)


ORACLE_VACUUM_PLAN = f"""
WITH adds AS (
  SELECT o_orderkey AS file_id,
         CAST(floor(o_totalprice) AS BIGINT) AS bytes
  FROM orders),
removes AS (
  SELECT o_orderkey AS file_id,
         o_orderkey % 16 + 1 + o_orderkey % 5 AS ver
  FROM orders WHERE o_orderstatus = 'F')
SELECT r.ver AS removed_ver, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(a.bytes) AS BIGINT) AS reclaim_bytes
FROM removes r JOIN adds a USING (file_id)
WHERE r.ver <= {SNAPSHOT_VERSION - VACUUM_RETENTION_VERSIONS}
GROUP BY r.ver ORDER BY removed_ver"""


WAP_MAX_GROWTH_QUARTERS = 4  # quarantine if delta * 4 > n_prod (>25%)


def wap_gate(staging: DataFrame, prod: DataFrame) -> DataFrame:
    """Write-Audit-Publish gate: before promoting a staging snapshot
    over prod, audit each day partition and emit a verdict —
    ``publish`` when the partition only grew within bounds,
    ``quarantine`` when rows disappeared (a correct snapshot never
    loses history) or growth exceeds 25% (upstream duplication /
    backfill gone wrong). The audit is two map-combinable day rollups
    and a day-keyed outer join — metadata-scale output, one pass per
    side; integer cross-multiplication (``delta · 4 > n_prod``) keeps
    the threshold exact.

    Returns ``(day, n_prod, n_stage, delta, verdict)`` per day
    present on either side.
    """
    sd = staging.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_stage")
    )
    pd_ = prod.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_prod")
    )
    j = pd_.join(sd, "day", "full_outer").select(
        "day",
        F.coalesce("n_prod", F.lit(0)).alias("n_prod"),
        F.coalesce("n_stage", F.lit(0)).alias("n_stage"),
    )
    delta = F.col("n_stage") - F.col("n_prod")
    verdict = F.when(
        (delta < 0)
        | (delta * WAP_MAX_GROWTH_QUARTERS > F.col("n_prod")),
        F.lit("quarantine"),
    ).otherwise(F.lit("publish"))
    return j.select(
        "day", "n_prod", "n_stage", delta.alias("delta"), verdict.alias("verdict")
    ).orderBy("day")


def _wl_wap_gate(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    # prod = last snapshot (missing the ~5% of rows staging adds);
    # staging additionally CORRUPTS its earliest day (drops half) so
    # the quarantine branch provably fires
    min_day = ev.select(F.min(F.to_date("ts")).alias("d"))
    prod = ev.where("event_id % 19 != 0")
    staging = ev.join(F.broadcast(min_day), how="cross").where(
        ~((F.to_date("ts") == F.col("d")) & (F.col("event_id") % 2 == 0))
    )
    return wap_gate(staging, prod)


ORACLE_WAP_GATE = f"""
WITH min_day AS (SELECT min(CAST(ts AS DATE)) AS d FROM events),
prod AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_prod
  FROM events WHERE event_id % 19 != 0 GROUP BY 1),
staging AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_stage
  FROM events, min_day
  WHERE NOT (CAST(ts AS DATE) = min_day.d AND event_id % 2 = 0)
  GROUP BY 1),
j AS (
  SELECT coalesce(p.day, s.day) AS day,
         CAST(coalesce(p.n_prod, 0) AS BIGINT) AS n_prod,
         CAST(coalesce(s.n_stage, 0) AS BIGINT) AS n_stage
  FROM prod p FULL OUTER JOIN staging s ON s.day = p.day)
SELECT day, n_prod, n_stage,
       CAST(n_stage - n_prod AS BIGINT) AS delta,
       CASE WHEN n_stage - n_prod < 0
              OR (n_stage - n_prod) * {WAP_MAX_GROWTH_QUARTERS} > n_prod
            THEN 'quarantine' ELSE 'publish' END AS verdict
FROM j ORDER BY day"""


# Declarative data-quality expectations over lineitem. Each condition
# is written in the SQL subset both engines share (BETWEEN / IN /
# IS NOT NULL / TIMESTAMP literals), so ONE list generates the Spark
# aggregation AND the DuckDB oracle — the suite cannot drift from its
# own certification. A row VIOLATES a check when the condition is not
# TRUE (NULL counts as a violation: `NOT coalesce(cond, FALSE)`).
DQ_EXPECTATIONS: tuple[tuple[str, str], ...] = (
    ("discount_range", "l_discount BETWEEN 0 AND 0.1"),
    (
        "keys_not_null",
        "l_orderkey IS NOT NULL AND l_partkey IS NOT NULL"
        " AND l_suppkey IS NOT NULL",
    ),
    ("linestatus_domain", "l_linestatus IN ('F', 'O')"),
    ("price_positive", "l_extendedprice > 0"),
    ("qty_range", "l_quantity BETWEEN 1 AND 50"),
    ("returnflag_domain", "l_returnflag IN ('A', 'N', 'R')"),
    (
        "shipdate_bounds",
        "l_shipdate >= TIMESTAMP '1992-01-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'",
    ),
    ("tax_range", "l_tax BETWEEN 0 AND 0.08"),
)


def dq_expectations(
    df: DataFrame, expectations: tuple[tuple[str, str], ...] = DQ_EXPECTATIONS
) -> DataFrame:
    """Expectation-suite data-quality audit (the Great-Expectations /
    dbt-test shape as a single dataflow): evaluate every declared
    check over one table scan and emit the tall report ``(check_name,
    n_violations, n_checked)``.

    Plan: ONE map-combinable aggregate — each check is a conditional
    sum fused into the same whole-stage-codegen pass, so N checks
    cost one scan regardless of N; ``stack`` reshapes the 1-row wide
    result to the tall report (rows = checks, not data). At 100 TB
    this is the shape that matters: the naive one-query-per-check
    audit scans the table N times. Per-partition verdicts compose by
    addition, so the suite also runs incrementally per ingest batch
    (the `wap_gate` pattern) with the same definitions.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_checked")] + [
        F.sum(
            F.expr(f"CASE WHEN NOT coalesce({cond}, FALSE) THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias(name)
        for name, cond in expectations
    ]
    one = df.agg(*aggs)
    stacked = ", ".join(f"'{n}', {n}" for n, _ in expectations)
    return (
        one.selectExpr(
            f"stack({len(expectations)}, {stacked})"
            " AS (check_name, n_violations)",
            "n_checked",
        )
        .orderBy("check_name")
    )


def _oracle_dq_expectations(
    expectations: tuple[tuple[str, str], ...] = DQ_EXPECTATIONS,
) -> str:
    sums = ",\n         ".join(
        f"CAST(sum(CASE WHEN NOT coalesce({cond}, FALSE) THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS {name}"
        for name, cond in expectations
    )
    rows = "\nUNION ALL ".join(
        f"SELECT '{name}' AS check_name, {name} AS n_violations, n_checked"
        f" FROM agg"
        for name, _ in expectations
    )
    return f"""
WITH agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_checked,
         {sums}
  FROM lineitem)
{rows}
ORDER BY check_name"""


ORACLE_DQ_EXPECTATIONS = _oracle_dq_expectations()


def _wl_dq_expectations(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return dq_expectations(spark.table("lineitem"))


def cdc_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload("ops_merge_upsert", _wl_merge_upsert, ORACLE_MERGE_UPSERT),
        Workload("ops_scd2_history", _wl_scd2, ORACLE_SCD2),
        Workload("ops_incremental_rollup", _wl_incr_rollup, ORACLE_INCR_ROLLUP),
        Workload("ops_snapshot_diff", _wl_snapshot_diff, ORACLE_SNAPSHOT_DIFF),
        Workload(
            "ops_partition_manifest",
            _wl_partition_manifest,
            _oracle_partition_manifest(),
        ),
        Workload("ops_fk_integrity", _wl_fk_integrity, ORACLE_FK_INTEGRITY),
        Workload(
            "ops_delta_log_replay", _wl_delta_log_replay, ORACLE_DELTA_LOG_REPLAY
        ),
        Workload("ops_wap_gate", _wl_wap_gate, ORACLE_WAP_GATE),
        Workload(
            "ops_dq_expectations", _wl_dq_expectations, ORACLE_DQ_EXPECTATIONS
        ),
        Workload("ops_vacuum_plan", _wl_vacuum_plan, ORACLE_VACUUM_PLAN),
        Workload(
            "ops_mv_join_delta", _wl_mv_join_delta, ORACLE_MV_JOIN_DELTA
        ),
    ]
