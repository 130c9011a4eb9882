"""Hand-checked change-data operators (operators/cdc.py); the full
corpus is covered by the ops_merge_upsert / ops_scd2_history oracles in
test_workloads_oracle.py."""

from datetime import datetime

from pyspark.sql import functions as F  # noqa: F401

from query_refinement_dsit_databases_2021_spark.operators.cdc import (
    merge_upsert,
    scd2_history,
)


def _t(m):
    return datetime(2024, 1, 1, 0, m)


def test_merge_upsert_latest_wins_insert_and_passthrough(spark):
    base = spark.createDataFrame(
        [(1, _t(0), 10.0), (2, _t(0), 20.0)],
        "user_id long, ts timestamp, value double",
    )
    updates = spark.createDataFrame(
        [
            # two updates for user 1: the later (ts, event_id) wins
            (100, _t(5), 1, 11.0),
            (101, _t(9), 1, 12.0),
            # insert for user 3
            (102, _t(7), 3, 30.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {
        r["user_id"]: (r["ts"], r["value"])
        for r in merge_upsert(base, updates).collect()
    }
    assert got == {1: (_t(9), 12.0), 2: (_t(0), 20.0), 3: (_t(7), 30.0)}


def test_merge_upsert_equal_ts_tiebreak(spark):
    base = spark.createDataFrame(
        [(1, _t(0), 10.0)], "user_id long, ts timestamp, value double"
    )
    updates = spark.createDataFrame(
        [(200, _t(5), 1, 1.0), (201, _t(5), 1, 2.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    [r] = merge_upsert(base, updates).collect()
    assert (r["user_id"], r["value"]) == (1, 2.0)  # highest event_id wins


def test_scd2_collapses_runs_and_links_intervals(spark):
    changelog = spark.createDataFrame(
        [
            (1, _t(0), 1, 5.0),
            (2, _t(1), 1, 5.0),  # same value -> same version
            (3, _t(2), 1, 7.0),  # change -> version 2
            (4, _t(3), 1, 5.0),  # back to 5.0 -> NEW version (SCD2, not distinct)
            (5, _t(0), 2, 9.0),  # other key: single current version
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    rows = sorted(
        scd2_history(changelog).collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    u1 = [(r["valid_from"], r["valid_to"], r["value"], r["n_events"]) for r in rows if r["user_id"] == 1]
    assert u1 == [
        (_t(0), _t(2), 5.0, 2),
        (_t(2), _t(3), 7.0, 1),
        (_t(3), None, 5.0, 1),
    ]
    [u2] = [r for r in rows if r["user_id"] == 2]
    assert (u2["valid_from"], u2["valid_to"], u2["value"]) == (_t(0), None, 9.0)


def test_snapshot_diff_classifies_all_three(spark):
    from query_refinement_dsit_databases_2021_spark.operators.cdc import snapshot_diff

    a = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, 100, 30)], "k long, ts_us long, v_mills long"
    )
    b = spark.createDataFrame(
        [(1, 100, 10), (2, 200, 25), (4, 100, 40)], "k long, ts_us long, v_mills long"
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(a, b).collect()}
    # 1 unchanged (dropped), 2 changed, 3 removed, 4 added
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_partition_manifest_detects_tampering(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.cdc import (
        partition_manifest,
    )

    rows = [
        (1, datetime(2024, 3, 1, 10), 1, "a", 5.0),
        (2, datetime(2024, 3, 1, 11), 1, "a", 7.5),
        (3, datetime(2024, 3, 2, 10), 1, "a", 1.0),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    base = {r["day"]: r for r in partition_manifest(
        spark.createDataFrame(rows, schema)).collect()}
    # replica with one corrupted value on day 1: count matches, sum and
    # digest must both flip; day 2 untouched
    bad = [(1, datetime(2024, 3, 1, 10), 1, "a", 5.01)] + rows[1:]
    tampered = {r["day"]: r for r in partition_manifest(
        spark.createDataFrame(bad, schema)).collect()}
    d1, t1 = base[list(base)[0]], tampered[list(tampered)[0]]
    assert d1["n"] == t1["n"] == 2
    assert d1["sum_cents"] != t1["sum_cents"]
    assert d1["xor_sig"] != t1["xor_sig"]
    d2 = sorted(base)[1]
    assert base[d2] == tampered[d2]


def test_fk_integrity_counts_orphans(spark):
    from query_refinement_dsit_databases_2021_spark.operators.cdc import (
        fk_integrity,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (3,), (4,), (5,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    clean_child = spark.createDataFrame([(1,), (2,)], "ck long")
    got = {
        r["relation"]: (r["n_child"], r["n_orphans"])
        for r in fk_integrity(
            [
                ("child->parent", child, "fk", parent, "pk"),
                ("clean->parent", clean_child, "ck", parent, "pk"),
            ]
        ).collect()
    }
    # keys 4 and 5 have no parent -> 2 orphan rows; dup key 3 is fine
    assert got == {"child->parent": (6, 2), "clean->parent": (2, 0)}


def test_delta_log_replay_hand_built_log(spark):
    from query_refinement_dsit_databases_2021_spark.operators.cdc import (
        delta_log_replay,
    )

    adds = spark.createDataFrame(
        # (file_id, bytes, add_ver)
        [(1, 100, 0), (2, 200, 0), (3, 300, 1), (4, 400, 2), (5, 500, 9)],
        "file_id long, bytes long, ver long",
    )
    removes = spark.createDataFrame(
        # 2 removed inside the snapshot horizon, 3 removed after it,
        # 6 is a remove with no matching add (compaction artifact)
        [(2, 1), (3, 7), (6, 1)],
        "file_id long, ver long",
    )
    # V=5: live = {1 (v0), 4 (v2)}; 2 removed@1, 3 removed@7>5 -> 3 IS
    # live only if its remove is after V -> wait, remove@7 > 5 so live;
    # 5 added@9 > 5 -> not yet added
    got = {
        r["ver"]: (r["n_files"], r["total_bytes"])
        for r in delta_log_replay(adds, removes, 5).collect()
    }
    assert got == {0: (1, 100), 1: (1, 300), 2: (1, 400)}
    # full replay at V=9: 5 appears, 3's remove (v7<=9) now applies
    got9 = {
        r["ver"]: (r["n_files"], r["total_bytes"])
        for r in delta_log_replay(adds, removes, 9).collect()
    }
    assert got9 == {0: (1, 100), 2: (1, 400), 9: (1, 500)}


def test_wap_gate_verdicts(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.cdc import wap_gate

    def ev(day, n, start=0):
        return [(start + i, datetime(2024, 3, day, 10)) for i in range(n)]

    schema = "event_id long, ts timestamp"
    # day 1: prod 10 -> stage 12 (+20%, within 25%) => publish
    # day 2: prod 10 -> stage 8 (rows lost) => quarantine
    # day 3: prod 10 -> stage 14 (+40%) => quarantine
    # day 4: stage-only day (prod 0, any growth > 25% of 0) => quarantine
    prod = spark.createDataFrame(
        ev(1, 10) + ev(2, 10, 100) + ev(3, 10, 200), schema
    )
    stage = spark.createDataFrame(
        ev(1, 12) + ev(2, 8, 100) + ev(3, 14, 200) + ev(4, 3, 300), schema
    )
    got = {str(r["day"]): (r["delta"], r["verdict"])
           for r in wap_gate(stage, prod).collect()}
    assert got == {
        "2024-03-01": (2, "publish"),
        "2024-03-02": (-2, "quarantine"),
        "2024-03-03": (4, "quarantine"),
        "2024-03-04": (3, "quarantine"),
    }


def test_dq_expectations_counts_planted_violations(spark):
    from query_refinement_dsit_databases_2021_spark.operators.cdc import (
        dq_expectations,
    )

    rows = [
        # clean row
        (1, 1, 1, 10.0, 100.0, 0.05, 0.04, "A", "F", "1995-06-01 00:00:00"),
        # qty out of range + tax out of range
        (2, 1, 1, 99.0, 100.0, 0.05, 0.5, "N", "O", "1995-06-01 00:00:00"),
        # NULL discount (violation by NOT coalesce) + bad flag domain
        (3, 1, 1, 10.0, 100.0, None, 0.04, "X", "F", "1995-06-01 00:00:00"),
        # NULL key + non-positive price + date out of bounds
        (None, 1, 1, 10.0, 0.0, 0.05, 0.04, "A", "F", "2005-06-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    out = {r["check_name"]: (r["n_violations"], r["n_checked"]) for r in dq_expectations(df).collect()}
    assert out == {
        "discount_range": (1, 4),
        "keys_not_null": (1, 4),
        "linestatus_domain": (0, 4),
        "price_positive": (1, 4),
        "qty_range": (1, 4),
        "returnflag_domain": (1, 4),
        "shipdate_bounds": (1, 4),
        "tax_range": (1, 4),
    }


def test_vacuum_plan_respects_retention(spark):
    from query_refinement_dsit_databases_2021_spark.operators.cdc import (
        vacuum_plan,
    )

    adds = spark.createDataFrame(
        [(1, 100, 0), (2, 200, 0), (3, 300, 1), (4, 400, 2)],
        "file_id long, bytes long, ver long",
    )
    removes = spark.createDataFrame(
        # file 1 removed long ago (vacuumable), file 3 inside retention
        # (kept), file 4 removed after the snapshot version (kept)
        [(1, 2), (3, 9), (4, 12)],
        "file_id long, ver long",
    )
    rows = [
        (r["removed_ver"], r["n_files"], r["reclaim_bytes"])
        for r in vacuum_plan(adds, removes, version=10, retention=4).collect()
    ]
    assert rows == [(2, 1, 100)]


def test_mv_join_delta_equals_recompute_any_split(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.cdc import (
        mv_join_delta,
    )

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.50, datetime(2024, 1, 5), "1-URGENT"),
            (2, 11, "F", 200.25, datetime(2024, 1, 9), "2-HIGH"),
            (3, 10, "O", 50.00, datetime(2024, 2, 1), "3-MEDIUM"),
            (4, 12, "F", 75.10, datetime(2024, 2, 2), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "BUILDING"), (11, "AUTOMOBILE"), (12, "BUILDING")],
        "c_custkey long, c_mktsegment string",
    )

    def key(df):
        return sorted(
            (r["mktsegment"], r["month"], r["n_orders"], r["revenue_cents"])
            for r in df.collect()
        )

    full = key(mv_join_delta(orders, orders.limit(0), customer))
    # ANY base/delta split folds to the same view
    for pred in ("o_orderkey <= 2", "o_orderkey % 2 = 0", "false"):
        got = key(
            mv_join_delta(
                orders.where(f"NOT ({pred})"), orders.where(pred), customer
            )
        )
        assert got == full, pred
