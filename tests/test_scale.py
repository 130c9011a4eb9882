"""Salting and bucketing scale patterns: result parity with the plain
formulation AND physical-plan assertions (the point of these operators
is the plan shape, not just the rows)."""

import shutil

import pytest
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.operators.scale import (
    bucketed_join,
    salted_count_distinct,
    salted_join,
    write_bucketed,
)


@pytest.fixture()
def skewed_df(spark):
    # 90% of rows share one hot key
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )


@pytest.fixture()
def dim_df(spark):
    rows = [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(7)]
    return spark.createDataFrame(rows, "k string, w double")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark, skewed_df, dim_df):
    plain = sorted(
        tuple(r) for r in skewed_df.join(dim_df, ["k"], "inner").collect()
    )
    salted = salted_join(skewed_df, dim_df, ["k"], n_salts=8)
    got = sorted(tuple(r) for r in salted.collect())
    assert got == plain and len(got) == 2000
    # the shuffle must be keyed on (k, salt), not k alone
    assert "__salt" in _plan(salted)
    assert "__salt" not in salted.columns


def test_salted_left_join_keeps_unmatched(spark, skewed_df):
    dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    out = salted_join(skewed_df, dim, ["k"], how="left", n_salts=4)
    plain = skewed_df.join(dim, ["k"], "left")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_rejects_right_join(spark, skewed_df, dim_df):
    with pytest.raises(ValueError):
        salted_join(skewed_df, dim_df, ["k"], how="right")


def test_salted_count_distinct_exact(spark, skewed_df):
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(skewed_df, "k", "v", n_salts=8).collect()
    }
    want = {
        r["k"]: r["nd"]
        for r in skewed_df.groupBy("k")
        .agg(F.count_distinct("v").alias("nd"))
        .collect()
    }
    assert got == want


def test_bucketed_join_elides_exchanges(spark):
    left = spark.range(5000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("key"), (F.col("id") % 13).alias("b")
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(left, "t_bl", "key", 8)
        write_bucketed(right, "t_br", "key", 8)
        joined = bucketed_join(spark, "t_bl", "t_br", ["key"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 2500
        # identical unbucketed join DOES shuffle — the layout is the win
        shuffled = left.join(right, ["key"])
        assert "Exchange" in _plan(shuffled)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS t_bl")
        spark.sql("DROP TABLE IF EXISTS t_br")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_zorder_key_matches_reference_interleave(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import zorder_key

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.range(200).select(
        (F.col("id") * 7 % 301).alias("x"), (F.col("id") * 13 % 509).alias("y")
    )
    rows = df.withColumn("z", zorder_key(F.col("x"), F.col("y"))).collect()
    for r in rows:
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_layout_prunes_non_leading_dim(spark):
    """The point of the layout: range-partitioned Z-curve segments give
    every file a compact bounding box in BOTH dims, so a predicate on
    the NON-leading dimension skips most files; a lexicographic layout
    (sort by x) puts the full y range in every file and skips none."""
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        zorder_key,
        zorder_layout,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    n_files = 16

    def overlapping_files(parts_df):
        # per-output-partition min/max — exactly the parquet footer
        # stats a reader would prune on
        stats = (
            parts_df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
            .collect()
        )
        # repartitionByRange samples boundaries and may legally leave
        # some partitions empty (they emit no stats row) — assert the
        # bound, and base ratios on the observed non-empty count
        assert 0 < len(stats) <= n_files
        # probe: y BETWEEN 0 AND 3 (a thin slice of the non-leading dim)
        return (
            sum(1 for r in stats if r["lo"] <= 3 and r["hi"] >= 0),
            len(stats),
        )

    lex = grid.repartitionByRange(n_files, "x", "y")
    zed = zorder_layout(grid, "x", "y", n_files)
    (n_lex, lex_files), (n_zed, zed_files) = (
        overlapping_files(lex),
        overlapping_files(zed),
    )
    assert n_lex == lex_files  # every x-stripe spans all of y
    assert n_zed <= zed_files // 2, (n_zed, zed_files, n_lex, lex_files)


def test_skew_profile_ranks_and_shares(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import skew_profile

    # key 'hot' holds 6 of 10 rows -> 600000 ppm, rank 1
    rows = [(i, "hot" if i < 6 else f"k{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = skew_profile(df, "k", top_k=3).collect()
    assert [r["rnk"] for r in out] == [1, 2, 3]
    top = out[0]
    assert (top["k"], top["cnt"], top["share_ppm"]) == ("hot", 6, 600000)
    # ties (all cnt=1) break on key ascending
    assert [r["k"] for r in out[1:]] == ["k6", "k7"]


def test_column_stats_one_pass_exact(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import column_stats

    rows = [(1.0, None), (2.5, 4.0), (2.5, 4.0), (-1.25, None)]
    df = spark.createDataFrame(rows, "a double, b double")
    out = {r["col"]: r for r in column_stats(df, ["a", "b"]).collect()}
    a, b = out["a"], out["b"]
    assert (a["lo_c"], a["hi_c"], a["ndv"], a["n_nulls"]) == (-125, 250, 3, 0)
    assert (b["lo_c"], b["hi_c"], b["ndv"], b["n_nulls"]) == (400, 400, 1, 2)


def test_corr_matrix_known_correlations(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import corr_matrix

    # y = x exactly (r = 1), z anti-correlated with x (r = -1)
    rows = [(float(i), float(i), float(10 - i)) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r["r"] for r in corr_matrix(
        df, [("x", 100), ("y", 100), ("z", 100)]
    ).collect()}
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0


def test_hilbert_key_matches_python_reference(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        hilbert_key_df,
    )

    def ref(x, y, bits):
        d = 0
        s = 1 << (bits - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in hilbert_key_df(grid, "x", "y", bits=4).collect()
    }
    for (x, y), h in got.items():
        assert h == ref(x, y, 4), (x, y)
    # bijective over the grid and consecutive addresses are neighbors
    inv = {h: xy for xy, h in got.items()}
    assert sorted(inv) == list(range(256))
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_locality_beats_zorder(spark):
    # the locality claim, measured: over all consecutive address pairs
    # the Hilbert curve's grid distance is ALWAYS 1, while the Morton
    # curve takes diagonal jumps (distance > 1) at quadrant boundaries
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        hilbert_key_df,
        zorder_key,
    )

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    h = {
        r["hkey"]: (r["x"], r["y"])
        for r in hilbert_key_df(grid, "x", "y", bits=4).collect()
    }
    z = {
        r["zkey"]: (r["x"], r["y"])
        for r in grid.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=4).alias("zkey")
        ).collect()
    }

    def max_jump(m):
        return max(
            abs(m[d][0] - m[d + 1][0]) + abs(m[d][1] - m[d + 1][1])
            for d in range(255)
        )

    assert max_jump(h) == 1
    assert max_jump(z) > 1


def test_hilbert_layout_prunes_at_least_as_well_as_zorder(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        hilbert_layout,
        zorder_layout,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    n_files = 16

    def overlap_ratio(parts_df):
        stats = (
            parts_df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
            .collect()
        )
        assert 0 < len(stats) <= n_files
        n = sum(1 for r in stats if r["lo"] <= 3 and r["hi"] >= 0)
        return n / len(stats)

    hil = overlap_ratio(hilbert_layout(grid, "x", "y", n_files, bits=6))
    zed = overlap_ratio(zorder_layout(grid, "x", "y", n_files, bits=6))
    # connected regions can only tighten the bounding boxes: the
    # non-leading-dim probe must touch no more files than under Morton
    assert hil <= zed
    assert hil < 1.0


def test_compaction_plan_matches_python_next_fit(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        compaction_plan,
    )

    # controlled file sizes: one "file" per (day, type), bytes =
    # sum(len(props)) + 32 * rows; recompute the next-fit-decreasing
    # plan in plain Python and require exact agreement
    rows, eid = [], 0
    sizes = {}
    for day, typ, payloads in [
        (1, "a", ["x" * 100, "y" * 60]),
        (1, "b", ["x" * 300]),
        (2, "a", ["x" * 10] * 5),
        (2, "b", ["x" * 250, "y" * 5]),
        (3, "a", ["x" * 40]),
    ]:
        for p in payloads:
            rows.append((eid, datetime(2024, 3, day, 12), 1, typ, 1.0, p))
            eid += 1
        sizes[(day, typ)] = sum(len(p) for p in payloads) + 32 * len(payloads)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    target = 300
    got = [
        (r["grp"], r["n_files"], r["total_bytes"], r["max_file_bytes"])
        for r in compaction_plan(df, target_bytes=target).collect()
    ]
    order = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, expect = 0, {}
    for (day, typ), b in order:
        g = cum // target
        n, tot, mx = expect.get(g, (0, 0, 0))
        expect[g] = (n + 1, tot + b, max(mx, b))
        cum += b
    assert got == [(g, *expect[g]) for g in sorted(expect)]


def test_bloom_prefilter_matches_python_reference(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        BLOOM_BITS,
        BLOOM_H1_MUL,
        BLOOM_H2_ADD,
        BLOOM_H2_MUL,
        bloom_prefilter_stats,
    )

    build_keys = [3, 17, 101, 4242]
    probe_keys = [k * 13 + 5 for k in range(400)] + build_keys * 2
    build = spark.createDataFrame([(k,) for k in build_keys], "k long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "p long")
    row = bloom_prefilter_stats(build, "k", probe, "p").collect()[0]

    b1 = {(k * BLOOM_H1_MUL) % BLOOM_BITS for k in build_keys}
    b2 = {(k * BLOOM_H2_MUL + BLOOM_H2_ADD) % BLOOM_BITS for k in build_keys}
    n_pass = sum(
        1
        for k in probe_keys
        if (k * BLOOM_H1_MUL) % BLOOM_BITS in b1
        and (k * BLOOM_H2_MUL + BLOOM_H2_ADD) % BLOOM_BITS in b2
    )
    n_true = sum(1 for k in probe_keys if k in set(build_keys))
    assert (row["n_probe"], row["n_pass"], row["n_true"], row["n_false_pos"]) == (
        len(probe_keys),
        n_pass,
        n_true,
        n_pass - n_true,
    )
    # the filter never rejects a true match (no false negatives)
    assert row["n_pass"] >= row["n_true"]


def test_layout_advisor_rules(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        layout_advisor,
    )

    n = 5000
    rows = [
        (
            i,                                  # id: unique -> bucket
            f"m{i % 12:02d}",                   # month: ndv 12 -> partition
            f"s{i % 3}",                        # status: ndv 3 -> zorder
            f"f{i % 2}",                        # flag: ndv 2 -> misses top-2
            "A" if i < 3000 else f"h{i % 9}",   # hot: ndv 10 but 60% skew
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, month string, status string, flag string, hot string"
    )
    got = {
        r["role"] + ":" + r["col"]: (r["ndv"], r["top1_ppm"], r["n_buckets"])
        for r in layout_advisor(
            df, ["id", "month", "status", "flag", "hot"]
        ).collect()
    }
    # partition: month (highest NDV inside [2,1000] and <=50% top share);
    # hot is NDV-eligible but 600000 ppm skewed -> rejected
    assert set(got) == {"partition:month", "bucket:id", "zorder:hot",
                        "zorder:status"}
    assert got["partition:month"][0] == 12
    # bucket ladder: 5000 DIV 1024 = 4 <= 8 -> 8 buckets
    assert got["bucket:id"] == (5000, 1000000 // 5000, 8)
    assert got["zorder:hot"][1] == 600000


def test_countmin_overestimates_only_and_matches_reference(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        CMS_HASHES,
        CMS_W,
        countmin_estimate,
    )

    # skewed stream: key 7 hot, long tail; force collisions by keeping
    # keys spread over a range larger than any single bucket row
    keys = [7] * 500 + [k for k in range(1000, 1400) for _ in range(2)]
    stream = spark.createDataFrame([(k,) for k in keys], "k long")
    queries = spark.createDataFrame(
        [(7, 500), (1001, 2), (999999, 0)], "k long, truth long"
    )
    got = {r["k"]: (r["truth"], r["est"]) for r in
           countmin_estimate(stream, "k", queries, "k").collect()}

    from collections import Counter
    counters = [Counter() for _ in CMS_HASHES]
    for k in keys:
        for i, (mul, add) in enumerate(CMS_HASHES):
            counters[i][(k * mul + add) % CMS_W] += 1
    for k, (truth, est) in got.items():
        ref = min(
            counters[i][(k * mul + add) % CMS_W]
            for i, (mul, add) in enumerate(CMS_HASHES)
        )
        assert est == ref          # bit-exact vs the Python replay
        assert est >= truth        # CMS never undercounts


def test_distribution_drift_detects_shifted_half(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        distribution_drift,
    )

    rows = []
    eid = 0
    # key "stable": identical histograms both halves -> tv = 0
    # key "shifted": values move from bucket 0 to bucket 2 -> tv = 1e6
    for day in (1, 20):
        for i in range(10):
            rows.append((eid, datetime(2024, 1, day, 1, i), 1, "stable", 10.0, "")); eid += 1
            v = 10.0 if day == 1 else 110.0
            rows.append((eid, datetime(2024, 1, day, 2, i), 1, "shifted", v, "")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["key"]: r for r in distribution_drift(df).collect()}
    assert out["stable"]["tv_ppm"] == 0
    assert out["shifted"]["tv_ppm"] == 1_000_000
    assert out["stable"]["n_a"] == out["stable"]["n_b"] == 10


def test_hll_distinct_matches_python_replay_and_reasonable_error(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        HLL_ADD,
        HLL_ADD2,
        HLL_C,
        HLL_M,
        HLL_MUL,
        HLL_MUL2,
        HLL_P,
        HLL_R,
        hll_distinct,
    )

    keys = {"a": list(range(1, 2001)), "b": [7, 7, 7, 11, 13]}
    rows = [(k, g) for g, ks in keys.items() for k in ks]
    df = spark.createDataFrame(rows, "k long, g string")
    out = {r["g"]: r for r in hll_distinct(df, "k", "g").collect()}

    def replay(ks):
        regs = [0] * HLL_M
        for k in ks:
            h1 = (k * HLL_MUL + HLL_ADD) % HLL_P
            h = ((h1 * h1) % HLL_P + (HLL_MUL2 * h1) % HLL_P + HLL_ADD2) % HLL_P
            r, w = h % HLL_M, h // HLL_M
            rho = 26 if w == 0 else (w & -w).bit_length()
            regs[r] = max(regs[r], rho)
        s = sum(1 << (HLL_R - rho) for rho in regs)
        import math

        return sum(1 for rho in regs if rho == 0), math.floor(HLL_C / s)

    for g, ks in keys.items():
        zero, est = replay(ks)
        assert (out[g]["zero_regs"], out[g]["est"]) == (zero, est), g
    # 2000 distinct keys, m=64 -> expect the estimate within ~3 std
    # errors (1.04/8 = 13%) of truth; a lattice-biased hash fails this
    assert abs(out["a"]["est"] - 2000) / 2000 < 0.4


def test_dynamic_partition_pruning_fires_on_partitioned_fact(
    spark, tmp_path_factory
):
    """The 100 TB lever Catalyst applies at runtime: joining a
    partition-keyed fact table against a FILTERED dim must inject a
    dynamicpruning subquery into the fact scan, so only the dim's
    surviving partition values are read — scan cost follows the dim
    filter, not the fact size. Pinned here so a layout or join-shape
    refactor cannot silently lose it."""
    path = str(tmp_path_factory.mktemp("dpp") / "fact.parquet")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.createDataFrame(
        [(i, i % 8, float(i)) for i in range(800)],
        "id long, part_key long, v double",
    )
    fact.write.partitionBy("part_key").mode("overwrite").parquet(path)
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(8)],
        "part_key long, flag string",
    )
    joined = (
        spark.read.parquet(path)
        .join(dim.where(F.col("flag") == "keep"), "part_key")
        .groupBy("part_key")
        .agg(F.sum("v").alias("sv"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the result is correct: only partitions 0 and 1 survive
    got = {r["part_key"]: r["sv"] for r in joined.collect()}
    assert set(got) == {0, 1}
    assert got[0] == sum(float(i) for i in range(800) if i % 8 == 0)


def test_record_linkage_blocking_and_scoring(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        record_linkage,
    )

    # same block (nation 1, BUILDING): 101/102 agree on balance AND
    # name suffix (score 3); 101/103 agree only on suffix (1) -> cut;
    # 104 is in another block and must NEVER pair despite identical
    # fields (blocking bounds the candidate space)
    rows = [
        (101, "Customer#000000101", 1, 50.00, "BUILDING"),
        (102, "Customer#000000201", 1, 49.50, "BUILDING"),
        (103, "Customer#000000111", 1, 900.00, "BUILDING"),
        (104, "Customer#000000301", 2, 50.00, "MACHINERY"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    got = [
        (r["cust_a"], r["cust_b"], r["score"], r["bal_diff_cents"])
        for r in record_linkage(df).collect()
    ]
    assert got == [(101, 102, 3, 50)]


def test_bitmap_index_and_matches_direct(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        bitmap_index_and,
    )

    # keys 0..199: pred_a = even keys, pred_b = key % 3 == 0;
    # AND = multiples of 6 -> 34 keys (0, 6, ..., 198)
    df = spark.createDataFrame(
        [(i, i % 2 == 0, i % 3 == 0) for i in range(200)],
        "k long, a boolean, b boolean",
    )
    r = bitmap_index_and(df, "k", F.col("a"), F.col("b")).collect()[0]
    assert r["bitmap_count"] == r["direct_count"] == 34
    # every word holds some even key -> 200/32 rounded up words
    assert r["words_a"] == 7


def test_k_anonymity_flags_small_groups(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        k_anonymity_audit,
    )

    rows = [(i, f"Customer#{i:09d}", 1, 500.0, "BUILDING") for i in range(8)]
    rows += [(100, "Customer#000000100", 2, 1500.0, "MACHINERY")]  # group of 1
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    got = [
        (r["c_nationkey"], r["group_n"], r["violates"])
        for r in k_anonymity_audit(df).collect()
    ]
    # smallest first: the singleton violates (k=5), the 8-group passes
    assert got == [(2, 1, 1), (1, 8, 0)]


def test_ab_ztest_hand_proportions(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        ab_ztest,
    )

    # even users (arm 1): 8/10 convert; odd users (arm 0): 4/10 --
    # z for (0.4 vs 0.8) at n=10 each is ~ -1.826: below the 1.96 bar
    rows = []
    eid = 0
    for u in range(20):
        converts = (u % 10 < 8) if u % 2 == 0 else (u % 10 < 4)
        # conv := more purchases than errors
        kinds = ["purchase", "purchase", "error"] if converts else [
            "error", "error", "purchase"]
        for k in kinds:
            rows.append((eid, datetime(2024, 3, 1, 0, eid % 60), u, k, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = ab_ztest(df).collect()[0]
    assert (r["n_a"], r["n_b"]) == (10, 10)
    assert (r["conv_a"], r["conv_b"]) == (4, 8)
    import math

    pp = 12 / 20
    z = (0.4 - 0.8) / math.sqrt(pp * (1 - pp) * (1 / 10 + 1 / 10))
    assert r["z"] == math.floor(z * 1e6 + 0.5) / 1e6
    assert r["significant"] == 0


def test_slo_burn_rate_threshold(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        SLO_BUDGET_PPM,
        slo_burn_rate,
    )

    # hour 0: 50% errors (burn >> 1e6, paging); hour 1: ~4.5% (quiet)
    rows = [
        (i, datetime(2024, 3, 1, 0, i % 60), 1,
         "error" if i % 2 == 0 else "view", 1.0)
        for i in range(40)
    ] + [
        (100 + i, datetime(2024, 3, 1, 1, i % 60), 1,
         "error" if i == 0 else "view", 1.0)
        for i in range(22)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = slo_burn_rate(df).collect()
    hot, quiet = out[0], out[1]
    assert (hot["n_events"], hot["n_errors"], hot["paging"]) == (40, 20, 1)
    assert hot["burn_ppm"] == 20 * 10**12 // (40 * SLO_BUDGET_PPM)
    assert (quiet["n_errors"], quiet["paging"]) == (1, 0)


def test_kmv_distinct_exact_below_capacity_and_mergeable(spark):
    """KMV contract: (1) a group with < k distinct keys reports the
    EXACT count; (2) above capacity the estimate is the closed form
    (k-1)*P div h_k replayed in Python on the same hash; (3) the
    sketch is mergeable — bottom-k over shard-A ∪ shard-B equals the
    bottom-k of the union of the shard bottom-k sets."""
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        HLL_ADD,
        HLL_ADD2,
        HLL_MUL,
        HLL_MUL2,
        HLL_P,
        kmv_distinct,
    )

    def h(key):
        h1 = (key * HLL_MUL + HLL_ADD) % HLL_P
        return ((h1 * h1) % HLL_P + (HLL_MUL2 * h1) % HLL_P + HLL_ADD2) % HLL_P

    # group 'small': 5 distinct keys (< k) -> exact; group 'big': 300
    rows = [(k, "small") for k in range(5)] * 3
    rows += [(1000 + k, "big") for k in range(300)]
    df = spark.createDataFrame(rows, "key long, g string")
    got = {r["g"]: (r["n_kept"], r["est"])
           for r in kmv_distinct(df, "key", "g", k=64).collect()}
    assert got["small"] == (5, 5)
    hashes = sorted({h(1000 + k) for k in range(300)})
    hk = hashes[63]
    assert got["big"] == (64, (63 * HLL_P) // hk)
    # estimate within 35% of truth at k=64 (statistical sanity)
    assert abs(got["big"][1] - 300) / 300 < 0.35

    # mergeability: shard bottom-64 sets union -> same bottom-64
    shard_a = sorted({h(1000 + k) for k in range(150)})[:64]
    shard_b = sorted({h(1000 + k) for k in range(150, 300)})[:64]
    merged = sorted(set(shard_a) | set(shard_b))[:64]
    assert merged == hashes[:64]


def test_equidepth_hist_partitions_and_tie_semantics(spark):
    """Equi-depth buckets partition the input exactly (sum n = rows),
    bucket ranges are disjoint and ordered, and duplicate-heavy values
    land in the LOWER bucket (ties never split a value across
    buckets)."""
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        equidepth_hist,
    )

    # 16 distinct values -> 8 buckets of exactly 2
    df = spark.createDataFrame([(v,) for v in range(1, 17)], "v long")
    got = [(r["bucket"], r["n"], r["lo"], r["hi"])
           for r in equidepth_hist(df, "v").collect()]
    assert [g[0] for g in got] == list(range(1, 9))
    assert all(g[1] == 2 for g in got)
    assert got[0][2] == 1 and got[-1][3] == 16
    for (b1, _, _, hi1), (b2, _, lo2, _) in zip(got, got[1:]):
        assert hi1 < lo2

    # heavy duplicates: value 5 x20 + 1..4 -> 5 never splits
    df2 = spark.createDataFrame(
        [(5,)] * 20 + [(v,) for v in range(1, 5)], "v long"
    )
    got2 = [(r["bucket"], r["n"], r["lo"], r["hi"])
            for r in equidepth_hist(df2, "v").collect()]
    assert sum(g[1] for g in got2) == 24
    fives = [g for g in got2 if g[2] <= 5 <= g[3]]
    assert len(fives) == 1 and fives[0][1] >= 20


def test_selfjoin_profile_hand_counts(spark):
    """pairs = c*(c-1)/2 per key, shares sum to <= 1e6, total is the
    exact candidate count of the self-equi-join."""
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        selfjoin_profile,
    )

    rows = [(1, "hot")] * 4 + [(2, "warm")] * 2 + [(3, "cold")]
    df = spark.createDataFrame(
        [(i, r[1]) for i, r in enumerate(rows)],
        "row_id long, key string",
    )
    got = {r["key"]: (r["c"], r["pairs"], r["share_ppm"], r["total_pairs"])
           for r in selfjoin_profile(df, "key").collect()}
    # hot: 4 rows -> 6 pairs; warm: 2 -> 1; cold: 1 -> 0; total 7
    assert got["hot"] == (4, 6, (1000000 * 6) // 7, 7)
    assert got["warm"] == (2, 1, (1000000 * 1) // 7, 7)
    assert got["cold"][1] == 0


def test_grouping_skew_gini_known_distributions(spark):
    """Gini contract: uniform group sizes -> 0; extreme concentration
    -> close to (n-1)/n; a hand case matches the closed form."""
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        grouping_skew_gini,
    )

    # uniform: 4 groups x 3 rows -> G = 0
    uni = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(12)], "row_id long, key string"
    )
    row = grouping_skew_gini(uni, "key").collect()[0]
    assert (row["n_groups"], row["total"], row["gini_ppm"]) == (4, 12, 0)

    # hand case: sizes 1, 3 ascending -> G = (2*(1*1+2*3) - 3*4) / (2*4)
    # = (14 - 12) / 8 = 0.25
    h = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "b"), (3, "b")], "row_id long, key string"
    )
    row = grouping_skew_gini(h, "key").collect()[0]
    assert row["gini_ppm"] == 250000

    # concentration: one group of 97 + 3 singletons -> G large
    conc = spark.createDataFrame(
        [(i, "big") for i in range(97)]
        + [(100 + j, f"s{j}") for j in range(3)],
        "row_id long, key string",
    )
    row = grouping_skew_gini(conc, "key").collect()[0]
    assert row["gini_ppm"] > 700000


def test_zone_map_skip_sim_clustered_vs_scrambled(spark):
    """Perfectly clustered layout: 1024 rows, o = v, 64 files of 16
    values, 16 predicates of 64 values -> each predicate overlaps
    exactly 4 files -> scanned 64 of 1024 pairs = 937500 ppm skipped,
    exactly. A scrambling permutation of the same values spreads every
    file's zone across ~the full span -> (near) zero skip."""
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        zone_map_skip_sim,
    )

    base = spark.range(1024).select(F.col("id").alias("o"))
    clustered = base.select("o", F.col("o").alias("v"))
    row = zone_map_skip_sim(
        clustered, "clustered", F.col("o"), F.col("v")
    ).collect()[0]
    assert row["layout"] == "clustered"
    assert row["pairs_scanned"] == 64
    assert row["skip_ppm"] == 937500

    scrambled = base.select(
        "o", ((F.col("o") * 617) % 1024).alias("v")
    )
    row = zone_map_skip_sim(
        scrambled, "scrambled", F.col("o"), F.col("v")
    ).collect()[0]
    # 617 is odd and coprime to 1024: a full permutation, so every
    # 16-row file spans nearly the whole value range (measured
    # 101562 ppm — a whisker above zero, an order of magnitude under
    # the clustered layout's 937500)
    assert row["skip_ppm"] < 150000


def test_shuffle_advisor_hand_values(spark):
    """Exact byte model and recommendation on a hand table: 4 rows x
    (1 long + 1 string) with known lengths, a tiny target budget, and
    a deliberately skewed key."""
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        shuffle_advisor,
    )

    df = spark.createDataFrame(
        [(1, "aa"), (1, "bbbb"), (1, "c"), (2, "dd")],
        "k long, s string",
    )
    row = shuffle_advisor(df, "k", target_bytes=20).collect()[0]
    # est = 4 rows * 8 (long) + (2+4)+(4+4)+(1+4)+(2+4) = 32 + 25 = 57
    assert row["n_rows"] == 4
    assert row["est_bytes"] == 57
    assert row["recommended_partitions"] == (57 + 19) // 20  # ceil = 3
    assert row["skew_key_top1_ppm"] == 750000  # key 1 owns 3 of 4 rows
    assert bool(row["needs_salting"]) is True


def test_kmv_set_ops_exact_below_capacity(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        kmv_set_ops,
    )

    # |A|=30, |B|=30, overlap 10: every sketch is below k=64 capacity,
    # so union/intersection/Jaccard degrade to EXACT values
    rows = [(i, "A") for i in range(1, 31)] + [
        (i, "B") for i in range(21, 51)
    ]
    df = spark.createDataFrame(rows, "k long, side string")
    got = kmv_set_ops(df, "k", "side").collect()[0]
    assert (got["n_a_kept"], got["n_b_kept"]) == (30, 30)
    assert got["union_est"] == 50
    assert got["jacc_ppm"] == 1000000 * 10 // 50
    assert got["inter_est"] == 10


def test_kmv_set_ops_estimates_above_capacity(spark):
    from query_refinement_dsit_databases_2021_spark.operators.scale import (
        kmv_set_ops,
    )

    # |A|=600, |B|=600, |A∩B|=200, |A∪B|=1000: sketches saturate at
    # k=64 and the estimates should land within a loose (k=64) band
    rows = [(i, "A") for i in range(1, 601)] + [
        (i, "B") for i in range(401, 1001)
    ]
    df = spark.createDataFrame(rows, "k long, side string")
    got = kmv_set_ops(df, "k", "side").collect()[0]
    assert (got["n_a_kept"], got["n_b_kept"]) == (64, 64)
    assert 600 <= got["union_est"] <= 1500
    assert 50 <= got["inter_est"] <= 450
    # determinism: a different partitioning yields the identical row
    again = kmv_set_ops(df.repartition(13), "k", "side").collect()[0]
    assert tuple(got) == tuple(again)
