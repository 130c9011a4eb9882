"""Unit tests for the dataset-assembly operators
(``operators/sampling.py``) and near-dup cluster resolution
(``dedup.neardup_components``) on hand-checkable fixtures. The
sf-scale DuckDB differential check lives in test_workloads_oracle.py
(pipe_split_hash / pipe_sample_stratified / pipe_pack_sequences /
pipe_chunk_documents / pipe_dedup_clusters)."""

import pytest
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.operators.dedup import (
    neardup_components,
)
from query_refinement_dsit_databases_2021_spark.operators.sampling import (
    chunk_documents,
    hash_split,
    pack_sequences,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 9)), ["en", "de"][i % 2], f"src{i % 3}")
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_hash_split_deterministic_and_total(docs):
    a = {r.doc_id: r.split for r in hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == 60
    # stability under growth: assignments of existing keys never move
    sub = {r.doc_id: r.split for r in hash_split(docs.limit(20)).collect()}
    assert all(a[k] == v for k, v in sub.items())


def test_hash_split_respects_weights(docs):
    big = docs.selectExpr("doc_id * 97 + 13 AS doc_id", "text", "lang", "source")
    counts = (
        hash_split(big).groupBy("split").count().rdd.collectAsMap()
    )
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_stratified_exact_counts(docs):
    out = stratified_sample(docs, fraction=0.25, exact=True)
    got = out.groupBy("lang").count().rdd.collectAsMap()
    want = {
        r["lang"]: r["count"] * 2500 // 10_000
        for r in docs.groupBy("lang").count().collect()
    }
    assert got == {k: v for k, v in want.items() if v}
    # keeps input columns untouched
    assert out.columns == docs.columns


def test_stratified_bernoulli_is_subset_and_deterministic(docs):
    s1 = {r.doc_id for r in stratified_sample(docs, fraction=0.5).collect()}
    s2 = {r.doc_id for r in stratified_sample(docs, fraction=0.5).collect()}
    assert s1 == s2
    all_ids = {r.doc_id for r in docs.collect()}
    assert s1 <= all_ids and 0 < len(s1) < len(all_ids)


def test_pack_sequences_bins(docs):
    out = pack_sequences(docs, budget=10).collect()
    by_group = {}
    for r in sorted(out, key=lambda r: (r.source, r.doc_id)):
        by_group.setdefault(r.source, []).append(r)
    for rows in by_group.values():
        cum = 0
        for r in rows:
            assert r.bin == cum // 10  # bin = exclusive prefix div budget
            cum += r.n_tokens
        bins = [r.bin for r in rows]
        assert bins == sorted(bins) and bins[0] == 0


def test_chunk_documents_covers_text(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij" * 50), (2, "short"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk=200, overlap=40).collect()
    texts = {r[0]: r[1] for r in df.collect()}
    for doc_id, text in texts.items():
        chunks = sorted(
            (r for r in out if r.doc_id == doc_id), key=lambda r: r.start
        )
        assert chunks[0].start == 1
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        # non-overlap strides reconstruct the original text
        rebuilt = "".join(c.chunk_text[:160] for c in chunks)
        assert rebuilt == text
        assert all(len(c.chunk_text) <= 200 for c in chunks)


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk=10, overlap=10)


def test_neardup_components_small_graph(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6), (8, 9), (9, 10)],
        "doc_a long, doc_b long",
    )
    docs = spark.createDataFrame([(i,) for i in range(1, 12)], "doc_id long")
    got = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in neardup_components(pairs, docs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (5, False), 7: (7, True),
        8: (8, True), 9: (8, False), 10: (8, False), 11: (11, True),
    }


def test_neardup_components_chain_diameter(spark):
    # a 12-node path: worst-case diameter for min-label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    out = neardup_components(pairs).collect()
    assert {r.cluster_id for r in out} == {1}
    assert sum(1 for r in out if r.is_canonical) == 1


def test_neardup_components_without_docs_only_paired(spark):
    pairs = spark.createDataFrame([(4, 2)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in neardup_components(pairs).collect()}
    assert got == {2: 2, 4: 2}


def test_neardup_components_raises_when_unconverged(spark):
    # exhausting max_iters must raise, never silently return partial
    # (wrong) labels: a 12-node path cannot converge in one
    # propagate+hop round
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(pairs, max_iters=1)


def test_weighted_sample_probability_extremes(spark):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 1.0 if i % 2 == 0 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = {r.doc_id for r in weighted_sample(df, "w").collect()}
    # weight 1 -> always kept, weight 0 -> never kept
    assert kept == {i for i in range(100) if i % 2 == 0}
    # out-of-range weights clamp rather than error
    df2 = spark.createDataFrame([(1, 7.5), (2, -3.0)], "doc_id long, w double")
    assert {r.doc_id for r in weighted_sample(df2, "w").collect()} == {1}


def test_remix_sources_hits_target_mix(docs):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        remix_sources,
    )

    # docs fixture: 60 rows over src0/src1/src2, 20 each
    out = remix_sources(docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25})
    got = out.groupBy("source").count().rdd.collectAsMap()
    # N = min(20/0.5, 20/0.25, 20/0.25) = 40 -> caps 20 / 10 / 10
    assert got == {"src0": 20, "src1": 10, "src2": 10}
    # groups absent from targets are dropped entirely
    out2 = remix_sources(docs, {"src0": 1.0})
    assert out2.groupBy("source").count().rdd.collectAsMap() == {"src0": 20}
    # deterministic across invocations
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in remix_sources(
            docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25}
        ).collect()
    )
    assert a == b


def test_remix_sources_rejects_bad_targets(docs):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        remix_sources,
    )

    with pytest.raises(ValueError):
        remix_sources(docs, {})
    with pytest.raises(ValueError):
        remix_sources(docs, {"src0": -0.1})
    with pytest.raises(ValueError):
        remix_sources(docs, {"src0": 0.0})
    # a positive-share target group missing from the data raises
    # instead of silently returning an empty result (its oracle
    # would otherwise diverge: an inner join drops the group and
    # still samples the others)
    with pytest.raises(ValueError, match="absent from data"):
        remix_sources(docs, {"nope": 1.0})
    with pytest.raises(ValueError, match="nope"):
        remix_sources(docs, {"src0": 0.5, "nope": 0.5})
    # a ZERO-share target for a missing group is harmless: it asks
    # for nothing, so the mix is still satisfiable
    out = remix_sources(docs, {"src0": 1.0, "nope": 0.0})
    assert out.groupBy("source").count().rdd.collectAsMap() == {"src0": 20}


def test_temperature_mix_caps_and_extremes(spark):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, f"t{i}", "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # alpha=0.5: caps = floor(sqrt(n_g * n_min)) -> big 20, small 10
    got = (
        temperature_mix(df).groupBy("source").count().rdd.collectAsMap()
    )
    assert got == {"big": 20, "small": 10}
    # the smallest group is always kept whole (cap_min = n_min)
    assert got["small"] == 10
    # alpha=1 is the natural mix (keep everything)
    assert temperature_mix(df, alpha=1.0).count() == 50
    # alpha=0 equalizes: every group capped at n_min
    eq = temperature_mix(df, alpha=0.0).groupBy("source").count().rdd.collectAsMap()
    assert eq == {"big": 10, "small": 10}
    # deterministic
    a = sorted(r.doc_id for r in temperature_mix(df).collect())
    assert a == sorted(r.doc_id for r in temperature_mix(df).collect())
    with pytest.raises(ValueError):
        temperature_mix(df, alpha=1.5)


def test_importance_weights_separates_target_vocabulary(spark):
    """DSIR-style scoring: documents written in the target population's
    vocabulary must outscore documents in the raw population's
    vocabulary, and a mixed doc must land between them."""
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        importance_weights,
    )

    rows = (
        # target (en) docs use vocabulary A
        [(i, "alpha beta gamma delta alpha beta", "en") for i in range(8)]
        # raw docs use vocabulary B
        + [(10 + i, "omega psi chi phi omega psi", "fr") for i in range(8)]
        # one raw doc written in vocabulary A, one mixed
        + [(30, "alpha beta gamma delta alpha beta", "fr"),
           (31, "alpha beta omega psi", "fr")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r["score_ppm"] for r in importance_weights(df).collect()}
    assert got[0] > got[10]          # target vocab >> raw vocab
    assert got[30] == got[0]         # score depends on text, not label
    assert got[10] < got[31] < got[30]  # mixed doc in between
    # per-token normalization: same text => same score regardless of length
    assert got[0] == got[7]


def test_importance_weights_is_integer_exact_and_total(spark):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        importance_weights,
    )

    rows = [(i, f"w{i % 5} w{(i + 1) % 5}", "en" if i % 2 == 0 else "fr")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = importance_weights(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "bigint", "bigint", "bigint"
    ]
    rows_out = out.collect()
    assert len(rows_out) == 20  # every doc scored
    for r in rows_out:
        assert r["score_ppm"] == r["score_sum"] // r["n_tokens"]


def test_mixture_plan_epochs_and_rates(spark):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        mixture_plan,
    )

    # en has 40 tokens available, fr has 10
    rows = [(i, " ".join(["t"] * 10), "en") for i in range(4)] + [
        (100, " ".join(["t"] * 10), "fr")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["lang"]: r
        for r in mixture_plan(
            df, total_tokens=100, weights=(("en", 200_000), ("fr", 800_000))
        ).collect()
    }
    # en: target 20 of 40 available -> 1 epoch, downsample to 50%
    assert got["en"]["target_tokens"] == 20
    assert got["en"]["epochs"] == 1
    assert got["en"]["rate_ppm"] == 500_000
    # fr: target 80 of 10 available -> 8 epochs, rate capped at 1e6
    assert got["fr"]["target_tokens"] == 80
    assert got["fr"]["epochs"] == 8
    assert got["fr"]["rate_ppm"] == 1_000_000
    # groups without a weight are absent
    assert set(got) == {"en", "fr"}


def test_pack_efficiency_hand_bins(spark):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        pack_efficiency,
    )

    # 5 docs x 10 tokens, budget 16: bins at prefix//16 = 0,0,1,1,2
    rows = [(i, " ".join(["t"] * 10), "s") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = pack_efficiency(df, budget=16).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_docs"] == 5 and r["n_bins"] == 3
    assert r["total_tokens"] == 50
    # fill = 1e6 * 50 / (3 * 16)
    assert r["fill_ppm"] == (1_000_000 * 50) // 48
    assert r["max_bin_tokens"] == 20  # two 10-token docs share a bin


def test_curriculum_phases_orders_by_quality_without_global_sort(spark):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        curriculum_phases,
    )

    # high-quality: diverse tokens; low-quality: repeated token
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(20)), "s") for i in range(10)]
    rows += [(100 + i, " ".join(["the"] * 20), "s") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in curriculum_phases(df, n_phases=2).collect()}
    assert len(got) == 20
    # diverse docs in the earlier phase than the degenerate ones
    assert all(got[i]["phase"] == 0 for i in range(10))
    assert all(got[100 + i]["phase"] == 1 for i in range(10))
    # equal scores share a phase (tie contract)
    assert len({got[100 + i]["phase"] for i in range(10)}) == 1
    # plan: no global-sort ranking of the corpus — the only Window runs
    # over the <=1001-row score histogram, and the corpus side joins it
    # by broadcast
    plan = curriculum_phases(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_target_encoding_shrinks_rare_category(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        TE_SMOOTH_M,
        target_encoding,
    )

    # 'common': 200 events at $10; 'rare': 1 event at $1000.
    # prior ~ (200*1000 + 100000)/201 cents; the rare encoding must be
    # pulled far from $1000 toward the prior, the common one barely
    rows = [
        (i, datetime(2024, 3, 1, 0, i % 60), 1, "common", 10.0)
        for i in range(200)
    ] + [(999, datetime(2024, 3, 1, 1, 0), 1, "rare", 1000.0)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r["event_type"]: r for r in target_encoding(df).collect()}
    gs, gn = 200 * 1000 + 100000, 201
    import math

    def exp_enc(sc, n):
        num = sc * gn + gs * TE_SMOOTH_M
        den = gn * (n + TE_SMOOTH_M) * 100.0
        return math.floor(num / den * 1e6 + 0.5) / 1e6

    assert out["common"]["enc"] == exp_enc(200 * 1000, 200)
    assert out["rare"]["enc"] == exp_enc(100000, 1)
    prior = gs / gn / 100.0
    assert abs(out["rare"]["enc"] - prior) < abs(1000.0 - prior) * 0.05


def test_kfold_assignment_covers_and_balances(spark):
    from query_refinement_dsit_databases_2021_spark.operators.sampling import (
        KFOLD_K,
        kfold_assignment,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(500)], "doc_id long, text string"
    )
    out = kfold_assignment(docs).collect()
    assert [r["fold"] for r in out] == list(range(KFOLD_K))
    assert sum(r["n"] for r in out) == 500  # coverage (disjoint by construction)
    assert sum(r["key_checksum"] for r in out) == sum(range(500))
    # rough balance: every fold within 2x of the uniform share
    assert all(50 <= r["n"] <= 200 for r in out), out
