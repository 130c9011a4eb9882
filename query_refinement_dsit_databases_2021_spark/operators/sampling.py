"""Deterministic sampling, splitting, packing and chunking operators
for the training-data pipeline layer.

These are the dataset-assembly steps that sit between dedup/quality
filtering and the trainer: reproducible train/val/test splits,
stratified subsampling, context-window packing, and document chunking.
The reference has no counterpart (it is a CP query engine); these are
the §7.4 "pipeline extension" surface.

Scale notes (100 TB):

- :func:`hash_split` and the Bernoulli path of
  :func:`stratified_sample` are pure map-side column arithmetic —
  no shuffle, no state, embarrassingly parallel, and stable under
  re-partitioning because the assignment is a pure function of the
  row key (never ``rand()``/``monotonically_increasing_id``).
- The exact path of :func:`stratified_sample` and
  :func:`pack_sequences` each cost ONE shuffle, partitioned by the
  stratum / pack-group key. Group by a bounded-cardinality, bounded-
  size key (``source`` shard, ``lang``) so no single partition holds
  more than one group's rows; a giant stratum should be pre-salted
  upstream.
- :func:`chunk_documents` is a per-row explode (flatMap); output
  size is input size × duplication factor ``chunk/(chunk-overlap)``,
  no shuffle.

Determinism contract: every assignment derives from the 31-bit
polynomial :func:`textops.rolling_hash` of a salted key string, and
every threshold comparison is integer arithmetic — bit-identical in
Spark and the DuckDB oracles (same contract as ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.operators.textops import (
    HASH_P,
    rolling_hash,
    tokens,
)

BUCKETS = 10_000

# Post-hash mixing multiplier (MINSTD LCG step). The raw polynomial
# rolling hash has weak dispersion on SHORT keys — e.g. doc_ids 0..499
# as strings span only ~60% of the bucket space, starving the tail
# split. One multiplicative step mod the same prime is a bijection on
# [0, HASH_P) that spreads those clusters uniformly (verified: 500
# sequential ids -> 80/11/9% on an 80/10/10 target).
MIX_A = 48_271

DEFAULT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("train", 0.8),
    ("val", 0.1),
    ("test", 0.1),
)


def bucket_of(key: Column, salt: str, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in ``[0, buckets)`` from the salted string
    form of ``key``: LCG-mixed rolling hash (see ``MIX_A``). A pure
    function of the row — safe to recompute on retry/re-partition,
    unlike ``rand(seed)`` which is per-partition."""
    h = rolling_hash(F.concat(F.lit(salt + "|"), key.cast("string")))
    return (h * MIX_A) % HASH_P % buckets


def sql_bucket(key_expr: str, salt: str, buckets: int = BUCKETS) -> str:
    """DuckDB mirror of :func:`bucket_of` — the single SQL-side source
    for every sampling/split oracle, so Spark and oracle can never
    drift."""
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import (
        _sql_rolling_hash,
    )

    salted = "'" + salt + "|' || " + key_expr
    return f"(({_sql_rolling_hash(salted)}) * {MIX_A}) % {HASH_P} % {buckets}"


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = DEFAULT_WEIGHTS,
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights, as a
    pure function of ``hash(salt | key)``. Adding rows later never
    reassigns existing rows (the property random-number splits lack).

    Returns the input with one extra ``split`` string column.
    """
    b = bucket_of(F.col(key), salt)
    cum = 0.0
    expr: Column | None = None
    for name, w in weights[:-1]:
        cum += w
        cond = b < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata: str = "lang",
    key: str = "doc_id",
    fraction: float = 0.2,
    salt: str = "strat",
    exact: bool = False,
) -> DataFrame:
    """Deterministic stratified subsample: ~``fraction`` of each
    stratum.

    ``exact=False`` (scale default): Bernoulli per row on the salted
    hash of ``(strata, key)`` — zero shuffle, per-stratum counts
    binomially distributed around ``fraction * n``.

    ``exact=True``: exactly ``floor(fraction * n)`` rows per stratum —
    rank rows within the stratum by hash (a deterministic permutation)
    and keep the prefix. One shuffle on ``strata``. The keep test is
    pure integer arithmetic (``rn * BUCKETS <= frac_buckets * n``), so
    no float-boundary ambiguity.
    """
    frac_buckets = int(round(fraction * BUCKETS))
    h = bucket_of(
        F.concat(F.col(strata).cast("string"), F.lit("|"), F.col(key).cast("string")),
        salt,
    )
    if not exact:
        return df.where(h < frac_buckets)
    from pyspark.sql import Window

    w = Window.partitionBy(strata)
    ranked = df.withColumn("_h", h).select(
        "*",
        F.row_number().over(w.orderBy("_h", key)).alias("_rn"),
        F.count("*").over(w).alias("_n"),
    )
    return ranked.where(
        F.col("_rn") * BUCKETS <= F.lit(frac_buckets) * F.col("_n")
    ).drop("_h", "_rn", "_n")


def weighted_sample(
    df: DataFrame,
    weight: str,
    key: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability ``clamp(weight, 0, 1)`` — the quality-weighted
    curation step (upweight clean documents, downweight boilerplate)
    expressed as the same zero-shuffle salted-hash Bernoulli as
    :func:`stratified_sample`, with a per-row threshold instead of a
    constant. The threshold is quantized to integer bucket units with
    floor(x + 0.5) — the module's tie-breaking convention (see
    :func:`simsearch.quantize_int8`) — so the keep test never depends
    on an engine's round-half behavior.
    """
    b = bucket_of(F.col(key), salt)
    p = F.least(F.greatest(F.col(weight), F.lit(0.0)), F.lit(1.0))
    return df.where(b < F.floor(p * BUCKETS + F.lit(0.5)))


def remix_sources(
    df: DataFrame,
    targets: dict[str, float],
    group: str = "source",
    key: str = "doc_id",
    salt: str = "remix",
) -> DataFrame:
    """Domain reweighting toward a target mix, downsample-only: find
    the largest corpus size ``N`` at which every group can supply its
    share (``N = min_g n_g / target_g``), then keep the first
    ``floor(target_g * N)`` rows of each group under the deterministic
    salted-hash permutation. Groups absent from ``targets`` are
    dropped; a target group with positive share that is absent from
    the DATA raises (an empty group cannot supply any share, so the
    only consistent downsample-only answer would be an empty result —
    surfaced as an error instead of silently returning nothing).

    The group stats are a tiny driver-side aggregate (plan-time
    parameter, like CP domain resolution — SURVEY §4 O3); the data
    path is one window shuffle on the group key. All engines compute
    the same IEEE doubles for the thresholds, and the keep test
    compares an integer rank to a floored integer.
    """
    from pyspark.sql import Window

    if not targets or any(t < 0 for t in targets.values()):
        raise ValueError("targets must be a non-empty {group: share>=0} map")
    if all(t == 0 for t in targets.values()):
        raise ValueError("at least one target share must be positive")
    counts = {
        r[0]: r[1] for r in df.groupBy(group).count().collect()
    }
    absent = [g for g, t in targets.items() if t > 0 and g not in counts]
    if absent:
        raise ValueError(
            f"target groups absent from data: {sorted(absent)} — a "
            "positive share cannot be supplied by an empty group "
            "(downsample-only contract)"
        )
    n_new = min(counts[g] / t for g, t in targets.items() if t > 0)
    keep_expr: Column | None = None
    import math as _math

    for g, t in targets.items():
        cap = int(_math.floor(t * n_new))
        cond = (F.col(group) == g) & (F.col("_rn") <= cap)
        keep_expr = cond if keep_expr is None else keep_expr | cond
    h = bucket_of(
        F.concat(F.col(group).cast("string"), F.lit("|"), F.col(key).cast("string")),
        salt,
    )
    w = Window.partitionBy(group).orderBy("_h", key)
    ranked = df.withColumn("_h", h).withColumn(
        "_rn", F.row_number().over(w)
    )
    return ranked.where(keep_expr).drop("_h", "_rn")


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    group: str = "source",
    key: str = "doc_id",
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-based source reweighting — the ``n^alpha`` mixing
    recipe multilingual/multi-source LLM corpora use (alpha=1 keeps the
    natural mix, alpha=0 equalizes sources; 0.3–0.7 is the usual
    flattening range). Downsample-only, like :func:`remix_sources`.

    The per-group cap has a closed form with NO cross-group float sum:
    with targets ``t_g = n_g^a / W`` and the downsample-only corpus
    size ``N = min_h n_h / t_h``, the normalizer ``W`` cancels and
    ``cap_g = floor(n_g^a * n_min^(1-a))`` — order-free, so both
    engines compute the identical IEEE product (for a=0.5 both factors
    are correctly-rounded sqrts; the smallest group is kept whole:
    ``cap_min = n_min``). Group counts are a tiny plan-time aggregate;
    the data path is one window shuffle on the group key, identical to
    :func:`remix_sources`.
    """
    import math as _math

    from pyspark.sql import Window

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = {r[0]: r[1] for r in df.groupBy(group).count().collect()}
    if not counts:
        raise ValueError("cannot mix an empty corpus")
    n_min = min(counts.values())
    if alpha == 0.5:
        # sqrt is IEEE-correctly-rounded — bit-identical to the oracle
        caps = {
            g: int(_math.floor(_math.sqrt(float(n)) * _math.sqrt(float(n_min))))
            for g, n in counts.items()
        }
    else:
        # pow() is not guaranteed correctly rounded; fine for the
        # operator, but the oracle-paired workload pins alpha=0.5
        caps = {
            g: int(_math.floor(float(n) ** alpha * float(n_min) ** (1.0 - alpha)))
            for g, n in counts.items()
        }
    keep_expr: Column | None = None
    for g, cap in caps.items():
        cond = (F.col(group) == g) & (F.col("_rn") <= cap)
        keep_expr = cond if keep_expr is None else keep_expr | cond
    h = bucket_of(
        F.concat(F.col(group).cast("string"), F.lit("|"), F.col(key).cast("string")),
        salt,
    )
    w = Window.partitionBy(group).orderBy("_h", key)
    ranked = df.withColumn("_h", h).withColumn("_rn", F.row_number().over(w))
    return ranked.where(keep_expr).drop("_h", "_rn")


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    group: str = "source",
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Streaming-concatenation packing: within each ``group`` (a
    bounded shard key), documents are laid out in ``key`` order and cut
    into bins of ``budget`` whitespace tokens — bin = exclusive-prefix
    token count div budget, i.e. the bin the document's first token
    lands in when the stream is concatenated and cut every ``budget``
    tokens (documents may straddle a cut; the trainer's loader handles
    intra-document splits).

    One window shuffle partitioned by ``group``; all arithmetic is
    integer (token counts), so bin assignment is exact.

    Returns ``(group, key, n_tokens, bin)``.
    """
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col(text))).cast("long")
    w = (
        Window.partitionBy(group)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    # `div` is integer division on longs — bit-exact for any int64
    # cumulative sum, unlike float `/` which loses exactness past 2^53.
    return (
        docs.select(group, key, n_tok.alias("n_tokens"))
        .withColumn("_prev", cum_prev.cast("long"))
        .select(
            group,
            key,
            "n_tokens",
            F.expr(f"_prev div {int(budget)}").alias("bin"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk: int = 200,
    overlap: int = 40,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Split each document into overlapping character windows of
    ``chunk`` chars every ``chunk - overlap`` chars (the RAG /
    fixed-context preprocessing step). Pure flatMap — a per-row
    ``sequence`` + ``explode``, no shuffle, no Python.

    Returns ``(key, chunk_id, start, chunk_text)`` with 1-based
    ``start``; every document yields at least one chunk (possibly
    empty text).
    """
    if overlap >= chunk:
        raise ValueError("overlap must be smaller than chunk")
    stride = chunk - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text)), F.lit(1)), F.lit(stride)
    )
    return (
        docs.select(key, text, F.explode(starts).alias("start"))
        .select(
            key,
            F.expr(f"(start - 1) div {stride}").cast("long").alias("chunk_id"),
            F.col("start").cast("long").alias("start"),
            F.substring(F.col(text), F.col("start"), F.lit(chunk)).alias(
                "chunk_text"
            ),
        )
    )


DSIR_BUCKETS = 256
MIXTURE_WEIGHTS_PPM: tuple[tuple[str, int], ...] = (
    ("en", 400_000),
    ("fr", 200_000),
    ("de", 150_000),
    ("es", 150_000),
    ("zh", 100_000),
)


def importance_weights(
    docs: DataFrame,
    target: Column | None = None,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Hashed-feature importance weights for data selection — the
    DSIR recipe (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling") linearized for engine-exactness:
    token occurrences hash into ``n_buckets`` features; each bucket
    gets an add-1-smoothed target/raw probability ratio; a document's
    score is the count-weighted SUM of its buckets' ratios (the
    published estimator sums log-ratios — logs are not bit-portable
    across engines, so this variant sums the ratios themselves; the
    ranking it induces is what selection consumes). Score is
    normalized per token so length doesn't dominate.

    Scale shape (100 TB): two corpus passes — (1) explode tokens,
    ONE map-combinable groupBy(bucket) producing the n_buckets-row
    distribution table (a broadcast dim table; totals ride a 1-row
    broadcast agg, never a driver count); (2) explode again,
    broadcast-join the ratio table, ONE groupBy(doc_id). No
    corpus-sized join, no driver state, no floats crossing rows:
    per-bucket ratios are floor-quantized to int64 ppm (identical
    IEEE mult/div on both engines), per-doc sums are integer.

    Returns ``(doc_id, n_tokens, score_sum, score_ppm)`` where
    ``score_ppm = score_sum div n_tokens``.
    """
    if target is None:
        target = F.col("lang") == "en"
    tok = docs.select(
        "doc_id",
        target.alias("is_t"),
        F.explode(tokens(F.col("text"))).alias("w"),
    ).withColumn("bucket", bucket_of(F.col("w"), "dsir", n_buckets))
    cnts = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(~F.col("is_t"), 1).otherwise(0)).cast("long").alias("cr"),
    )
    totals = cnts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    b = F.lit(int(n_buckets))
    pt = (F.col("ct") + 1).cast("double") / (F.col("tt") + b)
    pr = (F.col("cr") + 1).cast("double") / (F.col("tr") + b)
    ratio = (
        cnts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(F.lit(1e6) * (pt / pr) + F.lit(0.5))
            .cast("long")
            .alias("r_ppm"),
        )
    )
    return (
        tok.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("r_ppm").cast("long").alias("score_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_sum",
            F.expr("score_sum div n_tokens").alias("score_ppm"),
        )
    )


def mixture_plan(
    docs: DataFrame,
    total_tokens: int = 1_000_000,
    weights: tuple[tuple[str, int], ...] = MIXTURE_WEIGHTS_PPM,
    group: str = "lang",
) -> DataFrame:
    """Training-mixture plan: given target mixture ``weights`` (ppm
    per ``group`` value) and a token budget, turn per-group availability
    into the numbers a data loader executes — target token count,
    epoch count (ceil of target/available: how many times the group
    repeats), and a downsampling rate in ppm for groups with surplus.
    This is the domain-reweighting step between corpus stats and the
    sampler (the knob DoReMi/offline-mixture recipes tune).

    ONE map-combinable groupBy(``group``) over a token-count
    projection; weights are a literal when-chain (no join). All
    arithmetic is int64 (ppm weights, integer div/ceil) — bit-exact.

    Returns ``(group, avail_tokens, weight_ppm, target_tokens,
    epochs, rate_ppm)`` for groups named in ``weights``; ``rate_ppm``
    is capped at 1e6 (never upsample within an epoch — repeats are
    ``epochs``' job).
    """
    wcol = F.lit(None).cast("long")
    for name, ppm in weights:
        wcol = F.when(F.col("grp") == name, F.lit(int(ppm))).otherwise(wcol)
    avail = (
        docs.select(
            F.col(group).alias("grp"),
            F.size(tokens(F.col("text"))).cast("long").alias("_nt"),
        )
        .groupBy("grp")
        .agg(F.sum("_nt").alias("avail_tokens"))
        .withColumn("weight_ppm", wcol)
        .where(F.col("weight_ppm").isNotNull())
    )
    tgt = F.expr(f"({int(total_tokens)} * weight_ppm) div 1000000")
    return (
        avail.withColumn("target_tokens", tgt)
        .select(
            F.col("grp").alias(group),
            "avail_tokens",
            "weight_ppm",
            "target_tokens",
            F.expr(
                "(target_tokens + avail_tokens - 1) div avail_tokens"
            ).alias("epochs"),
            F.least(
                F.lit(1_000_000),
                F.expr("(1000000 * target_tokens) div avail_tokens"),
            )
            .cast("long")
            .alias("rate_ppm"),
        )
    )


def pack_efficiency(
    docs: DataFrame,
    budget: int = 2048,
    group: str = "source",
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Packing-efficiency audit over :func:`pack_sequences`: per
    ``group``, the bin count, token totals, fill ratio vs the ideal
    ``n_bins * budget``, and the fattest bin — the numbers that decide
    whether a packing layout wastes context windows or creates
    straggler bins (a bin's tokens can exceed ``budget`` because a
    document straddling a cut counts in its STARTING bin — the audit
    surfaces exactly that skew).

    Adds one (group, bin) agg + one group agg on top of the packing
    window — after the first agg everything is manifest-scale. All
    integer: ``fill_ppm = (1e6 * tokens) DIV (n_bins * budget)``.

    Returns ``(group, n_docs, n_bins, total_tokens, fill_ppm,
    max_bin_tokens)``.
    """
    packed = pack_sequences(docs, budget, group, key, text)
    per_bin = packed.groupBy(group, "bin").agg(
        F.count("*").cast("long").alias("_docs"),
        F.sum("n_tokens").cast("long").alias("_bin_tokens"),
    )
    return (
        per_bin.groupBy(group)
        .agg(
            F.sum("_docs").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_bins"),
            F.sum("_bin_tokens").cast("long").alias("total_tokens"),
            F.max("_bin_tokens").cast("long").alias("max_bin_tokens"),
        )
        .select(
            group,
            "n_docs",
            "n_bins",
            "total_tokens",
            F.expr(f"(1000000 * total_tokens) div (n_bins * {int(budget)})")
            .cast("long")
            .alias("fill_ppm"),
            "max_bin_tokens",
        )
    )


def curriculum_phases(docs: DataFrame, n_phases: int = 4) -> DataFrame:
    """Curriculum assignment: split the corpus into ``n_phases``
    quality tiers (phase 0 = highest quality first — the curriculum-
    learning schedule) WITHOUT a global sort: the integer quality
    score (the dataset-card qmills blend, 0..1000) has bounded
    cardinality, so the phase boundary comes from a ≤1001-row score
    histogram — one map-combinable groupBy, a window over the tiny
    dim table, and a broadcast join back. At 100 TB there is no
    single-partition ranking anywhere; ties (same score) share a
    phase by construction, so partitioning cannot split them.

    ``phase = (docs_strictly_better * n_phases) DIV total`` per score
    value. Returns ``(doc_id, qmills, phase)``.
    """
    from pyspark.sql import Window

    ws = tokens(F.col("text"))
    n_tok = F.size(ws)
    n_typ = F.size(F.array_distinct(ws))
    from query_refinement_dsit_databases_2021_spark.operators.textops import (
        STOPWORDS,
    )

    n_stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    blend = (
        F.lit(0.4) * (n_typ / n_tok)
        + F.lit(0.4) * (F.lit(1.0) - n_stop / n_tok)
        + F.lit(0.2) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
    )
    scored = docs.select(
        "doc_id", F.floor(blend * 1000 + F.lit(0.5)).cast("long").alias("qmills")
    )
    hist = scored.groupBy("qmills").agg(F.count("*").cast("long").alias("_n"))
    w = Window.orderBy(F.desc("qmills")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    totals = hist.agg(F.sum("_n").alias("_total"))
    phases = (
        hist.withColumn("_hi", F.coalesce(F.sum("_n").over(w), F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .select(
            "qmills",
            F.expr(f"(_hi * {int(n_phases)}) div _total").alias("phase"),
        )
    )
    return scored.join(F.broadcast(phases), "qmills").select(
        "doc_id", "qmills", "phase"
    )


# ---------------------------------------------------------------------------
# Workload registry entries (DuckDB oracles)
# ---------------------------------------------------------------------------


def sampling_workloads():
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import (
        _docs,
    )
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    bucket_sql = sql_bucket

    oracle_split = f"""
WITH b AS (SELECT doc_id, {bucket_sql("CAST(doc_id AS VARCHAR)", "split")} AS h
           FROM documents)
SELECT doc_id,
       CASE WHEN h < 8000 THEN 'train'
            WHEN h < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id"""

    oracle_strat = f"""
WITH b AS (
  SELECT doc_id, lang,
         {bucket_sql("lang || '|' || CAST(doc_id AS VARCHAR)", "strat")} AS h
  FROM documents),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM b)
SELECT doc_id, lang FROM r WHERE rn * {BUCKETS} <= 2000 * n ORDER BY doc_id"""

    oracle_pack = """
WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS prev
  FROM t)
SELECT source, doc_id, n_tokens, prev // 2048 AS bin
FROM c ORDER BY source, doc_id"""

    oracle_chunk = """
SELECT doc_id, (i - 1) // 160 AS chunk_id, i AS start,
       substr(text, i::INTEGER, 200) AS chunk_text
FROM documents, unnest(range(1, greatest(length(text), 1) + 1, 160)) t(i)
ORDER BY doc_id, start"""

    from query_refinement_dsit_databases_2021_spark.operators.pipelines import (
        ORACLE_QUALITY,
    )
    from query_refinement_dsit_databases_2021_spark.operators.textops import (
        quality_columns,
    )

    oracle_weighted = f"""
WITH q AS ({ORACLE_QUALITY})
SELECT doc_id, quality FROM q
WHERE {bucket_sql("CAST(doc_id AS VARCHAR)", "wsample")}
      < floor(least(greatest(quality, 0.0), 1.0) * {BUCKETS} + 0.5)
ORDER BY doc_id"""

    def _weighted(spark, sf_dir):
        qc = quality_columns(_docs(spark, sf_dir)).select("doc_id", "quality")
        return weighted_sample(qc, "quality")

    remix_targets = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    values = ", ".join(f"('{g}', {t})" for g, t in remix_targets.items())
    oracle_remix = f"""
WITH t(source, target) AS (VALUES {values}),
n AS (SELECT source, count(*) AS n_g FROM documents GROUP BY source),
nn AS (SELECT min(n_g / target) AS n_new FROM n JOIN t USING (source)),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM (SELECT doc_id, source,
               {bucket_sql("source || '|' || CAST(doc_id AS VARCHAR)", "remix")} AS h
        FROM documents) b)
SELECT doc_id, source
FROM r JOIN t USING (source), nn
WHERE rn <= floor(t.target * nn.n_new)
ORDER BY doc_id"""

    def _remix(spark, sf_dir):
        return remix_sources(_docs(spark, sf_dir), remix_targets).select(
            "doc_id", "source"
        )

    # temperature mix at alpha=0.5: cap_g = floor(sqrt(n_g)*sqrt(n_min))
    # (the normalizer-free closed form; sqrt is correctly rounded on
    # both engines, so the caps are bit-identical)
    oracle_temperature = f"""
WITH n AS (SELECT source, count(*) AS n_g FROM documents GROUP BY source),
mn AS (SELECT min(n_g) AS n_min FROM n),
cap AS (SELECT source,
               CAST(floor(sqrt(CAST(n_g AS DOUBLE))
                          * sqrt(CAST(n_min AS DOUBLE))) AS BIGINT) AS cap
        FROM n, mn),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM (SELECT doc_id, source,
               {bucket_sql("source || '|' || CAST(doc_id AS VARCHAR)", "tempmix")} AS h
        FROM documents) b)
SELECT doc_id, source
FROM r JOIN cap USING (source)
WHERE rn <= cap
ORDER BY doc_id"""

    def _temperature(spark, sf_dir):
        return temperature_mix(_docs(spark, sf_dir)).select("doc_id", "source")

    oracle_dsir = f"""
WITH tok AS (
  SELECT doc_id, lang = 'en' AS is_t, unnest(string_split(text, ' ')) AS w
  FROM documents),
bk AS (
  SELECT doc_id, is_t,
         {bucket_sql("w", "dsir", DSIR_BUCKETS)} AS bucket
  FROM tok),
cnts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS cr
  FROM bk GROUP BY bucket),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
        FROM cnts),
ratio AS (
  SELECT bucket,
         CAST(floor(1e6 * (((ct + 1)::DOUBLE / (tt + {DSIR_BUCKETS}))
                           / ((cr + 1)::DOUBLE / (tr + {DSIR_BUCKETS})))
                    + 0.5) AS BIGINT) AS r_ppm
  FROM cnts, tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(r_ppm) AS BIGINT) AS score_sum,
       CAST(sum(r_ppm) AS BIGINT) // count(*) AS score_ppm
FROM bk JOIN ratio USING (bucket)
GROUP BY doc_id ORDER BY doc_id"""

    _mix_when = " ".join(
        f"WHEN '{name}' THEN {ppm}" for name, ppm in MIXTURE_WEIGHTS_PPM
    )
    oracle_mixture = f"""
WITH avail AS (
  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
           AS avail_tokens,
         CAST(CASE lang {_mix_when} END AS BIGINT) AS weight_ppm
  FROM documents GROUP BY lang)
SELECT lang, avail_tokens, weight_ppm,
       (5000000 * weight_ppm) // 1000000 AS target_tokens,
       ((5000000 * weight_ppm) // 1000000 + avail_tokens - 1)
         // avail_tokens AS epochs,
       least(1000000, (1000000 * ((5000000 * weight_ppm) // 1000000))
         // avail_tokens) AS rate_ppm
FROM avail WHERE weight_ppm IS NOT NULL ORDER BY lang"""

    oracle_pack_eff = """
WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) // 2048 AS bin
  FROM t),
pb AS (
  SELECT source, bin, CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
  FROM c GROUP BY source, bin)
SELECT source, CAST(sum(docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
       (1000000 * CAST(sum(bin_tokens) AS BIGINT))
         // (count(*) * 2048) AS fill_ppm,
       CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens
FROM pb GROUP BY source ORDER BY source"""

    from query_refinement_dsit_databases_2021_spark.operators.pipelines import (
        _STOP_IN,
    )

    oracle_curriculum = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
m AS (
  SELECT doc_id, len(ws)::INT AS n_tok,
         len(list_distinct(ws))::INT AS n_typ,
         len(list_filter(ws, w -> w IN ({_STOP_IN})))::INT AS n_stop
  FROM t),
s AS (
  SELECT doc_id,
         floor((CAST(0.4 AS DOUBLE) * (n_typ / n_tok)
              + CAST(0.4 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - n_stop / n_tok)
              + CAST(0.2 AS DOUBLE)
                * least(n_tok / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
               * 1000 + 0.5)::BIGINT AS qmills
  FROM m),
h AS (SELECT qmills, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY qmills),
p AS (
  SELECT qmills,
         (CAST(coalesce(sum(n) OVER (ORDER BY qmills DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          * 4) // (SELECT sum(n) FROM h) AS phase
  FROM h)
SELECT s.doc_id, s.qmills, CAST(p.phase AS BIGINT) AS phase
FROM s JOIN p USING (qmills) ORDER BY doc_id"""

    def _pack_eff(spark, sf_dir):
        return pack_efficiency(_docs(spark, sf_dir)).orderBy("source")

    def _curriculum(spark, sf_dir):
        return curriculum_phases(_docs(spark, sf_dir)).orderBy("doc_id")

    def _dsir(spark, sf_dir):
        return importance_weights(_docs(spark, sf_dir)).orderBy("doc_id")

    def _mixture(spark, sf_dir):
        return mixture_plan(_docs(spark, sf_dir), total_tokens=5_000_000).orderBy("lang")

    def _split(spark, sf_dir):
        return hash_split(_docs(spark, sf_dir)).select("doc_id", "split")

    def _strat(spark, sf_dir):
        return stratified_sample(
            _docs(spark, sf_dir), exact=True
        ).select("doc_id", "lang")

    def _pack(spark, sf_dir):
        return pack_sequences(_docs(spark, sf_dir))

    def _chunk(spark, sf_dir):
        return chunk_documents(_docs(spark, sf_dir))

    def _kfold(spark, sf_dir):
        return kfold_assignment(_docs(spark, sf_dir))

    def _target_enc(spark, sf_dir):
        from query_refinement_dsit_databases_2021_spark.workloads import (
            register_views,
        )

        register_views(spark, sf_dir)
        return target_encoding(spark.table("events"))

    return [
        Workload("pipe_split_hash", _split, oracle_split),
        Workload("pipe_sample_stratified", _strat, oracle_strat),
        Workload("pipe_sample_weighted", _weighted, oracle_weighted),
        Workload("pipe_remix_sources", _remix, oracle_remix),
        Workload("pipe_sample_temperature", _temperature, oracle_temperature),
        Workload("pipe_pack_sequences", _pack, oracle_pack),
        Workload("pipe_chunk_documents", _chunk, oracle_chunk),
        Workload("pipe_dsir_importance", _dsir, oracle_dsir, headline=True),
        Workload("pipe_mixture_plan", _mixture, oracle_mixture),
        Workload("pipe_pack_efficiency", _pack_eff, oracle_pack_eff),
        Workload("pipe_curriculum_phases", _curriculum, oracle_curriculum),
        Workload("pipe_target_encoding", _target_enc, ORACLE_TARGET_ENCODING),
        Workload("pipe_kfold_assignment", _kfold, ORACLE_KFOLD),
    ]


TE_SMOOTH_M = 100  # pseudo-observations of the global prior


def target_encoding(
    events: DataFrame, cat: str = "event_type", value: str = "value"
) -> DataFrame:
    """Smoothed target encoding — the leakage-aware categorical
    featurizer (replace a category with the smoothed mean of the
    target): ``enc = (Σ_cat + prior·m) / (n_cat + m)`` with the global
    mean as prior, so rare categories shrink toward it instead of
    memorizing their few labels.

    Exactness: the prior is the rational ``GS/GN`` and is NEVER
    materialized as a float — the encoding is computed on the common
    denominator, ``enc = (Σc·GN + GS·m) / (GN·(n+m))``, all int64
    cents (headroom ~Σc·GN ≤ 1e9·1e9 at a billion rows — past that,
    DECIMAL(38,0)), then ONE division 6 dp floor-quantized into
    dollars. One map-combinable groupBy + a 1-row broadcast.

    Returns ``(cat, n, enc)`` ordered by category.
    """
    cents = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("long")
    per = events.groupBy(cat).agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("sc")
    )
    glob = events.agg(
        F.count(F.lit(1)).alias("gn"),
        F.sum(cents).alias("gs"),
    )
    enc = (F.col("sc") * F.col("gn") + F.col("gs") * F.lit(TE_SMOOTH_M)).cast(
        "double"
    ) / (
        (F.col("gn") * (F.col("n") + F.lit(TE_SMOOTH_M))).cast("double")
        * F.lit(100.0)
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            cat,
            "n",
            (F.floor(enc * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000.0)).alias(
                "enc"
            ),
        )
        .orderBy(cat)
    )


ORACLE_TARGET_ENCODING = f"""
WITH per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(floor(value * 100 + 0.5)::BIGINT) AS BIGINT) AS sc
  FROM events GROUP BY 1),
gtot AS (
  SELECT CAST(count(*) AS BIGINT) AS gn,
         CAST(sum(floor(value * 100 + 0.5)::BIGINT) AS BIGINT) AS gs
  FROM events)
SELECT event_type, n,
       floor(CAST(sc * gn + gs * {TE_SMOOTH_M} AS DOUBLE)
             / (CAST(gn * (n + {TE_SMOOTH_M}) AS DOUBLE) * 100.0)
             * 1000000 + 0.5) / 1000000.0 AS enc
FROM per, gtot ORDER BY event_type"""


KFOLD_K = 5


def kfold_assignment(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-based k-fold cross-validation assignment — the CV split
    with :func:`hash_split`'s never-reassigns property (a row's fold
    is a pure function of its key, so growing the corpus never moves
    existing rows between folds, and train/heldout views for fold i
    are WHERE clauses, not materializations).

    The workload emits the per-fold audit (size + key checksum), which
    is what certifies the assignment: disjointness and coverage are
    structural (every key gets exactly one fold), balance is what you
    inspect. Returns ``(fold, n, key_checksum)`` ordered by fold.
    """
    fold = bucket_of(F.col(key), "kfold") % KFOLD_K
    return (
        docs.select(fold.alias("fold"), F.col(key))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(key)).alias("key_checksum"),
        )
        .orderBy("fold")
    )


def _oracle_kfold() -> str:
    b = sql_bucket("CAST(doc_id AS VARCHAR)", "kfold")
    return f"""
SELECT ({b}) % {KFOLD_K} AS fold,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS key_checksum
FROM documents GROUP BY 1 ORDER BY fold"""


ORACLE_KFOLD = _oracle_kfold()
