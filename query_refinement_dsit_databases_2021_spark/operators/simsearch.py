"""Similarity search over an embedding column (``array<float>``).

Two strategies over ``embeddings.parquet`` (vec_id, embedding, label):

- **Brute-force cosine top-k** (the correctness baseline): broadcast
  the (small) query set against the corpus — ONE scan of the corpus,
  no corpus-side shuffle; per-query top-k via a ranking window whose
  partition count equals |queries|. At 100 TB the corpus side stays
  partition-parallel; only the k·|queries| result rows move.
- **LSH-bucketed ANN** (the scale path): multi-table random-hyperplane
  LSH — L independent tables of nbits hyperplane sign bits each; a
  corpus vector is a candidate iff it shares a bucket with the query
  in >=1 table. Exact cosine is computed only for deduped candidates.
  With per-bit collision prob p = 1 - theta/pi, recall is
  1-(1-p^nbits)^L (tested against the brute-force baseline); at
  corpus scale nbits grows ~log2(n / target_bucket_size) to keep
  buckets bounded, and the candidate join stays an equi-join
  shuffle-partitioned on (table, bucket) — never all-pairs.

Determinism contract (same as the dedup/text operators): every dot
product is a left fold in index order over doubles, hyperplane
components are Python-float literals inlined into BOTH engines, and
scores are rounded to 6 dp before ranking with a vec_id tie-break —
so Spark and the DuckDB oracles rank identically bit-for-bit.

- **IVF-bucketed ANN** (the second scale path): a coarse quantizer of
  stride-sampled corpus vectors as centroids; every vector sits in
  exactly one cell (nearest centroid), queries rescore only their
  nprobe nearest cells. The dataflow is the same bucket equi-join as
  LSH but needs no candidate dedup, and at corpus scale the cell id
  doubles as a bucketing/partition key so probes read only their
  cells. nprobe == |centroids| degenerates to exact brute force
  (pinned by a unit test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.operators.textops import (
    HASH_P,
    lcg_a,
    lcg_b,
)

DIM = 64
N_QUERIES = 16
TOP_K = 5
LSH_NBITS = 4
LSH_TABLES = 16
# IVF coarse quantizer: stride-sampled corpus vectors as centroids
# (deterministic; all ids exist at every SF >= 500-row embeddings and
# none collide with the query set vec_id < N_QUERIES)
IVF_CENTROID_IDS = tuple(100 + 16 * i for i in range(24))
# measured recall@5 over the synthetic near-uniform embeddings (no
# cluster structure, so recall ~ tracks probed fraction): nprobe
# 6 -> 0.49, 8 -> 0.61, 12 -> 0.83 at sf0.01. 12/24 cells keeps the
# rescore ~2x cheaper than brute force at >0.78 recall on every SF;
# pipe_ann_recall attests the floor per round.
IVF_NPROBE = 12


def hyperplane(j: int, dim: int = DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane j: an iterated-LCG
    stream (decorrelated across components, unlike a linear ramp) in
    [-0.5, 0.5) — identical Python floats are inlined into the Spark
    plan and the DuckDB oracle."""
    a, b = lcg_a(j), lcg_b(j)
    x = (a + b) % HASH_P
    out = []
    for _ in range(dim):
        x = (1103515245 * x + 12345) % HASH_P
        out.append(x / HASH_P - 0.5)
    return out


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def _lit_doubles(lits) -> Column:
    """A literal array<double> built with ONE py4j call (r09): the
    ``F.array(*[F.lit(x) ...])`` form costs ~65 driver⇄JVM round trips
    per 64-dim vector, which measured ~1.2 s per 24-centroid block of
    pure Python-side plan construction (63× slower than letting the
    JVM parse one string). ``CAST('<repr>' AS DOUBLE)`` is
    ``Double.parseDouble`` of Python's shortest round-trip repr —
    bit-exact for every finite double (property-tested incl.
    subnormals/extremes), and Catalyst constant-folds the cast, so the
    executed plan is the identical array literal."""
    body = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in lits)
    return F.expr(f"array({body})")


def _dot_lits(v: Column, lits) -> Column:
    """Dot product of an array column against LITERAL components —
    kept as the fold form: a scalar ``element_at`` chain was measured
    SLOWER (Catalyst tree size dominates before any row is touched),
    see the PQ kernel note below for where the real fix lives."""
    return _dot(v, _lit_doubles(lits))


def _dot_lits_sql(lits, col: str = "v") -> str:
    """SQL-text twin of :func:`_dot_lits` (r09): the Column form costs
    two higher-order-function constructions (~20 py4j round trips) PER
    call, which measured ~1.1 s of pure driver time per 24-centroid
    block. The string parses JVM-side in one call and resolves to the
    IDENTICAL zip_with+aggregate fold — same lambda ops, same literal
    doubles (repr round-trip), same evaluation order."""
    arr = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in lits)
    return (
        f"aggregate(zip_with({col}, array({arr}), (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _cell_entries_expr(cents, col: str = "v", nrm: str = "nrm") -> Column:
    """The per-centroid (cos, -cell) struct array as ONE parsed
    expression — shared by the unroll strategy and the projection
    forms; bit-identical to the previous per-struct Column build
    (parity pinned by the strategy/projection tests)."""
    parts = []
    for cell, cv, cn in cents:
        dot = _dot_lits_sql(cv, col)
        parts.append(
            f"struct(round({dot} / ({nrm} * CAST('{float(cn)!r}' AS DOUBLE)), 6)"
            f" AS cos, {-int(cell)} AS negcell)"
        )
    return F.expr("array(" + ",".join(parts) + ")")


def _with_norm(emb: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return emb.select(
        "vec_id", v.alias("v"), F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("nrm")
    )


def _brute_topk(
    base: DataFrame,
    n_queries: int,
    k: int,
    out_col: str,
    query_base: DataFrame | None = None,
) -> DataFrame:
    """Shared brute-force shape: broadcast queries × ONE corpus scan
    over a (vec_id, v, nrm) frame, exact cosine, per-query top-k by
    (score desc, vec_id asc). The single place that owns the 6-dp
    rounding and tie-break contract the oracles mirror. ``query_base``
    lets a filtered search draw its queries from the UNfiltered frame
    (hybrid retrieval: the predicate restricts candidates, not
    queries)."""
    queries = (query_base if query_base is not None else base).where(
        F.col("vec_id") < n_queries
    ).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = (
        F.broadcast(queries)
        .crossJoin(base)
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias(out_col))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc(out_col), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), out_col)
    )


def cosine_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector
    (vec_id < n_queries), excluding self.

    Returns (q_id, vec_id, rank, cos_sim); cos_sim rounded to 6 dp,
    rank deterministic via (cos desc, vec_id asc).
    """
    return _brute_topk(_with_norm(emb), n_queries, k, "cos_sim")


def _bucket_expr_sql(table: int, nbits: int, col: str = "v") -> str:
    """One table's nbits sign-bit bucket as SQL text (r09: the Column
    form built 2 higher-order functions per bit — ~128 HOF
    constructions per 16-table plan, all driver-side py4j time).
    Identical CASE/fold arithmetic, parsed JVM-side in one call."""
    bits = [
        f"(CASE WHEN {_dot_lits_sql(hyperplane(table * nbits + b), col)} > 0"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(nbits)
    ]
    return "CAST((" + " + ".join(bits) + ") AS BIGINT)"


def lsh_buckets(
    emb: DataFrame, nbits: int = LSH_NBITS, n_tables: int = LSH_TABLES
) -> DataFrame:
    """(vec_id, tbl, bucket): one row per (vector, hash table) — the
    table's bucket is nbits hyperplane sign bits. Pure column
    arithmetic + one explode; no shuffle."""
    base = _with_norm(emb)
    entries = F.expr(
        "array("
        + ",".join(
            f"struct({t} AS tbl, {_bucket_expr_sql(t, nbits)} AS bucket)"
            for t in range(n_tables)
        )
        + ")"
    )
    return base.select("vec_id", F.explode(entries).alias("e")).select(
        "vec_id", F.col("e.tbl").alias("tbl"), F.col("e.bucket").alias("bucket")
    )


def lsh_ann_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nbits: int = LSH_NBITS,
    n_tables: int = LSH_TABLES,
) -> DataFrame:
    """Approximate top-k cosine neighbors: candidates share >=1 LSH
    bucket with the query across n_tables independent tables (deduped
    before the exact rescore, so each pair is scored once). Same
    output shape as :func:`cosine_topk`; queries whose buckets
    under-fill return fewer than k rows."""
    base = _with_norm(emb)
    bk = lsh_buckets(emb, nbits, n_tables)
    qb = bk.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "tbl", "bucket"
    )
    cand = (
        qb.join(bk, ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = (
        cand.join(F.broadcast(q), "q_id")
        .join(base, "vec_id")
        .select("q_id", "vec_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def _centroid_literals(emb: DataFrame, centroid_ids) -> list[tuple[int, list[float], float]]:
    """Collect the centroid vectors (a handful of rows — a dim table,
    not the data path) as (cell_id, components, norm) literals to
    inline into the assignment projection."""
    rows = (
        _with_norm(emb.where(F.col("vec_id").isin(*centroid_ids)))
        .orderBy("vec_id")
        .collect()
    )
    return [(int(r["vec_id"]), [float(x) for x in r["v"]], float(r["nrm"])) for r in rows]


# _nearest_cells strategy switch: below this many centroids the
# per-centroid dot products are unrolled into ONE projection (no join,
# no shuffle on the corpus side); above it the unrolled expression tree
# would dwarf codegen limits, so the centroids become a broadcast dim
# table instead (same auto pattern as tokenize_ids' literal<->join
# switch in textops.py).
UNROLL_MAX_CELLS = 4096


def _nearest_cells(
    base: DataFrame, cents, n_cells: int, *, strategy: str = "auto"
) -> DataFrame:
    """(vec_id, cell, rnk) for the n_cells nearest centroids of every
    vector in `base`.

    Two bit-identical strategies (parity pinned by a unit test):

    - ``unroll`` (default up to UNROLL_MAX_CELLS centroids): pure
      column arithmetic per row — the centroid loop is unrolled into
      the projection; no shuffle, no join — plus one explode and a
      per-vector ranking window.
    - ``join`` (past ~4k cells, where an unrolled projection stops
      being codegen-able): centroids as a broadcast dim table, one
      BroadcastNestedLoopJoin fan-out, the same rounded-cosine /
      cell-asc ranking window. Still zero corpus-side shuffle.

    Both compute the identical left-fold dot product over the identical
    double values and rank on round(cos, 6) with a cell tie-break, so
    the strategies agree bit-for-bit.
    """
    if strategy == "auto":
        strategy = "unroll" if len(cents) <= UNROLL_MAX_CELLS else "join"
    if strategy == "join":
        cdf = base.sparkSession.createDataFrame(
            [(int(c), [float(x) for x in cv], float(cn)) for c, cv, cn in cents],
            "cell long, cv array<double>, cn double",
        )
        cos = F.round(
            _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell"))
        return (
            base.crossJoin(F.broadcast(cdf))
            .select("vec_id", "cell", cos.alias("cos"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= n_cells)
            .select("vec_id", "cell", F.col("rnk").cast("int").alias("rnk"))
        )
    entries = _cell_entries_expr(cents)
    # struct comparison is lexicographic: sort desc on (cos, -cell)
    # == cos desc, cell asc — the deterministic argmax contract
    ranked = F.slice(F.reverse(F.array_sort(entries)), 1, n_cells)
    return (
        base.select("vec_id", F.posexplode(ranked).alias("rnk", "e"))
        .select(
            "vec_id",
            (-F.col("e.negcell")).cast("long").alias("cell"),
            (F.col("rnk") + 1).alias("rnk"),
        )
    )


def ivf_assign(
    emb: DataFrame, centroid_ids=IVF_CENTROID_IDS, assignments: int = 1
) -> DataFrame:
    """IVF coarse assignment: (vec_id, cell) — each vector belongs to
    its ``assignments`` nearest centroids by rounded cosine (ties ->
    smallest centroid id). The cell id is the centroid's vec_id.

    ``assignments`` = 1 is classic IVF (exactly one cell per vector);
    a > 1 is multi-assignment (Jégou et al.'s IVFADC variant): a
    boundary vector is stored in each of its a nearest cells, so a
    query whose probe set misses the vector's primary cell can still
    find it — probe-set recall rises at the cost of an a× index. The
    serve side must dedup candidates (a vector reached via two probed
    cells appears twice)."""
    base = _with_norm(emb)
    cents = _centroid_literals(emb, centroid_ids)
    return _nearest_cells(base, cents, assignments).select("vec_id", "cell")


def ivf_ann_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    centroid_ids=IVF_CENTROID_IDS,
    nprobe: int = IVF_NPROBE,
    assignments: int = 1,
) -> DataFrame:
    """IVF-style ANN (the second scale path next to LSH): corpus
    partitioned into |centroids| cells by nearest-centroid assignment;
    a query rescoring only the vectors in its `nprobe` nearest cells.

    Versus LSH: one cell per vector (the candidate equi-join needs no
    dedup), and recall/cost tune via nprobe x cell size instead of
    nbits x tables. With nprobe == |centroids| the probed cells cover
    the corpus and the result equals :func:`cosine_topk` exactly
    (pinned by a unit test). At 100 TB the assignment is a pure
    projection on the corpus scan (centroids broadcast as literals),
    the corpus can be written bucketed by cell, and only probed cells
    are read. Same output shape as :func:`cosine_topk`.

    ``assignments`` > 1 stores each corpus vector in its a nearest
    cells (multi-assignment, see :func:`ivf_assign`) and dedups the
    candidate set — the measured sf0.1 trade (ann_multiassign.csv):
    a=2/nprobe=16 lifts recall@5 0.9625 → 0.9875 at 2× index rows and
    ~1.5× candidates; a=1 stays the default because equal recall is
    cheaper via nprobe (a=1/np=16 == a=2/np=12 at 0.9625, but the
    latter scans 1.5× the candidates and doubles storage).
    """
    base = _with_norm(emb)
    cents = _centroid_literals(emb, centroid_ids)
    # assignment as a pure projection CARRYING the vector (r09, guide
    # §2.4): the (vec_id, cell)-only assignment forced a corpus re-join
    # on vec_id to recover v for scoring — one corpus Exchange for
    # nothing. Projection forms are bit-identical to _nearest_cells
    # (parity test-pinned).
    if assignments == 1:
        assign = base.withColumn("cell", _cell_projection(cents))
    else:
        assign = base.withColumn(
            "cell", F.explode(_cells_projection(cents, assignments))
        )
    probes = (
        _nearest_cells(base.where(F.col("vec_id") < n_queries), cents, nprobe)
        .select(F.col("vec_id").alias("q_id"), "cell")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "v", "nrm")
    )
    if assignments > 1:
        # same pair set as the previous (q_id, vec_id) DISTINCT — v and
        # nrm are functionally dependent on vec_id
        cand = cand.dropDuplicates(["q_id", "vec_id"])
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = cand.join(F.broadcast(q), "q_id").select(
        "q_id", "vec_id", cos.alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    nbits: int = LSH_NBITS,
    n_tables: int = LSH_TABLES,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the fifth dedup
    family): vector pairs with cosine >= threshold, candidate-limited
    to multi-table LSH bucket collisions exactly like
    :func:`lsh_ann_topk` — near-identical vectors collide in every
    table, so recall at high thresholds is ~1 while the join stays
    bucket-partitioned. The default threshold is tuned to this
    synthetic corpus (true dups would sit at ~0.95+; nothing here
    exceeds ~0.45, so 0.4 keeps the workload non-degenerate).
    Returns (vec_a, vec_b, cos_sim), vec_a < vec_b."""
    # r09 (guide §2.4): bk feeds both sides of the bucket self-join and
    # base both sides of the verify join — lazily each ran twice, and
    # the bucket-hash projection is a ~#tables×#bits×dim-term unrolled
    # expression whose codegen alone is seconds; materialize each ONCE
    # on its node-sized output.
    base = _with_norm(emb).localCheckpoint()
    bk = lsh_buckets(emb, nbits, n_tables).localCheckpoint()
    b2 = bk.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    cand = (
        bk.join(b2, ["tbl", "bucket"])
        .where(F.col("vec_id") < F.col("vec_b"))
        .select(F.col("vec_id").alias("vec_a"), "vec_b")
        .distinct()
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SQL_BASE = """
base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             x -> x * x)),
              (acc, x) -> acc + x)) AS nrm
  FROM embeddings)"""


def _sql_dot(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i])), "
        f"(acc, x) -> acc + x)"
    )


def oracle_cosine_topk(
    n_queries: int = N_QUERIES, k: int = TOP_K, dim: int = DIM
) -> str:
    return f"""
WITH {_SQL_BASE},
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM base WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, vec_id,
         round({_sql_dot("qv", "v", dim)} / (qn * nrm), 6) AS cos_sim
  FROM q CROSS JOIN base WHERE vec_id <> q_id)
SELECT q_id, vec_id, rank, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
             ORDER BY cos_sim DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k}"""


def _sql_bucket(vexpr: str, table: int, nbits: int, dim: int = DIM) -> str:
    bits = []
    for b in range(nbits):
        h = (
            "(["
            + ", ".join(repr(x) for x in hyperplane(table * nbits + b, dim))
            + "]::DOUBLE[])"
        )
        bits.append(
            f"CASE WHEN {_sql_dot(vexpr, h, dim)} > 0 THEN {1 << b} ELSE 0 END"
        )
    return "(" + " + ".join(bits) + ")::BIGINT"


def oracle_lsh_ann_topk(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nbits: int = LSH_NBITS,
    n_tables: int = LSH_TABLES,
    dim: int = DIM,
) -> str:
    tables = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sql_bucket('v', t, nbits, dim)} AS bucket FROM base"
        for t in range(n_tables)
    )
    return f"""
WITH {_SQL_BASE},
bk AS ({tables}),
qb AS (SELECT vec_id AS q_id, tbl, bucket FROM bk WHERE vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT q_id, bk.vec_id
  FROM qb JOIN bk USING (tbl, bucket) WHERE bk.vec_id <> q_id),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM base WHERE vec_id < {n_queries}),
scored AS (
  SELECT cand.q_id, cand.vec_id,
         round({_sql_dot("qv", "v", dim)} / (qn * nrm), 6) AS cos_sim
  FROM cand JOIN q USING (q_id) JOIN base USING (vec_id))
SELECT q_id, vec_id, rank, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
             ORDER BY cos_sim DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k}"""


def oracle_ivf_ann_topk(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    centroid_ids=IVF_CENTROID_IDS,
    nprobe: int = IVF_NPROBE,
    dim: int = DIM,
    assignments: int = 1,
) -> str:
    ids = ", ".join(str(i) for i in centroid_ids)
    # multi-assignment (a > 1) stores each vector in its a nearest
    # cells; the candidate set then needs DISTINCT (a vector reached
    # via two probed cells). a = 1 keeps the original plain join.
    distinct = "DISTINCT " if assignments > 1 else ""
    return f"""
WITH {_SQL_BASE},
cent AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM base
         WHERE vec_id IN ({ids})),
dists AS (
  SELECT b.vec_id, cent.cell,
         row_number() OVER (PARTITION BY b.vec_id
             ORDER BY round({_sql_dot("b.v", "cv", dim)} / (b.nrm * cn), 6) DESC,
                      cent.cell ASC) AS rnk
  FROM base b CROSS JOIN cent),
assign AS (SELECT vec_id, cell FROM dists WHERE rnk <= {assignments}),
probes AS (SELECT vec_id AS q_id, cell FROM dists
           WHERE vec_id < {n_queries} AND rnk <= {nprobe}),
cand AS (
  SELECT {distinct}q_id, assign.vec_id
  FROM probes JOIN assign USING (cell) WHERE assign.vec_id <> q_id),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM base WHERE vec_id < {n_queries}),
scored AS (
  SELECT cand.q_id, cand.vec_id,
         round({_sql_dot("qv", "v", dim)} / (qn * nrm), 6) AS cos_sim
  FROM cand JOIN q USING (q_id) JOIN base USING (vec_id))
SELECT q_id, vec_id, rank, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
             ORDER BY cos_sim DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k}"""


def oracle_embedding_neardup(
    threshold: float = 0.4,
    nbits: int = LSH_NBITS,
    n_tables: int = LSH_TABLES,
    dim: int = DIM,
) -> str:
    tables = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sql_bucket('v', t, nbits, dim)} AS bucket FROM base"
        for t in range(n_tables)
    )
    return f"""
WITH {_SQL_BASE},
bk AS ({tables}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bk a JOIN bk b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
scored AS (
  SELECT vec_a, vec_b,
         round({_sql_dot("pa.v", "pb.v", dim)} / (pa.nrm * pb.nrm), 6) AS cos_sim
  FROM cand
  JOIN base pa ON pa.vec_id = vec_a
  JOIN base pb ON pb.vec_id = vec_b)
SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= {threshold!r}"""


# ---------------------------------------------------------------------------
# Workload registration
# ---------------------------------------------------------------------------


# recall floors attested by pipe_ann_recall (measured: lsh 0.91/0.95,
# ivf 0.79/0.83 at sf0.001/sf0.01 — deterministic, no randomness)
RECALL_FLOORS = {"ivf": 0.7, "lsh": 0.85}


def ann_recall(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Measure, don't guess: recall@k of each approximate index
    against the exact brute-force top-k, computed in-engine.

    avg_recall = Σ per-query hits / (n_queries · k) — an integer sum
    and ONE division, so Spark and the DuckDB oracle agree exactly
    (no float-summation order sensitivity). ``recall_ok`` attests the
    method's floor (RECALL_FLOORS); a regression in either index
    flips the flag and fails the round's correctness gate."""
    # exact brute-force reference materialized once (r09): it feeds
    # the query list and every per-method join — lazily the corpus
    # brute-force ran once per reference
    exact = (
        cosine_topk(emb, n_queries, k)
        .select("q_id", "vec_id")
        .localCheckpoint()
    )
    qs = exact.select("q_id").distinct()
    outs = []
    for method, fn in (("ivf", ivf_ann_topk), ("lsh", lsh_ann_topk)):
        ap = fn(emb).select("q_id", "vec_id")
        hits = (
            ap.join(exact, ["q_id", "vec_id"])
            .groupBy("q_id")
            .agg(F.count("*").alias("h"))
        )
        per_q = qs.join(hits, "q_id", "left").select(
            F.coalesce("h", F.lit(0)).alias("h")
        )
        agg = per_q.agg(
            F.sum("h").alias("total"), F.min("h").alias("mn")
        ).select(
            F.lit(method).alias("method"),
            (F.col("total").cast("double") / F.lit(n_queries * k)).alias(
                "avg_recall"
            ),
            (F.col("mn").cast("double") / F.lit(k)).alias("min_recall"),
        )
        outs.append(
            agg.select(
                "method",
                "avg_recall",
                "min_recall",
                (F.col("avg_recall") >= RECALL_FLOORS[method]).alias("recall_ok"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("method")


def oracle_ann_recall(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    def per_method(method: str, approx_sql: str) -> str:
        return f"""
SELECT '{method}' AS method,
       CAST(sum(h) AS DOUBLE) / {n_queries * k} AS avg_recall,
       CAST(min(h) AS DOUBLE) / {k} AS min_recall,
       CAST(sum(h) AS DOUBLE) / {n_queries * k} >= {RECALL_FLOORS[method]}
           AS recall_ok
FROM (
  SELECT qs.q_id, coalesce(hits.c, 0) AS h
  FROM (SELECT DISTINCT q_id FROM ({oracle_cosine_topk(n_queries, k)}) e0) qs
  LEFT JOIN (
    SELECT a.q_id, count(*) AS c
    FROM ({approx_sql}) a
    JOIN ({oracle_cosine_topk(n_queries, k)}) e USING (q_id, vec_id)
    GROUP BY a.q_id) hits USING (q_id))"""

    return (
        per_method("ivf", oracle_ivf_ann_topk())
        + "\nUNION ALL\n"
        + per_method("lsh", oracle_lsh_ann_topk())
        + "\nORDER BY method"
    )


def quantize_int8(
    embs: DataFrame, col: str = "embedding", key: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage/transfer
    compression step of a vector index (4x smaller than float32, 8x
    smaller than float64; dot products stay in integer SIMD).

    ``q_i = floor(x_i * 127 / max|x| + 0.5)`` — floor(+0.5) instead of
    round() so both engines execute the identical IEEE double op (no
    rounding-mode ambiguity at .5 ties). Zero vectors get scale
    1e-30 -> all-zero codes. Pure per-row array arithmetic: no shuffle,
    no Python; at 100 TB this is a map-only rewrite pass.

    Returns ``(key, scale_r, q)``: the (rounded) dequantization scale
    and the int8 code array.
    """
    absmax = F.array_max(F.transform(F.col(col), lambda x: F.abs(x)))
    scale = F.greatest(absmax.cast("double"), F.lit(1e-30))
    q = F.transform(
        F.col(col),
        lambda x: F.floor(x.cast("double") * 127 / scale + F.lit(0.5)).cast(
            "int"
        ),
    )
    return embs.select(key, F.round(scale, 6).alias("scale_r"), q.alias("q"))


def oracle_quantize_int8_scalar() -> str:
    """Gate oracle for quantize_int8 in scalar-row form (one row per
    (vec_id, dim); dims 0-based like posexplode — arrays are a
    driver-hash-unproven type class)."""
    return """
WITH s AS (
  SELECT vec_id, embedding,
         greatest(list_max(list_transform(embedding, x -> abs(x)))::DOUBLE,
                  1e-30) AS scale
  FROM embeddings)
SELECT vec_id, round(scale, 6) AS scale_r, CAST(i - 1 AS INTEGER) AS dim,
       floor(embedding[i]::DOUBLE * 127 / scale + 0.5)::INTEGER AS qv
FROM s, unnest(range(1, len(embedding) + 1)) u(i)
ORDER BY vec_id, dim"""


def _cell_projection(cents) -> "Column":
    """Single-nearest-cell as a pure per-row expression (no explode, no
    join): the argmax entry of the per-centroid (cos, -cell) structs."""
    entries = _cell_entries_expr(cents)
    best = F.element_at(F.reverse(F.array_sort(entries)), 1)
    return (-best["negcell"]).cast("long")


def _cells_projection(cents, assignments: int) -> "Column":
    """Top-``assignments`` nearest cells as ONE array-valued per-row
    expression (the multi-assignment build form of
    :func:`_cell_projection` — still no join, no shuffle)."""
    entries = _cell_entries_expr(cents)
    top = F.slice(F.reverse(F.array_sort(entries)), 1, assignments)
    return F.transform(top, lambda e: (-e["negcell"]).cast("long"))


def write_ivf_layout(
    emb: DataFrame,
    path: str,
    centroid_ids=IVF_CENTROID_IDS,
    assignments: int = 1,
) -> None:
    """Materialize the IVF index as a hive layout: the corpus written
    ``partitionBy(cell)`` so each cell is its own directory, plus a
    sidecar centroid table at ``<path>__centroids`` — serving reads
    centroids from the sidecar (tiny), never from the corpus, and the
    centroid set can never drift from the one that partitioned the
    layout. This is the amortization step the measured crossover
    demands (BASELINE.md: the per-corpus assignment pass costs more
    than brute force at low query counts) — assign ONCE at write time.

    The assignment is a pure projection fused into the single write
    scan (no join, no shuffle before partitionBy's task-side split) —
    with ``assignments`` > 1 (multi-assignment, see
    :func:`ivf_assign`) the projection is array-valued and exploded,
    an a× row fan-out that stays map-side. The sidecar records the
    build's ``assignments`` so serving knows whether candidate dedup
    is needed; layouts written before the column existed read as
    a = 1."""
    spark = emb.sparkSession
    cents = _centroid_literals(emb, centroid_ids)
    spark.createDataFrame(
        [(cell, cv, cn, assignments) for cell, cv, cn in cents],
        "cell long, cv array<double>, cn double, a int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}__centroids")
    v = _as_double(F.col("embedding"))
    nrm = F.sqrt(_fold_sum(F.transform(v, lambda x: x * x)))
    staged = emb.withColumn("v", v).withColumn("nrm", nrm)
    if assignments == 1:
        staged = staged.withColumn("cell", _cell_projection(cents))
    else:
        staged = staged.withColumn(
            "cell", F.explode(_cells_projection(cents, assignments))
        )
    (
        staged.drop("v", "nrm")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_from_layout(
    spark,
    path: str,
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Serve ANN from a :func:`write_ivf_layout` table: centroids come
    from the layout's sidecar (a |cells|-row read — the corpus is never
    scanned for them, and the set is the one that actually partitioned
    the data), each query's ``nprobe`` nearest cells are computed from
    those literals, and ONE scan reads only the probed cell directories
    (``cell IN (...)`` prunes at plan time — PartitionFilters content
    is asserted in the test). Per-query corpus cost is the probed
    share, with zero per-search assignment work. Same output
    shape/semantics as :func:`ivf_ann_topk` over the same
    corpus+queries (pinned by a test).

    The probe assignment stays a distributed DataFrame end-to-end —
    the query batch is NEVER materialized on the driver (a million-
    query batch flows through the same plan). The only driver hop is
    the distinct probed-cell set for the static partition filter,
    which is bounded by |centroids| (metadata scale), not by
    |queries|; the test pins that bound by intercepting collect()."""
    crows = spark.read.parquet(f"{path}__centroids").collect()
    cents = [
        (int(r["cell"]), [float(x) for x in r["cv"]], float(r["cn"]))
        for r in crows
    ]
    cents.sort()
    # pre-"a"-column layouts are single-assignment by construction
    layout_a = int(crows[0]["a"]) if "a" in crows[0].__fields__ else 1
    qbase = _with_norm(queries)
    probes = _nearest_cells(qbase, cents, nprobe).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    # metadata-scale driver hop: the DISTINCT probed cells (<= |cells|
    # rows regardless of query-batch size) become the plan-time
    # partition filter; the per-query probe rows stay distributed.
    probe_cells = sorted(
        int(r["cell"]) for r in probes.select("cell").distinct().collect()
    )
    # ONE pruned scan; keep cell alongside the normalized vector
    raw = spark.read.parquet(path).where(F.col("cell").isin(probe_cells))
    v = _as_double(F.col("embedding"))
    corpus = raw.select(
        "vec_id",
        "cell",
        v.alias("v"),
        F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("nrm"),
    )
    cand = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "v", "nrm")
    )
    if layout_a > 1:
        # multi-assignment stores a vector in a cells: a candidate
        # reached through two probed cells appears twice with FULLY
        # identical rows, so the dedup is deterministic. Skipped
        # entirely on single-assignment layouts (no extra exchange).
        cand = cand.dropDuplicates(["q_id", "vec_id"])
    q = qbase.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = cand.join(F.broadcast(q), "q_id").select(
        "q_id", "vec_id", cos.alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


# spherical k-means defaults: 8 seeds drawn from the same id lattice
# as IVF (all >= 100, clear of the query prefix), 2 Lloyd iterations
KMEANS_SEED_IDS = tuple(100 + 16 * i for i in range(8))
KMEANS_ITERS = 2


def _quantize_mills(v: Column) -> Column:
    """Component-wise integer millis (floor(x*1000+0.5), the module's
    tie-safe convention) — makes every cross-row sum an int64 sum,
    order-free and engine-exact."""
    return F.transform(v, lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("long"))


def kmeans_fit(
    emb: DataFrame,
    seed_ids=KMEANS_SEED_IDS,
    n_iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Spherical k-means (Lloyd's) over the embedding column —
    deterministic and engine-reproducible, the clustering step under
    SemDeDup-style semantic curation and IVF index training:

    - init: the seed vectors themselves (fixed ids, no rand());
    - assign: nearest centroid by ``round(cosine, 6)``, ties to the
      smallest cell id — the module's argmax contract;
    - update: component means from QUANTIZED integer sums
      (``sum(floor(x*1000+0.5)) / (1000.0 * n)``) so the new centroid
      is identical regardless of aggregation order, then one
      fixed-order fold for its norm. Cells keep their seed's vec_id as
      a stable id; a cell that empties is dropped (deterministically)
      rather than re-seeded.

    Returns the assignment under the FINAL centroids: ``(vec_id,
    cell)``.

    Plan at 100 TB: each iteration is one centroid-literal projection
    (no join — centroids unroll into the scan) plus one
    map-side-combinable groupBy(cell, dim) whose output is k·dim rows;
    the only driver traffic is those k·dim integer sums per iteration
    (plan-time scalars, same O4 pattern as CP domain resolution). The
    oracle unrolls the identical iterations as SQL CTEs.
    """
    import math as _math

    base = _with_norm(emb)
    cents = _centroid_literals(emb, seed_ids)
    for _ in range(n_iters):
        assign = _nearest_cells(base, cents, 1).select("vec_id", "cell")
        stats = (
            assign.join(base, "vec_id")
            .select("cell", F.posexplode(_quantize_mills(F.col("v"))).alias("dim", "qv"))
            .groupBy("cell", "dim")
            .agg(F.sum("qv").alias("sq"), F.count("*").alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = (
                int(r["sq"]),
                int(r["n"]),
            )
        cents = []
        for cell in sorted(by_cell):
            dims = by_cell[cell]
            cv = [dims[i][0] / (1000.0 * dims[i][1]) for i in range(len(dims))]
            # plain left fold in dim order — the exact sequence of IEEE
            # adds the oracle's list_reduce and _with_norm's aggregate use
            acc = 0.0
            for x in cv:
                acc = acc + x * x
            cents.append((cell, cv, _math.sqrt(acc)))
    return _nearest_cells(base, cents, 1).select("vec_id", "cell")


def oracle_kmeans(
    seed_ids=KMEANS_SEED_IDS, n_iters: int = KMEANS_ITERS, dim: int = DIM
) -> str:
    """The same Lloyd iterations unrolled as SQL CTEs (set-based update
    instead of driver literals — different mechanics, same values)."""
    ids = ", ".join(str(i) for i in seed_ids)
    parts = [
        _SQL_BASE,
        f"cents0 AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM base\n"
        f"           WHERE vec_id IN ({ids}))",
    ]
    for t in range(n_iters + 1):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT b.vec_id, c.cell,
           row_number() OVER (PARTITION BY b.vec_id
               ORDER BY round({_sql_dot('b.v', 'c.cv', dim)} / (b.nrm * c.cn), 6) DESC,
                        c.cell ASC) AS rnk
    FROM base b CROSS JOIN cents{t} c) WHERE rnk = 1)"""
        )
        if t < n_iters:
            parts.append(
                f"""s{t} AS (
  SELECT a.cell, i, sum(floor(b.v[i] * 1000 + 0.5)::BIGINT) AS sq,
         count(*) AS n
  FROM a{t} a JOIN base b USING (vec_id),
       unnest(range(1, {dim + 1})) u(i)
  GROUP BY a.cell, i)"""
            )
            parts.append(
                f"""cents{t + 1} AS (
  SELECT cell, cv,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(cv, x -> x * x)), (acc, x) -> acc + x)) AS cn
  FROM (SELECT cell, list(sq / (1000.0 * n) ORDER BY i) AS cv
        FROM s{t} GROUP BY cell))"""
            )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a{n_iters}"
        + "\nORDER BY vec_id"
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.3,
    seed_ids=KMEANS_SEED_IDS,
    n_iters: int = KMEANS_ITERS,
    assign: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus
    (:func:`kmeans_fit`, or pass a precomputed ``assign``), then inside
    each cell mark every vector that has a SMALLER-id neighbor at
    ``round(cosine, 6) >= threshold`` as a duplicate — the kept set is
    the per-near-duplicate-group minimum id, matching the module's
    representative convention (:func:`embedding cosine near-dup`).

    Output: ``(vec_id, cell, is_dup)`` for every vector.

    Scale shape: the pair work is a within-cell self-join — bounded by
    cell sizes (k tunes the bound), never corpus²; cells are the
    natural bucketing/partition key, so at 100 TB the join shuffles on
    ``cell`` and a hot cell is AQE-splittable. The miss risk (near-dups
    straddling a cell boundary) is the standard SemDeDup trade; raise
    k-means iterations or run the LSH near-dup pass for recall.
    """
    if assign is None:
        assign = kmeans_fit(emb, seed_ids, n_iters)
    base = _with_norm(emb).join(assign, "vec_id")
    a = base.select(
        "cell",
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    b = base.select(
        "cell",
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    cos = F.round(_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    dup_ids = (
        a.join(b, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .where(cos >= threshold)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        assign.join(dup_ids.withColumn("is_dup", F.lit(1)), "vec_id", "left")
        .select("vec_id", "cell", F.coalesce("is_dup", F.lit(0)).alias("is_dup"))
    )


def oracle_semantic_dedup(
    threshold: float = 0.3,
    seed_ids=KMEANS_SEED_IDS,
    n_iters: int = KMEANS_ITERS,
    dim: int = DIM,
) -> str:
    kmeans = oracle_kmeans(seed_ids, n_iters, dim)
    # reuse the kmeans CTE chain, swap its final SELECT for the dedup
    body = kmeans[: kmeans.rindex("\nSELECT vec_id,")]
    return (
        body
        + f""",
asg AS (SELECT vec_id, cell FROM a{n_iters}),
j AS (SELECT asg.cell, vec_id, v, nrm FROM asg JOIN base USING (vec_id)),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM j a JOIN j b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({_sql_dot('a.v', 'b.v', dim)} / (a.nrm * b.nrm), 6)
        >= {threshold})
SELECT asg.vec_id, CAST(asg.cell AS BIGINT) AS cell,
       CASE WHEN dups.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
FROM asg LEFT JOIN dups ON asg.vec_id = dups.vec_id
ORDER BY asg.vec_id"""
    )


def label_centroid_stats(
    embs: DataFrame, col: str = "embedding", label: str = "label"
) -> DataFrame:
    """Per-label centroid accumulators over the embedding column — the
    aggregation kernel under k-means / SemDeDup-style semantic
    clustering: for every (label, dim) the component sum and vector
    count, from which ``centroid[dim] = sum/n``.

    Components are quantized to integer millis (``floor(x*1000+0.5)``,
    the module's tie-safe convention) BEFORE summing, so the aggregate
    is a sum of int64 — order-free and bit-exact across engines,
    unlike a float sum whose value depends on reduction order.
    ``sum_sq`` (the quantized second moment) gives per-dim variance for
    dispersion/convergence checks without a second pass.

    Plan at 100 TB: posexplode multiplies rows by dim (64 here), then
    ONE map-side-combinable groupBy(label, dim) — partial aggregation
    collapses each partition to labels*dim rows before the shuffle, so
    shuffle bytes are O(partitions * labels * dim), independent of row
    count. No Python, no driver traffic.
    """
    q = F.transform(
        F.col(col), lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long")
    )
    exploded = embs.select(label, F.posexplode(q).alias("dim", "qv"))
    return exploded.groupBy(label, "dim").agg(
        F.count("*").alias("n_vecs"),
        F.sum("qv").alias("sum_q"),
        F.sum(F.col("qv") * F.col("qv")).alias("sum_sq"),
    )


def oracle_label_centroid_stats() -> str:
    # range + 1-based list indexing (the repo's ordinality idiom —
    # this DuckDB build lacks WITH ORDINALITY)
    return """
WITH x AS (
  SELECT label, i - 1 AS dim,
         floor(embedding[i]::DOUBLE * 1000 + 0.5)::BIGINT AS qv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i))
SELECT label, CAST(dim AS INTEGER) AS dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(qv) AS BIGINT) AS sum_q,
       CAST(sum(qv * qv) AS BIGINT) AS sum_sq
FROM x GROUP BY label, dim ORDER BY label, dim"""


def quantized_cosine_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Top-k cosine neighbors over the INT8-QUANTIZED codes — the
    memory-bounded serving path that follows :func:`quantize_int8`
    (4-8x smaller working set; integer SIMD dot products on a real
    engine). Cosine is scale-invariant, so searching the raw codes
    equals searching the dequantized vectors exactly: no scale column
    is touched. Code dots and norm-squares are sums of products bounded
    by 127^2 * dim — exactly representable in double — so the float
    work is limited to correctly-rounded IEEE sqrt/multiply/divide on
    those exact sums: deterministic across engines.

    Zero vectors (all-zero codes) have no direction and are excluded
    from both sides, mirroring the oracle.

    Returns (q_id, vec_id, rank, qcos_sim), rank by (cos desc, vec_id).
    """
    qz = quantize_int8(emb)
    v = _as_double(F.col("q"))
    base = qz.select(
        "vec_id",
        v.alias("v"),
        F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("nrm"),
    ).where(F.col("nrm") > 0)
    return _brute_topk(base, n_queries, k, "qcos_sim")


def oracle_quantized_topk(
    n_queries: int = N_QUERIES, k: int = TOP_K, dim: int = DIM
) -> str:
    return f"""
WITH s AS (
  SELECT vec_id,
         greatest(list_max(list_transform(embedding, x -> abs(x)))::DOUBLE,
                  1e-30) AS scale, embedding
  FROM embeddings),
qz AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> floor(x::DOUBLE * 127 / scale + 0.5)) AS v
  FROM s),
base AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
  FROM qz)
SELECT q_id, vec_id, rank, qcos_sim FROM (
  SELECT q_id, vec_id, qcos_sim,
         row_number() OVER (PARTITION BY q_id
             ORDER BY qcos_sim DESC, vec_id ASC)::BIGINT AS rank
  FROM (
    SELECT q.vec_id AS q_id, b.vec_id AS vec_id,
           round({_sql_dot("q.v", "b.v", dim)} / (q.nrm * b.nrm), 6) AS qcos_sim
    FROM base q CROSS JOIN base b
    WHERE q.vec_id < {n_queries} AND q.nrm > 0 AND b.nrm > 0
      AND b.vec_id <> q.vec_id))
WHERE rank <= {k}"""


def filtered_cosine_topk(
    emb: DataFrame,
    docs: DataFrame,
    lang: str = "en",
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """Hybrid retrieval: top-k cosine neighbors among ONLY the vectors
    whose joined document satisfies a metadata predicate
    (``documents.lang = lang``; embeddings.vec_id aligns with
    documents.doc_id). PRE-filtering — the predicate restricts the
    candidate corpus before the scan meets the broadcast queries, so
    the NLJ does |queries| x |filtered| work, never |queries| x
    |corpus| followed by a discard (the post-filter anti-pattern).
    Queries themselves are NOT filtered: a query in any language
    retrieves its top-k among the ``lang`` candidates.

    Returns (q_id, vec_id, rank, cos_sim) like :func:`cosine_topk`.
    """
    all_vecs = _with_norm(emb)
    keep = docs.where(F.col("lang") == lang).select(
        F.col("doc_id").alias("vec_id")
    )
    base = all_vecs.join(keep, "vec_id")
    return _brute_topk(base, n_queries, k, "cos_sim", query_base=all_vecs)


def oracle_filtered_topk(
    lang: str = "en", n_queries: int = N_QUERIES, k: int = TOP_K, dim: int = DIM
) -> str:
    return f"""
WITH {_SQL_BASE},
keep AS (SELECT doc_id FROM documents WHERE lang = '{lang}'),
cand AS (SELECT b.* FROM base b JOIN keep kd ON kd.doc_id = b.vec_id),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM base
      WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, vec_id,
         round({_sql_dot("qv", "v", dim)} / (qn * nrm), 6) AS cos_sim
  FROM q CROSS JOIN cand WHERE vec_id <> q_id)
SELECT q_id, vec_id, rank, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
             ORDER BY cos_sim DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k}"""


def contrastive_pairs(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Contrastive training-pair assembly: for each anchor (query
    vector), its best SAME-label neighbor (the positive) paired with
    each of its top-k different-label neighbors (the hard negatives
    from :func:`hard_negative_topk`), with the positive-negative
    margin — the (anchor, positive, negative) triplets a contrastive /
    triplet-loss trainer consumes, margin included so curriculum
    filtering (keep hardest triplets: smallest margins) is a WHERE
    clause downstream.

    Determinism: both cosines are the family's 6-dp contract; the
    margin is floor-quantized from their difference (identical IEEE
    operands on both engines). Anchors with no same-label neighbor
    drop (no positive exists).

    Plan: ONE broadcast-queries × corpus scan scores everything; the
    positive is a rank-1 window over the same-label slice, negatives
    the existing hard-negative ranking over the different-label slice
    — one NLJ feeds both (the label predicate splits plan-side, so
    the corpus is never scanned twice). Returns ``(q_id, pos_id,
    neg_id, neg_rank, pos_cos, neg_cos, margin)``.
    """
    v = _as_double(F.col("embedding"))
    base = emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("nrm"),
    )
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = (
        F.broadcast(q)
        .crossJoin(base)
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (F.col("label") == F.col("q_label")).alias("same"),
            cos.alias("cos_sim"),
        )
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    pos = (
        scored.where(F.col("same"))
        .withColumn("_rn", F.row_number().over(wp))
        .where(F.col("_rn") == 1)
        .select(
            "q_id",
            F.col("vec_id").alias("pos_id"),
            F.col("cos_sim").alias("pos_cos"),
        )
    )
    neg = (
        scored.where(~F.col("same"))
        .withColumn("neg_rank", F.row_number().over(wp))
        .where(F.col("neg_rank") <= k)
        .select(
            "q_id",
            F.col("vec_id").alias("neg_id"),
            F.col("neg_rank").cast("long").alias("neg_rank"),
            F.col("cos_sim").alias("neg_cos"),
        )
    )
    margin = (
        F.floor((F.col("pos_cos") - F.col("neg_cos")) * 1e6 + F.lit(0.5))
        / F.lit(1000000.0)
    )
    # pos is <= n_queries rows by construction — broadcast it so the
    # final assembly never sort-merges
    return (
        neg.join(F.broadcast(pos), "q_id")
        .select(
            "q_id", "pos_id", "neg_id", "neg_rank", "pos_cos", "neg_cos",
            margin.alias("margin"),
        )
        .orderBy("q_id", "neg_rank")
    )


def oracle_contrastive_pairs(
    n_queries: int = N_QUERIES, k: int = TOP_K, dim: int = DIM
) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             x -> x * x)),
              (acc, x) -> acc + x)) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
      FROM base WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, vec_id, (label = q_label) AS same,
         round({_sql_dot("qv", "v", dim)} / (qn * nrm), 6) AS cos_sim
  FROM q CROSS JOIN base WHERE vec_id <> q_id),
pos AS (
  SELECT q_id, vec_id AS pos_id, cos_sim AS pos_cos FROM (
    SELECT q_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
               ORDER BY cos_sim DESC, vec_id ASC) AS rn
    FROM scored WHERE same)
  WHERE rn = 1),
neg AS (
  SELECT q_id, vec_id AS neg_id, neg_rank, cos_sim AS neg_cos FROM (
    SELECT q_id, vec_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS neg_rank
    FROM scored WHERE NOT same)
  WHERE neg_rank <= {k})
SELECT p.q_id, p.pos_id, n.neg_id, n.neg_rank, p.pos_cos, n.neg_cos,
       floor((p.pos_cos - n.neg_cos) * 1e6 + 0.5) / 1000000.0 AS margin
FROM pos p JOIN neg n USING (q_id)
ORDER BY q_id, neg_rank"""


PCA_ROUNDS = 4
PCA_MILLS = 1000


def power_iteration_pc1(
    emb: DataFrame, rounds: int = PCA_ROUNDS
) -> DataFrame:
    """Top principal direction of the (uncentered) embedding matrix by
    power iteration — ``v ← normalize(Xᵀ X v)`` — the dimension-
    reduction / drift-axis primitive (e.g. the "dominant direction"
    removal step in common-component embedding post-processing).

    Determinism: components quantize to integer mills; each round the
    per-row projection ``s_i = x_i·v`` and the per-dim accumulation
    ``w_d = Σ_i x_{i,d}·s_i`` are exact int64 sums (associative, so
    partitioning is irrelevant); ONLY the normalization is float — a
    fixed-order left fold over the 64 dims (`aggregate` ↔
    `list_reduce`, bit-identical) followed by the floor-mills
    re-quantization. The iterate is therefore exactly reproducible —
    including the sign, which matters because PC1 is only defined up
    to ±. Int64 headroom: ``rows · max_mills² · dim`` ≈ 10⁹ rows at
    |x| ≤ 1.

    Plan per round: two corpus-shaped map-combinable aggregations
    (per-row dot via broadcast of the 1-row v; per-dim accumulate) —
    the classic "matrix-free matvec" shape; the 64-value iterate
    travels as a broadcast literal array, exactly like the k-means
    centroid literals. Returns ``(dim, loading_mills)``.
    """
    ex, v = _pc1_iterate(emb, rounds)
    ex.unpersist()
    return v.select(F.posexplode("v").alias("dim", "loading_mills")).orderBy(
        "dim"
    )


def _pc1_iterate(emb: DataFrame, rounds: int = PCA_ROUNDS):
    """Shared power-iteration core: returns the persisted exploded
    mills-component frame and the 1-row iterate ``v`` (length-DIM
    int64 array) after ``rounds`` — consumed by
    :func:`power_iteration_pc1` (loadings) and :func:`pc1_projections`
    (per-vector transform)."""
    ex = emb.select(
        "vec_id",
        F.posexplode(_quantize_mills(_as_double(F.col("embedding")))).alias(
            "dim", "c"
        ),
    ).persist()
    spark = emb.sparkSession
    v = spark.range(1).select(
        F.array(*[F.lit(PCA_MILLS).cast("long") for _ in range(DIM)]).alias("v")
    )
    norm_fold = (
        "sqrt(aggregate(wl, CAST(0 AS DOUBLE),"
        " (a, y) -> a + CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))"
    )
    for _ in range(rounds):
        s = (
            ex.crossJoin(F.broadcast(v))
            .select(
                "vec_id",
                (
                    F.col("c")
                    * F.element_at(F.col("v"), F.col("dim") + 1)
                ).alias("p"),
            )
            .groupBy("vec_id")
            .agg(F.sum("p").alias("s"))
        )
        w = (
            ex.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("c") * F.col("s")).alias("w"))
        )
        warr = w.agg(
            F.array_sort(F.collect_list(F.struct("dim", "w"))).alias("pairs")
        ).select(F.expr("transform(pairs, p -> p.w)").alias("wl"))
        v = warr.selectExpr(
            f"transform(wl, x -> CAST(floor(x / {norm_fold}"
            f" * {PCA_MILLS} + 0.5) AS BIGINT)) AS v"
        ).localCheckpoint()
    return ex, v


def pc1_projections(emb: DataFrame, rounds: int = PCA_ROUNDS) -> DataFrame:
    """Common-component projection: each vector's integer-mills
    coefficient along the fitted PC1 — the scalar the
    "all-but-the-top" embedding post-processing (Arora/Mu et al.)
    subtracts to remove the dominant shared direction before
    similarity search. ``proj_mills = (1000·(x·v)) DIV (v·v)`` on
    mills-int operands — all int64 (both engines' integer division
    TRUNCATES on negatives, verified, so anti-aligned vectors agree
    too).

    Plan: the shared power-iteration core (two map-combinable aggs
    per round) plus ONE final map-only pass: the fitted v broadcasts
    into a per-row dot — the transform costs one corpus scan however
    many vectors. Returns ``(vec_id, proj_mills)`` ordered.
    """
    ex, v = _pc1_iterate(emb, rounds)
    out = (
        ex.crossJoin(F.broadcast(v))
        .select(
            "vec_id",
            (F.col("c") * F.element_at(F.col("v"), F.col("dim") + 1)).alias("p"),
            F.expr("aggregate(v, CAST(0 AS BIGINT), (a, y) -> a + y * y)").alias(
                "vv"
            ),
        )
        .groupBy("vec_id", "vv")
        .agg(F.sum("p").alias("xv"))
        .select(
            "vec_id",
            F.expr("CAST((1000 * xv) DIV vv AS BIGINT)").alias("proj_mills"),
        )
        .orderBy("vec_id")
    )
    ex.unpersist()
    return out


def oracle_pc1_projections(rounds: int = PCA_ROUNDS, dim: int = DIM) -> str:
    base = oracle_power_pca(rounds, dim)
    # reuse the full CTE chain, swap the final SELECT for the
    # projection pass
    head = base[: base.rindex("\nSELECT")]
    return f"""{head}
SELECT e.vec_id,
       CAST((1000 * sum(e.c * vv.v[e.dim + 1]))
            // list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(vv.v, y -> y * y)), (a, z) -> a + z)
            AS BIGINT) AS proj_mills
FROM e, v{rounds} vv
GROUP BY e.vec_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(vv.v, y -> y * y)), (a, z) -> a + z)
ORDER BY vec_id"""


def oracle_power_pca(rounds: int = PCA_ROUNDS, dim: int = DIM) -> str:
    v0 = "[" + ", ".join(str(PCA_MILLS) for _ in range(dim)) + "]::BIGINT[]"
    parts = [
        f"""e AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
         floor(embedding[i]::DOUBLE * 1000 + 0.5)::BIGINT AS c
  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
v0 AS (SELECT {v0} AS v)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""s{t} AS (
  SELECT e.vec_id, CAST(sum(e.c * vv.v[e.dim + 1]) AS BIGINT) AS s
  FROM e, v{t - 1} vv GROUP BY e.vec_id),
w{t} AS (
  SELECT e.dim, CAST(sum(e.c * s{t}.s) AS BIGINT) AS w
  FROM e JOIN s{t} USING (vec_id) GROUP BY e.dim),
wa{t} AS (SELECT list(w ORDER BY dim) AS wl FROM w{t}),
v{t} AS (
  SELECT list_transform(wl, x -> floor(x / sqrt(
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(wl, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))),
             (a, z) -> a + z))
         * {PCA_MILLS} + 0.5)::BIGINT) AS v
  FROM wa{t})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(i - 1 AS INTEGER) AS dim, v[i] AS loading_mills
FROM v{rounds}, unnest(range(1, {dim + 1})) u(i)
ORDER BY dim"""
    )


def _ndcg_discounts(k: int) -> list[int]:
    """Integer micro-unit DCG discounts 1/log2(i+1), i = 1..k —
    computed ONCE in Python and inlined as literals into both the
    Spark plan and the DuckDB oracle, so no engine ever evaluates a
    log."""
    import math

    return [int(math.floor(1e6 / math.log2(i + 1) + 0.5)) for i in range(1, k + 1)]


def ann_ndcg(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """NDCG@k attestation of each approximate index against the exact
    brute-force ranking — the GRADED companion to :func:`ann_recall`
    (recall says how many true neighbors an index returns; NDCG says
    whether it returns the best ones FIRST). Relevance of a returned
    doc is ``k+1-exact_rank`` (0 if outside the exact top-k);
    position discounts are the literal integer table
    ``_ndcg_discounts`` so the whole metric is int64:
    ``ndcg_ppm = (1e6 · Σ rel_i·D_i) DIV Σ ideal_i·D_i`` per query,
    averaged by integer division. Bit-stable across engines — a
    ranking regression in either index moves an integer.

    Plan: exact and approximate lists are k·n_queries rows; all joins
    and aggregations are attestation-sized. Returns ``(method,
    avg_ndcg_ppm, min_ndcg_ppm)``.
    """
    disc = _ndcg_discounts(k)
    idcg = sum((k - i) * d for i, d in enumerate(disc))  # rel k, k-1, ...
    # exact reference materialized once (r09) — same as ann_recall
    exact = cosine_topk(emb, n_queries, k).select(
        "q_id", "vec_id", (F.lit(k + 1) - F.col("rank")).alias("rel")
    ).localCheckpoint()
    qs = exact.select("q_id").distinct()
    disc_arr = F.array(*[F.lit(d) for d in disc])
    outs = []
    for method, fn in (("ivf", ivf_ann_topk), ("lsh", lsh_ann_topk)):
        ap = fn(emb).select("q_id", "vec_id", "rank")
        dcg = (
            ap.join(exact, ["q_id", "vec_id"], "left")
            .select(
                "q_id",
                (
                    F.coalesce("rel", F.lit(0))
                    * F.element_at(disc_arr, F.col("rank").cast("int"))
                ).alias("g"),
            )
            .groupBy("q_id")
            .agg(F.sum("g").alias("dcg"))
        )
        per_q = qs.join(dcg, "q_id", "left").select(
            F.expr(f"(1000000 * coalesce(dcg, 0)) DIV {idcg}").alias("ndcg_ppm")
        )
        outs.append(
            per_q.agg(
                F.lit(method).alias("method"),
                F.expr(f"CAST(sum(ndcg_ppm) DIV {n_queries} AS BIGINT)").alias(
                    "avg_ndcg_ppm"
                ),
                F.min("ndcg_ppm").cast("long").alias("min_ndcg_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("method")


def oracle_ann_ndcg(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    disc = _ndcg_discounts(k)
    idcg = sum((k - i) * d for i, d in enumerate(disc))
    disc_case = " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(disc)
    )
    method_sqls = []
    for method, approx in (
        ("ivf", "ivf_ranked"),
        ("lsh", "lsh_ranked"),
    ):
        method_sqls.append(
            f"""
SELECT '{method}' AS method,
       CAST(sum(ndcg_ppm) // {n_queries} AS BIGINT) AS avg_ndcg_ppm,
       CAST(min(ndcg_ppm) AS BIGINT) AS min_ndcg_ppm
FROM (
  SELECT q.q_id,
         (1000000 * COALESCE(d.dcg, 0)) // {idcg} AS ndcg_ppm
  FROM (SELECT DISTINCT q_id FROM exact) q
  LEFT JOIN (
    SELECT a.q_id,
           CAST(sum(COALESCE(e.rel, 0) *
                CASE a.rank {disc_case} END) AS BIGINT) AS dcg
    FROM {approx} a
    LEFT JOIN exact e ON e.q_id = a.q_id AND e.vec_id = a.vec_id
    GROUP BY a.q_id) d ON d.q_id = q.q_id)"""
        )
    union = " UNION ALL ".join(method_sqls)
    # exact / approx ranked lists inlined from the existing oracles
    return f"""
WITH exact_base AS ({oracle_cosine_topk(n_queries, k)}),
exact AS (SELECT q_id, vec_id, {k + 1} - rank AS rel FROM exact_base),
ivf_base AS ({oracle_ivf_ann_topk(n_queries, k)}),
ivf_ranked AS (SELECT q_id, vec_id, rank FROM ivf_base),
lsh_base AS ({oracle_lsh_ann_topk(n_queries, k)}),
lsh_ranked AS (SELECT q_id, vec_id, rank FROM lsh_base)
SELECT * FROM ({union}) ORDER BY method"""


def ann_mrr(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Mean Reciprocal Rank attestation — the third leg of the IR
    metric set next to recall@k (:func:`ann_recall`) and NDCG@k
    (:func:`ann_ndcg`): per query, 1/rank of the FIRST returned doc
    that is a true top-k neighbor (0 if none) — the metric for
    "did the right answer come first", the one a RAG router reads.
    Integer ppm: ``rr_ppm = 1e6 DIV first_hit_rank``; the mean is an
    integer division by n_queries.

    Attestation-sized joins only. Returns ``(method, mrr_ppm,
    n_miss)`` — n_miss = queries with no true neighbor in the
    returned list.
    """
    # exact brute-force reference materialized once (r09): it feeds
    # the query list and every per-method join — lazily the corpus
    # brute-force ran once per reference
    exact = (
        cosine_topk(emb, n_queries, k)
        .select("q_id", "vec_id")
        .localCheckpoint()
    )
    qs = exact.select("q_id").distinct()
    outs = []
    for method, fn in (("ivf", ivf_ann_topk), ("lsh", lsh_ann_topk)):
        ap = fn(emb).select("q_id", "vec_id", "rank")
        first = (
            ap.join(exact, ["q_id", "vec_id"], "leftsemi")
            .groupBy("q_id")
            .agg(F.min("rank").alias("fr"))
        )
        per_q = qs.join(first, "q_id", "left").select(
            F.expr(
                "CASE WHEN fr IS NULL THEN 0 ELSE 1000000 DIV fr END"
            ).alias("rr_ppm"),
            F.col("fr").isNull().cast("long").alias("miss"),
        )
        outs.append(
            per_q.agg(
                F.lit(method).alias("method"),
                F.expr(f"CAST(sum(rr_ppm) DIV {n_queries} AS BIGINT)").alias(
                    "mrr_ppm"
                ),
                F.sum("miss").cast("long").alias("n_miss"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("method")


def oracle_ann_mrr(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    def per_method(method: str, approx_sql: str) -> str:
        return f"""
SELECT '{method}' AS method,
       CAST(sum(rr_ppm) // {n_queries} AS BIGINT) AS mrr_ppm,
       CAST(sum(miss) AS BIGINT) AS n_miss
FROM (
  SELECT CASE WHEN f.fr IS NULL THEN 0 ELSE 1000000 // f.fr END AS rr_ppm,
         CASE WHEN f.fr IS NULL THEN 1 ELSE 0 END AS miss
  FROM (SELECT DISTINCT q_id FROM ({oracle_cosine_topk(n_queries, k)}) e0) qs
  LEFT JOIN (
    SELECT a.q_id, min(a.rank) AS fr
    FROM ({approx_sql}) a
    JOIN ({oracle_cosine_topk(n_queries, k)}) e USING (q_id, vec_id)
    GROUP BY a.q_id) f USING (q_id))"""

    return (
        per_method("ivf", oracle_ivf_ann_topk())
        + "\nUNION ALL\n"
        + per_method("lsh", oracle_lsh_ann_topk())
        + "\nORDER BY method"
    )


MMR_CANDIDATES = 10
MMR_LAM_NUM = 7  # lambda = 0.7 as the integer pair (7, 3)
MMR_LAM_REST = 3


def mmr_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    c: int = MMR_CANDIDATES,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: greedy diversified
    top-k. Round t picks the candidate maximizing ``λ·rel(c) − (1−λ)·
    max_{s∈selected} sim(c, s)`` — relevance traded against redundancy
    with what is already picked (Carbonell & Goldstein 1998), the
    standard result-diversification step after any ANN/lexical
    retrieval.

    Integer contract: relevance and pair similarities are 6-dp
    cosines lifted to integer micro-units (``floor(x·1e6 + 0.5)``),
    λ = 0.7 applied as the integer pair (7, 3) — every MMR score is
    int64, so the greedy argmax (ties: vec_id asc) is bit-stable
    across engines and partitionings. The DuckDB oracle unrolls the
    same k greedy rounds as a CTE chain.

    Plan: ONE corpus scan feeds the brute top-c candidate lists
    (broadcast queries, same shape as :func:`cosine_topk`); candidate
    PAIR similarities and all k greedy rounds run on
    candidate-count-sized frames (≤ n_queries·c rows) — the iterative
    part never touches the corpus again. At 100 TB swap the candidate
    stage for the bucketed ANN path; the MMR tail is unchanged.

    Returns ``(q_id, vec_id, pick, mmr_score)`` — pick = selection
    order 1..k.
    """
    base = _with_norm(emb)
    cand = _brute_topk(base, n_queries, c, "cos_sim").select(
        "q_id",
        "vec_id",
        F.floor(F.col("cos_sim") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("rel"),
    )
    cv = cand.join(
        base.select("vec_id", "v", "nrm"), "vec_id"
    ).select("q_id", "vec_id", "v", "nrm")
    a = cv.select(
        F.col("q_id"), F.col("vec_id").alias("va"),
        F.col("v").alias("xa"), F.col("nrm").alias("na"),
    )
    b = cv.select(
        F.col("q_id").alias("qb"), F.col("vec_id").alias("vb"),
        F.col("v").alias("xb"), F.col("nrm").alias("nb"),
    )
    sim = (
        a.join(b, (a.q_id == b.qb) & (a.va != b.vb))
        .select(
            "q_id",
            "va",
            "vb",
            F.floor(
                F.round(
                    _dot(F.col("xa"), F.col("xb"))
                    / (F.col("na") * F.col("nb")),
                    6,
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("sim"),
        )
        .persist()
    )
    cand = cand.persist()
    selected = None  # (q_id, vec_id, pick, mmr_score)
    for t in range(1, k + 1):
        if selected is None:
            maxsim = cand.select(
                "q_id", "vec_id", F.lit(0).cast("long").alias("ms")
            )
            remaining = cand
        else:
            remaining = cand.join(
                selected.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_anti"
            )
            sel_b = selected.select(
                F.col("q_id").alias("qs"), F.col("vec_id").alias("vs")
            )
            sims_to_sel = sim.join(
                sel_b, (sim.q_id == sel_b.qs) & (sim.vb == sel_b.vs)
            ).select(sim.q_id.alias("q_id"), F.col("va").alias("vec_id"), "sim")
            maxsim = (
                remaining.select("q_id", "vec_id")
                .join(sims_to_sel, ["q_id", "vec_id"], "left")
                .groupBy("q_id", "vec_id")
                .agg(F.coalesce(F.max("sim"), F.lit(0)).alias("ms"))
            )
        scored = remaining.join(maxsim, ["q_id", "vec_id"]).select(
            "q_id",
            "vec_id",
            (
                F.lit(MMR_LAM_NUM) * F.col("rel")
                - F.lit(MMR_LAM_REST) * F.col("ms")
            ).alias("mmr_score"),
        )
        w = Window.partitionBy("q_id").orderBy(
            F.desc("mmr_score"), F.asc("vec_id")
        )
        pick = (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                "q_id",
                "vec_id",
                F.lit(t).cast("long").alias("pick"),
                "mmr_score",
            )
        )
        selected = (
            pick if selected is None else selected.unionByName(pick)
        ).localCheckpoint()
    return selected.orderBy("q_id", "pick")


def oracle_mmr_topk(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    c: int = MMR_CANDIDATES,
    dim: int = DIM,
) -> str:
    parts = [
        f"""WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             x -> x * x)),
              (acc, x) -> acc + x)) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM base
      WHERE vec_id < {n_queries}),
cand AS (
  SELECT q_id, vec_id,
         CAST(floor(cos_sim * 1e6 + 0.5) AS BIGINT) AS rel
  FROM (
    SELECT q_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
               ORDER BY cos_sim DESC, vec_id ASC) AS rnk
    FROM (
      SELECT q_id, vec_id,
             round({_sql_dot("qv", "v", dim)} / (qn * nrm), 6) AS cos_sim
      FROM q CROSS JOIN base WHERE vec_id <> q_id))
  WHERE rnk <= {c}),
cv AS (SELECT c.q_id, c.vec_id, b.v, b.nrm FROM cand c
       JOIN base b USING (vec_id)),
sim AS (
  SELECT a.q_id, a.vec_id AS va, b.vec_id AS vb,
         CAST(floor(round({_sql_dot("a.v", "b.v", dim)} / (a.nrm * b.nrm), 6)
              * 1e6 + 0.5) AS BIGINT) AS sim
  FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id)"""
    ]
    sel_union = None
    for t in range(1, k + 1):
        if t == 1:
            parts.append(
                f""",
p1 AS (
  SELECT q_id, vec_id, CAST(1 AS BIGINT) AS pick,
         CAST({MMR_LAM_NUM} AS BIGINT) * rel AS mmr_score
  FROM (SELECT q_id, vec_id, rel,
               row_number() OVER (PARTITION BY q_id
                   ORDER BY {MMR_LAM_NUM} * rel DESC, vec_id ASC) AS rn
        FROM cand) WHERE rn = 1)"""
            )
            sel_union = "SELECT q_id, vec_id FROM p1"
        else:
            parts.append(
                f""",
s{t} AS ({sel_union}),
m{t} AS (
  SELECT c.q_id, c.vec_id,
         CAST(COALESCE((SELECT max(s.sim) FROM sim s
                        JOIN s{t} sel ON sel.q_id = s.q_id
                                     AND sel.vec_id = s.vb
                        WHERE s.q_id = c.q_id AND s.va = c.vec_id), 0)
              AS BIGINT) AS ms
  FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM s{t} sl
                    WHERE sl.q_id = c.q_id AND sl.vec_id = c.vec_id)),
p{t} AS (
  SELECT q_id, vec_id, CAST({t} AS BIGINT) AS pick, mmr_score
  FROM (SELECT m.q_id, m.vec_id,
               {MMR_LAM_NUM} * c.rel - {MMR_LAM_REST} * m.ms AS mmr_score,
               row_number() OVER (PARTITION BY m.q_id
                   ORDER BY {MMR_LAM_NUM} * c.rel - {MMR_LAM_REST} * m.ms DESC,
                            m.vec_id ASC) AS rn
        FROM m{t} m JOIN cand c ON c.q_id = m.q_id AND c.vec_id = m.vec_id)
  WHERE rn = 1)"""
            )
            sel_union += f" UNION ALL SELECT q_id, vec_id FROM p{t}"
    selects = " UNION ALL ".join(
        f"SELECT q_id, vec_id, pick, CAST(mmr_score AS BIGINT) AS mmr_score"
        f" FROM p{t}"
        for t in range(1, k + 1)
    )
    parts.append(f"\n{selects}\nORDER BY q_id, pick")
    return "".join(parts)


def hard_negative_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector the k most cosine-similar corpus vectors whose ``label``
    DIFFERS from the query's — the near-miss examples a retrieval /
    embedding trainer pairs against each positive (the reference has
    no embedding surface; this is the training-data-pipeline
    extension over the same `embeddings` table as :func:`cosine_topk`).

    Semantics: similarity ranking identical to :func:`cosine_topk`
    (6-dp cosine, ties broken by vec_id asc); the label inequality
    replaces the self-exclusion (a vector shares its own label, so
    self never qualifies). NULL-labeled rows drop out on both sides
    (``!=`` is NULL) — same contract in Spark and the oracle.

    Plan: broadcast queries × ONE corpus scan; the label predicate
    evaluates inside the NLJ's generated code, so disqualified pairs
    are never materialized. At 100 TB the same composition runs over
    :func:`lsh_ann_topk`'s bucketed candidates instead of the full
    scan — bucket-join, label filter, exact rescore — documented in
    SCALE.md; this exact form is the correctness yardstick.

    Returns ``(q_id, vec_id, rank, cos_sim)``.
    """
    v = _as_double(F.col("embedding"))
    base = emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("nrm"),
    )
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = (
        F.broadcast(q)
        .crossJoin(base)
        .where(F.col("label") != F.col("q_label"))
        .select("q_id", "vec_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def oracle_hard_negative_topk(
    n_queries: int = N_QUERIES, k: int = TOP_K, dim: int = DIM
) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             x -> x * x)),
              (acc, x) -> acc + x)) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
      FROM base WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, vec_id,
         round({_sql_dot("qv", "v", dim)} / (qn * nrm), 6) AS cos_sim
  FROM q CROSS JOIN base WHERE label <> q_label)
SELECT q_id, vec_id, rank, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
             ORDER BY cos_sim DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k}"""


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# --------------------------------------------------------------------------

# PQ layout: DIM is split into PQ_M contiguous subspaces of DIM/PQ_M
# dims; each subspace has PQ_KS codewords = the slices of
# stride-sampled corpus vectors (same deterministic sampling idea as
# IVF_CENTROID_IDS; k-means would sharpen the codebook, the dataflow
# is identical). A vector encodes to PQ_M byte codes (16 bytes here vs
# 256 float bytes — the memory path for billion-vector serving, Jegou
# et al. 2011). m tunes the accuracy/memory trade: measured shortlist
# recall of the exact top-5 within a 50-candidate ADC shortlist on the
# unstructured synthetic corpus: m=4 -> 0.41, m=8 -> 0.50,
# m=16 -> 0.725 (attested by a unit test; real embedding corpora with
# cluster structure quantize far better).
PQ_M = 16
PQ_KS = 16
PQ_CODEWORD_IDS = tuple(50 + 24 * j for j in range(PQ_KS))
PQ_SHORTLIST = 50


def _pq_codewords(emb: DataFrame, codeword_ids=PQ_CODEWORD_IDS):
    """Collect the sampled codeword vectors as literals (a
    PQ_KS-row dim table — metadata scale, same contract as
    :func:`_centroid_literals`). Code ``j`` is the j-th codeword id in
    ascending vec_id order."""
    rows = (
        emb.where(F.col("vec_id").isin(*codeword_ids))
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def _pq_grid(
    frame: DataFrame, cws, m: int, sub: int, id_cols, argmin_only: bool
) -> DataFrame:
    """The PQ distance grid as an Arrow-batched numpy kernel — the one
    place in this module where Python touches vector data, and the
    textbook case for the escape hatch: a (batch × ks × sub) dense
    squared-distance grid is a SIMD kernel (what FAISS hand-vectorizes),
    and Catalyst expression evaluation of the same grid — whether as
    m·ks unrolled higher-order folds or as scalar element_at chains —
    was measured 20-30× slower with the cost dominated by expression
    machinery, not data.

    Exactness contract (bit-identical to the oracle's ``list_reduce``):
    the accumulation is an explicit per-element loop ``acc += d*d`` in
    index order over float64 (numpy elementwise ops are the same IEEE
    ops; no pairwise summation enters at any length), the lift is
    ``floor(d2 * 1e6 + 0.5)``, and ``argmin`` takes the FIRST minimum —
    the smallest-code tie-break.

    ``frame`` carries ``id_cols`` + ``r`` (array<double>). Returns
    ``(*id_cols, s, code)`` when ``argmin_only`` (the encoder) else the
    full ``(*id_cols, s, code, d2m)`` grid (the query tables).
    """
    cb = [list(map(float, cw)) for cw in cws]
    ks = len(cb)
    id_cols = tuple(id_cols)
    id_fields = ", ".join(f"{c} long" for c in id_cols)
    schema = f"{id_fields}, s long, code long" + (
        "" if argmin_only else ", d2m long"
    )

    def fn(it):
        import numpy as np
        import pandas as pd

        cbv = np.array(cb, dtype=np.float64)
        for pdf in it:
            b = len(pdf)
            if b == 0:
                continue
            r = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf["r"]]
            )
            ids = {c: pdf[c].to_numpy() for c in id_cols}
            frames = []
            for s in range(m):
                vs = r[:, s * sub : (s + 1) * sub]
                cs = cbv[:, s * sub : (s + 1) * sub]
                acc = np.zeros((b, ks), dtype=np.float64)
                for t in range(sub):
                    d = vs[:, t][:, None] - cs[:, t][None, :]
                    acc = acc + d * d
                d2m = np.floor(acc * 1e6 + 0.5).astype(np.int64)
                if argmin_only:
                    data = {c: ids[c] for c in id_cols}
                    data["s"] = np.full(b, s, dtype=np.int64)
                    data["code"] = d2m.argmin(axis=1).astype(np.int64)
                else:
                    data = {c: np.repeat(ids[c], ks) for c in id_cols}
                    data["s"] = np.full(b * ks, s, dtype=np.int64)
                    data["code"] = np.tile(np.arange(ks, dtype=np.int64), b)
                    data["d2m"] = d2m.reshape(-1)
                frames.append(pd.DataFrame(data))
            yield pd.concat(frames, ignore_index=True)

    return frame.mapInPandas(fn, schema=schema)


def pq_encode(
    emb: DataFrame,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> DataFrame:
    """PQ-encode the corpus: ``(vec_id, s, code)`` — per subspace the
    argmin-d2 codeword (ties: smaller code). ONE corpus scan through
    the Arrow-batched :func:`_pq_grid` kernel — no join, no shuffle;
    at 100 TB this is a map-only pass exactly like IVF assignment,
    with the distance grid as a vectorized numpy kernel instead of a
    Catalyst expression forest (20-30× faster, bit-identical)."""
    cws = _pq_codewords(emb, codeword_ids)
    sub = dim // m
    frame = emb.select("vec_id", _as_double(F.col("embedding")).alias("r"))
    return _pq_grid(frame, cws, m, sub, ("vec_id",), argmin_only=True)


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> DataFrame:
    """PQ asymmetric-distance top-k: queries score the ENCODED corpus
    via per-subspace distance-table lookups (ADC) — approximate L2
    search over m small codes instead of dim floats. Per query the
    table is m·ks entries (computed from the raw query vector, hence
    "asymmetric"); the corpus-side work is one lookup join + an
    integer sum per (query, vector, subspace).

    Scale shape: the corpus is touched ONCE to encode (map-only
    projection; in production the codes are the stored index, 64x
    smaller than the vectors here) and once through the lookup join —
    a broadcast equi-join on (s, code) against the n_queries·m·ks-row
    table, then one groupBy(q_id, vec_id) integer sum. No float
    crosses rows: distances are int64 micro-units, so the sum and the
    (adist asc, vec_id asc) ranking are engine-exact.

    Returns ``(q_id, vec_id, rank, adist)``; adist = Σ_s d2m lookups.
    """
    cws = _pq_codewords(emb, codeword_ids)
    sub = dim // m
    codes = pq_encode(emb, codeword_ids, m, dim)
    qframe = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        _as_double(F.col("embedding")).alias("r"),
    )
    qtab = _pq_grid(qframe, cws, m, sub, ("q_id",), argmin_only=False)
    scored = (
        codes.join(F.broadcast(qtab), ["s", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2m").cast("long").alias("adist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "adist")
    )


def pq_rerank_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    c: int = PQ_SHORTLIST,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> DataFrame:
    """Production PQ serving: ADC shortlist of ``c`` candidates per
    query (:func:`pq_adc_topk` with k = c — the scan never touches raw
    vectors), then EXACT squared-L2 rerank of the shortlist only. The
    rerank join is candidate-count-sized (n_queries · c rows against
    the corpus by key — an equi-join that reads c vectors per query,
    never a second corpus scan shape). Exactness contract: true d2 is
    the same index-order fold floor-lifted to int64 micro-units;
    ranking is (d2 asc, vec_id asc).

    Returns ``(q_id, vec_id, rank, d2_micro)`` — rank 1..k by exact
    distance among the shortlist."""
    shortlist = pq_adc_topk(emb, n_queries, c, codeword_ids, m, dim).select(
        "q_id", "vec_id"
    )
    v = _as_double(F.col("embedding"))
    base = emb.select("vec_id", v.alias("v"))
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = _fold_sum(F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)))
    scored = (
        shortlist.join(base, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.floor(d2 * F.lit(1e6) + F.lit(0.5)).cast("long").alias("d2_micro"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("d2_micro"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "d2_micro")
    )


def _pq_adc_sql(codeword_ids, m: int, dim: int, n_queries: int) -> str:
    """Shared oracle fragment (CTE list, no WITH): the (vector,
    subspace, codeword) d2m grid computed once, corpus codes by
    per-subspace argmin, the query tables, and the summed ADC
    distances — the same fold order, floor-micro lift, and tie-breaks
    as :func:`pq_encode` / :func:`pq_adc_topk`."""
    sub = dim // m
    ids = ", ".join(str(i) for i in sorted(codeword_ids))
    return f"""base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
cw AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS cv
  FROM base WHERE vec_id IN ({ids})),
pairs AS (
  SELECT b.vec_id, u.s, c.j,
         CAST(floor(list_reduce(list_prepend(0.0, list_transform(
                range(1, {sub + 1}),
                i -> (b.v[u.s * {sub} + i] - c.cv[u.s * {sub} + i])
                   * (b.v[u.s * {sub} + i] - c.cv[u.s * {sub} + i]))),
              (acc, x) -> acc + x) * 1e6 + 0.5) AS BIGINT) AS d2m
  FROM base b, unnest(range(0, {m})) u(s), cw c),
codes AS (
  SELECT vec_id, s, j AS code,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2m, j) AS rn
  FROM pairs),
qtab AS (SELECT vec_id AS q_id, s, j, d2m FROM pairs
         WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.q_id, c.vec_id, CAST(sum(q.d2m) AS BIGINT) AS adist
  FROM (SELECT vec_id, s, code FROM codes WHERE rn = 1) c
  JOIN qtab q ON q.s = c.s AND q.j = c.code
  WHERE c.vec_id <> q.q_id
  GROUP BY q.q_id, c.vec_id)"""


def oracle_pq_adc_topk(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> str:
    """DuckDB mirror of :func:`pq_adc_topk`."""
    return f"""
WITH {_pq_adc_sql(codeword_ids, m, dim, n_queries)}
SELECT q_id, vec_id, rank, adist FROM (
  SELECT q_id, vec_id, adist,
         row_number() OVER (PARTITION BY q_id
             ORDER BY adist, vec_id)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k} ORDER BY q_id, rank"""


def oracle_pq_rerank_topk(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    c: int = PQ_SHORTLIST,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> str:
    """DuckDB mirror of :func:`pq_rerank_topk`: the ADC shortlist CTE,
    then the exact full-dim d2 fold (same index order, same
    floor-micro lift) reranks it."""
    return f"""
WITH {_pq_adc_sql(codeword_ids, m, dim, n_queries)},
shortlist AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
               ORDER BY adist, vec_id) AS rank
    FROM scored)
  WHERE rank <= {c}),
rr AS (
  SELECT s.q_id, s.vec_id,
         CAST(floor(list_reduce(list_prepend(0.0, list_transform(
                range(1, {dim + 1}),
                i -> (q.v[i] - b.v[i]) * (q.v[i] - b.v[i]))),
              (acc, x) -> acc + x) * 1e6 + 0.5) AS BIGINT) AS d2_micro
  FROM shortlist s
  JOIN base b ON b.vec_id = s.vec_id
  JOIN base q ON q.vec_id = s.q_id)
SELECT q_id, vec_id, rank, d2_micro FROM (
  SELECT q_id, vec_id, d2_micro,
         row_number() OVER (PARTITION BY q_id
             ORDER BY d2_micro, vec_id)::BIGINT AS rank
  FROM rr)
WHERE rank <= {k} ORDER BY q_id, rank"""


def ivfpq_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    centroid_ids=IVF_CENTROID_IDS,
    nprobe: int = IVF_NPROBE,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> DataFrame:
    """IVF-PQ (the IVFADC architecture, Jegou et al. 2011): the coarse
    quantizer restricts WHICH vectors each query scores (nprobe
    nearest cells, exactly :func:`ivf_ann_topk`'s candidate rule), and
    product quantization of the CELL RESIDUALS (v − centroid) decides
    HOW they are scored — per-(query, cell) distance tables over the
    query's residual in that cell, summed by code lookup. Residual
    encoding is what makes the composition better than PQ alone: after
    subtracting the centroid the residual distribution is tighter, so
    the same codebook quantizes finer.

    Scale shape: assignment + residual encode is one corpus pass (the
    centroid table joins by broadcast, codes explode map-side); the
    serving join is (cell, s, code) equi — the n_queries·nprobe·m·ks
    query tables broadcast; ONE integer-sum groupBy. Distances are
    int64 micro-units end to end.

    Returns ``(q_id, vec_id, rank, adist)`` over the probed cells.
    """
    spark = emb.sparkSession
    base = _with_norm(emb)
    # ONE literal-fetch job for both dim tables: centroid and codeword
    # ids share a corpus filter-scan, so fetching them separately paid
    # a second fixed-cost Spark job for zero information (bench: ~0.9 s
    # of the ivfpq wall). Ordering contracts preserved: both fetchers
    # sort by vec_id.
    all_ids = sorted(set(centroid_ids) | set(codeword_ids))
    fetched = (
        _with_norm(emb.where(F.col("vec_id").isin(*all_ids)))
        .orderBy("vec_id")
        .collect()
    )
    by_id = {
        int(r["vec_id"]): ([float(x) for x in r["v"]], float(r["nrm"]))
        for r in fetched
    }
    cents = [(i, by_id[i][0], by_id[i][1]) for i in sorted(centroid_ids)]
    cws = [by_id[i][0] for i in sorted(codeword_ids)]
    sub = dim // m
    cdf = spark.createDataFrame(
        [(int(cell), [float(x) for x in cv]) for cell, cv, _ in cents],
        "cell long, cent array<double>",
    )
    # assignment as a pure projection (bit-identical to the
    # _nearest_cells(…, 1) rule, parity test-pinned): carrying the cell
    # on the corpus row avoids the base ⋈ assign self-join — one corpus
    # Exchange removed (r09; the layout builder already used this form)
    res = (
        base.withColumn("cell", _cell_projection(cents))
        .join(F.broadcast(cdf), "cell")
        .select(
            "vec_id",
            "cell",
            F.zip_with("v", "cent", lambda x, c: x - c).alias("r"),
        )
    )
    codes = _pq_grid(res, cws, m, sub, ("vec_id", "cell"), argmin_only=True)
    probes = _nearest_cells(base.where(F.col("vec_id") < n_queries), cents, nprobe).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    qres = (
        probes.join(
            base.select(F.col("vec_id").alias("q_id"), "v"), "q_id"
        )
        .join(F.broadcast(cdf), "cell")
        .select(
            "q_id", "cell", F.zip_with("v", "cent", lambda x, c: x - c).alias("r")
        )
    )
    qtab = _pq_grid(qres, cws, m, sub, ("q_id", "cell"), argmin_only=False)
    scored = (
        codes.join(F.broadcast(qtab), ["cell", "s", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2m").cast("long").alias("adist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "adist")
    )


def oracle_ivfpq_topk(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    centroid_ids=IVF_CENTROID_IDS,
    nprobe: int = IVF_NPROBE,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> str:
    """DuckDB mirror of :func:`ivfpq_topk`: assignment/probes reuse
    the certified IVF argmax form; residuals, residual codes, and the
    per-(query, cell) tables use the same index-order folds and
    floor-micro lifts."""
    sub = dim // m
    cids = ", ".join(str(i) for i in centroid_ids)
    wids = ", ".join(str(i) for i in sorted(codeword_ids))
    d2m = (
        f"""CAST(floor(list_reduce(list_prepend(0.0, list_transform(
                range(1, {sub + 1}),
                i -> (rr.r[u.s * {sub} + i] - c.cwv[u.s * {sub} + i])
                   * (rr.r[u.s * {sub} + i] - c.cwv[u.s * {sub} + i]))),
              (acc, x) -> acc + x) * 1e6 + 0.5) AS BIGINT)"""
    )
    return f"""
WITH {_SQL_BASE},
cent AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM base
         WHERE vec_id IN ({cids})),
cw AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS cwv
       FROM base WHERE vec_id IN ({wids})),
dists AS (
  SELECT b.vec_id, cent.cell,
         row_number() OVER (PARTITION BY b.vec_id
             ORDER BY round({_sql_dot("b.v", "cv", dim)} / (b.nrm * cn), 6) DESC,
                      cent.cell ASC) AS rnk
  FROM base b CROSS JOIN cent),
assign AS (SELECT vec_id, cell FROM dists WHERE rnk = 1),
probes AS (SELECT vec_id AS q_id, cell FROM dists
           WHERE vec_id < {n_queries} AND rnk <= {nprobe}),
res AS (
  SELECT b.vec_id, a.cell,
         list_transform(range(1, {dim + 1}), i -> b.v[i] - c.cv[i]) AS r
  FROM base b JOIN assign a USING (vec_id) JOIN cent c USING (cell)),
rp AS (
  SELECT rr.vec_id, rr.cell, u.s, c.j, {d2m} AS d2m
  FROM res rr, unnest(range(0, {m})) u(s), cw c),
codes AS (
  SELECT vec_id, cell, s, j AS code,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2m, j) AS rn
  FROM rp),
qres AS (
  SELECT p.q_id, p.cell,
         list_transform(range(1, {dim + 1}), i -> b.v[i] - c.cv[i]) AS r
  FROM probes p JOIN base b ON b.vec_id = p.q_id JOIN cent c USING (cell)),
qp AS (
  SELECT rr.q_id, rr.cell, u.s, c.j, {d2m} AS d2m
  FROM qres rr, unnest(range(0, {m})) u(s), cw c),
scored AS (
  SELECT q.q_id, c.vec_id, CAST(sum(q.d2m) AS BIGINT) AS adist
  FROM (SELECT vec_id, cell, s, code FROM codes WHERE rn = 1) c
  JOIN qp q ON q.cell = c.cell AND q.s = c.s AND q.j = c.code
  WHERE c.vec_id <> q.q_id
  GROUP BY q.q_id, c.vec_id)
SELECT q_id, vec_id, rank, adist FROM (
  SELECT q_id, vec_id, adist,
         row_number() OVER (PARTITION BY q_id
             ORDER BY adist, vec_id)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k} ORDER BY q_id, rank"""


# IVFADC-R defaults (tools/ann_recall_curve.py, BASELINE.md): the
# measured recall@5 grid over (nprobe, shortlist) puts the knee at
# nprobe=16 / c=200 — raising the 0.588 raw-IVFADC floor past 0.8 for
# one more probed cell-group and a shortlist that is still O(100)
# rows/query at ANY corpus size.
# Tuned on the measured (nprobe, c) grid (BASELINE.md rounds 6-7).
# r07 finding: at sf0.1 the 0.750 recall@5 ceiling was NOT the probe
# set (the 16-of-24-cell probe set contains 0.963 of the true top-5)
# but the ADC shortlist — quantization noise pushes true neighbors
# past rank 200 in the ADC ordering. The lever with defensible scale
# cost is c, not the codebook: the rerank join is n_queries·c rows
# (broadcast-trivial at ANY corpus size; c=400 doubles a join that is
# already 4 orders below the corpus), while a k-means residual
# codebook measured only +0.075 at c=200 and adds a training stage.
# Measured reranked recall@5 at sf0.1, nprobe=16: c=200 → 0.750,
# c=300 → 0.863, c=400 → 0.913, c=500 → 0.925.
IVFPQ_RERANK_NPROBE = 16
IVFPQ_RERANK_SHORTLIST = 400


def ivfpq_rerank_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    c: int = IVFPQ_RERANK_SHORTLIST,
    centroid_ids=IVF_CENTROID_IDS,
    nprobe: int = IVFPQ_RERANK_NPROBE,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> DataFrame:
    """IVFADC-R (Jegou et al. 2011 §V): the IVF-PQ ADC scan shortlists
    ``c`` candidates per query (:func:`ivfpq_topk` with k = c — codes
    only, never raw vectors), then the shortlist alone is reranked by
    EXACT squared L2 — :func:`pq_rerank_topk`'s recipe applied to the
    residual-coded IVF index. This recovers the recall the int-coded
    ADC ordering loses to quantization noise (measured 0.588 → the
    probed-cells bound at c=200) while the rerank join stays
    candidate-count-sized: n_queries · c rows keyed against the
    corpus, a broadcast-able equi-join at any corpus scale.

    Returns ``(q_id, vec_id, rank, d2_micro)`` — rank 1..k by exact
    distance among the shortlist."""
    shortlist = ivfpq_topk(
        emb, n_queries, c, centroid_ids, nprobe, codeword_ids, m, dim
    ).select("q_id", "vec_id")
    return _exact_rerank(shortlist, emb, n_queries, k)


def _exact_rerank(
    shortlist: DataFrame, emb: DataFrame, n_queries: int, k: int
) -> DataFrame:
    """EXACT squared-L2 rerank of a (q_id, vec_id) shortlist against
    the raw vectors — the recall-recovery half of IVFADC-R, shared by
    the inline (:func:`ivfpq_rerank_topk`) and layout-served
    (:func:`ivfpq_rerank_from_layout`) forms. The rerank join is
    shortlist-sized (n_queries · c rows) against the corpus — a
    broadcast-able equi-join at any corpus scale; the query side stays
    a pushed-down ``vec_id < n_queries`` scan."""
    v = _as_double(F.col("embedding"))
    base = emb.select("vec_id", v.alias("v"))
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = _fold_sum(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y))
    )
    scored = (
        shortlist.join(base, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.floor(d2 * F.lit(1e6) + F.lit(0.5)).cast("long").alias("d2_micro"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("d2_micro"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "d2_micro"
        )
    )


def oracle_ivfpq_rerank_topk(
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    c: int = IVFPQ_RERANK_SHORTLIST,
    centroid_ids=IVF_CENTROID_IDS,
    nprobe: int = IVFPQ_RERANK_NPROBE,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> str:
    """DuckDB mirror of :func:`ivfpq_rerank_topk`: the certified
    IVF-PQ oracle (k = c) as the shortlist CTE, then the exact
    full-dim d2 fold (same index order, same floor-micro lift)
    reranks it."""
    inner = oracle_ivfpq_topk(
        n_queries, c, centroid_ids, nprobe, codeword_ids, m, dim
    )
    return f"""
WITH shortlist AS (SELECT q_id, vec_id FROM ({inner}) iq),
rbase AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
rr AS (
  SELECT s.q_id, s.vec_id,
         CAST(floor(list_reduce(list_prepend(0.0, list_transform(
                range(1, {dim + 1}),
                i -> (q.v[i] - b.v[i]) * (q.v[i] - b.v[i]))),
              (acc, x) -> acc + x) * 1e6 + 0.5) AS BIGINT) AS d2_micro
  FROM shortlist s
  JOIN rbase b ON b.vec_id = s.vec_id
  JOIN rbase q ON q.vec_id = s.q_id)
SELECT q_id, vec_id, rank, d2_micro FROM (
  SELECT q_id, vec_id, d2_micro,
         row_number() OVER (PARTITION BY q_id
             ORDER BY d2_micro, vec_id)::BIGINT AS rank
  FROM rr)
WHERE rank <= {k} ORDER BY q_id, rank"""


def write_ivfpq_layout(
    emb: DataFrame,
    path: str,
    centroid_ids=IVF_CENTROID_IDS,
    codeword_ids=PQ_CODEWORD_IDS,
    m: int = PQ_M,
    dim: int = DIM,
) -> None:
    """Materialize the IVF-PQ index (the build half of IVFADC serving):
    the residual CODES — not the vectors — written ``partitionBy(cell)``
    so each coarse cell is its own directory, plus two metadata-scale
    sidecars (``<path>__centroids``: (cell, cv, cn); ``<path>__codewords``:
    (j, cwv)) so serving can never drift from the codebooks that encoded
    the layout. This is the same amortization :func:`write_ivf_layout`
    gives plain IVF, compounded by PQ's compression: the stored index is
    m int64 codes per vector instead of dim floats, and
    :func:`ivfpq_topk` re-assigned + re-encoded the whole corpus on
    every call — at 100 TB that is the difference between one build
    pass and one per query batch.

    Build cost: ONE literal-fetch job for both codebooks (same fused
    fetch as :func:`ivfpq_topk`), then one corpus pass — assignment is
    a pure projection (:func:`_cell_projection`, bit-identical to the
    ``_nearest_cells(…, 1)`` rule), the centroid join is broadcast, and
    the PQ encode is the Arrow :func:`_pq_grid` kernel. No corpus-side
    shuffle before partitionBy's task-side split."""
    spark = emb.sparkSession
    all_ids = sorted(set(centroid_ids) | set(codeword_ids))
    fetched = (
        _with_norm(emb.where(F.col("vec_id").isin(*all_ids)))
        .orderBy("vec_id")
        .collect()
    )
    by_id = {
        int(r["vec_id"]): ([float(x) for x in r["v"]], float(r["nrm"]))
        for r in fetched
    }
    cents = [(i, by_id[i][0], by_id[i][1]) for i in sorted(centroid_ids)]
    cws = [by_id[i][0] for i in sorted(codeword_ids)]
    spark.createDataFrame(
        [(cell, cv, cn) for cell, cv, cn in cents],
        "cell long, cv array<double>, cn double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}__centroids")
    spark.createDataFrame(
        [(j, cw) for j, cw in enumerate(cws)],
        "j long, cwv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}__codewords")
    sub = dim // m
    cdf = spark.createDataFrame(
        [(int(cell), [float(x) for x in cv]) for cell, cv, _ in cents],
        "cell long, cent array<double>",
    )
    v = _as_double(F.col("embedding"))
    nrm = F.sqrt(_fold_sum(F.transform(v, lambda x: x * x)))
    res = (
        emb.withColumn("v", v)
        .withColumn("nrm", nrm)
        .withColumn("cell", _cell_projection(cents))
        .join(F.broadcast(cdf), "cell")
        .select(
            "vec_id",
            "cell",
            F.zip_with("v", "cent", lambda x, c: x - c).alias("r"),
        )
    )
    codes = _pq_grid(res, cws, m, sub, ("vec_id", "cell"), argmin_only=True)
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivfpq_topk_from_layout(
    spark,
    path: str,
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    dim: int = DIM,
) -> DataFrame:
    """Serve IVF-PQ ANN from a :func:`write_ivfpq_layout` index: the
    codebooks come from the layout's sidecars (|cells| + ks rows — the
    corpus is never scanned for them), each query's ``nprobe`` nearest
    cells are computed from those literals, and ONE pruned scan reads
    only the probed cell directories of the CODES table
    (``cell IN (...)`` lands in PartitionFilters — asserted in the
    test). Zero per-search corpus work: no assignment, no residual
    encode — the scan is m int64 codes per candidate, and the scoring
    join is the same (cell, s, code) equi against the broadcast
    per-(query, cell) residual distance tables as :func:`ivfpq_topk`,
    whose output this matches exactly (parity pinned by a test).

    The probe assignment stays a distributed DataFrame end-to-end; the
    only driver hop is the distinct probed-cell set for the plan-time
    partition filter, bounded by |centroids|, not |queries| (the test
    pins that bound by intercepting collect())."""
    cents = [
        (int(r["cell"]), [float(x) for x in r["cv"]], float(r["cn"]))
        for r in spark.read.parquet(f"{path}__centroids").collect()
    ]
    cents.sort()
    cwrows = spark.read.parquet(f"{path}__codewords").collect()
    cws = [
        [float(x) for x in r["cwv"]]
        for r in sorted(cwrows, key=lambda r: int(r["j"]))
    ]
    sub = dim // m
    qbase = _with_norm(queries)
    probes = _nearest_cells(qbase, cents, nprobe).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    # metadata-scale driver hop: distinct probed cells (<= |cells|)
    probe_cells = sorted(
        int(r["cell"]) for r in probes.select("cell").distinct().collect()
    )
    codes = (
        spark.read.parquet(path)
        .where(F.col("cell").isin(probe_cells))
        .select("vec_id", F.col("cell").cast("long").alias("cell"), "s", "code")
    )
    cdf = spark.createDataFrame(
        [(int(cell), [float(x) for x in cv]) for cell, cv, _ in cents],
        "cell long, cent array<double>",
    )
    qres = (
        probes.join(qbase.select(F.col("vec_id").alias("q_id"), "v"), "q_id")
        .join(F.broadcast(cdf), "cell")
        .select(
            "q_id", "cell", F.zip_with("v", "cent", lambda x, c: x - c).alias("r")
        )
    )
    qtab = _pq_grid(qres, cws, m, sub, ("q_id", "cell"), argmin_only=False)
    scored = (
        codes.join(F.broadcast(qtab), ["cell", "s", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2m").cast("long").alias("adist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "adist")
    )


def ivfpq_rerank_from_layout(
    spark,
    path: str,
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    c: int = IVFPQ_RERANK_SHORTLIST,
    nprobe: int = IVFPQ_RERANK_NPROBE,
    m: int = PQ_M,
    dim: int = DIM,
) -> DataFrame:
    """IVFADC-R served from a :func:`write_ivfpq_layout` index — the
    production shape of :func:`ivfpq_rerank_topk`: the ADC shortlist
    (k = c) comes from the partition-pruned CODES scan
    (:func:`ivfpq_topk_from_layout` — no per-search assignment or
    encode), then :func:`_exact_rerank` recovers the recall the
    int-coded ordering loses to quantization noise with one
    shortlist-sized join against the raw vectors. Output is identical
    to the inline form when the layout was built with the same
    codebooks (parity test-pinned); at 10M vectors this is the
    serving-tier recall referee path (ann_scale.csv)."""
    queries = emb.where(F.col("vec_id") < n_queries)
    shortlist = ivfpq_topk_from_layout(
        spark, path, queries, k=c, nprobe=nprobe, m=m, dim=dim
    ).select("q_id", "vec_id")
    return _exact_rerank(shortlist, emb, n_queries, k)


def _emb(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return spark.table("embeddings")


def _wl_ivfpq_serve(spark, sf_dir):
    """Serving-path workload: the IVF-PQ layout is built ONCE per
    sf_dir (the production amortization — build is a batch job, serving
    is the steady state) under the gitignored spark-warehouse dir, and
    rebuilt only when missing or older than the source parquet. Every
    call after the first measures the pure serving path; output is
    identical to ``pipe_ann_ivfpq`` (same oracle; parity test-pinned),
    so bench records serving ≪ build directly against that entry.

    The layout is keyed by a fingerprint of the ABSOLUTE sf_dir plus
    the source parquet's (mtime, size) — not the basename — so two
    sf_dirs sharing a basename, or an in-place regeneration, can never
    serve a layout built from different data. Builds land in a temp
    sibling and are atomically renamed into place so a concurrent
    builder can't expose a half-written layout."""
    emb = _emb(spark, sf_dir)
    path = _cached_layout_path(emb, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ivfpq_topk_from_layout(spark, path, queries).orderBy("q_id", "rank")


def _cached_layout_path(emb: DataFrame, sf_dir: str) -> str:
    """Build-once IVF-PQ layout for a sf_dir (see
    :func:`_wl_ivfpq_serve`'s contract docstring): fingerprinted by
    absolute path + source (mtime, size), atomically published."""
    import hashlib
    import os
    import shutil

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    src = os.path.join(sf_dir, "embeddings.parquet")
    sig = os.path.abspath(sf_dir)
    if os.path.exists(src):
        st = os.stat(src)
        sig += f"|{st.st_mtime_ns}|{st.st_size}"
    tag = hashlib.sha256(sig.encode()).hexdigest()[:16]
    # the layout spans three sibling paths (codes + __centroids +
    # __codewords), so they are nested under ONE root dir whose atomic
    # rename publishes all of them together
    layout_root = os.path.join(root, "spark-warehouse", f"ivfpq_layout_{tag}")
    path = os.path.join(layout_root, "layout")
    if not os.path.isdir(layout_root):
        tmp_root = f"{layout_root}.build-{os.getpid()}"
        shutil.rmtree(tmp_root, ignore_errors=True)
        write_ivfpq_layout(emb, os.path.join(tmp_root, "layout"))
        try:
            os.rename(tmp_root, layout_root)
        except OSError:
            # another builder won the race; its layout has the same
            # fingerprint, so serving from it is equivalent
            shutil.rmtree(tmp_root, ignore_errors=True)
    return path


def _wl_ivfpq_rerank_serve(spark, sf_dir):
    """IVFADC-R from the materialized layout (build amortized exactly
    as ``pipe_ann_ivfpq_serve``): ADC shortlist from the pruned codes
    scan, exact rerank of the shortlist only. Output — and oracle —
    identical to the inline ``pipe_ann_ivfpq_rerank``."""
    emb = _emb(spark, sf_dir)
    path = _cached_layout_path(emb, sf_dir)
    return ivfpq_rerank_from_layout(spark, path, emb).orderBy("q_id", "rank")


def _wl_filtered_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return filtered_cosine_topk(emb, spark.table("documents"))


def _wl_quantized_topk(spark, sf_dir):
    return quantized_cosine_topk(_emb(spark, sf_dir))


def _wl_brute(spark, sf_dir):
    return cosine_topk(_emb(spark, sf_dir))


def _wl_lsh(spark, sf_dir):
    return lsh_ann_topk(_emb(spark, sf_dir))


def _wl_ivf(spark, sf_dir):
    return ivf_ann_topk(_emb(spark, sf_dir))


def _wl_ivf_multiassign(spark, sf_dir):
    """Multi-assignment IVF (a=2): each corpus vector lives in its TWO
    nearest cells, candidates dedup'd — the measured recall-ceiling
    option (0.9625 → 0.9875 at nprobe=16, ann_multiassign.csv). The
    oracle replays the a=2 assignment rule + DISTINCT identically."""
    return ivf_ann_topk(_emb(spark, sf_dir), assignments=2)


def _wl_emb_neardup(spark, sf_dir):
    return embedding_neardup_pairs(_emb(spark, sf_dir))


def _wl_ann_recall(spark, sf_dir):
    return ann_recall(_emb(spark, sf_dir))


OUTLIER_Z = 2.0


def embedding_outliers(emb: DataFrame, threshold: float = OUTLIER_Z) -> DataFrame:
    """Embedding outlier detection by distance-to-centroid z-score —
    the curation pass that flags vectors far from the corpus mean
    (mislabeled modality, corrupted rows, adversarial junk). Norm-based
    checks are degenerate on unit-normalized corpora (every norm is
    1.0); squared distance to the mean vector is not.

    Determinism: components quantize to integer mills; the per-dim
    mean comes from exact int64 sums (a dim-sized plan-time aggregate,
    inlined as literals like IVF centroids); each vector's squared
    distance is a fixed-order LEFT FOLD over dims (bit-identical to
    the oracle's ``list_reduce`` over ``list(... ORDER BY i)``) and is
    floor-quantized to an int64 before the corpus moment sums, so the
    final z is one identical IEEE expression, floor-quantized at 4 dp.
    Returns flagged ``(vec_id, d2m, z)`` rows; empty when the corpus
    is degenerate (std = 0 — guarded on both engines, no divide error).

    100 TB: two corpus scans (dim-mean, then score) + a 1-row stats
    broadcast; Σ d2m² stays in int64 for ~1e5-mills²-scale distances
    up to ~1e5 rows per unit — beyond, pre-scale the quantization.
    """
    v = _as_double(F.col("embedding"))
    qv = _quantize_mills(v)
    staged = emb.select("vec_id", qv.alias("qv"))
    dim_sums = (
        staged.select(F.posexplode("qv").alias("i", "c"))
        .groupBy("i")
        .agg(F.sum("c").alias("s"), F.count("*").alias("n"))
        .orderBy("i")
        .collect()
    )
    means = [r["s"] / r["n"] for r in dim_sums]  # exact ints -> IEEE div
    m_lit = _lit_doubles(means)
    diff2 = F.zip_with(
        F.col("qv"), m_lit, lambda c, m: (c - m) * (c - m)
    )
    d2m = F.floor(
        F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x) + F.lit(0.5)
    ).cast("long")
    scored = staged.select("vec_id", d2m.alias("d2m"))
    stats = scored.agg(
        F.count("*").alias("n"),
        F.sum("d2m").alias("s"),
        F.sum(F.col("d2m") * F.col("d2m")).alias("ss"),
    )
    joined = scored.crossJoin(F.broadcast(stats))
    mu = F.col("s") / F.col("n")
    sd = F.sqrt(F.col("ss") / F.col("n") - mu * mu)
    # when() guards the ANSI divide: z is NULL (row dropped) if sd == 0
    z4 = F.when(
        sd > 0,
        F.floor((F.col("d2m") - mu) / sd * 1e4 + F.lit(0.5)) / 1e4,
    )
    return (
        joined.select("vec_id", "d2m", z4.alias("z"))
        .where(F.col("z").isNotNull() & (F.abs(F.col("z")) >= threshold))
    )


def oracle_embedding_outliers(threshold: float = OUTLIER_Z) -> str:
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)::BIGINT) AS qv
  FROM embeddings),
e AS (SELECT vec_id, i, qv[i] AS c
      FROM q, unnest(range(1, len(qv) + 1)) u(i)),
m AS (SELECT i, CAST(sum(c) AS BIGINT) AS s, count(*) AS n FROM e GROUP BY i),
d AS (
  SELECT vec_id,
         floor(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((e.c - CAST(m.s AS DOUBLE) / m.n)
                    * (e.c - CAST(m.s AS DOUBLE) / m.n) ORDER BY e.i)),
               (acc, x) -> acc + x) + 0.5)::BIGINT AS d2m
  FROM e JOIN m USING (i) GROUP BY vec_id),
st AS (SELECT count(*) AS n, CAST(sum(d2m) AS BIGINT) AS s,
              CAST(sum(d2m * d2m) AS BIGINT) AS ss
       FROM d),
z AS (SELECT vec_id, d2m,
             CASE WHEN sqrt(ss / n - (s / n) * (s / n)) > 0
                  THEN floor((d2m - s / n)
                             / sqrt(ss / n - (s / n) * (s / n))
                             * 10000.0 + 0.5) / 10000.0 END AS z
      FROM d, st)
SELECT vec_id, d2m, z FROM z
WHERE z IS NOT NULL AND abs(z) >= {threshold}
ORDER BY vec_id"""


def _wl_outliers(spark, sf_dir):
    return embedding_outliers(_emb(spark, sf_dir)).orderBy("vec_id")


def embedding_drift(emb: DataFrame) -> DataFrame:
    """Per-dimension embedding drift between two corpus halves (here
    split by ``vec_id`` parity; production splits by snapshot/date) —
    the monitoring op that catches a silent encoder change or a data
    mix shift before it poisons retrieval: a re-deployed embedding
    model moves the centroid, and per-DIM shifts localize which
    subspace moved.

    Determinism: components quantize to integer mills, per-half sums
    are exact int64, and the two means + their difference are one
    identical IEEE expression per dim on both engines, floor-quantized
    at 6 dp.

    Plan: ONE posexplode + ONE map-combinable groupBy(dim) with
    conditional sums — a single pass over the corpus producing
    dim-sized output. Int64 headroom: |mills| <= 1e3 per component, so
    Σ stays exact to ~9e15 rows per half.
    Returns ``(dim, na, nb, mean_a, mean_b, shift)``.
    """
    qv = _quantize_mills(_as_double(F.col("embedding")))
    is_a = (F.col("vec_id") % 2 == 0).alias("is_a")
    ex = emb.select(is_a, F.posexplode(qv).alias("dim", "c"))
    agg = ex.groupBy("dim").agg(
        F.sum(F.when(F.col("is_a"), F.col("c"))).alias("sa"),
        F.count(F.when(F.col("is_a"), F.lit(1))).alias("na"),
        F.sum(F.when(~F.col("is_a"), F.col("c"))).alias("sb"),
        F.count(F.when(~F.col("is_a"), F.lit(1))).alias("nb"),
    )
    mean_a = F.col("sa") / (F.lit(1000.0) * F.col("na"))
    mean_b = F.col("sb") / (F.lit(1000.0) * F.col("nb"))

    def _r6(x):
        return F.floor(x * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000.0)

    return agg.select(
        "dim",
        "na",
        "nb",
        _r6(mean_a).alias("mean_a"),
        _r6(mean_b).alias("mean_b"),
        _r6(F.abs(mean_a - mean_b)).alias("shift"),
    ).orderBy("dim")


def oracle_embedding_drift() -> str:
    return """
WITH ex AS (
  SELECT (vec_id % 2 = 0) AS is_a, CAST(i - 1 AS INTEGER) AS dim,
         floor(embedding[i]::DOUBLE * 1000 + 0.5)::BIGINT AS c
  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
agg AS (
  SELECT dim,
         CAST(sum(CASE WHEN is_a THEN c END) AS BIGINT) AS sa,
         CAST(count(CASE WHEN is_a THEN 1 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN NOT is_a THEN c END) AS BIGINT) AS sb,
         CAST(count(CASE WHEN NOT is_a THEN 1 END) AS BIGINT) AS nb
  FROM ex GROUP BY dim)
SELECT dim, na, nb,
       floor(sa / (1000.0 * na) * 1000000 + 0.5) / 1000000.0 AS mean_a,
       floor(sb / (1000.0 * nb) * 1000000 + 0.5) / 1000000.0 AS mean_b,
       floor(abs(sa / (1000.0 * na) - sb / (1000.0 * nb)) * 1000000 + 0.5)
         / 1000000.0 AS shift
FROM agg ORDER BY dim"""


WHITEN_QUERY_PREFIX = 100  # emit whitened rows for vec_id < this


def embedding_whitening(emb: DataFrame) -> DataFrame:
    """Per-dimension z-score whitening of the embedding column — the
    standard pre-ANN / pre-PCA normalization (mean-center each
    dimension, scale to unit variance) so no dimension dominates the
    distance metric.

    Determinism: components are quantized to integer millis first
    (``floor(x::double*1000+0.5)``, the module's convention), so the
    per-dim moment sums are int64 and order-free; the z-score is then
    algebraically ONE division of exact integers, ``z = (n·q − Σq) /
    sqrt(n·Σq² − (Σq)²)`` (the n² factors cancel), with the IEEE-exact
    sqrt — no intermediate mean/std floats whose rounding could
    diverge across engines. 6 dp floor-quantized. Headroom: q ≤ ~1e3
    ⇒ n·Σq² ≤ ~1e9·n² — int64-safe past 1e9 vectors per dim-partition;
    beyond that the sums switch to DECIMAL(38,0).

    Scale: one posexplode + one 64-row groupBy(dim) (map-side
    combinable) + a broadcast join of the 64-row stats table back onto
    the exploded rows. Returns ``(vec_id, dim, q_mills, z)`` for the
    query-prefix rows (the whitened matrix itself stays distributed).
    """
    q = F.floor(F.col("x").cast("double") * 1000 + F.lit(0.5)).cast("long")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "dim", q.alias("q"))
    stats = flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sx"),
        F.sum(F.col("q") * F.col("q")).alias("sxx"),
    )
    zc = (F.col("n") * F.col("q") - F.col("sx")).cast("double") / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    z6 = F.floor(zc * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000.0)
    return (
        flat.where(F.col("vec_id") < WHITEN_QUERY_PREFIX)
        .join(F.broadcast(stats), "dim")
        .where(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        .select("vec_id", "dim", F.col("q").alias("q_mills"), z6.alias("z"))
        .orderBy("vec_id", "dim")
    )


def oracle_embedding_whitening() -> str:
    return f"""
WITH flat AS (
  SELECT vec_id, i - 1 AS dim,
         floor(embedding[i]::DOUBLE * 1000 + 0.5)::BIGINT AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
stats AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sx,
         CAST(sum(q * q) AS BIGINT) AS sxx
  FROM flat GROUP BY dim)
SELECT f.vec_id, f.dim, f.q AS q_mills,
       floor(CAST(s.n * f.q - s.sx AS DOUBLE)
             / sqrt(CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE))
             * 1000000 + 0.5) / 1000000.0 AS z
FROM flat f JOIN stats s USING (dim)
WHERE f.vec_id < {WHITEN_QUERY_PREFIX}
  AND s.n * s.sxx - s.sx * s.sx > 0
ORDER BY f.vec_id, f.dim"""


def simsearch_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload(
            "pipe_embed_whitening",
            lambda spark, sf_dir: embedding_whitening(_emb(spark, sf_dir)),
            oracle_embedding_whitening(),
            False,
        ),
        Workload("pipe_embed_outliers", _wl_outliers, oracle_embedding_outliers(), False),
        Workload(
            "pipe_embed_drift",
            lambda spark, sf_dir: embedding_drift(_emb(spark, sf_dir)),
            oracle_embedding_drift(),
            False,
        ),
        Workload("pipe_ann_cosine_topk", _wl_brute, oracle_cosine_topk(), True),
        Workload(
            "pipe_ann_hard_negatives",
            lambda spark, sf_dir: hard_negative_topk(_emb(spark, sf_dir)),
            oracle_hard_negative_topk(),
            False,
        ),
        Workload(
            "pipe_ann_mmr",
            lambda spark, sf_dir: mmr_topk(_emb(spark, sf_dir)),
            oracle_mmr_topk(),
            False,
        ),
        Workload(
            "pipe_ann_ndcg",
            lambda spark, sf_dir: ann_ndcg(_emb(spark, sf_dir)),
            oracle_ann_ndcg(),
            False,
        ),
        Workload(
            "pipe_embed_power_pca",
            lambda spark, sf_dir: power_iteration_pc1(_emb(spark, sf_dir)),
            oracle_power_pca(),
            False,
        ),
        Workload(
            "pipe_contrastive_pairs",
            lambda spark, sf_dir: contrastive_pairs(_emb(spark, sf_dir)),
            oracle_contrastive_pairs(),
            False,
        ),
        Workload(
            "pipe_embed_pc1_projection",
            lambda spark, sf_dir: pc1_projections(_emb(spark, sf_dir)),
            oracle_pc1_projections(),
            False,
        ),
        Workload(
            "pipe_ann_mrr",
            lambda spark, sf_dir: ann_mrr(_emb(spark, sf_dir)),
            oracle_ann_mrr(),
            False,
        ),
        Workload("pipe_ann_lsh_topk", _wl_lsh, oracle_lsh_ann_topk(), False),
        Workload("pipe_ann_ivf_topk", _wl_ivf, oracle_ivf_ann_topk(), False),
        Workload(
            "pipe_ann_ivf_multiassign",
            _wl_ivf_multiassign,
            oracle_ivf_ann_topk(assignments=2),
            False,
        ),
        Workload("pipe_ann_recall", _wl_ann_recall, oracle_ann_recall(), False),
        Workload(
            "pipe_dedup_embedding_cosine",
            _wl_emb_neardup,
            oracle_embedding_neardup(),
            False,
        ),
        Workload(
            # gate form emits SCALAR rows (vec_id, dim, qv): array
            # columns have never been driver-hashed (same unproven
            # class as raw timestamps — see workloads.py time
            # normalization); the operator itself still returns codes
            # as arrays
            "pipe_embed_quantize_int8",
            lambda spark, sf_dir: quantize_int8(_emb(spark, sf_dir)).select(
                "vec_id", "scale_r", F.posexplode("q").alias("dim", "qv")
            ),
            oracle_quantize_int8_scalar(),
            False,
        ),
        Workload(
            "pipe_ann_quantized_topk",
            _wl_quantized_topk,
            oracle_quantized_topk(),
            False,
        ),
        Workload(
            "pipe_ann_filtered_topk",
            _wl_filtered_topk,
            oracle_filtered_topk(),
            False,
        ),
        Workload(
            "pipe_embed_label_stats",
            lambda spark, sf_dir: label_centroid_stats(_emb(spark, sf_dir)),
            oracle_label_centroid_stats(),
            False,
        ),
        Workload(
            "pipe_embed_kmeans",
            lambda spark, sf_dir: kmeans_fit(_emb(spark, sf_dir)),
            oracle_kmeans(),
            False,
        ),
        Workload(
            "pipe_dedup_semantic",
            lambda spark, sf_dir: semantic_dedup(_emb(spark, sf_dir)),
            oracle_semantic_dedup(),
            False,
        ),
        Workload(
            "pipe_ann_pq_adc",
            lambda spark, sf_dir: pq_adc_topk(_emb(spark, sf_dir)).orderBy(
                "q_id", "rank"
            ),
            oracle_pq_adc_topk(),
            False,
        ),
        Workload(
            "pipe_ann_pq_rerank",
            lambda spark, sf_dir: pq_rerank_topk(_emb(spark, sf_dir)).orderBy(
                "q_id", "rank"
            ),
            oracle_pq_rerank_topk(),
            False,
        ),
        Workload(
            "pipe_ann_ivfpq",
            lambda spark, sf_dir: ivfpq_topk(_emb(spark, sf_dir)).orderBy(
                "q_id", "rank"
            ),
            oracle_ivfpq_topk(),
            True,  # headline: the flagship round-4 ANN architecture
        ),
        Workload(
            # the serving half of the same architecture: identical
            # output (and oracle), but scored from the materialized
            # partitionBy(cell) codes layout — benched side-by-side
            # with the inline build path above (r04 verdict item 4)
            "pipe_ann_ivfpq_serve",
            _wl_ivfpq_serve,
            oracle_ivfpq_topk(),
            True,
        ),
        Workload(
            # IVFADC-R: ADC shortlist + exact rerank — lifts the raw
            # IVFADC recall@5 (0.175 measured) to the probed-cells
            # bound (0.887 at nprobe=16/c=200; tools/ann_recall_curve)
            "pipe_ann_ivfpq_rerank",
            lambda spark, sf_dir: ivfpq_rerank_topk(
                _emb(spark, sf_dir)
            ).orderBy("q_id", "rank"),
            oracle_ivfpq_rerank_topk(),
            False,
        ),
        Workload(
            # IVFADC-R from the MATERIALIZED layout (r09): the
            # production serving shape of the rerank tier — pruned
            # codes scan shortlists, exact rerank recovers recall;
            # same oracle as the inline form
            "pipe_ann_ivfpq_rerank_serve",
            _wl_ivfpq_rerank_serve,
            oracle_ivfpq_rerank_topk(),
            False,
        ),
        Workload(
            # greedy k-center coreset: diversity-first subset selection
            "pipe_sample_kcenter",
            lambda spark, sf_dir: kcenter_select(
                _emb(spark, sf_dir)
            ).orderBy("pick_order"),
            oracle_kcenter(),
            False,
        ),
    ]




# Greedy k-center (Gonzalez/farthest-point) coreset size
KCENTER_K = 8


def kcenter_select(emb: DataFrame, k: int = KCENTER_K, dim: int = DIM) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985, the 2-approx
    farthest-point traversal) — the diversity-first subset selector a
    curation pipeline runs to seed labeling / eval panels / cluster
    initializations: each round picks the vector FARTHEST from every
    already-chosen center, so the selection spreads over the corpus
    instead of oversampling its dense core (what uniform sampling
    does).

    Determinism: the seed is the smallest vec_id; distances are the
    repo's exact-lift idiom (index-order float fold → floor-micro
    int64, the PQ contract), so the argmax each round — ordered
    (dmin desc, vec_id asc) — is engine-invariant. Already-chosen
    centers have dmin = 0 and can never win again.

    Plan: k−1 corpus scans, each evaluating ≤ k inline literal-center
    distance folds and collecting ONE row (the argmax — the HITS /
    BPE-argmax bounded-collect convention). O(k²·n) kernel work total:
    the known cost of exact greedy k-center, embarrassingly parallel
    per scan; at larger k the production variant persists the running
    dmin column instead of re-folding (documented trade, same
    output).

    Returns ``(pick_order, vec_id, radius_micro)`` — ``radius_micro``
    is the chosen point's distance to the prior centers (the max-min
    covering radius curve; the seed reports 0).
    """
    v = _as_double(F.col("embedding"))
    base = emb.select("vec_id", v.alias("v"))
    seed = base.orderBy("vec_id").limit(1).collect()[0]
    centers = [(int(seed["vec_id"]), [float(x) for x in seed["v"]], 0)]
    for _t in range(1, k):
        dexprs = []
        for _cid, cv, _r in centers:
            carr = _lit_doubles(cv)
            d2 = _fold_sum(
                F.zip_with(F.col("v"), carr, lambda x, y: (x - y) * (x - y))
            )
            dexprs.append(
                F.floor(d2 * F.lit(1e6) + F.lit(0.5)).cast("long")
            )
        dmin = dexprs[0] if len(dexprs) == 1 else F.least(*dexprs)
        nxt = (
            base.select("vec_id", "v", dmin.alias("dmin"))
            .orderBy(F.desc("dmin"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        centers.append(
            (int(nxt["vec_id"]), [float(x) for x in nxt["v"]], int(nxt["dmin"]))
        )
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(t, cid, r) for t, (cid, _v, r) in enumerate(centers)],
        "pick_order long, vec_id long, radius_micro long",
    )


def oracle_kcenter(k: int = KCENTER_K, dim: int = DIM) -> str:
    """DuckDB mirror of :func:`kcenter_select`: k−1 unrolled
    MATERIALIZED argmax levels (the :func:`graph.hits` oracle
    pattern), each folding the same index-order micro-lifted
    distance."""
    def dist(a: str, b: str) -> str:
        return (
            f"CAST(floor(list_reduce(list_prepend(0.0, list_transform("
            f"range(1, {dim + 1}), i -> ({a}.v[i] - {b}.v[i]) * "
            f"({a}.v[i] - {b}.v[i]))), (acc, x) -> acc + x) * 1e6 + 0.5) "
            f"AS BIGINT)"
        )

    parts = [
        "WITH kb AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings),",
        "c0 AS MATERIALIZED (SELECT vec_id, v FROM kb "
        "ORDER BY vec_id LIMIT 1),",
        f"d1 AS MATERIALIZED (SELECT b.vec_id, b.v, {dist('b', 'c')} AS dmin "
        "FROM kb b CROSS JOIN c0 c)",
    ]
    for t in range(1, k):
        parts.append(
            f", c{t} AS MATERIALIZED (SELECT vec_id, v, dmin FROM d{t} "
            f"ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
        if t < k - 1:
            parts.append(
                f", d{t + 1} AS MATERIALIZED (SELECT p.vec_id, p.v, "
                f"LEAST(p.dmin, {dist('p', 'c')}) AS dmin "
                f"FROM d{t} p CROSS JOIN c{t} c)"
            )
    sel = ["SELECT 0 AS pick_order, vec_id, CAST(0 AS BIGINT) AS radius_micro FROM c0"]
    for t in range(1, k):
        sel.append(
            f"SELECT {t} AS pick_order, vec_id, "
            f"CAST(dmin AS BIGINT) AS radius_micro FROM c{t}"
        )
    parts.append("\n" + "\nUNION ALL\n".join(sel) + "\nORDER BY pick_order")
    return "\n".join(parts)
