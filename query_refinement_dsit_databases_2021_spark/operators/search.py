"""Full-text retrieval over the document corpus: inverted-index
postings, integer-exact TF-IDF, and BM25 top-k search.

The reference engine has no text-retrieval operator; this module adds
the lexical-search leg a training-data pipeline needs next to the ANN
family in ``simsearch.py`` (hybrid retrieval = lexical + vector; see
``pipe_ann_filtered_topk`` for the vector half).

Spark-first design — all three stages are shuffle-minimal:

- postings are built ONLY for the query's terms: the exploded token
  stream is filtered by an ``isin`` literal list *before* the
  ``groupBy`` that builds term frequencies, so the inverted index
  materialized per search is O(matching tokens), never O(corpus
  vocabulary). At 100 TB the full-vocabulary index is a separate,
  amortized artifact; a per-query plan must not rebuild it.
- document frequency ``df(t)`` is derived from those same filtered
  postings (a document contains ``t`` iff it has a posting row), so no
  second corpus scan is needed; the per-term ``df`` table is at most
  ``|query terms|`` rows and is broadcast back.
- the query set itself is a literal in-memory DataFrame, broadcast to
  every executor; per-query top-k is one ``row_number`` window
  partitioned by ``query_id`` (k rows per query survive the shuffle
  thanks to the rank filter's partial evaluation under AQE).

Determinism contract (cross-engine hash-exactness vs DuckDB):

- ``tfidf_topk`` is pure int64 arithmetic: ``idf_scaled(t) =
  (N * SCALE) div df(t)`` with integer division, ``score = Σ tf *
  idf_scaled`` — bit-exact in any engine. With ``SCALE = 10^6`` the
  score stays inside int64 for corpora up to ~10^11 documents and
  ~10^3 term frequency; shrink ``SCALE`` beyond that.
- ``bm25_topk`` needs ``ln`` (documented, unavoidable for BM25), so
  scores are rounded to ``ROUND_DIGITS`` decimals and the top-k order
  is taken on the ROUNDED score with ``doc_id`` as the tiebreak —
  last-ulp ``ln``/sum differences between engines cannot reorder the
  result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.operators.textops import tokens

SCALE = 1_000_000  # idf fixed-point scale for tfidf_topk
BM25_K1 = 1.2  # classic Robertson defaults
BM25_B = 0.75
ROUND_DIGITS = 4
TOP_K = 5

# The registered workload's query set: small, literal, broadcastable.
# Terms are drawn from the synthetic corpus vocabulary (TESTDATA.md).
SEARCH_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("spark", "shuffle", "join")),
    (1, ("window", "agg", "scan")),
    (2, ("vector", "hash", "batch")),
    (3, ("customer", "order", "query")),
)


def _query_df(spark: SparkSession) -> DataFrame:
    rows = [
        (qid, term) for qid, terms in SEARCH_QUERIES for term in terms
    ]
    return spark.createDataFrame(rows, "query_id INT, term STRING")


def query_postings(docs: DataFrame, terms: list[str]) -> DataFrame:
    """Term-frequency postings restricted to ``terms``:
    ``(doc_id, term, tf)``.

    The ``isin`` filter sits between the explode and the groupBy, so
    only matching tokens reach the shuffle — the hot path never
    aggregates the full vocabulary.
    """
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def full_postings(docs: DataFrame) -> DataFrame:
    """The standing full-vocabulary inverted index ``(term, doc_id,
    tf)`` — the amortized artifact the module docstring points at.

    Built once per corpus snapshot and written bucketed by ``term``
    (``scale.write_bucketed``), it turns every later term lookup into
    a bucket-pruned scan and every scoring aggregation into an
    exchange-free job: the groupBy(term) partitioning is satisfied by
    the bucket layout (zero-Exchange, asserted in
    ``tests/test_search.py::test_bucketed_postings_zero_exchange``).
    """
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame, spark: SparkSession, k: int = TOP_K
) -> DataFrame:
    """Integer-exact TF-IDF top-k per query:
    ``score = Σ_t tf(t,d) * ((N * SCALE) div df(t))``.

    The integer idf ``(N*SCALE) div df`` is a monotone rational proxy
    for the usual ``log(N/df)`` — same ranking family, bit-exact in
    int64 (real deployments may swap in the log form at the cost of
    float determinism; see :func:`bm25_topk`).

    Returns ``(query_id, doc_id, score, rank)`` with ``rank`` 1..k by
    ``(score desc, doc_id asc)``.
    """
    all_terms = sorted({t for _, ts in SEARCH_QUERIES for t in ts})
    # corpus cardinality as a broadcast 1-row aggregate, NOT a driver
    # .count(): keeps the whole search ONE Spark job (a separate count
    # job re-scans the corpus and roughly doubles wall time)
    n_df = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    post = query_postings(docs, all_terms)
    # df(t) as a count window OVER the postings (r09, guide §2.4): the
    # previous groupBy(term) + broadcast-join formulation referenced
    # ``post`` twice, and since the postings subtree is the corpus
    # tokenize pass, the plan tokenized the corpus TWICE (captured
    # before-plan: 6 parquet scans / 10 Exchanges; after: 4 / 8 with
    # one Generate). The window re-keys only the already-filtered
    # postings (≤ |query terms| · n_docs rows), never the corpus.
    post = post.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    qt = _query_df(spark if spark is not None else docs.sparkSession)
    scored = (
        post.join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(n_df))
        # long arithmetic: n_docs * SCALE overflows int32 from ~2k docs
        .select(
            "query_id",
            "doc_id",
            (
                F.col("tf")
                * F.expr(f"(n_docs * {SCALE}) div df").cast("long")
            ).alias("tfidf"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tfidf").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("int"))
        .orderBy("query_id", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    spark: SparkSession,
    k: int = TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k per query (Lucene's non-negative idf variant):

    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))``
    ``score(d) = Σ_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``

    ``dl`` is the document token count; ``avgdl``/``N`` are broadcast
    1-row corpus aggregates (not driver round-trips — the whole search
    is one Spark job). Scores are rounded to ``ROUND_DIGITS`` and ranked
    on the rounded value (doc_id tiebreak) — see the module determinism
    contract.
    """
    all_terms = sorted({t for _, ts in SEARCH_QUERIES for t in ts})
    # N and avgdl as a broadcast 1-row aggregate (same single-job
    # rationale as tfidf_topk; a driver .collect() would add a second
    # full corpus-scan job)
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(tokens(F.col("text")))).alias("avgdl"),
    )
    dl = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    )
    post = (
        query_postings(docs, all_terms)
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
    )
    df_t = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats.select("n_docs"))).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    qt = _query_df(spark)
    tfn = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        post.join(F.broadcast(qt), "term")
        .join(F.broadcast(idf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("idf") * tfn), ROUND_DIGITS).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("int"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Workload registry entries (DuckDB oracles)
# ---------------------------------------------------------------------------


def _sql_queries() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, ts in SEARCH_QUERIES for t in ts
    )
    return f"(VALUES {rows}) q(query_id, term)"


def _sql_terms() -> str:
    all_terms = sorted({t for _, ts in SEARCH_QUERIES for t in ts})
    return ", ".join(f"'{t}'" for t in all_terms)


def oracle_tfidf_topk(k: int = TOP_K) -> str:
    return f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
post AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM documents, unnest(string_split(text, ' ')) t(term)
  WHERE t.term IN ({_sql_terms()})
  GROUP BY doc_id, t.term),
dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
idf AS (SELECT term, CAST((n.n_docs * {SCALE}) // df AS BIGINT) AS idf_scaled
        FROM dft, n),
scored AS (
  SELECT q.query_id, p.doc_id,
         CAST(sum(p.tf * i.idf_scaled) AS BIGINT) AS score
  FROM post p
  JOIN {_sql_queries()} ON p.term = q.term
  JOIN idf i ON p.term = i.term
  GROUP BY q.query_id, p.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored)
SELECT query_id, doc_id, score, rank
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""


def oracle_bm25_topk(
    k: int = TOP_K, k1: float = BM25_K1, b: float = BM25_B
) -> str:
    return f"""
WITH corpus AS (
  SELECT count(*) AS n_docs,
         avg(len(string_split(text, ' '))) AS avgdl
  FROM documents),
dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       FROM documents),
post AS (
  SELECT d.doc_id, t.term, count(*) AS tf
  FROM documents d, unnest(string_split(text, ' ')) t(term)
  WHERE t.term IN ({_sql_terms()})
  GROUP BY d.doc_id, t.term),
dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
idf AS (SELECT term,
               ln(1.0 + (c.n_docs - df + 0.5) / (df + 0.5)) AS idf
        FROM dft, corpus c),
scored AS (
  SELECT q.query_id, p.doc_id,
         round(sum(i.idf * (p.tf * ({k1} + 1)) /
               (p.tf + {k1} * (1 - {b} + {b} * l.dl / c.avgdl))), {ROUND_DIGITS})
           AS score
  FROM post p
  JOIN {_sql_queries()} ON p.term = q.term
  JOIN idf i ON p.term = i.term
  JOIN dl l ON p.doc_id = l.doc_id
  CROSS JOIN corpus c
  GROUP BY q.query_id, p.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored)
SELECT query_id, doc_id, score, rank
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""


def _wl_tfidf(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import _docs

    return tfidf_topk(_docs(spark, sf_dir), spark)


def _wl_bm25(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import _docs

    return bm25_topk(_docs(spark, sf_dir), spark)


KEYWORDS_PER_DOC = 3


def keyword_extract(
    docs: DataFrame, k: int = KEYWORDS_PER_DOC
) -> DataFrame:
    """Per-document keyword extraction: the k highest ``tf·idf`` terms
    of each document, rendered as an ordered ``|``-joined string — the
    doc-tagging / faceting step of a corpus curation pipeline (and the
    cheap classical baseline any embedding-based tagger is judged
    against).

    Integer contract: same ``(N·SCALE) div df`` idf as
    :func:`tfidf_topk`; per-term scores are int64 products; ties break
    (score desc, term asc); the keyword string is aggregated in rank
    order on both engines (struct-sort + array_join ↔ ``string_agg …
    ORDER BY``) so even the rendering is bit-stable.

    Plan: this is the FULL-vocabulary variant (every term is a
    candidate, unlike the query-pruned search path): one explode →
    groupBy (doc, term), a map-combinable df(term) agg joined back
    broadcast-ish, a per-doc top-k window, and a per-doc string agg —
    two corpus-token-scale shuffles total. At 100 TB the df table is
    the standing vocabulary artifact (build once per snapshot,
    broadcast-join it), exactly the `full_postings` amortization
    note.

    Returns ``(doc_id, keywords, top_score)`` ordered by doc_id.
    """
    n_df = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    post = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_df))
        .select(
            "term",
            F.expr(f"(n_docs * {SCALE}) div df").cast("long").alias("idf_scaled"),
        )
    )
    scored = post.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf_scaled")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    top = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
    return (
        top.groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(rnk, term))), x -> x.term)"),
                "|",
            ).alias("keywords"),
            F.max("score").cast("long").alias("top_score"),
        )
        .orderBy("doc_id")
    )


def oracle_keyword_extract(k: int = KEYWORDS_PER_DOC) -> str:
    return f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
post AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM documents, unnest(string_split(text, ' ')) t(term)
  WHERE len(t.term) > 0
  GROUP BY doc_id, t.term),
idf AS (
  SELECT term, CAST((n.n_docs * {SCALE}) // df AS BIGINT) AS idf_scaled
  FROM (SELECT term, count(*) AS df FROM post GROUP BY term) d, n),
scored AS (
  SELECT p.doc_id, p.term,
         CAST(p.tf * i.idf_scaled AS BIGINT) AS score
  FROM post p JOIN idf i USING (term)),
top AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id,
       string_agg(term, '|' ORDER BY rnk) AS keywords,
       CAST(max(score) AS BIGINT) AS top_score
FROM top WHERE rnk <= {k}
GROUP BY doc_id ORDER BY doc_id"""


def _wl_keywords(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import _docs

    return keyword_extract(_docs(spark, sf_dir))


PRF_FEEDBACK_DOCS = 3  # R: top docs assumed relevant
PRF_EXPANSION_TERMS = 2  # E: expansion terms added per query
PRF_ORIG_WEIGHT = 2  # Rocchio alpha/beta ratio in integer form


def prf_expanded_topk(
    docs: DataFrame,
    spark: SparkSession,
    k: int = TOP_K,
    r: int = PRF_FEEDBACK_DOCS,
    e: int = PRF_EXPANSION_TERMS,
    w_orig: int = PRF_ORIG_WEIGHT,
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio query expansion,
    integer-exact): run the TF-IDF search, assume its top ``r`` docs
    per query are relevant, pick the ``e`` highest ``tf_fb * idf``
    terms from those docs that are NOT already in the query, and
    re-search with the expanded query — original terms weighted
    ``w_orig``, expansion terms 1.

    Everything stays in the module's int64 contract (``(N*SCALE) div
    df`` idf, integer products, ties broken by term/doc_id asc), so
    both passes are bit-reproducible across engines and partitionings.

    Plan: four pruned corpus passes, none vocabulary-scale — (1) the
    base search's term-filtered postings; (2) feedback-doc tokens via
    a broadcast join of the r×|queries|-row feedback set; (3) postings
    for the candidate terms via a broadcast semi-join (candidates are
    data-dependent, so `isin` literals can't prune — the semi-join
    does the same job plan-side); (4) nothing — the final pass REUSES
    (1) ∪ (3) postings (`union().distinct()` dedupes terms that are
    original for one query and expansion for another). At 100 TB each
    pass is the `query_postings` shape: filter-before-shuffle,
    O(matching tokens).

    Returns ``(query_id, doc_id, score, rank)`` with rank 1..k by
    (score desc, doc_id asc).
    """
    all_terms = sorted({t for _, ts in SEARCH_QUERIES for t in ts})
    # r09 plan truncation (guide §3.3 — wide compositions of joins
    # embed each referenced subtree VERBATIM in the plan; this
    # function's captured sf0.1 plan held 70 parquet scans / 318
    # Exchanges because the base-search and feedback subtrees were
    # re-expanded at every reference). Every multiply-referenced
    # intermediate here is BOUNDED-SMALL (1-row count, r×|queries|
    # feedback rows, candidate-vocab counts, e×|queries| expansion
    # terms), so one eager localCheckpoint each collapses the
    # downstream plan to joins against materialized tables without
    # moving meaningful data. Results unchanged — checkpointing only
    # truncates lineage.
    n_df = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).localCheckpoint()
    fb = (
        tfidf_topk(docs, spark, k=r)
        .select("query_id", "doc_id")
        .localCheckpoint()
    )
    # candidate expansion terms: token counts over the feedback docs
    fbtok = (
        docs.join(F.broadcast(fb), "doc_id")
        .select("query_id", F.explode(tokens(F.col("text"))).alias("term"))
    )
    cand = (
        fbtok.groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("tf_fb"))
        .join(_query_df(spark), ["query_id", "term"], "left_anti")
        .localCheckpoint()
    )
    # corpus postings for candidate terms (semi-join replaces isin)
    cand_terms = cand.select("term").distinct()
    post_cand = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .join(F.broadcast(cand_terms), "term", "leftsemi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    idf_cand = (
        post_cand.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_df))
        .select(
            "term",
            F.expr(f"(n_docs * {SCALE}) div df").cast("long").alias("idf_scaled"),
        )
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.desc(F.col("tf_fb") * F.col("idf_scaled")), F.asc("term")
    )
    expq = (
        cand.join(idf_cand, "term")
        .withColumn("trk", F.row_number().over(wt))
        .where(F.col("trk") <= e)
        .select("query_id", "term", F.lit(1).cast("long").alias("w"))
        .localCheckpoint()
    )
    fullq = _query_df(spark).select(
        "query_id", "term", F.lit(w_orig).cast("long").alias("w")
    ).unionByName(expq)
    # final postings: base-term postings ∪ candidate postings restricted
    # to chosen expansion terms; distinct() dedupes shared terms
    post_all = (
        query_postings(docs, all_terms)
        .select("doc_id", "term", "tf")
        .unionByName(
            post_cand.join(
                F.broadcast(expq.select("term").distinct()), "term", "leftsemi"
            ).select("doc_id", "term", "tf")
        )
        .distinct()
        .localCheckpoint()
    )
    idf_all = (
        post_all.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_df))
        .select(
            "term",
            F.expr(f"(n_docs * {SCALE}) div df").cast("long").alias("idf_scaled"),
        )
    )
    scored = (
        post_all.join(F.broadcast(fullq), "term")
        .join(F.broadcast(idf_all), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("w") * F.col("tf") * F.col("idf_scaled")).alias("score")
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("int"))
        .orderBy("query_id", "rank")
    )


def oracle_prf_topk(
    k: int = TOP_K,
    r: int = PRF_FEEDBACK_DOCS,
    e: int = PRF_EXPANSION_TERMS,
    w_orig: int = PRF_ORIG_WEIGHT,
) -> str:
    return f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
post0 AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM documents, unnest(string_split(text, ' ')) t(term)
  WHERE t.term IN ({_sql_terms()})
  GROUP BY doc_id, t.term),
dft0 AS (SELECT term, count(*) AS df FROM post0 GROUP BY term),
idf0 AS (SELECT term, CAST((n.n_docs * {SCALE}) // df AS BIGINT) AS idf_scaled
         FROM dft0, n),
scored0 AS (
  SELECT q.query_id, p.doc_id,
         CAST(sum(p.tf * i.idf_scaled) AS BIGINT) AS score
  FROM post0 p
  JOIN {_sql_queries()} ON p.term = q.term
  JOIN idf0 i ON p.term = i.term
  GROUP BY q.query_id, p.doc_id),
fb AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS rnk
    FROM scored0)
  WHERE rnk <= {r}),
fbtok AS (
  SELECT f.query_id, t.term
  FROM fb f JOIN documents d ON d.doc_id = f.doc_id,
       unnest(string_split(d.text, ' ')) t(term)),
cand AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS tf_fb
  FROM fbtok c GROUP BY query_id, term),
cand2 AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM {_sql_queries()}
                    WHERE q.query_id = c.query_id AND q.term = c.term)),
postc AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM documents, unnest(string_split(text, ' ')) t(term)
  WHERE t.term IN (SELECT DISTINCT term FROM cand2)
  GROUP BY doc_id, t.term),
dftc AS (SELECT term, count(*) AS df FROM postc GROUP BY term),
idfc AS (SELECT term, CAST((n.n_docs * {SCALE}) // df AS BIGINT) AS idf_scaled
         FROM dftc, n),
expq AS (
  SELECT query_id, term, CAST(1 AS BIGINT) AS w FROM (
    SELECT c.query_id, c.term,
           row_number() OVER (PARTITION BY c.query_id
                ORDER BY c.tf_fb * i.idf_scaled DESC, c.term) AS trk
    FROM cand2 c JOIN idfc i ON i.term = c.term)
  WHERE trk <= {e}),
fullq AS (
  SELECT query_id, term, CAST({w_orig} AS BIGINT) AS w FROM {_sql_queries()}
  UNION ALL SELECT query_id, term, w FROM expq),
postu AS (
  SELECT doc_id, term, tf FROM post0
  UNION
  SELECT doc_id, term, tf FROM postc
  WHERE term IN (SELECT DISTINCT term FROM expq)),
dftu AS (SELECT term, count(*) AS df FROM postu GROUP BY term),
idfu AS (SELECT term, CAST((n.n_docs * {SCALE}) // df AS BIGINT) AS idf_scaled
         FROM dftu, n),
scoredf AS (
  SELECT fq.query_id, p.doc_id,
         CAST(sum(fq.w * p.tf * i.idf_scaled) AS BIGINT) AS score
  FROM postu p
  JOIN fullq fq ON fq.term = p.term
  JOIN idfu i ON i.term = p.term
  GROUP BY fq.query_id, p.doc_id)
SELECT query_id, doc_id, score, rank FROM (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scoredf)
WHERE rank <= {k} ORDER BY query_id, rank"""


def _wl_prf(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import _docs

    return prf_expanded_topk(_docs(spark, sf_dir), spark)


RRF_K0 = 60


def rrf_fuse(
    a: DataFrame, b: DataFrame, k: int = TOP_K, k0: int = RRF_K0
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack, Clarke &
    Buettcher 2009) — the standard hybrid-retrieval merge (lexical
    BM25 + dense ANN in a RAG stack): per (query, doc),
    ``rrf = Σ_lists 1/(k0 + rank)``, absent-from-a-list contributes 0.
    Rank-only fusion needs no score calibration between systems, which
    is why it wins in practice. Integer contract: each contribution is
    ``1e6 DIV (k0 + rank)`` so the fused score and the (score desc,
    doc_id asc) ranking are engine-exact.

    Inputs are (query_id, doc_id, rank) frames (extra columns
    ignored); result-list-sized, so the full-outer merge join is
    metadata-scale no matter the corpus. Returns ``(query_id, doc_id,
    rrf_ppm, rank)`` — top-k fused."""
    fa = a.select("query_id", "doc_id", F.col("rank").cast("long").alias("_ra"))
    fb = b.select("query_id", "doc_id", F.col("rank").cast("long").alias("_rb"))
    fused = (
        fa.join(fb, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(F.expr(f"1000000 div ({k0} + _ra)"), F.lit(0))
                + F.coalesce(F.expr(f"1000000 div ({k0} + _rb)"), F.lit(0))
            ).alias("rrf_ppm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_ppm"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "rrf_ppm", F.col("rank").cast("long").alias("rank")
        )
        .orderBy("query_id", "rank")
    )


def _wl_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical list fused with the dense
    brute-cosine list over the same corpus (doc_id ≡ vec_id), queries
    restricted to the shared id space."""
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import _docs
    from query_refinement_dsit_databases_2021_spark.operators.simsearch import (
        cosine_topk,
    )
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    n_q = len(SEARCH_QUERIES)
    lex = bm25_topk(_docs(spark, sf_dir), spark)
    dense = (
        cosine_topk(spark.table("embeddings"))
        .where(F.col("q_id") < n_q)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            "rank",
        )
    )
    return rrf_fuse(lex, dense)


RAG_TOP_K = 3
RAG_BUDGET_CHARS = 400


def assemble_contexts(
    ranked: DataFrame,
    docs: DataFrame,
    k: int = RAG_TOP_K,
    budget_chars: int = RAG_BUDGET_CHARS,
) -> DataFrame:
    """RAG context assembly — the step after retrieval/fusion: per
    query, join the top-``k`` ranked documents back to their text,
    concatenate in rank order, and truncate to the context budget.
    Closes the retrieve → fuse → assemble loop (the prompt-side half
    of a RAG stack) as one dataflow.

    Deterministic: rank is unique per (query, doc) so the
    ``array_sort(struct(rank, text))`` rank-order concat is total;
    truncation is character-based on both engines. The join ships the
    top-k result list against the corpus by doc_id — result-list-sized
    rows carry text, the corpus is never shuffled.

    Returns ``(query_id, n_docs, context, context_chars)``.
    """
    top = ranked.where(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").cast("long").alias("rank")
    )
    j = top.join(docs.select("doc_id", "text"), "doc_id")
    ctx = F.substring(
        F.concat_ws(
            " | ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "text"))),
                lambda s: s["text"],
            ),
        ),
        1,
        budget_chars,
    )
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            ctx.alias("context"),
        )
        .select(
            "query_id",
            "n_docs",
            "context",
            F.length("context").cast("long").alias("context_chars"),
        )
    )


def _wl_rag_contexts(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import _docs

    return assemble_contexts(_wl_rrf(spark, sf_dir), _docs(spark, sf_dir)).orderBy(
        "query_id"
    )


def oracle_rag_contexts(
    k: int = RAG_TOP_K, budget_chars: int = RAG_BUDGET_CHARS
) -> str:
    return f"""
WITH fused AS ({oracle_rrf()}),
top AS (SELECT query_id, doc_id, rank FROM fused WHERE rank <= {k}),
j AS (SELECT t.query_id, t.rank, d.text
      FROM top t JOIN documents d USING (doc_id))
SELECT query_id, CAST(count(*) AS BIGINT) AS n_docs,
       left(string_agg(text, ' | ' ORDER BY rank), {budget_chars})
         AS context,
       CAST(length(left(string_agg(text, ' | ' ORDER BY rank),
                        {budget_chars})) AS BIGINT) AS context_chars
FROM j GROUP BY query_id ORDER BY query_id"""


def oracle_rrf(k: int = TOP_K, k0: int = RRF_K0) -> str:
    from query_refinement_dsit_databases_2021_spark.operators.simsearch import (
        oracle_cosine_topk,
    )

    n_q = len(SEARCH_QUERIES)
    return f"""
WITH lex AS ({oracle_bm25_topk()}),
dense AS (
  SELECT q_id AS query_id, vec_id AS doc_id, rank
  FROM ({oracle_cosine_topk()}) WHERE q_id < {n_q}),
fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         coalesce(1000000 // ({k0} + l.rank), 0)
           + coalesce(1000000 // ({k0} + d.rank), 0) AS rrf_ppm
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
SELECT query_id, doc_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm, rank FROM (
  SELECT query_id, doc_id, rrf_ppm,
         row_number() OVER (PARTITION BY query_id
             ORDER BY rrf_ppm DESC, doc_id)::BIGINT AS rank
  FROM fused)
WHERE rank <= {k} ORDER BY query_id, rank"""


def search_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload("pipe_search_tfidf", _wl_tfidf, oracle_tfidf_topk(), True),
        Workload("pipe_search_bm25", _wl_bm25, oracle_bm25_topk(), False),
        Workload(
            "pipe_search_phrase", _wl_phrase, oracle_phrase_search(), False
        ),
        Workload("pipe_search_prf", _wl_prf, oracle_prf_topk(), False),
        Workload(
            "pipe_doc_keywords", _wl_keywords, oracle_keyword_extract(), False
        ),
        Workload("pipe_search_rrf", _wl_rrf, oracle_rrf(), False),
        Workload("pipe_rag_contexts", _wl_rag_contexts, oracle_rag_contexts(), False),
    ]


SEARCH_PHRASE: tuple[str, ...] = ("table", "value")


def phrase_search(docs: DataFrame, phrase: tuple[str, ...]) -> DataFrame:
    """Exact phrase search through POSITIONAL postings: per document,
    how many times the token sequence ``phrase`` occurs.

    Architecture (the part that matters at 100 TB): tokens are
    position-stamped with ``posexplode`` and filtered to the phrase's
    terms before anything shuffles; each adjacency constraint
    ``pos(term_i) = pos(term_0) + i`` is an EQUI-join — the i-th
    posting stream is keyed on ``(doc_id, pos - i)`` so every hop is
    hash-partitionable (no theta-join, no NLJ). A K-word phrase is
    K-1 such joins over streams already reduced to single-term
    postings. The DuckDB oracle intentionally uses the other
    algorithm (direct sliding-window scan), making the differential
    an algebraic cross-check rather than a transliteration.

    Returns ``(doc_id, n_occurrences)``, ordered by ``doc_id``.
    """
    if len(phrase) < 2:
        raise ValueError("phrase must have at least two tokens")
    pos = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "term"),
    ).where(F.col("term").isin(list(set(phrase))))
    out = None
    for i, term in enumerate(phrase):
        leg = pos.where(F.col("term") == term).select(
            "doc_id", (F.col("pos") - i).alias("anchor")
        )
        out = leg if out is None else out.join(leg, ["doc_id", "anchor"])
    return (
        out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy("doc_id")
    )


def oracle_phrase_search(phrase: tuple[str, ...] = SEARCH_PHRASE) -> str:
    conds = " AND ".join(
        f"ws[i + {i}] = '{t}'" for i, t in enumerate(phrase)
    )
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
FROM tok, unnest(range(1, greatest(len(ws) - {len(phrase) - 2}, 1))) u(i)
WHERE {conds}
GROUP BY doc_id
ORDER BY doc_id"""


def _wl_phrase(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.operators.pipelines import _docs

    return phrase_search(_docs(spark, sf_dir), SEARCH_PHRASE)
