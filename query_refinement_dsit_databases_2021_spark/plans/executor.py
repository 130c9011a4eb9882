"""Query execution: the refinement dispatcher as declarative dataflow.

Lifecycle (SURVEY §3.4):

    parse -> resolve domains -> segment scan -> candidates (distributed
    UDF map) -> pass/fail split -> count -> [limit | tighten | relax]
    -> union -> result

The reference's BST/backtracking machinery (reference:src/bst_class.py,
reference:src/server.py:364-493) is execution strategy, not semantics —
replaced here by set-based evaluation: the per-row filter IS the
existential check, ``orderBy().limit()`` (TakeOrderedAndProject) IS the
threshold-maintaining top-k (SURVEY §4 O6-O9).

Refinement dispatch (reference:src/server.py:60-103, 413-429):

- not refined, cardinality k  -> any k passing rows (arbitrary-subset
  contract; reference branch order is random, bst_class.py:147)
- refined, n == k             -> passing rows as-is
- refined, n > k  (tighten)   -> top-k passing by RK desc
- refined, n < k  (relax)     -> passing ∪ (k−n best failing by RP asc,
                                 admission RP <= 1.0)

Determinism divergence (documented, SURVEY §7.5): refined paths break
score ties on (x, lx); the reference's tie order falls to Python sort
stability over a random exploration order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.errors import (
    DataVariabilityError,
    QueryError,
)
from query_refinement_dsit_databases_2021_spark.operators import scoring
from query_refinement_dsit_databases_2021_spark.operators.candidates import (
    build_candidates,
)
from query_refinement_dsit_databases_2021_spark.plans.domains import resolve_domains
from query_refinement_dsit_databases_2021_spark.plans.parser import parse_query
from query_refinement_dsit_databases_2021_spark.plans.spec import QuerySpec

VARIABILITY_EPS = 5e-28  # reference:src/server.py:211


@dataclass
class ExecutionInfo:
    """Side-channel stats of the last execute() call (plan-time scalars
    only — never data rows)."""

    spec: QuerySpec | None = None
    strategy: str | None = None
    n_passing: int | None = None
    action: str | None = None  # 'all' | 'limit' | 'exact' | 'tighten' | 'relax'
    udf_size: int | None = None  # candidate-count scale variable, server.py:37


class Engine:
    """Programmatic surface mirroring ``server.execute_query``
    (reference:src/server.py:14-103): ``Engine.execute(query) ->
    DataFrame[time_id, offset]``.

    Series tables are plain DataFrames registered by name (the analogue
    of Postgres tables; SURVEY §1.1): ``engine.register_series("emg_data",
    df)`` where ``df`` has a dense ``time_id`` column plus value columns.
    """

    def __init__(
        self,
        spark: SparkSession,
        strategy: str = "auto",
        partition_rows: int | None = None,
        cache_dir: str | None = None,
        cache_auto_seconds: float | None = None,
    ):
        self.spark = spark
        self.strategy = strategy
        self.partition_rows = partition_rows
        # K2 cache: the reference pickles its UDF map when the build
        # exceeds 300 s and reloads it on demand
        # (reference:src/server.py:249-286, threshold at :264). Here the
        # distributed UDF map (the candidates DataFrame) is written to
        # parquet keyed by a fingerprint of (table, column, domains,
        # measure set) — the exact inputs that determine its content.
        # Two modes, both requiring cache_dir:
        #   cache_auto_seconds=None  -> cache every build (opt-in eager)
        #   cache_auto_seconds=T     -> reference parity: build in
        #       memory, persist to parquet only when the measured build
        #       took longer than T seconds (the reference's 300 s
        #       trigger); cheap builds stay cache-free.
        self.cache_dir = cache_dir
        self.cache_auto_seconds = cache_auto_seconds
        self._tables: dict[str, DataFrame] = {}
        self.last_info = ExecutionInfo()

    def _cache_key(self, spec: QuerySpec) -> str:
        import hashlib

        measures = sorted(
            {(c.name, c.args) for c in spec.constraints}
        )  # bounds/targets don't change candidate values — only measures do
        # "v2": measure values are 9-dp-stabilized since
        # candidates.py:build_candidates grew that projection — caches
        # written before it hold raw floats and must not be reused
        raw = repr(
            ("v2", spec.table, spec.column, spec.x_domain, spec.lx_domain, measures)
        )
        return hashlib.sha256(raw.encode()).hexdigest()[:24]

    # -- catalog (SURVEY §2.1 S6) --------------------------------------
    def register_series(self, name: str, df: DataFrame) -> None:
        if "time_id" not in df.columns:
            raise QueryError(f"series table {name!r} lacks a time_id column")
        self._tables[name] = df

    def register_parquet(self, name: str, path: str) -> None:
        self.register_series(name, self.spark.read.parquet(path))

    def register_jdbc(
        self, name: str, url: str, table: str, **options
    ) -> None:
        """Source parity with the reference's Postgres storage
        (reference:src/client.py:68-88): register a series table read
        through Spark's JDBC source (optionally range-partitioned on
        time_id — see sources.series.read_jdbc)."""
        from query_refinement_dsit_databases_2021_spark.sources import series

        self.register_series(name, series.read_jdbc(self.spark, url, table, **options))

    def list_tables(self) -> dict[str, list[str]]:
        """Catalog readout (information_schema analogue,
        reference:src/client.py:124-146)."""
        return {name: df.columns for name, df in self._tables.items()}

    # -- execution ------------------------------------------------------
    def execute(
        self,
        query: str | QuerySpec,
        include_scores: bool = False,
    ) -> DataFrame:
        spec = parse_query(query) if isinstance(query, str) else query
        if spec.table not in self._tables:
            raise QueryError(f"ERROR: unknown table {spec.table!r}")
        table = self._tables[spec.table]
        if spec.column not in table.columns:
            raise QueryError(f"ERROR: unknown column {spec.column!r}")

        # P1 projection + rename (reference:src/server.py:199)
        series = table.select(
            F.col("time_id").cast("long").alias("time_id"),
            F.col(spec.column).cast("double").alias("y"),
        )
        spec = resolve_domains(series, spec)
        x0, x1 = spec.x_domain
        l0, l1 = spec.lx_domain

        # S5 range scan: the only bulk data read; Parquet pushdown
        # handles the rest (reference:src/server.py:190-206).
        segment = series.where(F.col("time_id").between(x0, x1 + l1))

        stats = segment.agg(
            F.min("time_id").alias("lo"),
            F.max("time_id").alias("hi"),
            F.count("*").alias("n"),
            F.var_pop("y").alias("v"),
        ).first()
        if stats["n"] == 0:
            raise QueryError("ERROR: no data in the requested time domain")
        t_start, t_end = int(stats["lo"]), int(stats["hi"])
        if stats["n"] != t_end - t_start + 1:
            raise QueryError(
                "ERROR: series segment has time_id gaps; window semantics "
                "require a dense axis (FIXTURES.md)"
            )
        # P5 variability guard (reference:src/server.py:209-214)
        if stats["v"] is not None and stats["v"] <= VARIABILITY_EPS:
            raise DataVariabilityError(
                "Chosen segment presents no variability. "
                "Please select a different segment."
            )

        from query_refinement_dsit_databases_2021_spark.operators.candidates import (
            pick_strategy,
        )

        strategy = self.strategy if self.strategy != "auto" else pick_strategy(spec)
        if self.cache_dir is not None:
            import os

            path = os.path.join(
                self.cache_dir, f"udfmap_{self._cache_key(spec)}.parquet"
            )
            if os.path.exists(path):
                candidates = self.spark.read.parquet(path).persist()
            elif self.cache_auto_seconds is None:
                build_candidates(
                    segment, spec, t_start, t_end, strategy, self.partition_rows
                ).write.mode("overwrite").parquet(path)
                candidates = self.spark.read.parquet(path).persist()
            else:
                # reference parity (src/server.py:264): time the build
                # and self-cache only when it was expensive enough that
                # a reload beats a rebuild
                import time as _time

                t0 = _time.time()
                candidates = build_candidates(
                    segment, spec, t_start, t_end, strategy, self.partition_rows
                ).persist()
                candidates.count()  # materialize so the timer sees the build
                if _time.time() - t0 > self.cache_auto_seconds:
                    candidates.write.mode("overwrite").parquet(path)
        else:
            candidates = build_candidates(
                segment, spec, t_start, t_end, strategy, self.partition_rows
            )
            # O4: persist only when the dispatch actually re-reads the
            # frame (refined: pass/fail split + count + scoring +
            # min/max). The unrefined path consumes candidates exactly
            # once, so caching it is pure write overhead (guide §5:
            # cache only what is reused).
            if spec.refined:
                candidates = candidates.persist()

        info = ExecutionInfo(
            spec=spec,
            strategy=strategy,
            udf_size=(x1 - x0 + 1) * (l1 - l0 + 1),
        )
        try:
            result = self._dispatch(spec, candidates, info, include_scores)
        finally:
            self.last_info = info
        return result

    def _dispatch(
        self,
        spec: QuerySpec,
        candidates: DataFrame,
        info: ExecutionInfo,
        include_scores: bool,
    ) -> DataFrame:
        cons = spec.constraints
        all_pass = F.lit(True)
        for c in cons:
            all_pass = all_pass & scoring.passes(c)
        passing = candidates.where(all_pass)
        k = spec.cardinality

        score_cols: list[str] = []

        if not spec.refined:
            info.action = "all" if k is None else "limit"
            out = passing if k is None else passing.limit(k)
        else:
            n = passing.count()
            info.n_passing = n
            if k is None:
                raise QueryError("ERROR: REFINED requires a cardinality")
            if n == k:
                info.action = "exact"
                out = passing
            elif n > k:
                # C3 tightening: top-k by RK desc (reference:src/server.py:413-429)
                info.action = "tighten"
                # Order on the score rounded to 9 decimals so the (x, lx)
                # tie-break — not last-bit float summation noise — decides
                # near-equal candidates; keeps results stable across
                # physical strategies, partitionings, and external oracles.
                out = (
                    passing.withColumn("rk", scoring.rank(cons))
                    .orderBy(F.round(F.col("rk"), 9).desc(), "x", "lx")
                    .limit(k)
                )
                score_cols = ["rk"]
            else:
                # C2 relaxation: best k-n failing by RP asc, RP <= 1
                # (reference:src/server.py:691-772)
                info.action = "relax"
                bounds = self._measure_bounds(candidates, cons)
                failing = candidates.where(~all_pass)
                relaxed = (
                    failing.withColumn(
                        "rp", scoring.relaxation_penalty(cons, bounds)
                    )
                    .where(F.col("rp") <= F.lit(scoring.MRP_INIT))
                    .orderBy(F.round(F.col("rp"), 9).asc(), "x", "lx")
                    .limit(k - n)
                )
                passing = passing.withColumn("rp", F.lit(0.0))
                out = passing.unionByName(relaxed)  # U1, disjoint by construction
                score_cols = ["rp"]

        keep = ["x", "lx"] + (score_cols if include_scores else [])
        out = out.select(*keep)
        renames = {"x": "time_id", "lx": "offset"}
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return out

    @staticmethod
    def _measure_bounds(
        candidates: DataFrame, cons: Iterable
    ) -> dict[str, tuple[float, float]]:
        """A4 global per-measure min/max over ALL candidates — the RD
        normalizers (reference:src/server.py:306-317, 345-349). A tiny
        aggregate collected to the driver (scalars, not data)."""
        aggs = []
        names = []
        for c in cons:
            if c.column in names:
                continue
            names.append(c.column)
            aggs.append(F.min(c.column).alias(f"min_{c.column}"))
            aggs.append(F.max(c.column).alias(f"max_{c.column}"))
        row = candidates.agg(*aggs).first()
        return {
            n: (float(row[f"min_{n}"]), float(row[f"max_{n}"])) for n in names
        }
