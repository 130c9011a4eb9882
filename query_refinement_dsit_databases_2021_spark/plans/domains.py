"""Domain resolution: fold ``None`` bounds to data MIN/MAX before planning.

Semantics of reference:src/server.py:124-183 (``fixDecisionDomains``):

- ``time_id`` domain ``None`` sides resolve to ``MIN(time_id)`` /
  ``MAX(time_id)`` of the series table.
- ``offset`` is a non-table variable bound to ``time_id``: default
  lo = 1, default hi = ``max(time_id) - min(time_id) + 1``
  (reference:src/server.py:172-181).

This is plan-time parameter resolution on the driver (SURVEY §4 O3) —
one tiny aggregate, not a Catalyst rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.errors import QueryError
from query_refinement_dsit_databases_2021_spark.plans.spec import QuerySpec


def series_bounds(series: DataFrame) -> tuple[int, int]:
    """MIN/MAX probe (SURVEY §2.1 S7; reference:src/server.py:152-158)."""
    row = series.agg(
        F.min("time_id").alias("lo"), F.max("time_id").alias("hi")
    ).first()
    if row is None or row["lo"] is None:
        raise QueryError("ERROR: series table is empty")
    return int(row["lo"]), int(row["hi"])


def resolve_domains(series: DataFrame, spec: QuerySpec) -> QuerySpec:
    """Return a spec with all four domain bounds concrete."""
    if spec.resolved:
        return spec

    t_min, t_max = series_bounds(series)

    x_lo, x_hi = spec.x_domain
    if x_lo is None:
        x_lo = t_min
    if x_hi is None:
        x_hi = t_max

    lx_lo, lx_hi = spec.lx_domain
    if lx_lo is None:
        lx_lo = 1  # reference:src/server.py:177
    if lx_hi is None:
        lx_hi = t_max - t_min + 1  # reference:src/server.py:178-181

    return spec.with_domains((x_lo, x_hi), (lx_lo, lx_hi))
