"""Refinement scoring: relaxation distance/penalty and ranking.

Faithful column-expression transcriptions of the reference formulas
(SURVEY §2.9, R1-R7):

- ``RD_c(t)`` (reference:src/server.py:614-633): 0 inside ``[a, b]``;
  ``(t−b)/(max_fc−b)`` above; ``(a−t)/(a−min_fc)`` below. An unbounded
  side is treated as ``t`` itself, i.e. it can never be violated.
  ``min_fc``/``max_fc`` are the global min/max of the measure over ALL
  candidates (reference:src/server.py:306-317, 345-349).
- ``RP = α·max_c(w_c·RD_c) + (1−α)·VC`` with hardcoded ``α = 0.5``,
  ``w_c = 1`` (reference:src/server.py:636-664); ``VC`` = fraction of
  violated constraints (reference:src/server.py:544).
- ``RK_c(t)``: target MAX → ``(b−t)/(b−a)``; MIN → ``(a−t)/(b−a)``
  (reference:src/server.py:779-792).
- ``RK = 1 − Σ_c w_c·RK_c`` with ``w_c = 1/|C|``
  (reference:src/server.py:795-816).

Admission guard: the reference's MRP is initialized to 1 and never
relaxed (reference:src/bst_class.py:107), so a failing candidate with
``RP > 1`` can never be returned — reproduced as ``RP <= 1.0``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.errors import QueryError
from query_refinement_dsit_databases_2021_spark.plans.spec import (
    MAXIMIZATION,
    ConstraintSpec,
)

ALPHA = 0.5  # RD-vs-VC preference, hardcoded in reference:src/server.py:662
RELAX_WEIGHT = 1.0  # per-constraint w_c, reference:src/server.py:658
MRP_INIT = 1.0  # admission ceiling, reference:src/bst_class.py:107


def passes(con: ConstraintSpec) -> Column:
    """Interval membership with unbounded sides auto-passing
    (reference:src/server.py:530-537)."""
    t = F.col(con.column)
    cond = F.lit(True)
    if con.lo is not None:
        cond = cond & (t >= F.lit(float(con.lo)))
    if con.hi is not None:
        cond = cond & (t <= F.lit(float(con.hi)))
    return cond


def vc_ratio(constraints: tuple[ConstraintSpec, ...]) -> Column:
    """Violated-constraint ratio across the constraint columns
    (a horizontal per-row aggregate, reference:src/server.py:544)."""
    n = len(constraints)
    passed = sum(passes(c).cast("int") for c in constraints)
    return (F.lit(n) - passed) / F.lit(float(n))


def relaxation_distance(
    con: ConstraintSpec, min_fc: float, max_fc: float
) -> Column:
    t = F.col(con.column)
    zero = F.lit(0.0)
    above = (
        ((t - F.lit(float(con.hi))) / F.lit(max_fc - float(con.hi)))
        if con.hi is not None
        else zero
    )
    below = (
        ((F.lit(float(con.lo)) - t) / F.lit(float(con.lo) - min_fc))
        if con.lo is not None
        else zero
    )
    expr = zero
    if con.hi is not None:
        expr = F.when(t > F.lit(float(con.hi)), above).otherwise(expr)
    if con.lo is not None:
        expr = F.when(t < F.lit(float(con.lo)), below).otherwise(expr)
    return expr


def relaxation_penalty(
    constraints: tuple[ConstraintSpec, ...],
    bounds: dict[str, tuple[float, float]],
) -> Column:
    """RP column; ``bounds`` maps constraint column -> (min_fc, max_fc)."""
    rds = [
        F.lit(RELAX_WEIGHT) * relaxation_distance(c, *bounds[c.column])
        for c in constraints
    ]
    rd = rds[0] if len(rds) == 1 else F.greatest(*rds)
    return F.lit(ALPHA) * rd + F.lit(1.0 - ALPHA) * vc_ratio(constraints)


def rank(constraints: tuple[ConstraintSpec, ...]) -> Column:
    """RK column. Requires bounded constraint intervals — the reference
    crashes (TypeError on None arithmetic) when tightening an unbounded
    constraint; we raise instead."""
    w_c = 1.0 / len(constraints)
    total = F.lit(0.0)
    for con in constraints:
        if con.lo is None or con.hi is None:
            raise QueryError(
                "ERROR: tightening requires bounded constraint intervals"
            )
        a, b, t = float(con.lo), float(con.hi), F.col(con.column)
        if con.target == MAXIMIZATION:
            rk_c = (F.lit(b) - t) / F.lit(b - a)
        else:
            rk_c = (F.lit(a) - t) / F.lit(b - a)
        total = total + F.lit(w_c) * rk_c
    return F.lit(1.0) - total
