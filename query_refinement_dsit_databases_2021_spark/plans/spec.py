"""Typed query IR.

Mirrors the reference's ``query_dict`` IR #1
(reference:src/client.py:163-175) with fields:
``decision_variables, domains, table, table_column, cp_constraints,
constraint_args, constraint_limits, constraint_targets, cardinality,
refined`` — here as dataclasses instead of parallel lists.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

MAXIMIZATION = "maximization"
MINIMIZATION = "minimization"


@dataclass(frozen=True)
class ConstraintSpec:
    """One WHERE constraint: ``name(args) in [lo, hi] MAX|MIN``.

    ``lo``/``hi`` may be None (unbounded side): an unbounded side
    auto-passes the membership check and contributes zero relaxation
    distance (reference:src/server.py:530-532, 614-626).
    """

    name: str
    args: tuple[int, ...] = ()
    lo: float | None = None
    hi: float | None = None
    target: str = MAXIMIZATION  # 'maximization' | 'minimization'

    @property
    def column(self) -> str:
        """Measure-column name in the candidates DataFrame (unique per
        constraint even when the same UDF repeats with different args)."""
        suffix = "_".join(str(a) for a in self.args)
        return f"m_{self.name}" + (f"_{suffix}" if suffix else "")


@dataclass(frozen=True)
class QuerySpec:
    """A CP window query over one series column.

    Decision variables are fixed to ``(time_id, offset)`` — window
    ``[x, x+lx]`` inclusive both ends (reference:src/client.py:208-211,
    reference:src/server.py:303-304, 332-334).
    """

    table: str
    column: str
    x_domain: tuple[int | None, int | None] = (None, None)
    lx_domain: tuple[int | None, int | None] = (None, None)
    constraints: tuple[ConstraintSpec, ...] = field(default_factory=tuple)
    cardinality: int | None = None
    refined: bool = False

    def with_domains(
        self,
        x_domain: tuple[int, int],
        lx_domain: tuple[int, int],
    ) -> "QuerySpec":
        return replace(self, x_domain=x_domain, lx_domain=lx_domain)

    @property
    def resolved(self) -> bool:
        return all(
            v is not None
            for v in (*self.x_domain, *self.lx_domain)
        )
