"""Parser for the reference's CP query grammar.

Grammar (reference:README.md:62-82):

    SELECT time_id, offset IN_DOMAIN [d, d], [d, d]
    FROM table.column
    WHERE constraint([arguments]) in [d, d] [MAX|MIN]
                [ and ... ]
    [LIMIT [REFINED] n]

``d`` is an integer or ``None``. The reference tokenizes with sqlparse
and digests tokens positionally (reference:src/client.py:149-293); we
hand-roll the equivalent with regexes (pure driver-side Python — query
parsing is not a data-plane operation, SURVEY §2.8 F2/F3).

Validation failures raise :class:`QueryError` where the reference calls
``earlyDeath`` (reference:src/client.py:296-303).
"""

from __future__ import annotations

import re

from query_refinement_dsit_databases_2021_spark.errors import QueryError
from query_refinement_dsit_databases_2021_spark.plans.spec import (
    MAXIMIZATION,
    MINIMIZATION,
    ConstraintSpec,
    QuerySpec,
)

# Measure registry keys; reference:src/client.py:160.
AVAILABLE_FUNCTIONS = ("avg_amp", "max_amp_excess_right", "max_amp_excess_left")

_DOMAIN = r"\[\s*(-?\d+|None)\s*,\s*(-?\d+|None)\s*\]"
# Constraint limits additionally accept decimals — an extension over the
# reference's integer-only template (reference:src/client.py:159); the
# measure values are continuous, so real-valued bounds are the natural
# domain. Decision-variable domains stay integer.
_CON_DOMAIN = r"\[\s*(-?\d+(?:\.\d+)?|None)\s*,\s*(-?\d+(?:\.\d+)?|None)\s*\]"
_SELECT_RE = re.compile(
    r"^\s*SELECT\s+time_id\s*,\s*offset\s+IN_DOMAIN\s*"
    rf"({_DOMAIN})\s*,\s*({_DOMAIN})\s*$",
)
_FROM_RE = re.compile(r"^\s*FROM\s+(\w+)\.(\w+)\s*$")
# one constraint term: name(arg?) in [a, b] MAX|MIN
_CON_RE = re.compile(
    rf"^(\w+)\((-?\d*)\)\s+in\s+({_CON_DOMAIN})\s+(MAX|MIN)$",
)
_LIMIT_RE = re.compile(r"^\s*LIMIT\s+(REFINED\s+)?(\d+)\s*$")


def _bound(tok: str) -> int | None:
    return None if tok == "None" else int(tok)


def _num_bound(tok: str) -> float | int | None:
    if tok == "None":
        return None
    return float(tok) if "." in tok else int(tok)


def _parse_domain(text: str) -> tuple[int | None, int | None]:
    m = re.fullmatch(_DOMAIN, text.strip())
    if not m:
        raise QueryError(f"ERROR at domain literal: {text!r}")
    return _bound(m.group(1)), _bound(m.group(2))


def _parse_con_domain(text: str):
    m = re.fullmatch(_CON_DOMAIN, text.strip())
    if not m:
        raise QueryError(f"ERROR at constraint limits: {text!r}")
    return _num_bound(m.group(1)), _num_bound(m.group(2))


def parse_query(query: str) -> QuerySpec:
    """Parse CP query text into a :class:`QuerySpec`.

    Line-structured like the reference (clauses on their own lines;
    WHERE constraint terms may wrap across lines joined by ``and``).
    """
    if ";" in query:
        # reference:README.md:75 — ';' leads to untested behavior; reject.
        raise QueryError("ERROR: queries must not contain ';'")

    lines = [ln.strip() for ln in query.strip().splitlines() if ln.strip()]
    if len(lines) < 3:
        raise QueryError("ERROR please fix query structure.")

    sel = _SELECT_RE.match(lines[0])
    if not sel:
        raise QueryError("ERROR at SELECT variables / IN_DOMAIN")
    x_domain = _parse_domain(sel.group(1))
    lx_domain = _parse_domain(sel.group(4))

    frm = _FROM_RE.match(lines[1])
    if not frm:
        raise QueryError("ERROR at table and column, only one of each acceptable.")
    table, column = frm.group(1), frm.group(2)

    # WHERE ... [and ...] possibly spanning multiple lines; optional LIMIT last.
    rest = lines[2:]
    cardinality: int | None = None
    refined = False
    if rest and rest[-1].upper().startswith("LIMIT"):
        lim = _LIMIT_RE.match(rest[-1])
        if not lim:
            raise QueryError("Error at LIMIT keyword")
        refined = lim.group(1) is not None
        cardinality = int(lim.group(2))
        rest = rest[:-1]

    if not rest or not rest[0].upper().startswith("WHERE"):
        raise QueryError("ERROR please fix query structure.")
    where_text = " ".join(rest)[len("WHERE"):].strip()

    constraints: list[ConstraintSpec] = []
    for term in re.split(r"\s+and\s+", where_text):
        m = _CON_RE.match(term.strip())
        if not m:
            raise QueryError(f"ERROR at constraint term: {term!r}")
        name, arg, dom, _, _, goal = m.groups()
        # validate against the live measure registry so register_measure
        # extends the grammar too (reference hardcodes the name list at
        # src/client.py:160; the three reference names are always present)
        from query_refinement_dsit_databases_2021_spark.operators.measures import (
            REGISTRY,
        )

        if name not in REGISTRY:
            raise QueryError("ERROR at constraint variable name and arguments")
        args = (int(arg),) if arg else ()
        # arg-arity contract (reference:README.md:77-78)
        if len(args) != REGISTRY[name].n_args:
            raise QueryError(
                f"ERROR: {name} takes exactly {REGISTRY[name].n_args} "
                "integer argument(s)"
            )
        lo, hi = _parse_con_domain(dom)
        target = MAXIMIZATION if goal == "MAX" else MINIMIZATION
        constraints.append(
            ConstraintSpec(name=name, args=args, lo=lo, hi=hi, target=target)
        )

    if not constraints:
        # reference:src/client.py:288-291
        raise QueryError("ERROR please fix query structure.")

    return QuerySpec(
        table=table,
        column=column,
        x_domain=x_domain,
        lx_domain=lx_domain,
        constraints=tuple(constraints),
        cardinality=cardinality,
        refined=refined,
    )
