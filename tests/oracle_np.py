"""Brute-force NumPy oracle for the CP query semantics (SURVEY §5.2).

Transliterates the *declarative* contract of the reference
(reference:src/server.py:291-351 build_UDF_map; :530-544 check+VC;
:614-664 RD/RP; :779-836 RK/top-k) for differential testing against
the Spark engine. Deliberately naive O(candidates × window)."""

from __future__ import annotations

import math

import numpy as np


def measures_for(y_by_t: dict[int, float], t_start: int, t_end: int, x: int, lx: int, con):
    name, args = con.name, con.args
    win = [y_by_t[t] for t in range(x, x + lx + 1)]
    if name == "avg_amp":
        return float(np.mean(win))
    if name == "max_amp_excess_right":
        w = args[0]
        xp = x + lx
        lxp = min(w, t_end - xp)
        nbr = [y_by_t[t] for t in range(xp, xp + lxp + 1)]
        return float(max(win) - max(nbr))
    if name == "max_amp_excess_left":
        w = args[0]
        wp = min(w, x - t_start)
        nbr = [y_by_t[t] for t in range(x - wp, x + 1)]
        return float(max(win) - max(nbr))
    # extension measures (operators/measures.py SumAmp/MinAmp/RangeAmp)
    if name == "sum_amp":
        return float(np.sum(win))
    if name == "min_amp":
        return float(min(win))
    if name == "range_amp":
        return float(max(win) - min(win))
    if name == "median_amp":
        return float(np.median(win))
    raise KeyError(name)


def brute_candidates(series, spec):
    """series: list[(time_id, y)]; returns dict[(x, lx)] -> {col: value}."""
    y_by_t = {t: y for t, y in series}
    t_start, t_end = min(y_by_t), max(y_by_t)
    x0, x1 = spec.x_domain
    l0, l1 = spec.lx_domain
    out = {}
    for x in range(max(x0, t_start), x1 + 1):
        for lx in range(l0, l1 + 1):
            if x + lx > t_end:
                continue
            # round 9 mirrors the engine's measure stabilization
            # (operators/candidates.py:build_candidates): a measure
            # landing exactly on a constraint bound must not be
            # classified by summation-order float noise
            out[(x, lx)] = {
                con.column: round(
                    measures_for(y_by_t, t_start, t_end, x, lx, con), 9
                )
                for con in spec.constraints
            }
    return out


def _passes(con, t):
    lo = con.lo if con.lo is not None else t
    hi = con.hi if con.hi is not None else t
    return lo <= t <= hi


def brute_execute(series, spec):
    """Returns (sorted list of (x, lx), action) under set-based
    semantics with (score, x, lx) tie-breaking."""
    cands = brute_candidates(series, spec)
    cons = spec.constraints
    passing = {
        key: vals
        for key, vals in cands.items()
        if all(_passes(c, vals[c.column]) for c in cons)
    }
    failing = {k: v for k, v in cands.items() if k not in passing}
    k = spec.cardinality

    if not spec.refined:
        if k is None:
            return sorted(passing), "all"
        return sorted(passing)[:k], "limit"  # arbitrary-subset contract

    n = len(passing)
    if n == k:
        return sorted(passing), "exact"
    if n > k:
        # tighten: top-k by RK desc, ties (x, lx) asc
        def rk(key):
            w_c = 1.0 / len(cons)
            s = 0.0
            for c in cons:
                t = passing[key][c.column]
                a, b = float(c.lo), float(c.hi)
                rk_c = (b - t) / (b - a) if c.target == "maximization" else (a - t) / (b - a)
                s += w_c * rk_c
            return 1.0 - s

        ranked = sorted(passing, key=lambda key: (-round(rk(key), 9), key))
        return sorted(ranked[:k]), "tighten"

    # relax: global per-measure min/max over ALL candidates
    mins = {c.column: min(v[c.column] for v in cands.values()) for c in cons}
    maxs = {c.column: max(v[c.column] for v in cands.values()) for c in cons}

    def rp(key):
        vals = failing[key]
        rd = -math.inf
        viol = 0
        for c in cons:
            t = vals[c.column]
            a = c.lo if c.lo is not None else t
            b = c.hi if c.hi is not None else t
            if a <= t <= b:
                rd_c = 0.0
            elif t > b:
                rd_c = (t - b) / (maxs[c.column] - b)
            else:
                rd_c = (a - t) / (a - mins[c.column])
            rd = max(rd, 1.0 * rd_c)
            if not _passes(c, t):
                viol += 1
        vc = viol / len(cons)
        return 0.5 * rd + 0.5 * vc

    admissible = [key for key in failing if rp(key) <= 1.0]
    chosen = sorted(admissible, key=lambda key: (round(rp(key), 9), key))[: k - n]
    return sorted(list(passing) + chosen), "relax"
