"""Parser tests: the reference grammar (reference:README.md:62-82) and
its earlyDeath validation paths (reference:src/client.py:203-292)."""

import pytest

from query_refinement_dsit_databases_2021_spark.errors import QueryError
from query_refinement_dsit_databases_2021_spark.plans.parser import parse_query

DEFAULT_QUERY = """\
SELECT time_id, offset IN_DOMAIN [300, 500], [10, 50]
FROM emg_data.emg1
WHERE avg_amp() in [1, 2] MAX
LIMIT REFINED 5
"""

SCALABILITY_QUERY = """\
SELECT time_id, offset IN_DOMAIN [1, 10], [5, 10]
FROM gas_data.flow_rate
WHERE avg_amp() in [50, 200] MAX and max_amp_excess_left(4) in [-2, 0] MAX and max_amp_excess_right(4) in [-2, 0] MAX
LIMIT REFINED 50
"""


def test_default_committed_query():
    # reference:src/query.txt:1-4
    spec = parse_query(DEFAULT_QUERY)
    assert spec.table == "emg_data" and spec.column == "emg1"
    assert spec.x_domain == (300, 500) and spec.lx_domain == (10, 50)
    assert len(spec.constraints) == 1
    con = spec.constraints[0]
    assert con.name == "avg_amp" and con.args == ()
    assert (con.lo, con.hi) == (1, 2) and con.target == "maximization"
    assert spec.cardinality == 5 and spec.refined is True


def test_scalability_query():
    # reference:src/scalability_experiment_scipt.py:12-19
    spec = parse_query(SCALABILITY_QUERY)
    assert [c.name for c in spec.constraints] == [
        "avg_amp",
        "max_amp_excess_left",
        "max_amp_excess_right",
    ]
    assert spec.constraints[1].args == (4,)
    assert spec.cardinality == 50 and spec.refined


def test_none_domains_and_unrefined_limit():
    spec = parse_query(
        "SELECT time_id, offset IN_DOMAIN [None, None], [None, 7]\n"
        "FROM t.c\n"
        "WHERE avg_amp() in [None, 3] MIN\n"
        "LIMIT 9\n"
    )
    assert spec.x_domain == (None, None) and spec.lx_domain == (None, 7)
    assert spec.constraints[0].lo is None and spec.constraints[0].hi == 3
    assert spec.constraints[0].target == "minimization"
    assert spec.cardinality == 9 and spec.refined is False


def test_no_limit_means_full_set():
    spec = parse_query(
        "SELECT time_id, offset IN_DOMAIN [1, 5], [1, 2]\nFROM t.c\n"
        "WHERE avg_amp() in [0, 1] MAX\n"
    )
    assert spec.cardinality is None and spec.refined is False


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT foo, bar IN_DOMAIN [1, 2], [1, 2]\nFROM t.c\nWHERE avg_amp() in [0, 1] MAX",
        "SELECT time_id, offset IN_DOMAIN [1, 2], [1, 2]\nFROM justtable\nWHERE avg_amp() in [0, 1] MAX",
        "SELECT time_id, offset IN_DOMAIN [1, 2], [1, 2]\nFROM t.c\nWHERE nosuch() in [0, 1] MAX",
        "SELECT time_id, offset IN_DOMAIN [1, 2], [1, 2]\nFROM t.c\nWHERE avg_amp() in [0, 1]",
        "SELECT time_id, offset IN_DOMAIN [1, 2], [1, 2]\nFROM t.c\nWHERE max_amp_excess_left() in [0, 1] MAX",
        "SELECT time_id, offset IN_DOMAIN [1, 2], [1, 2]\nFROM t.c\nWHERE avg_amp(3) in [0, 1] MAX",
        "SELECT time_id, offset IN_DOMAIN [1, 2], [1, 2]\nFROM t.c\nWHERE avg_amp() in [0, 1] MAX;",
        "SELECT time_id, offset IN_DOMAIN [1, 2], [1, 2]\nFROM t.c",
    ],
)
def test_early_death_paths(bad):
    with pytest.raises(QueryError):
        parse_query(bad)
