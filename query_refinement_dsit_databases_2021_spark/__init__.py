"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CP query-refinement system
(Chuhtra/Query_Refinement_DSIT_Databases_2021).

The core surface is a constraint-programming query over time-series
windows with automatic query refinement (relaxation / tightening),
re-expressed as declarative Spark DataFrame dataflow:

    range x range -> window aggregates -> filter -> top-k refinement

plus a Spark-native breadth layer (standard SQL over the session
catalog) and large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Reference semantics citations use ``reference:src/<file>:<lines>``
meaning the read-only checkout at /root/reference.
"""

from query_refinement_dsit_databases_2021_spark.errors import QueryError
from query_refinement_dsit_databases_2021_spark.plans.spec import ConstraintSpec, QuerySpec
from query_refinement_dsit_databases_2021_spark.plans.parser import parse_query
from query_refinement_dsit_databases_2021_spark.plans.executor import Engine
from query_refinement_dsit_databases_2021_spark.session import get_spark

__all__ = [
    "ConstraintSpec",
    "Engine",
    "QueryError",
    "QuerySpec",
    "get_spark",
    "parse_query",
]
