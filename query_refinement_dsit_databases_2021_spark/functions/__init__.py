"""Reusable column-function helpers (scalar functions, SURVEY §2.8).

The implementations live next to the operator families that own them;
this package re-exports the shared, engine-wide column builders so
users (and the CLI) have one import point for the scalar surface:

- text: ``tokens``, ``shingles``, ``shingle_hashes``, ``rolling_hash``
  and the LCG hash-family constants (``lcg_a``/``lcg_b``)
- deterministic bucketing: ``bucket_of`` (salted-hash buckets backing
  splits/sampling)
"""

from query_refinement_dsit_databases_2021_spark.operators.sampling import (
    bucket_of,
)
from query_refinement_dsit_databases_2021_spark.operators.textops import (
    lcg_a,
    lcg_b,
    rolling_hash,
    shingle_hashes,
    shingles,
    tokens,
)

__all__ = [
    "bucket_of",
    "lcg_a",
    "lcg_b",
    "rolling_hash",
    "shingle_hashes",
    "shingles",
    "tokens",
]
