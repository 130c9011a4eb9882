"""Document-corpus sources: JSONL (the lingua franca of training-data
interchange) and parquet, with schema enforcement.

Training pipelines almost always receive corpora as gzip'd JSONL
shards (one JSON object per line). Spark's native json source splits
uncompressed shards by byte range and parallelizes compressed shards
by file, so ingest bandwidth scales with shard count — the 100 TB
guidance is simply "many shards" (the standard layout anyway).

An explicit schema is REQUIRED here: without one Spark runs a full
inference pass over the data (a second read of 100 TB) and silently
widens types per shard batch. Malformed lines land in
``_corrupt_record`` under PERMISSIVE mode instead of failing the job;
``strict=True`` switches to FAILFAST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    strict: bool = False,
) -> DataFrame:
    """Read a JSONL corpus (optionally gzip'd; glob patterns ok).

    PERMISSIVE by default: malformed lines produce a row whose
    ``_corrupt_record`` column holds the raw line (select it to audit
    bad shards) and whose typed columns are null. ``strict=True`` uses
    FAILFAST — the read throws on the first malformed line.

    Spark refuses queries that reference ONLY ``_corrupt_record`` on a
    raw json scan (SPARK-21610); ``cache()`` the frame (or project a
    data column alongside) before filtering on it — see the test.
    """
    schema_with_corrupt = schema
    if not strict and "_corrupt_record" not in [f.name for f in schema.fields]:
        schema_with_corrupt = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema_with_corrupt)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, compress: bool = True) -> None:
    """Write a corpus as JSONL shards (one file per partition — shard
    count IS the write parallelism and the next reader's read
    parallelism for compressed data)."""
    writer = df.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)
