"""Series-table ingest: the Spark analogues of the reference's
db_preparation pipeline (SURVEY §2.1 S1-S4).

The reference unzips Kaggle CSVs, repairs headers, concatenates files
deriving a ``Date`` column from the filename, bulk-loads into Postgres
and lets a BIGSERIAL assign a dense 1..N ``time_id``
(reference:src/db_preparation.py:46-93, 113-180). Here the same steps
are declarative reads plus a dense surrogate key.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    skip_rows: int = 0,
) -> DataFrame:
    """CSV ingest with optional junk-header skipping (S1/S2; the
    reference drops 3 junk lines from the EMG csv,
    reference:src/db_preparation.py:170-180)."""
    reader = spark.read.option("header", header).option("mode", "DROPMALFORMED")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if skip_rows:
        # emulate skipping leading junk rows: monotonically numbered read
        w = Window.orderBy(F.monotonically_increasing_id())
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > skip_rows)
            .drop("_rn")
        )
    return df


def concat_csvs_with_date(
    spark: SparkSession, glob_path: str, schema=None
) -> DataFrame:
    """S3: union many CSVs and derive a ``Date`` column from the source
    filename with ``_``/extension stripped
    (reference:src/db_preparation.py:133-167)."""
    df = read_csv(spark, glob_path, schema=schema)
    date = F.regexp_replace(
        F.element_at(F.split(F.input_file_name(), "/"), -1),
        r"(_|\.csv)",
        "",
    )
    return df.withColumn("Date", date.cast("long"))


def clean_column_names(df: DataFrame) -> DataFrame:
    """F5: strip `` (unit)`` suffixes and spaces from headers
    (reference:src/db_preparation.py:163-164)."""
    return df.toDF(*[re.sub(r"\s*\(.*\)$", "", c).strip().replace(" ", "_") for c in df.columns])


def with_dense_time_id(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """S4: assign the dense 1..N surrogate key the reference gets from
    BIGSERIAL after a sorted bulk load
    (reference:src/db_preparation.py:58-59, 92-93).

    NOTE (scale): ``row_number`` over a global order serializes one
    pass through a single partition — acceptable as a one-time ingest
    step. For very large ingests prefer ``zipWithIndex``-style two-phase
    numbering (per-partition counts + offsets), provided by
    :func:`with_dense_time_id_distributed`.
    """
    w = Window.orderBy(*order_cols)
    return df.withColumn("time_id", F.row_number().over(w).cast("long"))


def with_dense_time_id_distributed(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Dense 1..N numbering without a single-partition sort: range-
    partition by the order columns, number within partitions, then add
    per-partition offsets (classic zipWithIndex semantics, distributed).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    ranged = ranged.withColumn("_rn", F.row_number().over(w_in))
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("time_id", (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def load_series(df: DataFrame, column: str) -> DataFrame:
    """P1: two-column projection with rename
    (reference:src/server.py:199)."""
    return df.select(
        F.col("time_id").cast("long").alias("time_id"),
        F.col(column).cast("double").alias("y"),
    )


def read_jdbc(
    spark,
    url: str,
    table: str,
    partition_column: str | None = "time_id",
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC series source — parity with the reference's Postgres storage
    (reference:src/client.py:68-88 connects psycopg2 to
    ``dbname=<emg|gas>``; the Spark analogue is the built-in JDBC
    reader, ``jdbc:postgresql://host/dbname``).

    When ``partition_column``/``num_partitions`` are given the read is
    range-partitioned on that column by the JDBC source itself (Spark
    issues one bounded query per partition), so a large series table
    lands distributed instead of through a single connection. Bounds
    are probed with a MIN/MAX push-down query (S7) unless provided in
    ``options`` (``lowerBound``/``upperBound``).

    The container ships no JDBC driver jars, so this path is exercised
    in tests through the registration seam (`Engine.register_jdbc`)
    with the reader monkeypatched — the reader body itself is a thin
    pass-through to the public ``spark.read.jdbc`` surface.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    if partition_column is not None and num_partitions:
        # Spark reader options are case-insensitive — match that here
        # so caller-supplied lowercase bounds suppress the probe
        given = {k.lower() for k in options}
        if "lowerbound" not in given or "upperbound" not in given:
            bounds = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "dbtable",
                    f"(SELECT MIN({partition_column}) AS lo, "
                    f"MAX({partition_column}) AS hi FROM {table}) b",
                )
                .load()
                .first()
            )
            if bounds["lo"] is None or bounds["hi"] is None:
                raise ValueError(
                    f"JDBC table {table!r} is empty (or {partition_column!r} "
                    "is all NULL) — cannot derive partition bounds; load it "
                    "unpartitioned (num_partitions=None) or pass "
                    "lowerBound/upperBound explicitly"
                )
            reader = reader.option("lowerBound", str(bounds["lo"])).option(
                "upperBound", str(bounds["hi"])
            )
        reader = reader.option("partitionColumn", partition_column).option(
            "numPartitions", str(num_partitions)
        )
    return reader.load()
