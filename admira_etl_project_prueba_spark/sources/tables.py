"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings, one parquet file per table under ``{sf_dir}/``.

Scale note: each loader is a plain ``spark.read.parquet`` — columnar,
vectorized, filter-pushdown-capable.  On a real 100 TB layout these would be
directories of many files (possibly date-partitioned); the API is unchanged.

Quirk: ``events.parquet`` stores ``TIMESTAMP(NANOS)`` which the vectorized
Spark reader rejects outright.  With ``spark.sql.legacy.parquet.nanosAsLong``
the column arrives as raw nanos (LongType) and we rebuild a microsecond
timestamp with integer division — identical to DuckDB's ns→µs truncation,
which keeps the oracle comparison exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from admira_etl_project_prueba_spark.session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a proper microsecond TIMESTAMP_NTZ."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # raw nanos → truncate to micros (integer div — no float rounding)
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    apply_runtime_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view — the engine's SQL front door.

    After this, any ANSI query runs via ``spark.sql(...)`` with the same
    Catalyst plans (pushdown, pruning, AQE) as the DataFrame API; the two
    surfaces are the same engine.  In production these would be catalog
    tables (Hive/Unity/Glue) — the query text is unchanged.
    """
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
