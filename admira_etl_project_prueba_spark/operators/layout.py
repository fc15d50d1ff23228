"""Data-layout operators: z-order (Morton) clustering keys.

Multi-dimensional data clustering for scan pruning: parquet/ORC keep
min/max statistics per row group, but a table sorted on one column has
useless stats on every other.  Interleaving the bits of several columns
into one Morton key and sorting by it keeps row-group min/max ranges tight
on ALL participating columns at once, so predicates on any of them prune
I/O (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything here is row-local integer bit arithmetic (shiftleft/shiftright
folds over a literal bit range) — scan → project, no shuffle, no UDF, and
exact in any engine's int64, so the key computation is DuckDB-oracleable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_expr(cols: list[str], bits: int = 20) -> str:
    """SQL expression interleaving the low ``bits`` bits of each column.

    Column c's bit k lands at position k·N + c (N = len(cols)), so the
    key cycles through the columns bit-by-bit — the classic Morton curve.
    Inputs must be non-negative and fit in ``bits`` bits; callers clamp or
    bucket first (the *order* only needs monotone per-dimension codes).
    With N·bits ≤ 62 the key is exact in a BIGINT.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"zorder_expr: {n} cols x {bits} bits overflows int64")
    terms = []
    for c_idx, c in enumerate(cols):
        terms.append(
            f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
            f"(acc, k) -> acc + shiftleft(shiftright(CAST({c} AS BIGINT), k) & 1, "
            f"k * {n} + {c_idx}))"
        )
    return " + ".join(terms)


def zorder_keys(df: DataFrame, cols: list[str], bits: int = 20) -> DataFrame:
    """Append ``zkey``: the Morton interleave of ``cols``."""
    return df.withColumn("zkey", F.expr(zorder_expr(cols, bits)))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 20,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet physically clustered on the z-order of
    ``cols``: range-repartition + within-partition sort by zkey, so BOTH
    the file-level and row-group-level min/max stats stay tight on every
    participating column.  ``repartitionByRange`` samples the key — one
    pass, no global sort bottleneck; each output task writes one locally
    sorted file.  ``num_files`` pins the output fan-out (explicit N is
    not AQE-coalesced); default lets Spark size it from the data."""
    keyed = zorder_keys(df, cols, bits)
    ranged = (
        keyed.repartitionByRange(num_files, "zkey")
        if num_files
        else keyed.repartitionByRange("zkey")
    )
    (
        ranged.sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_table(
    spark,
    path: str,
    out_path: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet table into
    ceil(rows / target_rows_per_file) right-sized files, optionally
    re-clustered on ``sort_cols``.

    The lakehouse maintenance job every streaming/upsert sink needs:
    micro-batches and partition upserts leave thousands of KB-sized
    files whose per-file open/footer costs dominate scans long before
    data volume does.  One pass: count → repartitionByRange (sampled
    ranges, no global sort) or round-robin when no sort is asked for →
    locally sorted right-sized files.  Returns {files_before,
    files_after, rows} so maintenance jobs can log/assert the effect.
    """
    import math

    df = spark.read.parquet(path)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)

    # Hadoop-FS counting (functions/fs), not os.walk — the maintenance
    # job must report correctly on HDFS/S3A URIs, same posture as the
    # fact-store port (round 9)
    from admira_etl_project_prueba_spark.functions.fs import count_files

    return {
        "files_before": count_files(spark, path),
        "files_after": count_files(spark, out_path),
        "rows": rows,
    }
