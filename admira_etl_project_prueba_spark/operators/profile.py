"""One-pass column profiling — the data-quality sweep a 100 TB ingest
runs before anything else trusts the table.

``profile_columns`` computes row count, per-column non-null count, exact
distinct count, and lexicographic min/max of the string form — all in ONE
aggregation over ONE scan (a struct of aggregates, then ``stack`` to long
form).  Per-column passes (the naive loop) would scan the table once per
column; this shape is why profiling is affordable at scale.

min/max are over the STRING CAST deliberately: one output type for every
column, engine-portable ordering (lexicographic VARCHAR), and the profile
stays hash-comparable against the DuckDB oracle.  Numeric range checks
belong to typed queries, not the generic profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form profile: (column, n_rows, n_nonnull, n_distinct, min_str,
    max_str), one row per column, one scan total."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(s).alias(f"_mn_{c}"),
            F.max(s).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return row.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack}) AS (column, n_nonnull, n_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str")
