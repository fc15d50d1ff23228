"""As-of (temporal) join — a custom operator Spark lacks natively.

``asof_join(left, right)``: for every left row, attach the single most
recent right row with the same key whose timestamp is ≤ (or <) the left
timestamp.  The classic use: enrich an event with the latest state/quote/
spend snapshot known at event time.

Implementation: the union-tag trick, NOT a range join —

    tag(left) ∪ tag(right)
      → window last_value(right-payload ignoring nulls)
        over (partition key order by ts, tag rows unbounded-preceding..current)
      → keep left rows

Why this shape at 100 TB: a naive ``l JOIN r ON l.key = r.key AND r.ts <=
l.ts`` + row_number explodes to |matches| intermediate rows (quadratic per
key) before pruning; the union-window form is ONE shuffle on the key, one
sort within partitions, linear output — and AQE handles skewed keys.  This
is the same plan a native ASOF JOIN (DuckDB/QuestDB) executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach the latest right payload at-or-before each left row's time.

    ``strict=True`` uses strictly-before (<) semantics: a right row at the
    exact same timestamp is not visible.  Ties within one side order right
    rows first (non-strict) / left rows first (strict), so the visibility
    rule holds even on equal timestamps.
    """
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    # tag order on equal ts: non-strict → right sorts before left (visible);
    # strict → left sorts before right (not visible)
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    l_cols = [c for c in left.columns]
    tagged_left = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_left"),
        F.lit(None).cast(
            left.sparkSession.createDataFrame([], right.schema)
            .select(payload_struct.alias("p"))
            .schema["p"]
            .dataType.simpleString()
        ).alias("_right"),
    )
    tagged_right = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_tag"),
        F.lit(None)
        .cast(
            left.sparkSession.createDataFrame([], left.schema)
            .select(F.struct(*[F.col(c) for c in l_cols]).alias("l"))
            .schema["l"]
            .dataType.simpleString()
        )
        .alias("_left"),
        payload_struct.alias("_right"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_right", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_left").isNotNull()).select(
        F.col("_left.*"),
        *[F.col(f"_asof.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
