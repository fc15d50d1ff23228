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


def interval_bin_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_hours: int = 24,
) -> DataFrame:
    """Range (interval containment) join without a nested loop: match each
    left row to every interval with ``start ≤ ts < end`` (plus optional
    equi-keys) — the other temporal join Spark lacks natively.

    A direct ``ts BETWEEN start AND end`` join is non-equi: Spark plans
    BroadcastNestedLoopJoin (or worse, a cartesian) — quadratic and
    undistributable at scale.  This operator converts the range predicate
    into an equi-join by time binning: each interval explodes into the
    bins it covers, left rows compute their single bin, the join runs on
    (keys…, bin), and the exact containment filter prunes bin-boundary
    false positives.  Fan-out = ceil(interval span / bin width) rows per
    interval — pick ``bin_hours`` near the typical span so expansion stays
    O(1) per interval while the join stays a shuffled/broadcast hash join.
    """
    on = on or []
    bin_us = bin_hours * 3600 * 1_000_000
    l = left.withColumn(
        "_bin", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / bin_us)
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / bin_us),
                F.floor(
                    (F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / bin_us
                ),
            )
        ),
    )
    joined = l.join(i, on + ["_bin"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bin")


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
