"""General analytics operators over the TPC-H-ish testdata tables.

The reference engine's query surface is tiny (predicate scans + two fixed
aggregations), but this engine is built to be a *general* PySpark analytics
layer; these queries prove out the operator classes the reference never
exercises — multi-way joins, wide aggregations, window functions,
sessionization — with the physical plans you'd want at 100 TB:

* dimension tables are broadcast (region/nation/supplier are KBs even at
  SF100k; customer only when small enough — AQE demotes otherwise);
* fact-fact joins shuffle on their join keys once, partial aggregation
  runs map-side, AQE coalesces post-shuffle partitions;
* money sums run through DECIMAL(25,6) then back to double — exact,
  partitioning-independent results (bit-stable across cluster sizes and
  equal to the DuckDB oracle).

Column aliases here are load-bearing: they must match the oracle SQL in
plans/catalog.py (the driver hash-compares by sorted column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def _dsum(col):
    """Exact money sum: double → DECIMAL(25,6) → SUM → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Scan + single hash aggregate; the filter pushes to the parquet scan and
    only 7 of 16 columns are read (check ReadSchema in .explain).
    """
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    agg = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        F.col("count_order"),
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    pivot: str = "1997-03-15",
) -> DataFrame:
    """TPC-H Q3 (adapted): top unshipped orders by revenue.

    customer is filtered before the join (Catalyst pushes the predicate),
    then joins shuffle on o_custkey / l_orderkey; top-10 via TakeOrdered.
    """
    p = F.lit(pivot).cast("timestamp_ntz")
    joined = (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders.filter(F.col("o_orderdate") < p), F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate") > p), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(
    tables: dict[str, DataFrame],
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 (adapted): revenue via local suppliers per nation.

    region/nation/supplier are broadcast — at any SF these stay dim-sized,
    so the only shuffles are the customer⋈orders and orders⋈lineitem joins.
    """
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    j = (
        tables["customer"]
        .join(
            tables["orders"].filter((F.col("o_orderdate") >= f) & (F.col("o_orderdate") < t)),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(tables["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(tables["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(tables["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(tables["region"].filter(F.col("r_name") == region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return j.groupBy("n_name").agg(_dsum(revenue).alias("revenue"))


def q6_revenue_forecast(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q6: pure scan-filter-sum — the pushdown showcase."""
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    filtered = lineitem.filter(
        (F.col("l_shipdate") >= f)
        & (F.col("l_shipdate") < t)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.coalesce(_dsum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0.0)).alias(
            "revenue"
        )
    )


def q10_returned_items(
    tables: dict[str, DataFrame],
    date_from: str = "1996-10-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q10 (adapted): top-20 customers by returned-item revenue."""
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    j = (
        tables["customer"]
        .join(
            tables["orders"].filter((F.col("o_orderdate") >= f) & (F.col("o_orderdate") < t)),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            tables["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(tables["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# events-table analytics
# ---------------------------------------------------------------------------

def events_daily_stats(events: DataFrame) -> DataFrame:
    """Day × event_type rollup: counts, distinct users, exact value sums."""
    return (
        events.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum("value").alias("total_value"),
        )
        .withColumn("avg_value", F.col("total_value") / F.col("n_events"))
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: split each user's event stream at >gap inactivity.

    Classic lag → new-session flag → running-sum session id. ONE shuffle
    (hash partition by user_id); both window functions and the final
    per-session aggregation reuse that partitioning — Catalyst plans no
    second exchange for the same key. At 100 TB this is the canonical
    shape; skewed power-users are handled by AQE.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond-exact gap (session tz is UTC so the ntz→ltz cast is stable)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    flagged = events.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sess = flagged.withColumn("session_id", F.sum("is_new").over(run))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            _dsum("value").alias("total_value"),
        )
    )


def top_users_by_value(events: DataFrame, k: int = 50) -> DataFrame:
    """Global top-k users by exact total value, with dense ranking.

    The per-user aggregate shuffles once; the global rank on the (tiny)
    aggregate is a single-partition window — fine because its input is
    already reduced to |users| rows, and orderBy+limit keeps it a TakeOrdered
    at scale.
    """
    per_user = events.groupBy("user_id").agg(_dsum("value").alias("total_value"))
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id").asc())
    return (
        per_user.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("user_id", "total_value", "rnk")
    )
