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


def dec6(expr: str) -> str:
    """Engine-portable 6-decimal quantization of a double expression.

    ``CAST(double AS DECIMAL(25,6))`` rounds through engine-specific
    paths — a near-tie double was observed to land 1e-6 apart between
    Spark and DuckDB (events_decay_attribution, round-10 generated-data
    sweep).  This form uses only exactly-specified IEEE ops (multiply,
    add, floor) to pick the micro-unit integer, then an exact decimal
    scale shift, so the quantized value is bit-identical on any engine;
    the SQL is valid in both dialects, so catalog oracles embed the SAME
    string.  Tie-break is half-toward-+inf (floor(x·1e6 + 0.5)), applied
    identically on both sides."""
    return (
        f"CAST(CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)"
        " * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(25,6))"
    )


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


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-07-01",
    date_to: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q4 (adapted): order-priority checking via EXISTS semi-join.

    The schema has no l_commitdate/l_receiptdate, so the EXISTS predicate is
    "has at least one returned line" (l_returnflag = 'R').  Catalyst plans a
    LeftSemi hash join — lineitem is reduced to its join key before the
    shuffle, so at 100 TB only (l_orderkey) pairs move, never payloads.
    """
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter((F.col("o_orderdate") >= f) & (F.col("o_orderdate") < t))
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q7_volume_shipping(
    tables: dict[str, DataFrame],
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 (adapted): bilateral shipping volume between two nations.

    nation joins twice under different roles (supplier side / customer
    side); both copies broadcast.  The disjunctive nation-pair predicate is
    applied after the broadcast joins, so the two fact shuffles
    (orders⋈lineitem, customer⋈orders) are the only exchanges.
    """
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    n1 = tables["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = tables["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        tables["supplier"]
        .join(
            tables["lineitem"].filter((F.col("l_shipdate") >= f) & (F.col("l_shipdate") < t)),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(tables["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(tables["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(_dsum(revenue).alias("revenue"))
    )


def q8_market_share(
    tables: dict[str, DataFrame],
    nation: str = "NATION_3",
    region: str = "ASIA",
    p_type: str = "PROMO",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8 (adapted): one nation's market share inside a region.

    Conditional numerator over a shared 7-table join; part/supplier/nation/
    region broadcast, facts shuffle once each.
    """
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    cust_nation = tables["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nation = tables["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        tables["part"].filter(F.col("p_type") == p_type)
        .join(tables["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(tables["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            tables["orders"].filter((F.col("o_orderdate") >= f) & (F.col("o_orderdate") < t)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(tables["region"].filter(F.col("r_name") == region)),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    volume = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    national = F.when(F.col("supp_nation") == nation, volume).otherwise(F.lit(0.0))
    agg = j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        _dsum(national).alias("nat_vol"), _dsum(volume).alias("all_vol")
    )
    return agg.select(
        "o_year", (F.col("nat_vol") / F.col("all_vol")).alias("mkt_share")
    )


def q9_product_profit(
    tables: dict[str, DataFrame], name_fragment: str = "red"
) -> DataFrame:
    """TPC-H Q9 (adapted): profit by supplier nation × year.

    No partsupp table in the schema, so supply cost is modeled as
    0.6 × p_retailprice × l_quantity (fixed margin stand-in).  part filters
    by name fragment before the join and broadcasts.
    """
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        tables["part"].filter(F.col("p_name").contains(name_fragment))
        .join(tables["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(tables["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(tables["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(tables["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"))
    )


def q12_priority_shipping(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 (adapted): high- vs low-priority line counts per returnflag.

    No l_shipmode in the schema, so the outer group is l_returnflag.  The
    CASE aggregation is the shape: conditional sums inside one hash agg.
    """
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            lineitem.filter((F.col("l_shipdate") >= f) & (F.col("l_shipdate") < t)),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame, excluded_priority: str = "5-LOW"
) -> DataFrame:
    """TPC-H Q13 (adapted): histogram of orders-per-customer.

    LEFT OUTER join keeps order-less customers (c_count = 0); the join
    condition filters the orders side only.  Two-level aggregation: the
    second groupBy runs on |customers| rows — trivially small post-reduce.
    """
    j = customer.join(
        orders.filter(F.col("o_orderpriority") != excluded_priority),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_outer",
    )
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15: top supplier(s) by quarterly revenue.

    The revenue aggregate is computed once and reused for both the scalar
    max and the equality probe (self-referential scalar subquery); the
    1-row max side broadcasts.
    """
    f = F.lit(date_from).cast("timestamp_ntz")
    t = F.lit(date_to).cast("timestamp_ntz")
    revenue = (
        lineitem.filter((F.col("l_shipdate") >= f) & (F.col("l_shipdate") < t))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supplier.join(F.broadcast(revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))),
                      F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity_revenue(
    part: DataFrame, lineitem: DataFrame, brand: str = "Brand#23"
) -> DataFrame:
    """TPC-H Q17 (adapted): revenue from small-quantity orders.

    The correlated per-part AVG subquery is decorrelated by hand into a
    grouped aggregate + equi-join — the plan Catalyst would produce, stated
    explicitly.  Quantity averages go through exact decimal sums so the
    0.2×avg threshold is bit-identical to the oracle.
    """
    per_part = lineitem.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (
            F.lit(0.2) * _dsum("l_quantity") / F.count(F.lit(1))
        ).alias("qty_limit")
    )
    branded = part.filter(F.col("p_brand") == brand)
    j = (
        lineitem.join(F.broadcast(branded), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
    )
    return j.agg((_dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))


def q18_large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    threshold: float = 300.0,
) -> DataFrame:
    """TPC-H Q18: customers with very large single orders.

    HAVING SUM(l_quantity) > threshold computed once per order, then joined
    back to orders/customer.  The aggregate survives the filter tiny, so
    AQE turns the join back into a broadcast at runtime.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > threshold)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


def q19_disjunctive_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19 (adapted): revenue under three OR-ed brand/size/qty bands.

    The disjunction mixes part and lineitem columns, so it can only be
    evaluated post-join — but the implied predicate p_size BETWEEN 1 AND 15
    and the join itself still prune; part broadcasts.
    """
    bands = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).filter(bands)
    return j.agg(
        F.coalesce(
            _dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), F.lit(0.0)
        ).alias("revenue")
    )


def q22_lapsed_customers(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 (adapted): well-funded customers with no recent orders.

    Scalar AVG subquery (1-row broadcast) + LEFT ANTI join against the
    recent-orders key set.  Anti joins ship only o_custkey — at 100 TB the
    probe side is a key column, not order payloads.
    """
    s = F.lit(since).cast("timestamp_ntz")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    recent = orders.filter(F.col("o_orderdate") >= s).select("o_custkey")
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )


def q21_late_sole_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    grace_days: int = 60,
) -> DataFrame:
    """TPC-H Q21 (adapted to this schema's columns): suppliers who were the
    SOLE late shipper on finished multi-supplier orders.

    The classic formulation is EXISTS(other supplier on the order) AND NOT
    EXISTS(other LATE supplier) — two correlated self-joins of lineitem.
    Here "late" is ``l_shipdate > o_orderdate + grace_days`` (this testdata
    has no commit/receipt dates; reference repo has no such query at all —
    beyond-reference generic-SQL surface).

    Spark-first decorrelation: per-(order, supplier) grain first (max of
    the late flag), then per-order counts over those distinct rows —
    replacing both correlated EXISTS with two stacked hash aggregates.
    Deliberately NOT ``countDistinct``: two distinct aggregates in one
    groupBy force an Expand (3× the join output shuffled); the stacked
    form shuffles each row once and was measured 26% faster at sf0.1
    with identical results.  At 100 TB this is one orderkey-shuffle
    instead of three lineitem self-shuffles; supplier/nation broadcast.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {int(grace_days)} DAYS"
    )
    per_order_supplier = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("late"))
    )
    per_order = (
        per_order_supplier.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("late").alias("n_late_supp"),
            F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
                "late_suppkey"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.groupBy("late_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("late_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"), "numwait")
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


def sessionize_events(
    events: DataFrame, gap_minutes: int = 30, id_base: int = 1
) -> DataFrame:
    """Events + per-event ``session_id``: the lag → new-session flag →
    running-sum core shared by :func:`sessionize` (per-session rollup)
    and :func:`events_session_funnel` (within-session ordering).  ONE
    shuffle (hash partition by user_id); both windows reuse it."""
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
    sid = F.sum("is_new").over(run) - F.lit(1 - id_base)
    return flagged.withColumn("session_id", sid.cast("long")).drop("is_new")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: split each user's event stream at >gap inactivity.

    Classic lag → new-session flag → running-sum session id. ONE shuffle
    (hash partition by user_id); both window functions and the final
    per-session aggregation reuse that partitioning — Catalyst plans no
    second exchange for the same key. At 100 TB this is the canonical
    shape; skewed power-users are handled by AQE.

    session_start/session_end are BIGINT epoch-micros, not formatted
    strings: exact across engines (string formatting of fractional
    seconds differs between Spark's date_format and other engines'
    strftime); session ids are 1-based (see plans/catalog.py
    events_sessionize for the full output-convention rationale).
    """
    sess = sessionize_events(events, gap_minutes)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("session_start"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("session_end"),
            _dsum("value").alias("total_value"),
        )
    )


def daily_value_moving_avg(events: DataFrame, days: int = 7) -> DataFrame:
    """Daily total value + trailing N-day moving average and cumulative sum.

    Two-phase: the heavy reduction (events → days) shuffles once; the
    window functions then run over ~|days| rows.  The frame is ROWS-based
    over the dense daily series, so it is deterministic and cheap.  At
    100 TB the day-grain aggregate is KBs — window cost is irrelevant;
    single-partition window on the reduced series is the right plan.
    """
    daily = events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.sum(F.col("value").cast(_DEC)).alias("total_dec")
    )
    w = Window.orderBy("day")
    trail = w.rowsBetween(-(days - 1), 0)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    # window arithmetic stays DECIMAL (exact, order-independent — engines
    # may reorder window-frame addition) and converts to double at the edge
    return daily.select(
        "day",
        F.col("total_dec").cast("double").alias("total_value"),
        (F.sum("total_dec").over(trail).cast("double") / F.count(F.lit(1)).over(trail)).alias(
            f"ma{days}"
        ),
        F.sum("total_dec").over(cum).cast("double").alias("cum_value"),
        (F.col("total_dec") - F.lag("total_dec", 1).over(w)).cast("double").alias("day_delta"),
    )


def events_cube(events: DataFrame) -> DataFrame:
    """CUBE(day-of-week, event_type) with grouping_id — the full lattice of
    subtotals in ONE pass (Catalyst Expand + a single shuffle), the
    generalization of the rollup entry."""
    return (
        events.select(
            F.dayofweek("ts").cast("int").alias("dow"), "event_type", "value"
        )
        .cube("dow", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("total_value"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def events_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact value percentiles per event_type (median, p90, p99).

    Uses the exact ``percentile`` aggregate — at extreme scale swap for
    ``approx_percentile`` (t-digest, mergeable, bounded memory); the exact
    form is kept here because it is oracle-checkable bit-for-bit.
    """
    return events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def top_parts_by_nation(tables: dict[str, DataFrame], k: int = 3) -> DataFrame:
    """Top-k parts by revenue within each supplier nation — the canonical
    top-N-per-group: one shuffle for the aggregate, then a partitioned
    window (rank per nation) over the reduced rows."""
    j = (
        tables["lineitem"]
        .join(F.broadcast(tables["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(tables["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    rev = (
        j.groupBy(F.col("n_name").alias("nation"), F.col("l_partkey").alias("partkey"))
        .agg(_dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("revenue").desc(), F.col("partkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("nation", "partkey", "revenue", "rnk")
    )


def events_value_correlation(events: DataFrame) -> DataFrame:
    """Pearson correlation of ``value`` vs the JSON ``props.k`` field per
    event_type — computed from EXACT decimal cross-moments.

    Built-in ``corr`` accumulates doubles in partition order (different
    bits on different cluster sizes); raw moments through DECIMAL(25,6)
    are associative and exact, so the final double arithmetic is
    reproducible anywhere and oracle-checkable.  One hash aggregate.
    """
    d = "decimal(25,6)"
    x = F.col("value")
    y = F.from_json("props", "k INT").getField("k").cast("double")
    base = events.select("event_type", x.alias("x"), y.alias("y"))
    m = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d)).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (cov / F.sqrt(vx * vy)).alias("pearson_r"),
    )


def events_retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, counted
    on each subsequent active day — the canonical product-analytics rollup.

    Two aggregations: first-day per user (one shuffle on user_id) and the
    cohort × day-offset distinct count; both reduce before joining, so the
    join input is |users|, not |events|.
    """
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    j = activity.join(first, "user_id")
    return (
        j.groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff("day", "cohort_day").cast("int").alias("day_n"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def events_funnel_ordered(events: DataFrame) -> DataFrame:
    """Ordered conversion funnel click → signup → purchase: a step counts
    only if it happens AFTER the previous step's first occurrence.

    One hash aggregate builds each user's first-occurrence timestamps
    (conditional MINs); the funnel conditions are then row-local.
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    stage2 = F.col("t_click").isNotNull() & (F.col("t_signup") > F.col("t_click"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_signup"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.col("t_click")).alias("reached_click"),
        F.sum(F.when(stage2, 1).otherwise(0)).cast("bigint").alias("reached_signup_after_click"),
        F.sum(F.when(stage3, 1).otherwise(0)).cast("bigint").alias("reached_full_funnel"),
    )


def supplier_revenue_distribution(
    supplier: DataFrame, lineitem: DataFrame, exact: bool = False
) -> DataFrame:
    """Relative-standing windows over the per-supplier revenue aggregate:
    percent_rank and cume_dist on the reduced (|suppliers|-row) set.

    The DEFAULT is the 100 TB mode (suppliers scale with the fact
    table): both relative standings become cdf estimates from a 99-edge
    approx_percentile grid — one mergeable sketch aggregate, a 1-row
    broadcast, row-local arithmetic, no single-partition sort (the same
    trade as quality_calibrated's global percentile; tolerance pinned in
    tests/test_sampled_quantiles.py).  ``exact=True`` opts into the
    single-partition percent_rank/cume_dist form — it survives as the
    DuckDB-oracle twin, not as something a bare caller should get.
    """
    rev = (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(_dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
    )
    if not exact:
        from admira_etl_project_prueba_spark.functions.quantiles import (
            bucket_expr,
            quantile_edges,
        )

        edges = quantile_edges(rev, {"_e": "revenue"}, 100)
        above = f"({bucket_expr('revenue', '_e', descending=True)}) - 1"
        return rev.crossJoin(F.broadcast(edges)).selectExpr(
            "s_suppkey",
            "s_name",
            "revenue",
            # desc percent_rank ≈ fraction of the grid above this revenue
            f"CAST({above} AS DOUBLE) / 99.0 AS pct_rank",
            # desc cume_dist ≈ P(revenue' >= revenue): one grid step higher
            f"CAST(({above}) + 1 AS DOUBLE) / 100.0 AS cume",
        )
    w = Window.orderBy(F.col("revenue").desc())
    return rev.select(
        "s_suppkey",
        "s_name",
        "revenue",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


TREND_SCHEMA = (
    "event_type string, n_days int, slope double, intercept double, r2 double"
)


def events_type_trend(events: DataFrame) -> DataFrame:
    """Per-group model fitting via grouped ``applyInPandas``: OLS trend of
    daily total value (y) over day index (x), one fit per event_type.

    The 100 TB discipline for Python model code: REDUCE FIRST.  The heavy
    aggregation (events → days) runs JVM-side with one shuffle; Python
    receives |groups| × |days| rows — a few KB — as Arrow batches.  The
    closed-form OLS is numpy, no per-row Python.  This is the template for
    any per-key sklearn/scipy fit: aggregate to the model's input grain in
    Spark, fit in applyInPandas.
    """
    import numpy as np
    import pandas as pd

    daily = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        y = pdf["total_value"].to_numpy()
        x = np.arange(len(y), dtype="float64")
        n = len(y)
        if n < 2:
            slope, intercept, r2 = 0.0, float(y[0]) if n else 0.0, 0.0
        else:
            xm, ym = x.mean(), y.mean()
            sxx = float(((x - xm) ** 2).sum())
            sxy = float(((x - xm) * (y - ym)).sum())
            slope = sxy / sxx
            intercept = ym - slope * xm
            ss_res = float(((y - (intercept + slope * x)) ** 2).sum())
            ss_tot = float(((y - ym) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "n_days": n,
                    "slope": slope,
                    "intercept": intercept,
                    "r2": r2,
                }
            ]
        )

    return daily.groupBy("event_type").applyInPandas(fit, TREND_SCHEMA)


def events_pivot_daily(events: DataFrame) -> DataFrame:
    """Wide-form day × event_type counts via ``groupBy().pivot()``.

    The pivot values are declared explicitly — with them, Catalyst plans a
    single pass; without, it runs an extra distinct-scan job first.  At
    scale pivots are for LOW-cardinality columns only (each value becomes
    a physical column).
    """
    types = ["click", "view", "signup", "purchase", "error"]
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select(
            "day", *[F.col(t).cast("bigint").alias(f"n_{t}") for t in types]
        )
    )


def user_value_quartiles(events: DataFrame, exact: bool = False) -> DataFrame:
    """Quartile assignment over per-user exact totals.

    Aggregate first (events → users, one shuffle), then assign quartiles
    on the reduced set.  The DEFAULT is the 100×-scale mode: the global
    ntile window (an ``Exchange SinglePartition`` + one-task sort of the
    whole user frame) is replaced by approx_percentile edges + a 1-row
    broadcast + row-local assignment — no global order anywhere in the
    plan (see functions/quantiles.py; parity tolerance pinned in
    tests/test_sampled_quantiles.py).  ``exact=True`` opts into the
    NTILE(4) form (deterministic total ordering value desc, user_id) —
    kept only as the DuckDB-oracle twin.
    """
    per_user = events.groupBy("user_id").agg(_dsum("value").alias("total_value"))
    if not exact:
        from admira_etl_project_prueba_spark.functions.quantiles import (
            with_sampled_buckets,
        )

        return with_sampled_buckets(
            per_user, [("quartile", "total_value", True)], 4
        ).select("user_id", "total_value", "quartile")
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id"))
    return per_user.select(
        "user_id", "total_value", F.ntile(4).over(w).cast("int").alias("quartile")
    )


def user_type_overlap(events: DataFrame, a: str = "click", b: str = "purchase") -> DataFrame:
    """Set-operation surface: users doing BOTH a and b (INTERSECT) and
    users doing a but never b (EXCEPT), labeled in one result.

    Both set ops hash-partition on user_id once; at scale these are the
    audience-segmentation primitives (overlap / retention / churn).
    """
    ua = events.filter(F.col("event_type") == a).select("user_id")
    ub = events.filter(F.col("event_type") == b).select("user_id")
    both = ua.intersect(ub).select("user_id", F.lit("both").alias("segment"))
    only_a = ua.subtract(ub).select("user_id", F.lit("a_only").alias("segment"))
    return both.unionByName(only_a)


def events_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured path: parse the JSON ``props`` column with a typed
    ``from_json`` schema (JVM-side, no Python), then aggregate by
    event_type × decade bucket of k.

    At 100 TB the right move is exactly this — parse ONCE into typed
    columns near the scan and aggregate the typed result — never repeated
    ``get_json_object`` calls per field (one JSON parse each).
    """
    parsed = events.select(
        "event_type", F.from_json("props", "k INT").getField("k").alias("k")
    )
    return (
        parsed.groupBy(
            "event_type", F.floor(F.col("k") / 10).cast("int").alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


def events_approx_distinct(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Approximate distinct users per event_type via HyperLogLog++.

    The mergeable-sketch shape for 100 TB cardinality work: per-partition
    sketches merge in O(sketch size), unlike exact COUNT(DISTINCT) whose
    shuffle grows with cardinality.  Not oracle-gated (DuckDB's HLL is a
    different sketch); pytest bounds the relative error vs exact instead.
    """
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def events_approx_distinct_checked(
    events: DataFrame, rsd: float = 0.02, rel_tol: float = 0.10
) -> DataFrame:
    """The gate twin of :func:`events_approx_distinct`: a DETERMINISTIC,
    exact-SQL-checkable frame that still exercises the HLL++ sketch.

    The sketch estimate itself is engine-specific (no exact oracle can
    exist for it), so the released columns are the exact distinct count
    per type plus ``hll_within_tol`` — 1 iff the engine's HLL estimate
    sits within ``rel_tol`` relative error of the exact count (5 sigma at
    rsd=0.02).  An oracle asserting ``hll_within_tol = 1`` hash-verifies
    the sketch's accuracy contract without hashing the estimate.  The
    exact COUNT(DISTINCT) is gate-SF-only scaffolding; production
    cardinality work uses the sketch-only operator above (mergeable,
    shuffle flat in cardinality).
    """
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("_hll"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        _within_tol("_hll", "exact_users", rel_tol),
    )


def _within_tol(est_col: str, exact_col: str, rel_tol: float):
    """1 iff the estimate sits within ``rel_tol`` relative error of the
    exact count.  Zero-guarded: a group whose key values are all NULL has
    exact = 0 (ANSI division would NULL the flag where the oracle emits
    1) — there the contract degenerates to "the sketch also says 0"."""
    return (
        F.when(
            F.col(exact_col) > 0,
            F.abs(F.col(est_col) - F.col(exact_col)) / F.col(exact_col)
            <= F.lit(float(rel_tol)),
        )
        .otherwise(F.col(est_col) == 0)
        .cast("int")
        .alias("hll_within_tol")
    )


def top_users_by_value(events: DataFrame, k: int = 50) -> DataFrame:
    """Global top-k users by exact total value, with dense ranking.

    The per-user aggregate shuffles once; the top-k itself is
    ``orderBy().limit(k)`` — physically ``TakeOrderedAndProject`` (each
    partition keeps its local top-k, the driver merges k-row heaps), so
    NO task ever sorts the full user frame.  The rank column is derived
    by a window AFTER the limit, over exactly k rows — bounded by
    construction, not by data size.
    """
    per_user = events.groupBy("user_id").agg(_dsum("value").alias("total_value"))
    top = per_user.orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    ).limit(int(k))
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "user_id", "total_value", "rnk"
    )


def events_approx_percentiles(
    events: DataFrame, accuracy: int = 10_000
) -> DataFrame:
    """Approximate p50/p90/p99 of value per event_type via the
    Greenwald-Khanna quantile sketch (``approx_percentile``).

    The mergeable-sketch companion to the exact ``events_percentiles``:
    per-partition sketches merge in O(sketch), so the shuffle is flat in
    row count — the only quantile shape that works at 100 TB, where exact
    percentile must shuffle every distinct value.  ``accuracy`` bounds
    rank error at n/accuracy — and below accuracy rows per group the GK
    answer IS the exact order statistic at rank ceil(p·n), which is how
    the catalog entry hash-matches a DuckDB rank oracle at gate SF; the
    at-scale error bound vs exact is pinned in pytest.
    """
    return events.groupBy("event_type").agg(
        F.expr(
            f"approx_percentile(value, array(0.5, 0.9, 0.99), {accuracy})"
        ).alias("p"),
        F.count(F.lit(1)).alias("n_events"),
    ).selectExpr(
        "event_type",
        "p[0] AS p50_approx",
        "p[1] AS p90_approx",
        "p[2] AS p99_approx",
        "n_events",
    )


def events_anomaly_zscore(events: DataFrame, threshold: float = 2.0) -> DataFrame:
    """Daily-volume anomaly detection: each (event_type, day)'s total value
    scored as a z-score against the type's own daily distribution; days
    beyond ``threshold`` are flagged.

    Two hash aggregates (day grain, then type grain) and one broadcast
    join back — no window over the full history.  All cross-row sums run
    through DECIMAL(25,6), so mean/variance — and therefore the flags —
    are bit-identical on any cluster size (same rationale as
    ``events_value_correlation``).  Population std; single-day types get
    NULL z-scores (0/0 is undefined, not zero).
    """
    d = "decimal(25,6)"
    daily = (
        events.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.sum(F.col("value").cast(d)).cast("double").alias("day_value"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("day_value").cast(d)).cast("double").alias("s1"),
        F.sum((F.col("day_value") * F.col("day_value")).cast(d))
        .cast("double")
        .alias("s2"),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("s1") / n
    var = F.col("s2") / n - mean * mean
    # clamp tiny negative rounding residue before sqrt
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std > 0, (F.col("day_value") - mean) / std)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "day_value",
            z.alias("zscore"),
            (F.abs(F.coalesce(z, F.lit(0.0))) > threshold).alias("is_anomaly"),
        )
    )


def events_dau_wau(events: DataFrame, window_days: int = 7) -> DataFrame:
    """DAU and trailing-WAU per day: distinct users that day, and distinct
    users in the ``window_days`` window ending that day.

    Scale shape: the raw stream first collapses to DISTINCT (user, day)
    pairs — one shuffle whose volume is active-users × days, not events.
    The trailing window is a row-local bin EXPANSION of that small frame
    (each user-day contributes to ``window_days`` buckets) followed by a
    second distinct count; no self-join of the event table, no window
    function over the full history.  Days are only emitted when the day
    itself had activity (DAU > 0), keeping parity with an oracle that has
    no calendar table.
    """
    user_days = (
        events.select(
            F.col("user_id"), F.to_date("ts").alias("day")
        ).distinct()
    )
    dau = user_days.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    expanded = user_days.selectExpr(
        "user_id",
        f"explode(sequence(day, date_add(day, {window_days - 1}))) AS day",
    )
    wau = expanded.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
        )
    )


def events_trailing_window_load(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Per-event trailing load: how many events (and how much value) this
    user generated in the [ts - N minutes, ts] interval INCLUDING this one
    — a RANGE (time-interval) window frame, the class rate-limit /
    velocity features come from.

    ROWS frames (events_moving_avg) count physical rows; RANGE frames are
    value-based — all peers within the interval, however many there are.
    Orders by epoch microseconds so the frame bound is exact integer
    arithmetic (identical in any engine); ties are peer-inclusive by
    RANGE-frame definition in both Spark and the oracle.  One shuffle,
    hash-partitioned by user_id; skewed power-users are an AQE concern,
    not a plan change.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-minutes * 60 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("value_trailing"),
    )


def events_distinct_rollup_sketched(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Distinct users per day AND overall from ONE pass of mergeable
    Datasketches HLL sketches — the re-aggregation pattern exact
    COUNT(DISTINCT) cannot do.

    At 100 TB you persist the per-day sketch column (KBs/day) and answer
    any coarser rollup (week, month, all-time) by ``hll_union_agg`` over
    stored sketches — no second scan of raw events.  Here both grains are
    emitted together: per-day rows plus an 'ALL' row whose estimate comes
    from merging the daily sketches, never from re-reading events.
    Union-of-parts equals sketch-of-whole for same-precision HLL (pytest
    pins this exactly); estimates are bounded-error vs exact.
    """
    daily = (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.hll_sketch_agg(F.col("user_id"), F.lit(lg_k)).alias("sk"),
            F.count(F.lit(1)).alias("n_events"),
        )
        # one pass over events feeds BOTH output grains; lazy — the
        # caller's single action materializes it (no separate job)
        .localCheckpoint(eager=False)
    )
    per_day = daily.select(
        "day",
        F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
        "n_events",
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"), F.lit(False)))
        .cast("long")
        .alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    ).select(F.lit("ALL").alias("day"), "approx_users", "n_events")
    return per_day.unionByName(merged)


def events_distinct_rollup_checked(
    events: DataFrame, lg_k: int = 12, rel_tol: float = 0.05
) -> DataFrame:
    """The gate twin of :func:`events_distinct_rollup_sketched` (same
    pattern as ``events_approx_distinct_checked``): a deterministic,
    exact-SQL-checkable frame that still exercises the full sketch
    dataflow — per-day HLL sketches, the union-merge 'ALL' grain, the
    estimates — but releases the exact distinct count per grain plus
    ``hll_within_tol`` (1 iff the sketch estimate sits within ``rel_tol``
    of exact; lg_k=12 ⇒ rsd ≈ 1.6%, so 0.05 allows 3 sigma on every
    grain).  The exact COUNT(DISTINCT) is gate-SF scaffolding;
    production rollups use the sketch-only operator above."""
    sk = events_distinct_rollup_sketched(events, lg_k).withColumnRenamed(
        "approx_users", "_hll"
    )
    exact_day = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    exact_all = events.agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    ).select(F.lit("ALL").alias("day"), "exact_users")
    exact = exact_day.unionByName(exact_all)
    # null-SAFE join key: a NULL ts yields a NULL day group on both sides
    # (and in the oracle's GROUP BY); a plain equi-join would silently
    # drop that row while the oracle keeps it
    return (
        sk.join(exact, sk["day"].eqNullSafe(exact["day"]))
        .select(
            sk["day"],
            "exact_users",
            "n_events",
            _within_tol("_hll", "exact_users", rel_tol),
        )
    )


def events_latest_per_user(events: DataFrame) -> DataFrame:
    """CDC-style record dedup: each user's single latest event (by event
    time, event_id as the deterministic tiebreak).

    The upsert-compaction primitive — change streams, SCD snapshots,
    "current state" tables all reduce to it.  row_number over a
    (key → order desc) window = one shuffle hash-partitioned by user_id;
    at 100 TB prefer writing the input bucketed by user_id so the window
    reuses the bucketing and the compaction becomes exchange-free
    (see store.write_bucketed / tests/test_bucketing.py).
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            "event_type",
            "value",
        )
    )


def q16_supplier_part_counts(
    part: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = "Brand#45",
    sizes: tuple[int, ...] = (1, 4, 7, 10, 13, 16, 19, 22),
) -> DataFrame:
    """TPC-H Q16 (adapted): how many distinct suppliers can provide each
    (brand, type, size) part class — excluding one brand and restricted to
    a size list.  This schema has no partsupp table, so the supplier↔part
    relation is derived from observed lineitem links.

    Plan: lineitem reduced to DISTINCT (partkey, suppkey) FIRST — the
    dedup shuffles two keys, after which the part join probes a broadcast
    and the counting agg runs on relation-sized (not fact-sized) input.
    At 100 TB the distinct-pair reduction is the whole game: it turns a
    600-billion-row fact into a bounded catalog relation.
    """
    links = lineitem.select("l_partkey", "l_suppkey").distinct()
    p = part.filter(
        (F.col("p_brand") != exclude_brand) & F.col("p_size").isin(*sizes)
    )
    return (
        links.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    part_type: str = "STANDARD",
    sizes: tuple[int, ...] = (5, 15, 25, 35, 45),
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2 (adapted): for each part of a given type/size class, which
    supplier in a region offers it at the minimum unit cost.  This schema
    has no partsupp, so the offer relation is derived from observed
    lineitems: cost(part, supplier) = MIN(l_extendedprice / l_quantity).

    Plan: Q2's correlated min-cost subquery decorrelates into a groupBy
    over the region's offers plus an equality join back on (part, cost) —
    the standard argmin-by-key shape.  All dims (supplier×nation×region,
    the filtered part list) broadcast; only the offer reduction shuffles,
    and it shuffles (partkey, suppkey) pairs, never raw lineitems.  MIN
    over the IEEE division is order-insensitive, so the double equality
    join is deterministic on both engines.
    """
    eu_supp = (
        supplier.join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu_offers = offers.join(
        F.broadcast(eu_supp), offers["l_suppkey"] == eu_supp["s_suppkey"]
    )
    best = eu_offers.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    p = part.filter(
        (F.col("p_type") == part_type) & F.col("p_size").isin(*sizes)
    )
    return (
        eu_offers.join(best, "l_partkey")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey")
        )
        .limit(k)
    )


def q11_important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    threshold_num: int = 3,
    threshold_den: int = 2,
) -> DataFrame:
    """TPC-H Q11 (adapted): parts whose value flowing through one region's
    suppliers exceeds ``threshold_num/threshold_den``× the average part's —
    Q11's scalar-subquery HAVING, made scale-free (the original's fixed
    fraction 0.0001/SF goes vacuous or total at other SFs; comparing
    against the mean self-normalizes at every SF).

    Plan: the region's suppliers broadcast into the lineitem scan; one
    (partkey) shuffle for the per-part decimal sum; the scalar threshold is
    a 1-row aggregate broadcast back via cross-join.  The HAVING compares
    ``value × n_parts × den > num × total`` in exact decimal×integer
    arithmetic — no decimal division, whose rounding differs across
    engines.
    """
    reg_supp = (
        supplier.join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    vals = (
        lineitem.join(
            F.broadcast(reg_supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).alias(
                "value_dec"
            )
        )
    )
    totals = vals.agg(
        F.sum("value_dec").alias("grand_total"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        vals.crossJoin(F.broadcast(totals))
        .filter(
            F.col("value_dec") * F.col("n_parts") * F.lit(threshold_den)
            > F.lit(threshold_num) * F.col("grand_total")
        )
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("stock_value")
        )
    )


def q20_promotable_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    name_prefix: str = "red",
    region_name: str = "EUROPE",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q20 (adapted): suppliers in a region with a recent-demand
    concentration in a named part family — for some part they supply whose
    name starts with ``name_prefix``, more than half their all-time shipped
    quantity moved inside one year.  Mirrors Q20's availqty-vs-half-shipped
    threshold with an observable proxy (no partsupp in this schema), and
    keeps its nested semi-join shape.

    Plan: the name-filtered part list broadcasts into the lineitem scan;
    one (suppkey, partkey) shuffle computes both decimal sums in a single
    pass (conditional aggregation, not two scans); the qualifying pairs
    semi-join the region's suppliers — dims broadcast, and the comparison
    ``2 × recent > total`` is exact decimal arithmetic.
    """
    fam = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    zero = F.lit(0).cast("decimal(25,6)")
    in_window = (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp")) & (
        F.col("l_shipdate") < F.lit(year_end).cast("timestamp")
    )
    flows = (
        lineitem.join(F.broadcast(fam), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(in_window, F.col("l_quantity").cast("decimal(25,6)")).otherwise(zero)
            ).alias("qty_recent"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty_all"),
        )
    )
    hot = (
        flows.filter(F.lit(2) * F.col("qty_recent") > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    reg_supp = (
        supplier.join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return reg_supp.join(
        hot, reg_supp["s_suppkey"] == hot["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


def events_grouping_sets(events: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the general grouping lattice: (day, type),
    (day), (type), with grouping_id disambiguating NULL-as-total from
    NULL-as-value.  Deliberately NOT a rollup/cube (no grand-total set):
    Catalyst plans ONE Expand over the scan + one hash agg, so adding a
    grouping set costs a row multiply, never an extra pass.
    """
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    return (
        events.select(day, "event_type", "value")
        .groupingSets(
            [["day", "event_type"], ["day"], ["event_type"]],
            F.col("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("total_value"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


def events_unpivot_daily(events: DataFrame) -> DataFrame:
    """Long-form inverse of :func:`events_pivot_daily`: melt the wide
    day × per-type-count table back to (day, event_type, n_events) via
    ``DataFrame.unpivot`` — the relational MELT/stack operator.

    Unpivot is a row-local Expand (each input row fans out to one row per
    measure column) — no shuffle beyond the upstream pivot's aggregation,
    and the round trip pivot→unpivot is loss-free for declared values
    (zero-filled combinations drop out with a filter, restoring the
    sparse long form).
    """
    wide = events_pivot_daily(events)
    types = ["click", "view", "signup", "purchase", "error"]
    return (
        wide.unpivot(
            ids=["day"],
            values=[f"n_{t}" for t in types],
            variableColumnName="measure",
            valueColumnName="n_events",
        )
        .filter(F.col("n_events") > 0)
        .select(
            "day",
            F.expr("substring(measure, 3)").alias("event_type"),
            "n_events",
        )
    )


def assign_contiguous_ids(
    df: DataFrame, order_cols: list[str], n_ranges: int = 32
) -> DataFrame:
    """Dense contiguous row ids (1..N) in ``order_cols`` order — WITHOUT
    the classic scale bug of ``row_number() OVER (ORDER BY …)``, whose
    empty PARTITION BY funnels the entire dataset through ONE task.

    Two-phase: range-repartition on the order columns (Spark samples
    split points), number rows within each range partition, then shift
    each partition by the total count of the partitions before it —
    the per-partition counts are a tiny driver-side cumsum broadcast
    back.  Every stage is parallel; the global order produced is
    identical to the single-window answer when ``order_cols`` is a
    total order (unique key).

    ``monotonically_increasing_id`` is cheaper when ids only need to be
    unique — this operator is for when they must be DENSE and ORDERED
    (surrogate keys, token offsets, shard manifests).
    """
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(n_ranges, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )  # one row per range partition — KBs, broadcast below
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("row_id", F.row_number().over(w) + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def events_daily_gapfill(events: DataFrame) -> DataFrame:
    """Dense daily series with gap filling: every calendar day between the
    stream's min and max date appears exactly once; days with no events
    carry n_events = 0 and forward-fill their running total_value from the
    last observed day (NULL-skipping last() window).

    Dataflow: one day-grain aggregation of the fact table, a spine of
    dates exploded from a single (min, max) row — sequence() is row-local
    — and a left join + one ordered window over the day-grain series.
    At 100 TB the spine and the day-grain aggregate are both tiny (days,
    not events); nothing after the first aggregation touches fact rows.
    """
    daily = events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DEC)).alias("v_dec"),
    )
    spine = (
        daily.agg(
            F.min("day").alias("d0"), F.max("day").alias("d1")
        )
        .selectExpr(
            "explode(sequence(to_date(d0), to_date(d1), interval 1 day)) AS d"
        )
        .selectExpr("date_format(d, 'yyyy-MM-dd') AS day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("v_dec").cast("double"), F.lit(0.0)).alias("day_value"),
            F.last(F.col("v_dec"), ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("last_observed_value"),
            F.sum(F.coalesce(F.col("v_dec"), F.lit(0).cast(_DEC)))
            .over(w)
            .cast("double")
            .alias("running_value"),
        )
    )


def events_value_histogram(
    events: DataFrame, lo: float = 0.0, hi: float = 100.0, bins: int = 20
) -> DataFrame:
    """Equi-width histogram of the value column per event_type: fixed
    [lo, hi) bins plus clamp bins for outliers — a single hash aggregate
    (bin id is row-local arithmetic), the profile primitive dashboards
    build on.  Bin edges are data-independent so the operator is one pass
    and sketch-free; pair with events_percentiles for data-driven cuts.
    """
    width = (hi - lo) / bins
    bin_id = F.when(F.col("value") < lo, F.lit(-1)).otherwise(
        F.least(
            F.floor((F.col("value") - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
        )
    ).cast("long")
    return (
        events.select("event_type", bin_id.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            "n",
        )
    )


def events_type_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition statistics over each user's event
    stream: counts and conditional probabilities of event_type →
    next-event_type, the standard input to funnel discovery and
    next-action models.

    ONE shuffle (hash partition by user_id) feeds the lag window; the
    transition aggregation and the per-source-type probability window both
    run on the tiny (|types|²-row) aggregate.  Session-boundary policy:
    transitions are counted across a user's whole stream (no gap split) —
    compose with sessionize first for within-session transitions.

    Returns (prev_type, next_type, n_transitions, p_transition) where
    p_transition sums to 1 per prev_type.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot)
        ).alias("p_transition"),
    )


def events_session_funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    gap_minutes: int = 30,
) -> DataFrame:
    """Within-session ORDERED funnel: how many sessions reach step 1
    (a ``view``), step 2 (a ``click`` strictly after that view), step 3
    (a ``purchase`` strictly after that click).

    Ordering is the point — a purchase before the first view does not
    convert.  Step times are resolved as three window passes over the
    SAME (user_id, session_id) partitioning the sessionizer produced, so
    the whole query is still ONE shuffle: t1 = min view time, t2 = min
    click time > t1, t3 = min purchase time > t2; each pass is a
    projection, no extra exchange.  Micro-second integer comparisons —
    exact in any engine.

    Returns (steps_completed, n_sessions): one row per depth 0..3,
    absent depths omitted.
    """
    se = sessionize_events(events, gap_minutes).selectExpr(
        "user_id",
        "session_id",
        "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    w = Window.partitionBy("user_id", "session_id")
    s1, s2, s3 = steps
    t1 = se.withColumn(
        "t1", F.min(F.when(F.col("event_type") == s1, F.col("us"))).over(w)
    )
    t2 = t1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == s2) & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == s3) & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(w),
    )
    per_session = t3.groupBy("user_id", "session_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return (
        per_session.selectExpr(
            "CAST(CASE WHEN t3 IS NOT NULL THEN 3 "
            "WHEN t2 IS NOT NULL THEN 2 "
            "WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS steps_completed"
        )
        .groupBy("steps_completed")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )


def events_anomaly_mad(events: DataFrame, threshold: float = 3.5) -> DataFrame:
    """Robust daily-volume anomaly detection: modified z-score
    0.6745·(x − median)/MAD per event_type (Iglewicz & Hoaglin 1993).

    The mean/std variant (``events_anomaly_zscore``) lets one extreme day
    inflate its own yardstick; median/MAD has a 50% breakdown point, so a
    single spike cannot mask itself.  Exact ``percentile`` keeps it
    oracle-checkable (the DuckDB twin is ``quantile_cont``); at extreme
    scale swap for approx_percentile.  Dataflow: day-grain aggregate, two
    tiny per-type percentile aggregates, one broadcast join back — no
    window over history.  MAD = 0 (constant series) yields NULL scores,
    not zero: flagging is undefined, and silently unflagged is a lie.
    """
    d = "decimal(25,6)"
    daily = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("value").cast(d)).cast("double").alias("day_value"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(day_value, 0.5)").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev", F.abs(F.col("day_value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad"),
        F.max("med").alias("med"),  # constant per type
    )
    score = F.when(
        F.col("mad") > 0,
        F.expr("CAST(0.6745 AS DOUBLE)")
        * (F.col("day_value") - F.col("med"))
        / F.col("mad"),
    )
    return daily.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        "day_value",
        score.alias("mscore"),
        (F.abs(F.coalesce(score, F.lit(0.0))) > threshold).alias("is_anomaly"),
    )


def fk_integrity_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    child→parent foreign key, the child row count, NULL-key count, and
    ORPHAN count (non-null keys with no parent).

    The data-quality gate a 100 TB ingest runs before anything joins:
    every check ships ONLY the key column — a left-anti join against the
    (broadcastable, dim-sized) parent key set — so the audit costs one
    key projection per fact table, never a payload shuffle.  NULL keys
    are counted separately (an equality join can never match them;
    folding them into 'orphans' would misdiagnose the fix).

    Returns (relation, n_rows, n_null_fk, n_orphans), one row per check.
    """
    checks = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for relation, child, fk, parent, pk in checks:
        keys = tables[child].select(F.col(fk).alias("k"))
        parents = F.broadcast(
            tables[parent].select(F.col(pk).alias("k")).distinct()
        ).withColumn("matched", F.lit(1))
        # ONE pass: left-outer broadcast join marks each key, a single
        # aggregate derives all three counts (a separate anti-join +
        # crossJoin of 1-row aggs would plan a nested-loop join)
        row = (
            keys.join(parents, "k", "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null_fk"),
                F.sum(
                    F.when(
                        F.col("k").isNotNull() & F.col("matched").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
            )
            .selectExpr(f"'{relation}' AS relation", "n_rows", "n_null_fk", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out


def events_cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week, tracked across week offsets.

    ONE user-key shuffle does everything: per user, aggregate the first
    week AND the distinct-week set together (collect_set of week starts
    — bounded by the calendar, dozens of values at most), then explode
    row-locally into (cohort, offset) pairs; the final matrix is a tiny
    aggregate.  The naive formulation (distinct user-weeks JOIN
    per-user minimum) re-shuffles the activity frame a second time on
    the same key.  Week offsets are integer day-diffs div 7 between
    week starts — no date-diff float edge cases.

    Output: cohort_week, week_offset, n_active_users, n_cohort_users,
    retention_rate (= active / cohort size, ≤ 1.0, offset 0 ≡ 1.0).
    """
    per_user = (
        events.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
        )
        .groupBy("user_id")
        .agg(
            F.min("aw").alias("cw"),
            F.collect_set("aw").alias("weeks"),
        )
    )
    pairs = per_user.select(
        "user_id", "cw", F.explode("weeks").alias("aw")
    ).select(
        "user_id",
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        F.expr("datediff(aw, cw) div 7").alias("week_offset"),
    )
    matrix = pairs.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_users")
    )
    base = (
        per_user.groupBy(F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cohort_users"))
    )
    return matrix.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        F.col("week_offset").cast("int").alias("week_offset"),
        "n_active_users",
        "n_cohort_users",
        (
            F.col("n_active_users").cast("double")
            / F.col("n_cohort_users").cast("double")
        ).alias("retention_rate"),
    )


def events_debounce(events: DataFrame, within_seconds: int = 3600) -> DataFrame:
    """Drop near-duplicate event deliveries: an event is suppressed when
    the previous event of the same (user_id, event_type) lies within
    ``within_seconds`` (default 1 h) — the cleanup for at-least-once
    delivery and client retries re-emitting the same logical action.

    One (user, type) shuffle, one lag window, integer microsecond
    comparison.  Suppression chains deliberately do NOT reset: in a
    burst e0..e3 each half-window apart, e1–e3 all suppress against their
    predecessor (each is a plausible retry of it); anchor-based
    semantics (keep e0, re-anchor at e2) would need a session-style
    running id — that variant is ``sessionize`` with a small gap.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    return (
        events.withColumn("us", F.expr("unix_micros(CAST(ts AS TIMESTAMP))"))
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > within_seconds * 1_000_000)
        )
        .drop("prev_us")
        .select("event_id", "user_id", "event_type", "us", "value")
    )


def events_linear_attribution(
    events: DataFrame, lookback_days: int = 7
) -> DataFrame:
    """Multi-touch LINEAR attribution: each purchase splits one unit of
    credit (and its revenue) equally across that user's click/view
    touches in the preceding ``lookback_days`` window.

    The touch↔conversion pairing is a USER-KEYED equi-join with a
    row-local time filter — per-user fan-out is bounded by activity, so
    the join shuffles user-aligned slices, never a cross product (the
    naive range-join formulation is a nested loop at scale).  Credit
    1/n and revenue v/n are summed as DECIMAL(25,6) — order-independent
    across partitionings.  The per-touch share rounds to 6 decimals, so
    the conversion's rounding residual (1 - n·round(1/n), and likewise
    for revenue) is assigned to its FIRST touch (earliest tus, event_id
    tiebreak — deterministic): per-conversion credit sums to EXACTLY 1
    and revenue to exactly its decimal value.  Conversions with NO
    in-window touch surface in the 'unattributed' bucket, so summed
    credit equals the conversion count exactly — a hard reconciliation
    invariant, not an approximation.
    """
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    touches = events.filter(
        F.col("event_type").isin("click", "view")
    ).selectExpr(
        "user_id", "event_type AS touch_type", f"{us} AS tus",
        "event_id AS touch_id",
    )
    convs = events.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id", "event_id AS conv_id", f"{us} AS cus", "value"
    )
    lb = lookback_days * 86_400_000_000
    pairs = convs.join(touches, "user_id").filter(
        (F.col("tus") < F.col("cus")) & (F.col("cus") - F.col("tus") <= lb)
    )
    per_conv = pairs.groupBy("conv_id", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches")
    )
    # the join on conv_id and the first-touch window share the conv_id
    # partitioning — one exchange serves both
    w_first = Window.partitionBy("conv_id").orderBy("tus", "touch_id")
    credited = (
        pairs.join(per_conv.select("conv_id", "n_touches"), "conv_id")
        .withColumn("rn", F.row_number().over(w_first))
        .selectExpr(
            "touch_type",
            "rn",
            "n_touches",
            f"{dec6('CAST(1.0 AS DOUBLE) / n_touches')} AS base_credit",
            f"{dec6('value / n_touches')} AS base_rev",
            "CAST(value AS decimal(25,6)) AS vdec",
        )
        .selectExpr(
            "touch_type",
            "base_credit + IF(rn = 1,"
            " CAST(1.0 AS decimal(25,6)) - base_credit * n_touches,"
            " CAST(0.0 AS decimal(25,6))) AS credit",
            "base_rev + IF(rn = 1,"
            " vdec - base_rev * n_touches,"
            " CAST(0.0 AS decimal(25,6))) AS rev",
        )
        .groupBy("touch_type")
        .agg(
            F.sum("credit").cast("double").alias("attributed_conversions"),
            F.sum("rev").cast("double").alias("attributed_revenue"),
        )
    )
    unattributed = (
        convs.join(per_conv.select("conv_id"), "conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("double").alias("attributed_conversions"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .selectExpr(
            "'unattributed' AS touch_type",
            "attributed_conversions",
            "coalesce(attributed_revenue, 0.0) AS attributed_revenue",
        )
    )
    return credited.unionByName(unattributed)


EVENT_TYPES = ("click", "view", "signup", "purchase", "error")


def events_daily_pivot(events: DataFrame) -> DataFrame:
    """Day × event-type value matrix: pivot with an EXPLICIT type list.

    Passing the pivot values avoids Spark's extra distinct-collect pass
    over the data (a driver round-trip that also makes the output schema
    data-dependent — poison for a 100 TB incremental pipeline where a
    new event type must not silently reshape downstream tables).  One
    shuffle; unobserved types yield 0.0 via the decimal-sum coalesce.
    """
    return (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.col("value").cast(_DEC).alias("v"),
        )
        .groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum("v"))
        .select(
            "day",
            *[
                F.coalesce(F.col(t).cast("double"), F.lit(0.0)).alias(f"{t}_value")
                for t in EVENT_TYPES
            ],
        )
    )


def events_unpivot_daily_values(pivoted: DataFrame) -> DataFrame:
    """Inverse melt of :func:`events_daily_pivot` (the VALUE-sum pivot;
    the count pivot's melt is :func:`events_unpivot_daily`): wide day ×
    type matrix back to long (day, event_type, total_value) rows via the
    built-in unpivot — row-local stack, no shuffle; zero-filled cells
    are kept so unpivot(pivot(x)) is total on the (day × type) grid."""
    return pivoted.unpivot(
        "day",
        [f"{t}_value" for t in EVENT_TYPES],
        "event_type",
        "total_value",
    ).withColumn("event_type", F.expr("replace(event_type, '_value', '')"))


def events_aqp_daily_totals(events: DataFrame, pct: int = 10) -> DataFrame:
    """Approximate query processing: per-day value totals estimated from
    a deterministic ``pct``% uniform sample, with a 95% CI — the
    sample-then-estimate shape that answers dashboard-grade rollups
    from a fixed fraction of a 100 TB fact table.

    The sample predicate is the engine-portable hash bucket
    (hex60(event_id) % 100 < pct), so the estimate is REPRODUCIBLE —
    same rows, any engine, any partitioning — and pushes down to the
    scan.  Estimator: Horvitz-Thompson scale-up (sum * 100/pct);
    variance from the sample's sum of squares (exact decimal sums, one
    sqrt — IEEE-correctly-rounded, so even the CI is bit-stable).
    Output keeps n_sampled so consumers can see the support.
    """
    from admira_etl_project_prueba_spark.operators.textops import hex60

    scale = 100.0 / pct
    sampled = events.filter(
        F.expr(f"{hex60('CAST(event_id AS STRING)')} % 100 < {pct}")
    ).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").cast(_DEC).alias("v"),
        (F.col("value") * F.col("value")).cast(_DEC).alias("v2"),
    )
    return (
        sampled.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.sum("v").alias("s"),
            F.sum("v2").alias("s2"),
        )
        .selectExpr(
            "day",
            "n_sampled",
            f"CAST(s AS DOUBLE) * CAST({scale!r} AS DOUBLE) AS est_total",
            # per-row variance of the HT estimator under Bernoulli(pct/100):
            # var = (1/p - 1) * sum(v^2) / p ... collapsed to scale terms
            f"CAST({scale!r} AS DOUBLE) * (CAST({scale!r} AS DOUBLE) - CAST(1.0 AS DOUBLE))"
            " * CAST(s2 AS DOUBLE) AS est_var",
        )
        .selectExpr(
            "day",
            "n_sampled",
            "est_total",
            "est_total - CAST(1.96 AS DOUBLE) * sqrt(est_var) AS ci_low",
            "est_total + CAST(1.96 AS DOUBLE) * sqrt(est_var) AS ci_high",
        )
    )


def events_daily_autocorr(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Lag-1..max_lag autocorrelation of each type's daily-total series —
    the seasonality detector behind "is this weekly-periodic?" checks
    that moving averages and MAD anomalies can't answer.

    ONE (type)-window shuffle: the daily reduction is lagged max_lag
    times in the same ordered window, stacked row-locally, and reduced
    to r_k = sum((x_t - mean)(x_{t-k} - mean)) / sum((x_t - mean)^2).
    Cross-products are cast to DECIMAL(25,6) before summing
    (order-independent); the final ratio is rounded to 6 decimals —
    same cross-engine float policy as the OLS trend fit.
    """
    daily = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("value").cast(_DEC)).cast("double").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"x_{k}") for k in range(1, max_lag + 1)],
    )
    stats = lagged.groupBy("event_type").agg(
        (F.sum(F.col("x").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("mean"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    centered = lagged.join(F.broadcast(stats), "event_type")
    stacked = centered.selectExpr(
        "event_type",
        "n_days",
        f"{dec6('(x - mean) * (x - mean)')} AS den_term",
        "stack("
        + str(max_lag)
        + ", "
        + ", ".join(
            f"{k}, {dec6(f'(x - mean) * (x_{k} - mean)')}"
            for k in range(1, max_lag + 1)
        )
        + ") AS (lag, num_term)",
    )
    return (
        stacked.groupBy("event_type", "lag")
        .agg(
            F.max("n_days").alias("n_days"),
            F.sum("num_term").alias("num"),
            F.sum("den_term").alias("den"),
        )
        .selectExpr(
            "event_type",
            "CAST(lag AS INT) AS lag",
            "n_days",
            # zero variance (constant series) => honest NULL, not an
            # ANSI divide-by-zero throw / IEEE NaN
            "CASE WHEN den <> 0 THEN "
            "CAST(round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS DOUBLE) END AS acf",
        )
    )


def events_winsorize(
    events: DataFrame, lo: float = 0.01, hi: float = 0.99
) -> DataFrame:
    """Winsorize values to the per-type [p_lo, p_hi] band — the robust
    preprocessing step that tames heavy tails before means/regressions
    (training pipelines clip reward/score columns the same way).

    Exact percentiles per type (one aggregate over the groups), clamp
    via broadcast join — two passes but the clamp pass is the SAME scan
    shape any projection costs.  Emits original and clamped value plus
    a was_clipped flag so downstream can audit the winsorization rate.
    """
    bounds = events.groupBy("event_type").agg(
        F.expr(f"percentile(value, {lo!r})").alias("p_lo"),
        F.expr(f"percentile(value, {hi!r})").alias("p_hi"),
    )
    return (
        events.join(F.broadcast(bounds), "event_type")
        .selectExpr(
            "event_id",
            "event_type",
            "value",
            "CASE WHEN value < p_lo THEN p_lo WHEN value > p_hi THEN p_hi "
            "ELSE value END AS value_winsorized",
            "value < p_lo OR value > p_hi AS was_clipped",
        )
    )


def events_value_histogram_minmax(events: DataFrame, n_bins: int = 20) -> DataFrame:
    """DATA-DRIVEN equi-width histogram per event type: bin edges derive
    from the per-type min/max (one tiny aggregate, broadcast back) — the
    drift-profile complement to :func:`events_value_histogram`, whose
    bins are FIXED [lo, hi) and therefore comparable across snapshots.

    Bin index is integer floor arithmetic with the max value folded into
    the last bin.  Exact counts, one shuffle over (type, bin).
    """
    rng = events.groupBy("event_type").agg(
        F.min("value").alias("v_min"), F.max("value").alias("v_max")
    )
    binned = events.join(F.broadcast(rng), "event_type").selectExpr(
        "event_type",
        "v_min",
        "v_max",
        f"CAST(least(CAST(floor((value - v_min) / (CASE WHEN v_max > v_min "
        f"THEN (v_max - v_min) ELSE 1.0 END) * {n_bins}) AS INT), "
        f"{n_bins - 1}) AS INT) AS bin",
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
        .selectExpr(
            "event_type",
            "bin",
            "n_events",
            f"v_min + (v_max - v_min) * bin / {n_bins} AS bin_lo",
            f"v_min + (v_max - v_min) * (bin + 1) / {n_bins} AS bin_hi",
        )
    )


def events_anomaly_dow(events: DataFrame, threshold: float = 2.0) -> DataFrame:
    """Seasonality-adjusted anomaly detection: each (event_type, day)'s
    total value z-scored against the type's distribution FOR THAT DAY OF
    WEEK — "is this Monday abnormal for a Monday?" — which catches
    weekday/weekend-pattern breaks the plain z-score
    (:func:`events_anomaly_zscore`) washes out, and stays silent on
    ordinary weekly swing the plain score falsely flags.

    Day-of-week derives from the epoch day number modulo 7 (0 =
    Thursday, 1970-01-01) — pure integer arithmetic, identical on every
    engine, no locale-dependent calendar call.  Same exactness seam as
    the plain z-score: decimal moments, population std, NULL z when a
    (type, dow) cell has no spread.  Two hash aggregates + one
    broadcast join; the stats frame is |types| × 7 rows.
    """
    d = "decimal(25,6)"
    daily = (
        events.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.sum(F.col("value").cast(d)).cast("double").alias("day_value"))
        .withColumn(
            "dow",
            (F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date")) % 7)
            .cast("int"),
        )
    )
    stats = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("day_value").cast(d)).cast("double").alias("s1"),
        F.sum((F.col("day_value") * F.col("day_value")).cast(d))
        .cast("double")
        .alias("s2"),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("s1") / n
    var = F.col("s2") / n - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std > 0, (F.col("day_value") - mean) / std)
    return (
        daily.join(F.broadcast(stats), ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            "dow",
            "day_value",
            z.alias("zscore_dow"),
            (F.abs(F.coalesce(z, F.lit(0.0))) > threshold).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


def user_rfm_segments(events: DataFrame, exact: bool = False) -> DataFrame:
    """RFM segmentation: every user scored 1-4 on Recency (days since
    last purchase, newer = higher), Frequency (purchase count), and
    Monetary (decimal-exact purchase value), quartiled by ntile — the
    classic marketing segmentation grid (a "444" is a best customer,
    "111" is churned-cheap).  Only purchase events count, matching the
    funnel ops' revenue convention.

    Determinism: the anchor date is the corpus max purchase timestamp
    (data-derived, not wall clock); every ntile ordering carries a
    user_id tie-break; monetary sums ride the decimal seam.  One user-
    grain aggregate, then three windows over (metric, user_id) int/
    double pairs — text-free, model-thin shuffles.

    The DEFAULT is the 100 TB mode: the three consecutive global
    ntile sorts (each an ``Exchange SinglePartition`` over the whole
    user frame) become ONE approx_percentile aggregate (all three edge
    arrays from a single sketch pass) + a 1-row broadcast + row-local
    assignments — no global order in the plan.  Parity tolerance is
    pinned in tests/test_sampled_quantiles.py; ``exact=True`` opts into
    the three-ntile form, kept only as the DuckDB-oracle twin.
    """
    from pyspark.sql import Window as W

    purchases = events.filter(F.col("event_type") == "purchase")
    anchor = purchases.agg(F.max("ts").alias("anchor"))
    per_user = (
        purchases.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .selectExpr(
            "user_id",
            "datediff(CAST(anchor AS DATE), CAST(last_ts AS DATE)) AS recency_days",
            "frequency",
            "monetary",
        )
    )
    if not exact:
        from admira_etl_project_prueba_spark.functions.quantiles import (
            with_sampled_buckets,
        )

        return (
            with_sampled_buckets(
                per_user,
                [
                    ("r_score", "recency_days", True),  # fewer days ⇒ higher score
                    ("f_score", "frequency", False),
                    ("m_score", "monetary", False),
                ],
                4,
            )
            .selectExpr(
                "user_id",
                "recency_days",
                "frequency",
                "monetary",
                "r_score",
                "f_score",
                "m_score",
                "concat(r_score, f_score, m_score) AS segment",
            )
            .orderBy("user_id")
        )
    r = W.partitionBy().orderBy(F.desc("recency_days"), "user_id")  # newer last ⇒ higher ntile
    f = W.partitionBy().orderBy("frequency", "user_id")
    m = W.partitionBy().orderBy("monetary", "user_id")
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r).alias("r_score"),
        F.ntile(4).over(f).alias("f_score"),
        F.ntile(4).over(m).alias("m_score"),
    ).selectExpr(
        "*",
        "concat(r_score, f_score, m_score) AS segment",
    ).orderBy("user_id")


def events_position_attribution(
    events: DataFrame, lookback_days: int = 7
) -> DataFrame:
    """Multi-touch POSITION-BASED (U-shaped) attribution: 40% of each
    purchase's credit to the user's first in-window touch, 40% to the
    last, the remaining 20% split equally across the middles (1 touch ⇒
    100%, 2 touches ⇒ 50/50) — the journey-shaped model marketers run
    NEXT to linear attribution to see whether discovery or closing
    touches drive conversions.

    Same machinery and exactness contract as
    :func:`events_linear_attribution`: user-keyed equi-join with a
    row-local time filter, decimal(25,6) credit/revenue shares, the
    per-conversion rounding residual assigned to the deterministic
    first touch so credit sums to EXACTLY the conversion count, and an
    'unattributed' bucket for no-touch conversions (hard
    reconciliation, not approximation).
    """
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    touches = events.filter(
        F.col("event_type").isin("click", "view")
    ).selectExpr(
        "user_id", "event_type AS touch_type", f"{us} AS tus",
        "event_id AS touch_id",
    )
    convs = events.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id", "event_id AS conv_id", f"{us} AS cus", "value"
    )
    lb = lookback_days * 86_400_000_000
    pairs = convs.join(touches, "user_id").filter(
        (F.col("tus") < F.col("cus")) & (F.col("cus") - F.col("tus") <= lb)
    )
    per_conv = pairs.groupBy("conv_id", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches")
    )
    w_first = Window.partitionBy("conv_id").orderBy("tus", "touch_id")
    dec = "decimal(25,6)"
    weight = (
        "CASE WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE) "
        "WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE) "
        "WHEN rn = 1 OR rn = n_touches THEN CAST(0.4 AS DOUBLE) "
        "ELSE CAST(0.2 AS DOUBLE) / (n_touches - 2) END"
    )
    # Per-conversion totals are DECIMAL WINDOW SUMS of the very same
    # per-row shares being released — not a closed-form re-derivation.
    # The closed form multiplied IEEE doubles in a fixed association
    # order (value*0.4 then *2, …); any engine associating differently
    # would compute a different "total" than the sum of its own rows and
    # the residual would stop reconciling.  Summing the rows themselves
    # makes credit ≡ n_conversions and revenue ≡ Σvalue by construction
    # on every engine, independent of libm/association behavior.
    w_conv = Window.partitionBy("conv_id")
    credited = (
        pairs.join(per_conv.select("conv_id", "n_touches"), "conv_id")
        .withColumn("rn", F.row_number().over(w_first))
        .selectExpr(
            "conv_id",
            "touch_type",
            "rn",
            "n_touches",
            f"{dec6(weight)} AS base_credit",
            f"{dec6(f'value * ({weight})')} AS base_rev",
            f"CAST(value AS {dec}) AS vdec",
        )
        .withColumn(
            "credit_total", F.sum("base_credit").over(w_conv).cast(dec)
        )
        .withColumn("rev_total", F.sum("base_rev").over(w_conv).cast(dec))
        .selectExpr(
            "touch_type",
            f"base_credit + IF(rn = 1, CAST(1.0 AS {dec}) - credit_total,"
            f" CAST(0.0 AS {dec})) AS credit",
            f"base_rev + IF(rn = 1, vdec - rev_total,"
            f" CAST(0.0 AS {dec})) AS rev",
        )
        .groupBy("touch_type")
        .agg(
            F.sum("credit").cast("double").alias("attributed_conversions"),
            F.sum("rev").cast("double").alias("attributed_revenue"),
        )
    )
    unattributed = (
        convs.join(per_conv.select("conv_id"), "conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("double").alias("attributed_conversions"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .selectExpr(
            "'unattributed' AS touch_type",
            "attributed_conversions",
            "coalesce(attributed_revenue, 0.0) AS attributed_revenue",
        )
    )
    return credited.unionByName(unattributed)


def basket_part_lift(
    lineitem: DataFrame, min_support: int = 3, top_n: int = 50
) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    part pair co-occurring in ≥ ``min_support`` orders, the support,
    confidence (both directions folded into the a→b orientation with
    a < b), and lift — P(ab)/(P(a)·P(b)), the classic 'bought together
    more than chance' signal behind recommendations and bundling.
    Top ``top_n`` pairs by lift (ties → pair id order), deterministic.

    Exactness: counts are integers; lift = (n_ab·N)/(n_a·n_b) is ONE
    IEEE divide of exact integer products — engine-identical.

    Scale shape: the pair expansion is the grouped row-local pattern
    (collect per order, expand C(items,2) locally — bounded by max
    basket size, ~7 in TPC-H), so lineitem shuffles ONCE; item counts
    broadcast back into the |pairs|-row frame; min-support prunes
    before any join.  The order total rides in as a broadcast 1-row
    aggregate (the q22_lapsed_customers shape) — ONE action, no
    driver-side pre-count interpolated as a literal (that was a second
    full lineitem pass before the real plan ever ran).  The same shape
    as the co-supply graph builder, with the statistics kept instead of
    thresholded away.
    """
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = li.groupBy().agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("s"))
        .selectExpr(
            "explode(flatten(transform(s, (x, i) -> "
            "transform(slice(s, i + 2, size(s)), y -> struct(x AS a, y AS b))"
            "))) AS p"
        )
        .selectExpr("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_support))
    )
    ia = item.selectExpr("l_partkey AS a", "n_item AS n_a")
    ib = item.selectExpr("l_partkey AS b", "n_item AS n_b")
    return (
        pairs.join(ia, "a")
        .join(ib, "b")
        .crossJoin(F.broadcast(n_orders))
        .selectExpr(
            "a AS part_a",
            "b AS part_b",
            "n_ab",
            "CAST(n_a AS BIGINT) AS n_a",
            "CAST(n_b AS BIGINT) AS n_b",
            "CAST(n_ab AS DOUBLE) / n_a AS confidence_a_to_b",
            "CAST(n_ab AS DOUBLE) / n_b AS confidence_b_to_a",
            "CAST(n_ab AS DOUBLE) * n_orders / (CAST(n_a AS DOUBLE) * n_b) AS lift",
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(int(top_n))
    )


def events_decay_attribution(
    events: DataFrame, lookback_days: int = 7
) -> DataFrame:
    """Multi-touch TIME-DECAY attribution: each purchase's credit is
    split over the user's in-window click/view touches with weight
    halving per day of age (today's touch counts 2× yesterday's) — the
    recency-shaped model completing the trio next to linear and
    U-shaped.

    Exactness: the raw weight 2^-age_days is an EXACT double (age ≤
    lookback ⇒ a handful of exact powers of two, whose per-conversion
    sums are exact in IEEE regardless of order), the normalized share
    rounds to decimal(25,6), and the rounding residual — measured with
    a decimal window sum per conversion — goes to the deterministic
    first touch, so credit reconciles to the conversion count exactly
    and revenue to its decimal total, same contract as the other two
    models.  No-touch conversions land in 'unattributed'.
    """
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    touches = events.filter(
        F.col("event_type").isin("click", "view")
    ).selectExpr(
        "user_id", "event_type AS touch_type", f"{us} AS tus",
        "event_id AS touch_id",
    )
    convs = events.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id", "event_id AS conv_id", f"{us} AS cus", "value"
    )
    lb = lookback_days * 86_400_000_000
    dec = "decimal(25,6)"
    pairs = (
        convs.join(touches, "user_id")
        .filter((F.col("tus") < F.col("cus")) & (F.col("cus") - F.col("tus") <= lb))
        .selectExpr(
            "conv_id", "value", "touch_type", "tus", "touch_id",
            # age in whole days, 0..lookback ⇒ weight an exact power of two
            "CAST(1.0 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT),"
            " CAST((cus - tus) DIV 86400000000 AS INT)) AS DOUBLE) AS w",
        )
    )
    w_conv = Window.partitionBy("conv_id")
    w_first = Window.partitionBy("conv_id").orderBy("tus", "touch_id")
    shares = (
        pairs.withColumn("w_sum", F.sum("w").over(w_conv))
        .withColumn("rn", F.row_number().over(w_first))
        .selectExpr(
            "conv_id",
            "touch_type",
            "rn",
            f"{dec6('w / w_sum')} AS base_credit",
            f"{dec6('value * w / w_sum')} AS base_rev",
            f"CAST(value AS {dec}) AS vdec",
        )
        .withColumn("credit_total", F.sum("base_credit").over(Window.partitionBy("conv_id")))
        .withColumn("rev_total", F.sum("base_rev").over(Window.partitionBy("conv_id")))
    )
    credited = (
        shares.selectExpr(
            "touch_type",
            f"base_credit + IF(rn = 1, CAST(1.0 AS {dec}) - credit_total,"
            f" CAST(0.0 AS {dec})) AS credit",
            f"base_rev + IF(rn = 1, vdec - rev_total,"
            f" CAST(0.0 AS {dec})) AS rev",
        )
        .groupBy("touch_type")
        .agg(
            F.sum("credit").cast("double").alias("attributed_conversions"),
            F.sum("rev").cast("double").alias("attributed_revenue"),
        )
    )
    unattributed = (
        convs.join(pairs.select("conv_id").distinct(), "conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("double").alias("attributed_conversions"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .selectExpr(
            "'unattributed' AS touch_type",
            "attributed_conversions",
            "coalesce(attributed_revenue, 0.0) AS attributed_revenue",
        )
    )
    return credited.unionByName(unattributed)


def events_session_paths(
    events: DataFrame, gap_minutes: int = 30, top_n: int = 25
) -> DataFrame:
    """Session journey analysis: the top event-type PATHS users actually
    walk within a session ('view>view>purchase'), with session counts,
    share of all sessions, and the conversion flag — the behavioral
    complement to funnel queries, which test a path you hypothesize
    while this surfaces the paths that exist.

    Builds on :func:`sessionize_events` (same one-shuffle core); the
    path string is an ORDERED in-session concat via sort_array over
    (ts, event_id, type) structs — deterministic under any
    partitioning, event_id tie-break.  The path aggregate shuffles one
    short string per session; share = sessions/total is one IEEE divide
    of exact counts.  Top ``top_n`` by count (ties → path) keeps the
    report frame bounded no matter how long the tail of unique paths.
    """
    sess = sessionize_events(events, gap_minutes)
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    paths = (
        sess.selectExpr(
            "user_id", "session_id",
            f"struct({us} AS o, event_id, event_type) AS e",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.expr(
                "array_join(transform(sort_array(collect_list(e)),"
                " x -> x.event_type), '>')"
            ).alias("path")
        )
    )
    total = paths.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "path",
            "n_sessions",
            "CAST(n_sessions AS DOUBLE) / n_total AS share",
            "CASE WHEN path LIKE '%purchase%' THEN true ELSE false END AS converting",
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(int(top_n))
    )


def cohort_ltv(events: DataFrame) -> DataFrame:
    """Weekly cohort LTV curves: users grouped by first-activity week,
    with per-week-offset purchase revenue and the CUMULATIVE revenue per
    cohort user — the money companion to
    :func:`events_cohort_retention` (retention says who came back, LTV
    says what they were worth by age N).

    One user-key shuffle assigns cohorts (min week rides the same
    aggregate as the revenue events via a join on the per-user frame);
    revenue sums are decimal(25,6) end to end INCLUDING the cumulative
    window (exact running sums — no float accumulation across offsets);
    ltv_per_user is one IEEE divide per output cell.  The matrix is
    calendar-bounded, so the cumulative window runs on a tiny frame.

    Output: cohort_week, week_offset, n_cohort_users, revenue,
    cum_revenue, cum_ltv_per_user — ordered.
    """
    dec = "decimal(25,6)"
    first = (
        events.select("user_id", F.date_trunc("week", F.col("ts")).alias("aw"))
        .groupBy("user_id")
        .agg(F.min("aw").alias("cw"))
    )
    cohort_sizes = first.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort_users")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).alias("aw"),
        F.col("value").cast(dec).alias("v"),
    )
    cells = (
        purchases.join(first, "user_id")
        .selectExpr(
            "cw",
            "CAST(datediff(CAST(aw AS DATE), CAST(cw AS DATE)) DIV 7 AS INT)"
            " AS week_offset",
            "v",
        )
        .groupBy("cw", "week_offset")
        .agg(F.sum("v").alias("revenue"))
    )
    w = (
        Window.partitionBy("cw")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn("cum_revenue", F.sum("revenue").over(w))
        .join(F.broadcast(cohort_sizes), "cw")
        .selectExpr(
            "date_format(cw, 'yyyy-MM-dd') AS cohort_week",
            "week_offset",
            "n_cohort_users",
            "CAST(revenue AS DOUBLE) AS revenue",
            "CAST(cum_revenue AS DOUBLE) AS cum_revenue",
            "CAST(cum_revenue AS DOUBLE) / n_cohort_users AS cum_ltv_per_user",
        )
        .orderBy("cohort_week", "week_offset")
    )


def supplier_lead_time(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Operational lead-time profile per supplier: ship lag (days from
    order date to line ship date) summarized as count, exact integer-sum
    mean, and exact p50/p90 (ceil-rank convention, deterministic
    tie-break on order/line keys) — the supplier-scorecard query behind
    'who is slow, and how slow at the tail?'.

    Lag is whole-day integer arithmetic; the mean is one IEEE divide of
    exact sums; the percentile pick is a per-supplier row_number (the
    orderkey join shuffles on o_orderkey; the window re-shuffles on
    supplier — two shuffles of 3-int rows total, no text, no
    approximation).  At 100 TB the exact window trades against the
    mergeable histogram store (events_quantiles_histogram) — this is the
    exact-per-key form, right while |suppliers| × lines-per-supplier
    stays window-friendly.
    """
    lags = lineitem.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate"
    ).join(
        orders.selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        "l_orderkey",
    ).selectExpr(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS lag_days",
    )
    counts = lags.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("lag_days").cast("long").alias("lag_sum"),
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        "lag_days", "l_orderkey", "l_linenumber"
    )
    ranked = lags.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(counts), "l_suppkey"
    )
    return (
        ranked.groupBy("l_suppkey")
        .agg(
            F.max("n_lines").alias("n_lines"),
            F.max("lag_sum").alias("lag_sum"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.greatest(F.lit(1), F.ceil(F.col("n_lines") * 0.5)),
                    F.col("lag_days"),
                )
            ).alias("p50_days"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.greatest(F.lit(1), F.ceil(F.col("n_lines") * 0.9)),
                    F.col("lag_days"),
                )
            ).alias("p90_days"),
        )
        .selectExpr(
            "l_suppkey AS suppkey",
            "n_lines",
            "CAST(lag_sum AS DOUBLE) / n_lines AS mean_days",
            "CAST(p50_days AS INT) AS p50_days",
            "CAST(p90_days AS INT) AS p90_days",
        )
        .orderBy("suppkey")
    )
