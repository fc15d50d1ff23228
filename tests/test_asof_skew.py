"""Tests for the as-of join (union-window plan) and salted aggregation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators.asof import asof_join
from admira_etl_project_prueba_spark.operators.skew import (
    replicate_broadcast_for_salt,
    salted_sum_agg,
)


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        [
            ("A", ts(9), 100.0),
            ("A", ts(11), 110.0),
            ("B", ts(10), 50.0),
        ],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", ts(8), 1),    # before any quote
            ("A", ts(10), 2),   # after 9:00 quote
            ("A", ts(11), 3),   # exactly at 11:00 quote
            ("A", ts(12), 4),   # after 11:00 quote
            ("B", ts(23), 5),
        ],
        "sym string, tts timestamp, qty int",
    )
    return trades, quotes


def result_map(out):
    return {r["qty"]: r["px_asof"] for r in out.collect()}


def test_asof_non_strict(spark, frames):
    trades, quotes = frames
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
                    right_payload=["px"])
    got = result_map(out)
    assert got[1] is None          # nothing known yet
    assert got[2] == 100.0
    assert got[3] == 110.0         # same-instant quote IS visible
    assert got[4] == 110.0
    assert got[5] == 50.0


def test_asof_strict(spark, frames):
    trades, quotes = frames
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
                    right_payload=["px"], strict=True)
    got = result_map(out)
    assert got[3] == 100.0         # same-instant quote NOT visible
    assert got[4] == 110.0


def test_asof_plan_single_shuffle(spark, frames):
    """The union-window as-of must shuffle ONCE on the key — the property
    that makes it linear at 100 TB (vs the quadratic range-join shape)."""
    trades, quotes = frames
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
                    right_payload=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_salted_sum_matches_plain(spark, sf_dir):
    from admira_etl_project_prueba_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir).withColumn(
        "v", F.col("value").cast("decimal(25,6)")
    )
    plain = {
        (r["event_type"],): (r["s"], r["c"])
        for r in ev.groupBy("event_type")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = salted_sum_agg(ev, keys=["event_type"], sums=["v"], counts=["v"])
    got = {
        (r["event_type"],): (r["v"], r["v_count"]) for r in salted.collect()
    }
    assert got == plain            # decimal sums ⇒ exact equality


def test_replicated_broadcast_join_covers_all_salts(spark):
    dim = spark.createDataFrame([("x", 1), ("y", 2)], "k string, attr int")
    rep = replicate_broadcast_for_salt(dim, salt_n=4)
    assert rep.count() == 8
    big = spark.createDataFrame(
        [("x", s, 10) for s in range(4)], "k string, _salt int, v int"
    )
    j = big.join(F.broadcast(rep), ["k", "_salt"])
    assert j.count() == 4 and j.filter("attr = 1").count() == 4


def test_interval_bin_join_boundaries_and_spans(spark):
    """start inclusive, end exclusive, intervals spanning bin boundaries,
    overlapping intervals multi-match — and parity with the naive
    non-equi join."""
    from admira_etl_project_prueba_spark.operators.asof import interval_bin_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00"), (2, "2024-01-02 11:59:59"),
         (3, "2024-01-02 12:00:00"), (4, "2024-01-05 03:00:00")],
        "id long, ts_s string",
    ).selectExpr("id", "CAST(ts_s AS timestamp) AS ts")
    ivs = spark.createDataFrame(
        [("w1", "2024-01-01 12:00:00", "2024-01-02 12:00:00"),   # crosses midnight
         ("w2", "2024-01-02 00:00:00", "2024-01-03 00:00:00")],  # overlaps w1
        "name string, s_s string, e_s string",
    ).selectExpr("name", "CAST(s_s AS timestamp) AS s", "CAST(e_s AS timestamp) AS e")

    got = {
        (r["id"], r["name"])
        for r in interval_bin_join(left, ivs, "ts", "s", "e", bin_hours=24).collect()
    }
    naive = {
        (r["id"], r["name"])
        for r in left.join(ivs, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))).collect()
    }
    assert got == naive == {(1, "w1"), (2, "w1"), (2, "w2"), (3, "w2")}


def test_interval_bin_join_is_hash_join_not_nested_loop(spark):
    from admira_etl_project_prueba_spark.operators.asof import interval_bin_join

    left = spark.range(100).selectExpr(
        "id", "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP '2024-01-01 00:00:00') AS ts"
    )
    ivs = spark.createDataFrame(
        [("w", "2024-01-02 06:00:00", "2024-01-03 06:00:00")],
        "name string, s_s string, e_s string",
    ).selectExpr("name", "CAST(s_s AS timestamp) AS s", "CAST(e_s AS timestamp) AS e")
    df = interval_bin_join(left, ivs, "ts", "s", "e", bin_hours=24)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert df.count() == 24
