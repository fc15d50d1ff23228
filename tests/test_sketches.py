"""Mergeable HyperLogLog: accuracy bounds, merge algebra, small-range path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators import sketches as sk
from admira_etl_project_prueba_spark.sources.tables import load_events


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """Corrected estimate lands within 3 standard errors (3 * 1.04/sqrt(512)).

    sf0.001 has ~1.5k users per type — inside the n <= 2.5m biased regime
    where linear counting takes over, so the CORRECTED path is the one
    with the published error bound (the raw path is oracle-gated instead).
    """
    ev = load_events(spark, sf_dir)
    est = {
        r["event_type"]: r["est_distinct"]
        for r in sk.hll_distinct(
            ev, "user_id", ["event_type"], correct_small=True
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    bound = 3 * 1.04 / math.sqrt(sk.M)
    for t, n in exact.items():
        assert abs(est[t] - n) / n <= bound, (t, est[t], n)


def test_hll_merge_is_associative_and_idempotent(spark, sf_dir):
    """Merging day-sliced sketches == sketching directly; re-merge is a no-op."""
    ev = load_events(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    direct = sk.hll_registers(ev, "user_id", ["event_type"])
    daily = sk.hll_registers(ev, "user_id", ["event_type", "day"])
    merged = sk.hll_merge(daily, ["event_type"])
    remerged = sk.hll_merge(merged, ["event_type"])
    d = {(r["event_type"], r["bucket"]): r["register"] for r in direct.collect()}
    m = {(r["event_type"], r["bucket"]): r["register"] for r in merged.collect()}
    r2 = {(r["event_type"], r["bucket"]): r["register"] for r in remerged.collect()}
    assert d == m == r2
    assert len(d) == direct.select("event_type").distinct().count() * sk.M


def test_hll_small_range_correction_tightens_low_cardinality(spark):
    """At n=30 << m=512 the linear-counting branch is near-exact; the raw
    estimate, biased low-cardinality, must not beat it."""
    df = spark.range(30).select(
        F.lit("g").alias("g"), (F.col("id") * 7919).alias("uid")
    )
    corrected = sk.hll_distinct(df, "uid", ["g"], correct_small=True).collect()[0]
    raw = sk.hll_distinct(df, "uid", ["g"], correct_small=False).collect()[0]
    assert abs(corrected["est_distinct"] - 30) <= 2
    assert abs(corrected["est_distinct"] - 30) <= abs(raw["est_distinct"] - 30)
    assert corrected["n_empty_buckets"] >= sk.M - 30


def test_hll_registers_are_dense_and_bounded(spark):
    """Every (group, bucket) cell present; registers within [0, W+1]."""
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("uid")
    )
    regs = sk.hll_registers(df, "uid", ["g"]).collect()
    assert len(regs) == 3 * sk.M
    assert all(0 <= r["register"] <= sk.W + 1 for r in regs)
    # ungrouped variant: one dense sketch
    flat = sk.hll_registers(df, "uid").collect()
    assert len(flat) == sk.M
