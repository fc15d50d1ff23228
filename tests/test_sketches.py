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


def test_bloom_no_false_negatives_and_prefilter_payoff(spark, sf_dir):
    """Every actually-seen item flags maybe_seen (no false negatives);
    the prefilter passes only a small superset of the true positives."""
    from admira_etl_project_prueba_spark.plans.catalog import CATALOG

    rows = CATALOG["bloom_dedup_prefilter"].fn(spark, sf_dir).collect()
    assert rows
    fp = sum(1 for r in rows if r["maybe_seen"] and not r["actually_seen"])
    for r in rows:
        if r["actually_seen"]:
            assert r["maybe_seen"], r
    n_unseen = sum(1 for r in rows if not r["actually_seen"])
    # 8192-bit filter vs ~70 seen hashes: fill ~3%, fp ~ fill^4 — tiny.
    # Bound loosely: the prefilter must eliminate >90% of unseen docs.
    assert fp <= 0.1 * max(n_unseen, 1), (fp, n_unseen)


def test_bloom_union_is_distinct_union(spark):
    """Merging blooms = union-distinct of position frames; probing the
    merged filter sees members of both parts."""
    from admira_etl_project_prueba_spark.operators import sketches as sk2
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(f"a{i}",) for i in range(20)], ["v"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(20)], ["v"])
    merged = (
        sk2.bloom_positions(a, "v")
        .unionByName(sk2.bloom_positions(b, "v"))
        .distinct()
    )
    probe = a.unionByName(b).unionByName(
        spark.createDataFrame([(f"c{i}",) for i in range(200)], ["v"])
    )
    got = {r["v"]: r["maybe_seen"] for r in sk2.bloom_maybe_contains(probe, merged, "v").collect()}
    assert all(got[f"a{i}"] for i in range(20))
    assert all(got[f"b{i}"] for i in range(20))
    # unseen probes: mostly negative (40 items in 8192 bits)
    neg = sum(1 for i in range(200) if not got[f"c{i}"])
    assert neg >= 195


def test_bloom_probe_duplicate_rows_keep_multiplicity_and_flag(spark):
    """Duplicate probe rows (the at-least-once delivery case the prefilter
    exists for) must each keep maybe_seen=true and their multiplicity —
    the regression was sum(_hit)==k collapsing dups into sum=dups*k,
    flipping seen values to false."""
    from admira_etl_project_prueba_spark.operators import sketches as sk2

    seen = spark.createDataFrame([("x",), ("y",)], ["v"])
    bloom = sk2.bloom_positions(seen, "v")
    probe = spark.createDataFrame([("x",), ("x",), ("x",), ("y",), ("z",)], ["v"])
    out = sk2.bloom_maybe_contains(probe, bloom, "v").collect()
    assert len(out) == 5  # multiplicity preserved
    by_v = {}
    for r in out:
        by_v.setdefault(r["v"], []).append(r["maybe_seen"])
    assert by_v["x"] == [True, True, True]
    assert by_v["y"] == [True]
