"""Mergeable fixed-grid histogram → quantile store: merge algebra,
error bounds, clamping, and replay-safe streaming maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators import sketches as sk
from admira_etl_project_prueba_spark.sources.tables import load_events


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double")


def test_histogram_merge_equals_rebuild(spark, sf_dir, tmp_path):
    """Folding day slices into the store == one histogram over the union,
    bit-identically (integer-additive sufficient statistic)."""
    ev = load_events(spark, sf_dir).select("event_type", "value", "event_id")
    a = ev.filter("event_id % 3 = 0")
    b = ev.filter("event_id % 3 = 1")
    c = ev.filter("event_id % 3 = 2")
    path = str(tmp_path / "hist_store")
    sk.write_histogram_store(a, path)
    sk.merge_histogram_store(spark, path, b)
    sk.merge_histogram_store(spark, path, c)
    merged = {
        (r["event_type"], r["bin"]): r["n"]
        for r in spark.read.parquet(path).collect()
    }
    rebuilt = {
        (r["event_type"], r["bin"]): r["n"]
        for r in sk.value_histogram(ev).collect()
    }
    assert merged == rebuilt


def test_histogram_quantiles_within_one_bin_width(spark, sf_dir):
    """Every estimate lands within one bin width (2.0) of the exact
    per-type percentile with the same ceil-rank convention."""
    ev = load_events(spark, sf_dir)
    qs = (0.5, 0.9, 0.99)
    est = {
        (r["event_type"], r["q"]): r["estimate"]
        for r in sk.histogram_quantiles(sk.value_histogram(ev), qs).collect()
    }
    vals = {}
    for row in ev.select("event_type", "value").collect():
        vals.setdefault(row["event_type"], []).append(row["value"])
    import math

    for et, xs in vals.items():
        xs.sort()
        for q in qs:
            exact = xs[max(1, math.ceil(q * len(xs))) - 1]
            assert abs(est[(et, q)] - exact) <= 2.0 + 1e-9, (et, q)


def test_histogram_clamps_out_of_domain_values(spark):
    d = _ev(spark, [("t", -5.0), ("t", 0.5), ("t", 511.9), ("t", 9999.0)])
    hist = {r["bin"]: r["n"] for r in sk.value_histogram(d).collect()}
    # -5.0 clamps into bin 0 with 0.5; 9999 clamps into the last bin with 511.9
    assert hist == {0: 2, 255: 2}


def test_histogram_quantiles_exact_on_point_mass(spark):
    """All mass in one bin: every quantile interpolates inside that bin."""
    d = _ev(spark, [("t", 10.5)] * 100)
    out = {
        r["q"]: r
        for r in sk.histogram_quantiles(sk.value_histogram(d), (0.5, 0.99)).collect()
    }
    for q, r in out.items():
        assert r["bin"] == 5
        assert 10.0 <= r["estimate"] <= 12.0
        assert r["total"] == 100


def test_stream_value_histogram_replay_safe(spark, tmp_path):
    """Streamed store == batch histogram; re-streaming the same input with
    a FRESH checkpoint (an at-least-once replay of every batch) leaves the
    read-time fold unchanged (batch-keyed deltas overwrite, never add)."""
    from admira_etl_project_prueba_spark.streaming.ingest import (
        read_histogram_store,
        stream_value_histogram,
    )

    src = tmp_path / "hist_in"
    src.mkdir()
    rows = [("click", 1.0), ("click", 3.5), ("view", 100.2), ("view", 1.0)]
    with open(src / "a.csv", "w") as fh:
        for et, v in rows:
            fh.write(f"{et},{v}\n")

    def run(ckpt):
        stream = spark.readStream.schema("event_type string, value double").csv(
            str(src)
        )
        q = stream_value_histogram(
            stream, str(tmp_path / "store"), str(tmp_path / ckpt)
        )
        q.awaitTermination(120)

    run("ckpt1")
    first = {
        (r["event_type"], r["bin"]): r["n"]
        for r in read_histogram_store(spark, str(tmp_path / "store")).collect()
    }
    batch = {
        (r["event_type"], r["bin"]): r["n"]
        for r in sk.value_histogram(_ev(spark, rows)).collect()
    }
    assert first == batch
    run("ckpt2")  # full replay under a new checkpoint: same batch ids rewrite
    second = {
        (r["event_type"], r["bin"]): r["n"]
        for r in read_histogram_store(spark, str(tmp_path / "store")).collect()
    }
    assert second == batch
