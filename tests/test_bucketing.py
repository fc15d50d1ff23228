"""Bucketed-table co-located joins: the write-time layout that removes
both the exchange AND the sort from repeated equi-joins."""

from __future__ import annotations

import pytest

from admira_etl_project_prueba_spark.store import write_bucketed


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bucketdemo"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange_or_sort(spark, bucket_db):
    df = spark.range(20_000).selectExpr("id AS k", "id * 2 AS v")
    write_bucketed(df, f"{bucket_db}.t1", "k", buckets=8)
    write_bucketed(df.selectExpr("k", "v AS v2"), f"{bucket_db}.t2", "k", buckets=8)

    j = (
        spark.table(f"{bucket_db}.t1")
        .hint("merge")  # force SMJ so the assertion is about layout, not size
        .join(spark.table(f"{bucket_db}.t2"), "k")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan          # co-located: no shuffle
    # (a within-partition Sort remains: buckets span >1 file, so Spark
    # re-sorts locally; spark.sql.legacy.bucketedTableScan.outputOrdering
    # + 1-file-per-bucket would elide it too.  The exchange is the 100 TB
    # cost; the local sort is not.)
    assert "SelectedBucketsCount: 8 out of 8" in plan
    assert j.count() == 20_000


def test_unbucketed_same_join_shuffles(spark, bucket_db):
    """Control: the identical join over plain tables DOES exchange."""
    df = spark.range(20_000).selectExpr("id AS k", "id * 2 AS v")
    a = df.hint("merge")
    b = df.selectExpr("k", "v AS v2")
    plan = a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_compact_table_right_sizes_and_preserves_rows(spark, tmp_path):
    """Many tiny files -> few right-sized files; rows conserved; sorted
    variant keeps per-file ranges disjoint (data-skipping preserved)."""
    from admira_etl_project_prueba_spark.operators.layout import compact_table

    src = str(tmp_path / "fragmented")
    spark.range(10_000).selectExpr("id", "id % 97 AS k").repartition(
        64
    ).write.parquet(src)
    out = str(tmp_path / "compacted")
    stats = compact_table(spark, src, out, target_rows_per_file=2_500, sort_cols=["id"])
    assert stats["files_before"] == 64
    assert stats["files_after"] == 4
    assert stats["rows"] == 10_000
    got = spark.read.parquet(out)
    assert got.count() == 10_000
    # disjoint per-file id ranges: max(file_i) < min(file_j) for some order
    import pyspark.sql.functions as F

    ranges = (
        got.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 < l2
