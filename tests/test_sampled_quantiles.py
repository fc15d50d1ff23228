"""Parity-tolerance contract for the scale-safe sampled quantile modes.

Every global-window quantile operator (`exact=True`, the DuckDB oracle
form) has a sampled twin (`exact=False`): approx_percentile edges + a
1-row broadcast + row-local assignment — no `Exchange SinglePartition`
sort anywhere in the plan.  These tests pin BOTH halves of that claim:

* parity — sampled buckets/percentiles track the exact ones within the
  documented tolerance (exact agreement on tie-free data, ±1 bucket
  where ntile's equal-size tie splitting differs from range assignment,
  ~1/n + grid error on cdf estimates);
* plans — the sampled plans carry ZERO un-bounded single-partition
  sorts (tools/plan_audit.single_partition_sort_hits), while each exact
  twin carries the one the allowlist documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from admira_etl_project_prueba_spark.functions.quantiles import (
    with_sampled_buckets,
)
from admira_etl_project_prueba_spark.operators import analytics, textops
from admira_etl_project_prueba_spark.sources.tables import load_events, load_table
from tools.plan_audit import single_partition_sort_hits


def _events(spark, sf_dir):
    return load_events(spark, sf_dir)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sampled_buckets_equal_exact_ntile_on_tiefree_data(spark):
    # 1000 distinct values, accuracy 10k ⇒ the sketch edges are exact and
    # range assignment equals ntile bucket-for-bucket
    df = spark.range(1000).selectExpr("id", "CAST(id * 7 % 1000 AS DOUBLE) AS v")
    from pyspark.sql import Window

    exact = df.select(
        "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("b_exact")
    )
    sampled = with_sampled_buckets(df, [("b", "v", False)], 4).select("id", "b")
    j = exact.join(sampled, "id")
    assert j.filter("b != b_exact").count() == 0
    # descending orientation mirrors exactly too
    exact_d = df.select(
        "id", F.ntile(4).over(Window.orderBy(F.desc("v"), "id")).alias("b_exact")
    )
    sampled_d = with_sampled_buckets(df, [("b", "v", True)], 4).select("id", "b")
    assert exact_d.join(sampled_d, "id").filter("b != b_exact").count() == 0


def test_user_value_quartiles_sampled_parity(spark, sf_dir):
    ev = _events(spark, sf_dir)
    ex = analytics.user_value_quartiles(ev, exact=True).selectExpr("user_id", "quartile AS qe")
    ap = analytics.user_value_quartiles(ev, exact=False)
    assert ap.columns == ["user_id", "total_value", "quartile"]
    j = ex.join(ap.selectExpr("user_id", "quartile AS qa"), "user_id")
    n = j.count()
    assert n > 0 and n == ap.count()
    assert j.filter("abs(qe - qa) > 1").count() == 0
    assert j.filter("qe = qa").count() >= 0.8 * n


def test_user_rfm_segments_sampled_parity(spark, sf_dir):
    ev = _events(spark, sf_dir)
    ex = analytics.user_rfm_segments(ev, exact=True).selectExpr(
        "user_id", "r_score AS re", "f_score AS fe", "m_score AS me"
    )
    ap = analytics.user_rfm_segments(ev, exact=False)
    assert ap.columns == [
        "user_id", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score", "segment",
    ]
    j = ex.join(
        ap.selectExpr(
            "user_id", "r_score AS ra", "f_score AS fa", "m_score AS ma",
            "segment",
        ),
        "user_id",
    )
    assert j.count() == ex.count()
    # ties (small-int frequencies) shift boundary rows at most one bucket
    assert j.filter(
        "abs(re - ra) > 1 OR abs(fe - fa) > 1 OR abs(me - ma) > 1"
    ).count() == 0
    assert j.filter("segment != concat(ra, fa, ma)").count() == 0


def test_curriculum_stages_sampled_parity(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ex = textops.curriculum_stages(docs, exact=True).selectExpr("doc_id", "stage AS se")
    ap = textops.curriculum_stages(docs, exact=False)
    assert ap.columns == ["doc_id", "source", "n_tokens", "stage"]
    j = ex.join(ap.selectExpr("doc_id", "stage AS sa"), "doc_id")
    n = j.count()
    assert n > 0
    assert j.filter("abs(se - sa) > 1").count() == 0
    assert j.filter("se = sa").count() >= 0.9 * n


def test_quality_calibrated_sampled_parity(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ex = textops.quality_calibrated(docs, exact=True)
    ap = textops.quality_calibrated(docs, exact=False)
    assert ap.columns == ex.columns
    j = ex.selectExpr("doc_id", "q_pct_global AS ge", "q_pct_source AS se").join(
        ap.selectExpr("doc_id", "q_pct_global AS ga", "q_pct_source AS sa"),
        "doc_id",
    )
    row = j.selectExpr(
        "max(abs(ge - ga)) AS gmax", "max(abs(se - sa)) AS smax", "count(*) AS n"
    ).first()
    assert row["n"] > 0
    # 99-edge grid cdf: ±1 centile + sketch error
    assert row["gmax"] <= 0.05
    # the per-source window is IDENTICAL in both modes
    assert row["smax"] == 0.0


def test_supplier_revenue_distribution_sampled_parity(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    ex = analytics.supplier_revenue_distribution(sup, li, exact=True).selectExpr(
        "s_suppkey", "pct_rank AS pe", "cume AS ce"
    )
    ap = analytics.supplier_revenue_distribution(sup, li, exact=False)
    assert ap.columns == ["s_suppkey", "s_name", "revenue", "pct_rank", "cume"]
    j = ex.join(ap.selectExpr("s_suppkey", "pct_rank AS pa", "cume AS ca"),
                "s_suppkey")
    row = j.selectExpr(
        "max(abs(pe - pa)) AS pmax", "max(abs(ce - ca)) AS cmax",
        "count(*) AS n",
    ).first()
    n = row["n"]
    assert n > 0
    # grid cdf error is ~1 grid cell + the 1/(n-1) vs 1/n scale seam —
    # dominated by 1/n on small supplier counts
    tol = max(0.03, 2.0 / n)
    assert row["pmax"] <= tol and row["cmax"] <= tol


_SAMPLED = [
    ("user_value_quartiles_sampled", "user_value_quartiles"),
    ("user_rfm_segments_sampled", "user_rfm_segments"),
    ("curriculum_stages_sampled", "curriculum_stages"),
    ("quality_calibrated_sampled", "quality_calibrated"),
    ("supplier_revenue_distribution_sampled", "supplier_revenue_distribution"),
]


@pytest.mark.parametrize("sampled,exact", _SAMPLED)
def test_sampled_plan_has_no_single_partition_sort(spark, sf_dir, sampled, exact):
    from admira_etl_project_prueba_spark.plans.catalog import CATALOG

    plan_s = (
        CATALOG[sampled].fn(spark, sf_dir)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert single_partition_sort_hits(plan_s) == []
    plan_e = (
        CATALOG[exact].fn(spark, sf_dir)._jdf.queryExecution()
        .executedPlan().toString()
    )
    # the exact twin is exactly the anti-pattern the detector exists for
    assert len(single_partition_sort_hits(plan_e)) >= 1


def test_bare_default_calls_are_scale_safe(spark, sf_dir):
    """The round-8 contract: a BARE call to every quantile-family
    operator (no ``exact`` argument) must get the sampled, scale-safe
    plan — zero un-bounded single-partition sorts.  The exact
    single-partition form is opt-in (``exact=True``) and survives only
    as the DuckDB-oracle twin in the catalog."""
    ev = _events(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    bare = {
        "user_value_quartiles": analytics.user_value_quartiles(ev),
        "user_rfm_segments": analytics.user_rfm_segments(ev),
        "supplier_revenue_distribution":
            analytics.supplier_revenue_distribution(sup, li),
        "curriculum_stages": textops.curriculum_stages(docs),
        "quality_calibrated": textops.quality_calibrated(docs),
    }
    for name, df in bare.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert single_partition_sort_hits(plan) == [], name


def test_top_users_plan_is_take_ordered(spark, sf_dir):
    t = analytics.top_users_by_value(_events(spark, sf_dir))
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the k-row rank window is limit-bounded, not a global sort
    assert single_partition_sort_hits(plan) == []
