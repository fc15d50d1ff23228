"""Core consolidation tests — mirrors the reference's own unit fixtures
(/root/reference/internal/etl/test/transformer_test.go) plus the fusion and
edge cases the reference never covered (FIXTURES.md §5).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators.transform import (
    conform_ads,
    conform_crm,
    filter_since,
    transform,
)
from admira_etl_project_prueba_spark.schemas import ADS_SCHEMA, CRM_PARSED_SCHEMA

INGESTED = dt.datetime(2024, 1, 5, 12, 0, 0)


def ads_row(**kw):
    base = dict(
        date="2024-01-01",
        campaign_id="C-1001",
        channel="google_ads",
        clicks=100,
        impressions=5000,
        cost=50.0,
        utm_campaign="test_campaign",
        utm_source="google",
        utm_medium="cpc",
        ingested_at=INGESTED,
    )
    base.update(kw)
    return base


def crm_row(**kw):
    base = dict(
        opportunity_id="O-9001",
        contact_email="a@b.c",
        stage="lead",
        amount=0.0,
        utm_campaign="test_campaign",
        utm_source="google",
        utm_medium="cpc",
        ingested_at=INGESTED,
        created_at_raw="2024-01-01T10:00:00Z",
        created_at=dt.datetime(2024, 1, 1, 10, 0, 0),
        _date_fallback=False,
    )
    base.update(kw)
    return base


def make_ads(spark, rows):
    return spark.createDataFrame([tuple(r[f.name] for f in ADS_SCHEMA.fields) for r in rows], ADS_SCHEMA)


def make_crm(spark, rows):
    return spark.createDataFrame(
        [tuple(r[f.name] for f in CRM_PARSED_SCHEMA.fields) for r in rows], CRM_PARSED_SCHEMA
    )


def by_key(result):
    return {
        (r["date"], r["channel"], r["campaign_id"], r["utm_campaign"],
         r["utm_source"], r["utm_medium"]): r
        for r in (row.asDict() for row in result.collect())
    }


def test_cross_source_fusion(spark):
    """Ads + CRM with matching (date, channel, UTM triple) fuse into ONE
    metrics row — the semantics transformer_test.go accidentally fails to
    exercise (its CRM rows use time.Now() so keys never collide)."""
    ads = make_ads(spark, [ads_row()])
    crm = make_crm(
        spark,
        [
            crm_row(),  # lead
            crm_row(opportunity_id="O-9002", stage="closed_won", amount=1000.0),
        ],
    )
    out = by_key(transform(ads, crm))
    # CRM rows infer channel google→google_ads but campaign_id="" ⇒ 2 keys
    assert len(out) == 2
    ads_key = ("2024-01-01", "google_ads", "C-1001", "test_campaign", "google", "cpc")
    crm_key = ("2024-01-01", "google_ads", "", "test_campaign", "google", "cpc")
    a, c = out[ads_key], out[crm_key]
    assert a["clicks"] == 100 and a["impressions"] == 5000 and a["cost"] == 50.0
    assert a["cpc"] == pytest.approx(0.5)
    assert c["leads"] == 1 and c["closed_won"] == 1 and c["revenue"] == 1000.0
    assert c["cpa"] == 0.0  # cost 0 / leads 1 ⇒ 0/1 = 0
    assert c["cvr_opp_to_won"] == 0.0  # opportunities == 0 ⇒ guard ⇒ 0


def test_reference_unit_fixture_semantics(spark):
    """transformer_test.go:10-77 reproduced with pinned dates so both rows
    land on one fused key (FIXTURES.md §5): clicks=100, cost=50, leads=1,
    closed_won=1, revenue=1000, cpc=0.5, cpa=50, roas=20."""
    ads = make_ads(spark, [ads_row(campaign_id="")])  # align campaign_id with CRM
    crm = make_crm(
        spark,
        [
            crm_row(),
            crm_row(opportunity_id="O-9002", stage="closed_won", amount=1000.0),
        ],
    )
    out = by_key(transform(ads, crm))
    assert len(out) == 1
    r = next(iter(out.values()))
    assert r["clicks"] == 100
    assert r["cost"] == 50.0
    assert r["leads"] == 1
    assert r["closed_won"] == 1
    assert r["revenue"] == 1000.0
    assert r["cpc"] == pytest.approx(0.5)
    assert r["cpa"] == pytest.approx(50.0)
    assert r["cvr_lead_to_opp"] == 0.0  # zero opportunities
    assert r["roas"] == pytest.approx(20.0)


def test_measure_accumulation_same_key(spark):
    """Two ads rows sharing the full 6-key SUM together (transformer.go:58-62)."""
    ads = make_ads(spark, [ads_row(), ads_row(clicks=50, impressions=1000, cost=25.5)])
    crm = make_crm(spark, [])
    out = by_key(transform(ads, crm))
    assert len(out) == 1
    r = next(iter(out.values()))
    assert r["clicks"] == 150 and r["impressions"] == 6000
    assert r["cost"] == pytest.approx(75.5)


def test_unknown_stage_creates_zero_row(spark):
    """Unknown CRM stage contributes nothing but still creates the key's row
    (transformer.go:105-127)."""
    crm = make_crm(spark, [crm_row(stage="prospect", amount=123.0)])
    out = by_key(transform(make_ads(spark, []), crm))
    assert len(out) == 1
    r = next(iter(out.values()))
    assert r["leads"] == 0 and r["opportunities"] == 0 and r["closed_won"] == 0
    assert r["revenue"] == 0.0 and r["cost"] == 0.0


def test_amount_only_counts_when_closed_won(spark):
    crm = make_crm(
        spark,
        [
            crm_row(stage="lead", amount=500.0),          # amount ignored
            crm_row(opportunity_id="O-2", stage="opportunity", amount=700.0),
        ],
    )
    out = by_key(transform(make_ads(spark, []), crm))
    r = next(iter(out.values()))
    assert r["revenue"] == 0.0
    assert r["leads"] == 1 and r["opportunities"] == 1


def test_channel_inference_default_branch(spark):
    """utm_source outside the 4-arm switch ⇒ '{source}_{medium}'
    (transformer.go:26-28)."""
    crm = make_crm(spark, [crm_row(utm_source="newsletter", utm_medium="email")])
    out = by_key(transform(make_ads(spark, []), crm))
    (key,) = out.keys()
    assert key[1] == "newsletter_email"


def test_date_fallback_routes_by_ingested_at(spark):
    """Unparseable created_at ⇒ deterministic routing by ingested_at day
    (SURVEY.md §7 decision 3)."""
    crm = make_crm(
        spark,
        [crm_row(created_at_raw="not-a-date", created_at=None, _date_fallback=True)],
    )
    out = by_key(transform(make_ads(spark, []), crm))
    (key,) = out.keys()
    assert key[0] == "2024-01-05"  # INGESTED day, not today


def test_filter_since_inclusive_boundary(spark):
    """transformer_test.go:79-95: 3 days, since=middle ⇒ 2 rows (inclusive)."""
    ads = make_ads(
        spark,
        [ads_row(date="2024-01-01"), ads_row(date="2024-01-02"), ads_row(date="2024-01-03")],
    )
    out = transform(ads, make_crm(spark, []), since="2024-01-02")
    dates = sorted(r["date"] for r in out.collect())
    assert dates == ["2024-01-02", "2024-01-03"]


def test_filter_since_drops_malformed_dates(spark):
    """Unparseable fact dates are silently dropped by the since-filter
    (transformer.go:189-191)."""
    ads = make_ads(spark, [ads_row(date="garbage"), ads_row(date="2024-01-02")])
    out = transform(ads, make_crm(spark, []), since="2024-01-01")
    assert [r["date"] for r in out.collect()] == ["2024-01-02"]


def test_since_filter_runs_after_aggregation(spark):
    """Pre-since source rows DO enter the aggregation; whole consolidated
    rows are then dropped (handlers.go dataflow order, SURVEY.md §3.1)."""
    ads = make_ads(spark, [ads_row(date="2024-01-01"), ads_row(date="2024-01-02")])
    out = transform(ads, make_crm(spark, []), since="2024-01-02")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["clicks"] == 100  # not merged across dates


def test_divide_by_zero_guards(spark):
    """All 5 ratios are 0.0 (not NULL/Inf) when denominators are 0 (F12)."""
    ads = make_ads(spark, [ads_row(clicks=0, cost=0.0)])
    out = transform(ads, make_crm(spark, []))
    r = out.collect()[0]
    for c in ("cpc", "cpa", "cvr_lead_to_opp", "cvr_opp_to_won", "roas"):
        assert r[c] == 0.0, c


def test_plan_is_single_shuffle_hash_agg(spark):
    """The consolidation plan must be partial+final HashAggregate with ONE
    exchange — the scale-critical property (SURVEY.md §2.4 A1)."""
    ads = make_ads(spark, [ads_row()])
    crm = make_crm(spark, [crm_row()])
    plan = transform(ads, crm)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "HashAggregate" in plan


def test_read_jsonl_audited_splits_clean_and_corrupt(spark, tmp_path):
    """Malformed dump lines are quarantined with their raw text; clean rows
    parse typed; nothing is silently dropped."""
    from admira_etl_project_prueba_spark.sources.sinks import read_jsonl_audited

    p = tmp_path / "dump"
    p.mkdir()
    lines = [
        '{"doc_id": 1, "text": "good row"}',
        'not json at all',
        '{"doc_id": 3, "text": "another good"}',
        '{"doc_id": "NaN-ish", "text": "type mismatch"}',
        '{truncated',
    ]
    (p / "a.jsonl").write_text("\n".join(lines) + "\n")

    clean, corrupt = read_jsonl_audited(
        spark, str(p), "doc_id long, text string"
    )
    got = {(r["doc_id"], r["text"]) for r in clean.collect()}
    assert got == {(1, "good row"), (3, "another good")}
    bad = [r["raw_line"] for r in corrupt.collect()]
    assert len(bad) == 3 and all(b in "\n".join(lines) for b in bad)
    assert clean.count() + corrupt.count() == len(lines)


def test_k_anonymity_audit_counts_violators(spark):
    """Planted classes: sizes and violation flags exact; record counts
    partition the input."""
    from admira_etl_project_prueba_spark.operators.profile import k_anonymity_audit

    rows = (
        [("a", 1)] * 7      # one class of 7 (safe at k=5)
        + [("b", 1)] * 3    # class of 3 (violates)
        + [("c", 2)] * 3    # another class of 3 (violates)
        + [("d", 9)]        # singleton (violates)
    )
    df = spark.createDataFrame(rows, ["q1", "q2"])
    got = {r["class_size"]: r for r in k_anonymity_audit(df, ["q1", "q2"], k=5).collect()}
    assert got[7]["n_classes"] == 1 and not got[7]["violates_k"]
    assert got[3]["n_classes"] == 2 and got[3]["violates_k"]
    assert got[1]["n_classes"] == 1 and got[1]["violates_k"]
    assert sum(r["n_records"] for r in got.values()) == len(rows)


def test_quality_observation_rides_the_action(spark):
    """Observation counters match direct computation and cost no second
    scan — metrics available right after the ONE action."""
    from pyspark.sql import functions as F

    from admira_etl_project_prueba_spark.operators.profile import (
        with_quality_observation,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")], ["k", "s"]
    )
    observed, obs = with_quality_observation(df, ["s", "k"])
    out = observed.filter(F.col("k") > 1).count()  # the caller's own action
    assert out == 4
    got = obs.get
    # observe() sits ABOVE the source: counts reflect the full frame even
    # though the action filtered afterward
    assert got["n_rows"] == 5
    assert got["n_null_s"] == 2
    assert got["n_null_k"] == 0
