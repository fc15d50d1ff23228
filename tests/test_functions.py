"""Scalar function tests: flexible date parsing (F7/F8), channel inference
(F9), guarded ratios (F12), HMAC signing (F13), envelope decode (S2/S3)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.functions.channels import infer_channel
from admira_etl_project_prueba_spark.functions.dates import parse_flexible_timestamp
from admira_etl_project_prueba_spark.functions.metrics import safe_div
from admira_etl_project_prueba_spark.functions.signing import hmac_sha256_hex
from admira_etl_project_prueba_spark.sources.json_source import (
    ads_from_payload,
    crm_from_payload,
)


def parse_one(spark, raw):
    df = spark.createDataFrame([(raw,)], "raw string")
    return df.select(parse_flexible_timestamp("raw").alias("ts")).collect()[0]["ts"]


# the 8 reference layouts (crm.go:58-67) — all must parse
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2024-01-02T15:04:05Z", dt.datetime(2024, 1, 2, 15, 4, 5)),
        ("2024-01-02 15:04:05", dt.datetime(2024, 1, 2, 15, 4, 5)),
        ("2024-01-02", dt.datetime(2024, 1, 2)),
        ("2024-01-02T15:04:05+00:00", dt.datetime(2024, 1, 2, 15, 4, 5)),
        ("2024-01-02 15:04:05.000", dt.datetime(2024, 1, 2, 15, 4, 5)),
        ("2024/01/02 15:04:05", dt.datetime(2024, 1, 2, 15, 4, 5)),  # '/'→'-'
        ("  2024-01-02  ", dt.datetime(2024, 1, 2)),  # trimmed
    ],
)
def test_parse_flexible_formats(spark, raw, expected):
    assert parse_one(spark, raw) == expected


def test_parse_failure_yields_null(spark):
    assert parse_one(spark, "not-a-date") is None
    assert parse_one(spark, "") is None


@pytest.mark.parametrize(
    "source,medium,expected",
    [
        ("google", "cpc", "google_ads"),
        ("facebook", "social", "facebook_ads"),
        ("tiktok", "social", "tiktok_ads"),
        ("linkedin", "social", "linkedin_ads"),
        ("newsletter", "email", "newsletter_email"),
        ("", "", "_"),  # Go Sprintf("%s_%s","","") == "_"
    ],
)
def test_infer_channel(spark, source, medium, expected):
    df = spark.createDataFrame([(source, medium)], "s string, m string")
    got = df.select(infer_channel("s", "m").alias("c")).collect()[0]["c"]
    assert got == expected


def test_safe_div_guards(spark):
    df = spark.createDataFrame(
        [(10.0, 4.0), (10.0, 0.0), (10.0, -1.0)], "n double, d double"
    )
    got = [r["q"] for r in df.select(safe_div("n", "d").alias("q")).collect()]
    assert got == [2.5, 0.0, 0.0]


def test_hmac_signature_known_vector():
    # RFC-style check: deterministic, hex, keyed
    sig = hmac_sha256_hex("secret", b'{"a":1}')
    import hashlib, hmac as _hmac

    assert sig == _hmac.new(b"secret", b'{"a":1}', hashlib.sha256).hexdigest()
    assert len(sig) == 64


def test_ads_envelope_decode(spark):
    payload = json.dumps(
        {
            "external": {
                "ads": {
                    "performance": [
                        {
                            "date": "2024-01-01",
                            "campaign_id": "C-1001",
                            "channel": "google_ads",
                            "clicks": 10,
                            "impressions": 100,
                            "cost": 5.5,
                            "utm_campaign": "x",
                            "utm_source": "google",
                            "utm_medium": "cpc",
                        }
                    ]
                }
            }
        }
    )
    df = ads_from_payload(spark, payload, ingested_at=dt.datetime(2024, 1, 2))
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["campaign_id"] == "C-1001" and r["clicks"] == 10 and r["cost"] == 5.5
    assert r["ingested_at"] == dt.datetime(2024, 1, 2)


def test_crm_envelope_decode_mixed_dates(spark):
    rows = [
        {"opportunity_id": "O-1", "stage": "lead", "amount": 0.0,
         "created_at": "2024-01-02T10:00:00Z", "utm_campaign": "x",
         "utm_source": "google", "utm_medium": "cpc", "contact_email": "a@b.c"},
        {"opportunity_id": "O-2", "stage": "closed_won", "amount": 10.0,
         "created_at": "2024/01/03", "utm_campaign": "x",
         "utm_source": "google", "utm_medium": "cpc", "contact_email": "a@b.c"},
        {"opportunity_id": "O-3", "stage": "lead", "amount": 0.0,
         "created_at": "garbage", "utm_campaign": "x",
         "utm_source": "google", "utm_medium": "cpc", "contact_email": "a@b.c"},
    ]
    payload = json.dumps({"external": {"crm": {"opportunities": rows}}})
    df = crm_from_payload(spark, payload, ingested_at=dt.datetime(2024, 1, 5))
    got = {r["opportunity_id"]: r for r in df.collect()}
    assert got["O-1"]["created_at"] == dt.datetime(2024, 1, 2, 10, 0, 0)
    assert got["O-2"]["created_at"] == dt.datetime(2024, 1, 3)
    assert got["O-3"]["created_at"] is None and got["O-3"]["_date_fallback"]


def test_partial_envelopes_decode_to_go_zero_values(spark):
    """Missing JSON fields must decode like Go's unmarshal (zero values),
    so partial rows land on the reference's group keys ("" not NULL) and
    sums see 0 not NULL."""
    import json

    from admira_etl_project_prueba_spark.operators.transform import transform
    from admira_etl_project_prueba_spark.sources.json_source import (
        ads_from_payload,
        crm_from_payload,
    )

    ads_payload = json.dumps(
        {"external": {"ads": {"performance": [
            {"date": "2024-01-01", "clicks": 5},            # most fields absent
        ]}}}
    )
    crm_payload = json.dumps(
        {"external": {"crm": {"opportunities": [
            {"stage": "closed_won", "created_at": "2024-01-01"},  # amount absent
        ]}}}
    )
    ads = ads_from_payload(spark, ads_payload)
    a = ads.first()
    assert a["campaign_id"] == "" and a["utm_campaign"] == ""
    assert a["impressions"] == 0 and a["cost"] == 0.0

    crm = crm_from_payload(spark, crm_payload)
    c = crm.first()
    assert c["amount"] == 0.0 and c["utm_source"] == ""

    out = transform(ads, crm).collect()
    # partial rows still consolidate; keys are "" like the reference
    assert all(r["utm_campaign"] == "" for r in out)
    won = [r for r in out if r["closed_won"] == 1]
    assert won and won[0]["revenue"] == 0.0  # absent amount sums as 0, not NULL
