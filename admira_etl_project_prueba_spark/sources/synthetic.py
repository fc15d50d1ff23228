"""Deterministic ads/CRM views derived from the driver's ``events`` table.

The correctness gate (driver CORRECTNESS_r{N}.json) runs every declared
query against the TPC-H-ish testdata tables — which contain no marketing
data.  To make the *reference* semantics (consolidation, channel
inference, date parsing, export) oracle-checkable, we derive
AdsPerformance-shaped and CRMOpportunity-shaped views from ``events``
with arithmetic that is expressible IDENTICALLY in Spark and DuckDB
(the paired SQL lives in admira_etl_project_prueba_spark/oracle.py — keep
both in sync).

Mapping:
* click/view events  → ads rows   (clicks/impressions/cost from ``value``)
* signup/purchase/error events → CRM rows (stage mapping incl. an unknown
  'prospect' stage to exercise the zero-row path)
* UTM dims are CASE expressions over ``user_id``/``event_id`` so ads and
  CRM rows land in one shared key space (cross-source fusion happens).

Determinism rules for oracle parity:
* integer arithmetic only for dims (no float rounding in keys);
* ``floor`` before any double→int cast (Spark truncates, DuckDB rounds);
* money kept as the raw double ``value`` (sums go through DECIMAL later).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.functions.channels import infer_channel

# -- shared dim expressions (keep in sync with oracle.py!) -------------------

UTM_CAMPAIGN_SQL = (
    "CASE user_id % 3 WHEN 0 THEN 'back_to_school' "
    "WHEN 1 THEN 'summer_sale' ELSE 'test_campaign' END"
)
UTM_SOURCE_SQL = (
    "CASE user_id % 5 WHEN 0 THEN 'google' WHEN 1 THEN 'facebook' "
    "WHEN 2 THEN 'tiktok' WHEN 3 THEN 'linkedin' ELSE 'newsletter' END"
)
UTM_MEDIUM_SQL = (
    "CASE event_id % 3 WHEN 0 THEN 'cpc' WHEN 1 THEN 'social' ELSE 'email' END"
)


def synthetic_ads(events: DataFrame) -> DataFrame:
    """AdsPerformance view: click/view events (reference ads.go:5-16 shape)."""
    return (
        events.filter(F.col("event_type").isin("click", "view"))
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            F.concat(F.lit("C-100"), (F.col("user_id") % 5).cast("string")).alias(
                "campaign_id"
            ),
            F.expr(UTM_CAMPAIGN_SQL).alias("utm_campaign"),
            F.expr(UTM_SOURCE_SQL).alias("utm_source"),
            F.expr(UTM_MEDIUM_SQL).alias("utm_medium"),
            F.expr("CAST(floor(value) AS INT) % 50").alias("clicks"),
            F.expr("CAST(floor(value * 13) AS INT) % 1000").alias("impressions"),
            F.col("value").alias("cost"),
            F.lit("2024-07-01 00:00:00").cast("timestamp").alias("ingested_at"),
        )
        .withColumn("channel", infer_channel("utm_source", "utm_medium"))
    )


def synthetic_crm(events: DataFrame) -> DataFrame:
    """CRMOpportunity view (parsed shape): signup/purchase/error events.

    Stage mapping: signup→lead, error→opportunity, purchase→closed_won
    unless value<20 → 'prospect' (an unknown stage: must still create a
    zero-measure row, transformer.go:105-127).
    """
    return events.filter(
        F.col("event_type").isin("signup", "purchase", "error")
    ).select(
        F.concat(F.lit("O-"), F.col("event_id").cast("string")).alias("opportunity_id"),
        F.concat(F.lit("user"), F.col("user_id").cast("string"), F.lit("@example.com")).alias(
            "contact_email"
        ),
        F.expr(
            "CASE event_type WHEN 'signup' THEN 'lead' "
            "WHEN 'error' THEN 'opportunity' "
            "ELSE CASE WHEN value < 20 THEN 'prospect' ELSE 'closed_won' END END"
        ).alias("stage"),
        F.col("value").alias("amount"),
        F.expr(UTM_CAMPAIGN_SQL).alias("utm_campaign"),
        F.expr(UTM_SOURCE_SQL).alias("utm_source"),
        F.expr(UTM_MEDIUM_SQL).alias("utm_medium"),
        F.lit("2024-07-01 00:00:00").cast("timestamp").alias("ingested_at"),
        F.col("ts").alias("created_at"),
        F.lit(False).alias("_date_fallback"),
        F.col("event_id"),
    )


def synthetic_crm_raw_dates(events: DataFrame) -> DataFrame:
    """CRM rows with ``created_at_raw`` strings in the reference's accepted
    formats (rotating by event_id) + an unparseable value — the F7/F8
    parse-cascade input."""
    crm = synthetic_crm(events)
    raw = F.expr(
        "CASE event_id % 6 "
        "WHEN 0 THEN date_format(created_at, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") "
        "WHEN 1 THEN date_format(created_at, 'yyyy-MM-dd HH:mm:ss') "
        "WHEN 2 THEN date_format(created_at, 'yyyy-MM-dd') "
        "WHEN 3 THEN date_format(created_at, 'yyyy/MM/dd HH:mm:ss') "
        "WHEN 4 THEN concat('  ', date_format(created_at, 'yyyy-MM-dd HH:mm:ss'), '  ') "
        "ELSE 'not-a-date' END"
    )
    return crm.withColumn("created_at_raw", raw)
