"""Core consolidation — the reference's ``Transform`` re-expressed as one
declarative union-aggregate plan (SURVEY.md §2.4 A1/A2, §2.2 F1).

Reference parity: /root/reference/internal/etl/transformer.go:41-141 builds a
``map[MetricKey]*Metrics`` single-threaded; ads rows add
clicks/impressions/cost, CRM rows add stage-conditional counts and
closed-won revenue, sharing one composite key space
(date, channel, campaign_id, utm_campaign, utm_source, utm_medium).

Spark-first shape — NOT a hash-map translation:

    conform(ads) ∪ conform(crm)  →  groupBy(6-key).agg(SUMs)  →  derive ratios

* Catalyst plans a partial (map-side) + final HashAggregate, so the "hash
  map" is distributed, spill-capable, and whole-stage-codegen'd for free.
* One shuffle total, on the composite key.  At 100 TB this is the plan you
  want: partial aggregation collapses each input partition to its distinct
  keys before the exchange, and AQE coalesces/splits the post-shuffle
  partitions at runtime (skewed hot campaigns included).
* Money sums go through DECIMAL(25,6) and back to double: exact, and —
  unlike float accumulation — *independent of partitioning/AQE decisions*,
  so results are bit-stable across cluster sizes (and match the oracle).

Stage semantics (transformer.go:96-127): ``lead``/``opportunity``/
``closed_won`` increment their counters; ``closed_won`` also adds
``amount`` to revenue; ANY other stage contributes all-zero measures but
still creates the key's row — reproduced here because conformed rows always
enter the union (with zero measures), so the group exists.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.functions.channels import infer_channel
from admira_etl_project_prueba_spark.functions.dates import day_string
from admira_etl_project_prueba_spark.functions.metrics import with_derived_metrics
from admira_etl_project_prueba_spark.schemas import MEASURE_COLS, METRIC_KEY_COLS

# Exact-sum intermediate type for money columns (cost, revenue, amount).
# Wide enough for 100 TB-scale sums (19 integer digits), 6 decimal places.
_MONEY_DECIMAL = "decimal(25,6)"


def conform_ads(ads: DataFrame) -> DataFrame:
    """Project AdsPerformance rows onto the fact layout (transformer.go:48-78).

    Ads rows carry their own date/channel/campaign_id; CRM-side measures
    are zero.
    """
    return ads.select(
        F.col("date").cast("string").alias("date"),
        F.col("channel").cast("string").alias("channel"),
        F.col("campaign_id").cast("string").alias("campaign_id"),
        F.col("utm_campaign").cast("string").alias("utm_campaign"),
        F.col("utm_source").cast("string").alias("utm_source"),
        F.col("utm_medium").cast("string").alias("utm_medium"),
        F.col("clicks").cast("long").alias("clicks"),
        F.col("impressions").cast("long").alias("impressions"),
        F.col("cost").cast(_MONEY_DECIMAL).alias("cost"),
        F.lit(0).cast("long").alias("leads"),
        F.lit(0).cast("long").alias("opportunities"),
        F.lit(0).cast("long").alias("closed_won"),
        F.lit(0).cast(_MONEY_DECIMAL).alias("revenue"),
    )


def conform_crm(crm: DataFrame, compat_now_fallback: bool = False) -> DataFrame:
    """Project CRMOpportunity rows onto the fact layout (transformer.go:80-127).

    * date: day of ``created_at`` (F10); unparseable dates route by the
      ``ingested_at`` day (deterministic replacement for the reference's
      fallback-to-now, SURVEY.md §7 decision 3).  ``compat_now_fallback``
      restores wall-clock behavior (crm.go:40-44).
    * channel: inferred from UTM (F9); campaign_id: "" (transformer.go:88).
    * stage-conditional measures; unknown stages yield all-zero rows.
    """
    created = F.col("created_at")
    if compat_now_fallback:
        effective = F.coalesce(created, F.current_timestamp())
    else:
        effective = F.coalesce(created, F.col("ingested_at"))
    stage = F.col("stage")
    return crm.select(
        day_string(effective).alias("date"),
        infer_channel("utm_source", "utm_medium").alias("channel"),
        F.lit("").alias("campaign_id"),
        F.col("utm_campaign").cast("string").alias("utm_campaign"),
        F.col("utm_source").cast("string").alias("utm_source"),
        F.col("utm_medium").cast("string").alias("utm_medium"),
        F.lit(0).cast("long").alias("clicks"),
        F.lit(0).cast("long").alias("impressions"),
        F.lit(0).cast(_MONEY_DECIMAL).alias("cost"),
        F.when(stage == "lead", 1).otherwise(0).cast("long").alias("leads"),
        F.when(stage == "opportunity", 1).otherwise(0).cast("long").alias("opportunities"),
        F.when(stage == "closed_won", 1).otherwise(0).cast("long").alias("closed_won"),
        F.when(stage == "closed_won", F.col("amount"))
        .otherwise(F.lit(0.0))
        .cast(_MONEY_DECIMAL)
        .alias("revenue"),
    )


def consolidate(ads_conformed: DataFrame, crm_conformed: DataFrame) -> DataFrame:
    """Union the conformed sources and hash-aggregate on the 6-key (A1)."""
    union = ads_conformed.unionByName(crm_conformed)
    aggs = []
    for m in MEASURE_COLS:
        if m in ("cost", "revenue"):
            aggs.append(F.sum(m).cast("double").alias(m))
        else:
            aggs.append(F.sum(m).cast("long").alias(m))
    return union.groupBy(*METRIC_KEY_COLS).agg(*aggs)


def filter_since(metrics: DataFrame, since: str | dt.date | None) -> DataFrame:
    """Keep rows with date >= since, inclusive (F1, transformer.go:184-200).

    ``try_to_date`` yields NULL for unparseable dates (ANSI-safe) and NULL
    comparisons are false, so malformed dates are silently dropped — the
    exact reference semantics (drop at transformer.go:189-191) for free, and
    the predicate stays pushdown-eligible.
    """
    if since is None:
        return metrics
    since_lit = F.lit(since if isinstance(since, str) else since.isoformat())
    return metrics.filter(F.try_to_date("date") >= F.to_date(since_lit))


def transform(
    ads: DataFrame,
    crm: DataFrame,
    since: str | dt.date | None = None,
    compat_now_fallback: bool = False,
) -> DataFrame:
    """Full reference pipeline: conform → union-agg → derive → since-filter.

    Mirrors `POST /ingest/run` dataflow (handlers.go:76-122): note the
    since-filter runs AFTER aggregation, exactly like the reference
    (pre-`since` rows do enter the aggregation; whole consolidated rows are
    then dropped — same result only because the key contains the date).
    """
    consolidated = consolidate(conform_ads(ads), conform_crm(crm, compat_now_fallback))
    derived = with_derived_metrics(consolidated)
    return filter_since(derived, since)
