"""Wire-envelope decoding: JSON payload → typed source DataFrames.

Reference parity (SURVEY.md §2.1 S2/S3/S4):
* ads envelope   {"external":{"ads":{"performance":[...]}}}     — ads.go:18-24
* crm envelope   {"external":{"crm":{"opportunities":[...]}}}   — crm.go:78-84
* ingest stamping (``ingested_at = now()``)                     — extractor.go:69-71,87-89

Design: the payload is a handful of KB-to-MB of JSON fetched driver-side
(see http.py); parsing happens IN Spark via ``F.from_json`` with an explicit
schema + ``explode`` — declarative, schema-checked, and identical whether the
payload came from HTTP, a file, or a Kafka value column.  At 100 TB the same
two functions apply unchanged to a DataFrame of millions of envelope strings
(one per API page / Kafka record); nothing here is single-payload-shaped.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.functions.dates import parse_flexible_timestamp
from admira_etl_project_prueba_spark.schemas import (
    ADS_ENVELOPE_SCHEMA,
    CRM_ENVELOPE_SCHEMA,
)


def _payload_df(spark: SparkSession, payloads: str | list[str]) -> DataFrame:
    if isinstance(payloads, str):
        payloads = [payloads]
    return spark.createDataFrame([(p,) for p in payloads], "payload string")


def _ingest_ts(ingested_at: dt.datetime | None):
    # Deterministic tests pin the stamp; production uses the cluster clock
    # (reference extractor.go:69-71 stamps at extract time).
    if ingested_at is None:
        return F.current_timestamp()
    return F.lit(ingested_at).cast("timestamp")


def ads_from_payload(
    spark: SparkSession,
    payloads: str | list[str],
    ingested_at: dt.datetime | None = None,
) -> DataFrame:
    """Decode ads envelope JSON → flat AdsPerformance DataFrame (S2+S4)."""
    df = _payload_df(spark, payloads)
    parsed = df.select(
        F.from_json("payload", ADS_ENVELOPE_SCHEMA).alias("env")
    ).select(F.explode(F.col("env.external.ads.performance")).alias("r"))
    flat = parsed.select("r.*")
    # Go-unmarshal parity (ads.go:5-16): absent JSON fields decode to zero
    # values ("" / 0 / 0.0), not NULL — keeps group keys and sums identical
    # to the reference for partial envelopes.
    flat = flat.na.fill("").na.fill(0)
    return flat.withColumn("ingested_at", _ingest_ts(ingested_at))


def crm_from_payload(
    spark: SparkSession,
    payloads: str | list[str],
    ingested_at: dt.datetime | None = None,
) -> DataFrame:
    """Decode CRM envelope JSON → flat CRMOpportunity DataFrame (S3+S4).

    ``created_at`` arrives as a raw multi-format string; it is parsed with
    the F7 cascade into a timestamp column, keeping the raw value in
    ``created_at_raw`` and flagging parse failures in ``_date_fallback``
    (SURVEY.md §7 decision 3 — deterministic replacement for the
    reference's fallback-to-now at crm.go:37-45).
    """
    df = _payload_df(spark, payloads)
    flat = (
        df.select(F.from_json("payload", CRM_ENVELOPE_SCHEMA).alias("env"))
        .select(F.explode(F.col("env.external.crm.opportunities")).alias("r"))
        .select("r.*")
    )
    # Go-unmarshal parity (crm.go:10-20): absent string/number fields are
    # zero values, not NULL.  ``created_at`` is deliberately excluded — a
    # missing timestamp takes the F8 fallback path (§7 decision 3), which
    # the ``na.fill("")`` below cannot touch (it is parsed separately).
    flat = flat.na.fill("", [c for c in flat.columns if c != "created_at"]).na.fill(0)
    flat = flat.withColumn("ingested_at", _ingest_ts(ingested_at))
    return (
        flat.withColumnRenamed("created_at", "created_at_raw")
        .withColumn("created_at", parse_flexible_timestamp("created_at_raw"))
        .withColumn("_date_fallback", F.col("created_at").isNull())
    )
