"""Engine schemas — the three record types of the reference data model.

Reference parity (SURVEY.md §1):
* ``AdsPerformance``   — /root/reference/internal/models/ads.go:5-16
* ``CRMOpportunity``   — /root/reference/internal/models/crm.go:10-20
* ``Metrics`` (fact)   — /root/reference/internal/models/metrics.go:3-22
* wire envelopes       — ads.go:18-24, crm.go:78-84

Deliberate choices (SURVEY.md §7):
* money stays DoubleType (reference uses float64; the oracle uses DOUBLE);
* ``date`` stays a ``YYYY-MM-DD`` string in the fact schema, as in the
  reference — day-grain partition column, cheap to prune on;
* CRM ``created_at`` arrives as a *string* on the wire (8 accepted layouts)
  and is parsed engine-side (functions/dates.py), so the source schema keeps
  the raw string alongside the parsed timestamp.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Source schema: Ads performance rows (flattened)
# ---------------------------------------------------------------------------
ADS_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType()),  # "YYYY-MM-DD" day grain
        T.StructField("campaign_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("clicks", T.IntegerType()),
        T.StructField("impressions", T.IntegerType()),
        T.StructField("cost", T.DoubleType()),
        T.StructField("utm_campaign", T.StringType()),
        T.StructField("utm_source", T.StringType()),
        T.StructField("utm_medium", T.StringType()),
        T.StructField("ingested_at", T.TimestampType()),
    ]
)

# Wire envelope: {"external": {"ads": {"performance": [...]}}}
ADS_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "external",
            T.StructType(
                [
                    T.StructField(
                        "ads",
                        T.StructType(
                            [
                                T.StructField(
                                    "performance",
                                    T.ArrayType(
                                        T.StructType(
                                            [f for f in ADS_SCHEMA.fields if f.name != "ingested_at"]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)

# ---------------------------------------------------------------------------
# Source schema: CRM opportunity rows (flattened)
# ---------------------------------------------------------------------------
CRM_WIRE_FIELDS = [
    T.StructField("opportunity_id", T.StringType()),
    T.StructField("contact_email", T.StringType()),
    T.StructField("stage", T.StringType()),  # lead | opportunity | closed_won | (other)
    T.StructField("amount", T.DoubleType()),
    T.StructField("created_at", T.StringType()),  # RAW string, multi-format
    T.StructField("utm_campaign", T.StringType()),
    T.StructField("utm_source", T.StringType()),
    T.StructField("utm_medium", T.StringType()),
]

CRM_SCHEMA = T.StructType(
    CRM_WIRE_FIELDS
    + [
        T.StructField("ingested_at", T.TimestampType()),
    ]
)

# Parsed CRM: created_at resolved to a timestamp + deterministic-fallback flag
CRM_PARSED_SCHEMA = T.StructType(
    [f for f in CRM_SCHEMA.fields if f.name != "created_at"]
    + [
        T.StructField("created_at", T.TimestampType()),
        T.StructField("_date_fallback", T.BooleanType()),
    ]
)

# Wire envelope: {"external": {"crm": {"opportunities": [...]}}}
CRM_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "external",
            T.StructType(
                [
                    T.StructField(
                        "crm",
                        T.StructType(
                            [
                                T.StructField(
                                    "opportunities",
                                    T.ArrayType(T.StructType(CRM_WIRE_FIELDS)),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)

# ---------------------------------------------------------------------------
# Fact schema: consolidated Metrics (18 columns)
# ---------------------------------------------------------------------------
#: the composite business key — reference MetricKey, transformer.go:32-39
METRIC_KEY_COLS = [
    "date",
    "channel",
    "campaign_id",
    "utm_campaign",
    "utm_source",
    "utm_medium",
]

#: additive measures — safe to SUM at any re-aggregation grain
MEASURE_COLS = [
    "clicks",
    "impressions",
    "cost",
    "leads",
    "opportunities",
    "closed_won",
    "revenue",
]

#: non-additive derived ratios — recomputed after every (re-)aggregation
DERIVED_COLS = ["cpc", "cpa", "cvr_lead_to_opp", "cvr_opp_to_won", "roas"]

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("utm_campaign", T.StringType()),
        T.StructField("utm_source", T.StringType()),
        T.StructField("utm_medium", T.StringType()),
        T.StructField("clicks", T.LongType()),
        T.StructField("impressions", T.LongType()),
        T.StructField("cost", T.DoubleType()),
        T.StructField("leads", T.LongType()),
        T.StructField("opportunities", T.LongType()),
        T.StructField("closed_won", T.LongType()),
        T.StructField("revenue", T.DoubleType()),
        T.StructField("cpc", T.DoubleType()),
        T.StructField("cpa", T.DoubleType()),
        T.StructField("cvr_lead_to_opp", T.DoubleType()),
        T.StructField("cvr_opp_to_won", T.DoubleType()),
        T.StructField("roas", T.DoubleType()),
    ]
)
