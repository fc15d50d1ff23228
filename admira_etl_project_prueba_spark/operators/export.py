"""Export-day re-consolidation and HMAC-signed sink (SURVEY.md §2.4 A3, §2.1 S6).

Reference parity:
* ``consolidateMetricsByDate`` — /root/reference/internal/api/handlers.go:262-295:
  re-group one day's stored facts by the COARSER key (channel, campaign_id,
  utm_campaign) — utm_source/utm_medium drop out of the key; SUM all 7
  additive measures; recompute the derived ratios.
* ``exportToSink`` — handlers.go:331-383: JSON payload
  ``{date, metrics, exported_at}``, HMAC-SHA256 hex in ``X-Signature``,
  POST to SINK_URL; when SINK_URL is unset the export is "prepared" and the
  payload returned instead (handlers.go:236-244); empty day ⇒ 404
  (handlers.go:227-230) — surfaced here as ``EmptyExportError``.

Determinism (SURVEY.md §7 decision 2): the reference keeps the
*first-seen* utm_source/utm_medium per coarse group — first in Go map
iteration order, i.e. nondeterministic.  The engine defines them as the
MINIMUM of each column within the group: a stable, order-independent,
SQL-expressible refinement.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.request

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.functions.metrics import with_derived_metrics
from admira_etl_project_prueba_spark.functions.signing import hmac_sha256_hex
from admira_etl_project_prueba_spark.operators.queries import canonical_sort, metrics_by_date

#: the coarse export key (handlers.go:267) — utm_source/utm_medium excluded
EXPORT_KEY_COLS = ["channel", "campaign_id", "utm_campaign"]

_MONEY_DECIMAL = "decimal(25,6)"


class EmptyExportError(LookupError):
    """No stored metrics for the requested date (reference 404 path)."""


def consolidate_for_export(day_metrics: DataFrame) -> DataFrame:
    """A3 — coarse re-aggregation of one day's facts + ratio recompute."""
    agg = day_metrics.groupBy(*EXPORT_KEY_COLS).agg(
        F.min("date").alias("date"),  # constant within the day slice
        F.sum("clicks").cast("long").alias("clicks"),
        F.sum("impressions").cast("long").alias("impressions"),
        F.sum(F.col("cost").cast(_MONEY_DECIMAL)).cast("double").alias("cost"),
        F.sum("leads").cast("long").alias("leads"),
        F.sum("opportunities").cast("long").alias("opportunities"),
        F.sum("closed_won").cast("long").alias("closed_won"),
        F.sum(F.col("revenue").cast(_MONEY_DECIMAL)).cast("double").alias("revenue"),
        # deterministic replacement for reference "first-seen" (see module doc)
        F.min("utm_source").alias("utm_source"),
        F.min("utm_medium").alias("utm_medium"),
    )
    derived = with_derived_metrics(agg)
    # restore fact column order
    return derived.select(
        "date", "channel", "campaign_id", "utm_campaign", "utm_source",
        "utm_medium", "clicks", "impressions", "cost", "leads",
        "opportunities", "closed_won", "revenue", "cpc", "cpa",
        "cvr_lead_to_opp", "cvr_opp_to_won", "roas",
    )


def build_export_payload(
    metrics: DataFrame, date: str, exported_at: dt.datetime | None = None
) -> dict:
    """Filter → re-consolidate → driver-side payload (handlers.go:232-247).

    The collect() here is the API edge by design: one export day of
    coarse-grained rows, not a data-plane transfer.
    """
    day = metrics_by_date(metrics, date)
    consolidated = canonical_sort(
        consolidate_for_export(day), EXPORT_KEY_COLS
    )
    rows = [r.asDict() for r in consolidated.collect()]
    if not rows:
        raise EmptyExportError(f"no metrics found for date {date}")
    stamp = (exported_at or dt.datetime.now(dt.timezone.utc)).isoformat()
    return {"date": date, "metrics": rows, "exported_at": stamp}


def export_day(
    metrics: DataFrame,
    date: str,
    sink_url: str | None,
    secret: str = "",
    exported_at: dt.datetime | None = None,
    _post=None,
) -> dict:
    """`POST /export/run` — sign + POST when SINK_URL set, else return payload.

    Returns ``{"status": "exported"|"prepared", "payload": ..., "signature": ...}``.
    """
    payload = build_export_payload(metrics, date, exported_at)
    body = json.dumps(payload, sort_keys=True, default=str).encode("utf-8")
    signature = hmac_sha256_hex(secret, body)
    if not sink_url:
        # skip path, handlers.go:236-244
        return {"status": "prepared", "payload": payload, "signature": signature}
    post = _post or _default_post
    status = post(sink_url, body, signature)
    if not (200 <= status < 300):
        raise RuntimeError(f"sink returned status {status}")
    return {"status": "exported", "payload": payload, "signature": signature}


def _default_post(url: str, body: bytes, signature: str) -> int:
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/json", "X-Signature": signature},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status
