"""Query surface over the consolidated fact table (SURVEY.md §2.2/§2.5/§2.7).

Reference parity — the predicate scans of ``internal/storage/memory.go`` and
the Gin endpoints of ``internal/api/handlers.go``, re-expressed as Catalyst
predicates so pushdown / partition pruning / column pruning apply:

* F2  generic predicate scan            memory.go:28-39
* F3  channel + inclusive date range    memory.go:41-51
* F4  utm_campaign + date range         memory.go:53-63
* F5  exact-date scan                   memory.go:66-74
* F6  debug equality filters            handlers.go:386-501
* P1  offset/limit pagination           handlers.go:148-183
* A4  counts                            handlers.go:119,178

Determinism note (SURVEY.md §7 decision 2): the reference pages over Go map
iteration order — undefined.  Here every surfaced result is canonically
sorted by the 6 key columns, which makes pagination and golden hashing
well-defined.  Since the key is unique per row, the sort is total.

Scale note: filters are plain Column predicates on a date-partitioned
parquet store — F5 is a static partition prune, F3/F4 prune by range.
Pagination with OFFSET on Spark ≥3.4 executes as a global TopK
(sort + limit offset+limit) — fine for API-sized pages; a cursor (seek)
API is the 100 TB-honest variant and is provided via ``page_after``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.schemas import METRIC_KEY_COLS

DEFAULT_LIMIT = 100  # handlers.go:148


def canonical_sort(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Total order on the composite key — the engine's canonical order."""
    return df.orderBy(*[F.col(c).asc() for c in (cols or METRIC_KEY_COLS)])


def scan(df: DataFrame, predicate: Column) -> DataFrame:
    """F2 — generic predicate scan (Catalyst pushes it to the source)."""
    return df.filter(predicate)


def _between_dates(
    date_col: str, date_from: str | dt.date, date_to: str | dt.date
) -> Column:
    f = F.lit(str(date_from))
    t = F.lit(str(date_to))
    d = F.try_to_date(date_col)
    # both ends inclusive (memory.go:48-49); unparseable dates excluded
    # (memory.go:44-46) because try_to_date→NULL fails the comparison.
    return (d >= F.to_date(f)) & (d <= F.to_date(t))


def metrics_by_channel(
    metrics: DataFrame,
    channel: str,
    date_from: str | dt.date,
    date_to: str | dt.date,
) -> DataFrame:
    """F3 — `GET /metrics/channel` scan (memory.go:41-51)."""
    return metrics.filter(
        (F.col("channel") == channel) & _between_dates("date", date_from, date_to)
    )


def metrics_by_campaign(
    metrics: DataFrame,
    utm_campaign: str,
    date_from: str | dt.date,
    date_to: str | dt.date,
) -> DataFrame:
    """F4 — `GET /metrics/funnel` scan (memory.go:53-63)."""
    return metrics.filter(
        (F.col("utm_campaign") == utm_campaign)
        & _between_dates("date", date_from, date_to)
    )


def metrics_by_date(metrics: DataFrame, date: str | dt.date) -> DataFrame:
    """F5 — exact-day scan (memory.go:66-74); partition-prunes on the store."""
    return metrics.filter(F.try_to_date("date") == F.to_date(F.lit(str(date))))


def paginate(
    df: DataFrame,
    limit: int = DEFAULT_LIMIT,
    offset: int = 0,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """P1 — deterministic offset/limit page (handlers.go:148-173).

    Non-positive limit / negative offset fall back to defaults, mirroring
    the reference's silent clamping (handlers.go:148-160).
    """
    if limit is None or limit <= 0:
        limit = DEFAULT_LIMIT
    if offset is None or offset < 0:
        offset = 0
    ordered = canonical_sort(df, sort_cols)
    return ordered.offset(offset).limit(limit)


def page_after(
    df: DataFrame,
    after_key: tuple | None,
    limit: int = DEFAULT_LIMIT,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Cursor (seek) pagination — the scale-honest alternative to OFFSET.

    ``after_key`` is the key tuple of the last row of the previous page;
    the predicate is sargable so deep pages don't re-sort skipped rows.
    """
    cols = sort_cols or METRIC_KEY_COLS
    out = df
    if after_key is not None:
        cursor = F.struct(*[F.col(c) for c in cols])
        out = out.filter(cursor > F.struct(*[F.lit(v) for v in after_key]))
    return canonical_sort(out, cols).limit(limit)


def page_info(df: DataFrame, limit: int, offset: int) -> dict:
    """A4 + pagination envelope {total, limit, offset, has_more}
    (handlers.go:175-183)."""
    if limit is None or limit <= 0:
        limit = DEFAULT_LIMIT
    if offset is None or offset < 0:
        offset = 0
    total = df.count()
    return {
        "total": total,
        "limit": limit,
        "offset": min(offset, total),
        "has_more": offset + limit < total,
    }


# ---------------------------------------------------------------------------
# Debug endpoints (F6) — equality filters over the raw source frames
# ---------------------------------------------------------------------------

def debug_ads_by_date(ads: DataFrame, date: str) -> DataFrame:
    """`GET /debug/ads?date=` (handlers.go:406-413): ads.date == literal."""
    return ads.filter(F.col("date") == date)


def debug_crm_by_date(crm: DataFrame, date: str) -> DataFrame:
    """`GET /debug/crm?date=` (handlers.go:443-449): day(created_at) == literal."""
    return crm.filter(F.to_date("created_at") == F.to_date(F.lit(date)))


def debug_matches(
    ads: DataFrame, crm: DataFrame, utm_campaign: str
) -> tuple[DataFrame, DataFrame]:
    """`GET /debug/matches?utm_campaign=` (handlers.go:458-501).

    Two independent equality filters against one literal — deliberately NOT
    a join, same as the reference.
    """
    return (
        ads.filter(F.col("utm_campaign") == utm_campaign),
        crm.filter(F.col("utm_campaign") == utm_campaign),
    )
