"""Channel inference from UTM attribution (reference F9).

Reference parity: ``inferChannelFromUTM`` —
/root/reference/internal/etl/transformer.go:16-29: a 4-arm switch on
``utm_source`` with a ``"{source}_{medium}"`` default.

Pure ``CASE WHEN`` chain — codegen-friendly, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: utm_source → channel mapping (transformer.go:18-27)
CHANNEL_BY_SOURCE: dict[str, str] = {
    "google": "google_ads",
    "facebook": "facebook_ads",
    "tiktok": "tiktok_ads",
    "linkedin": "linkedin_ads",
}


def infer_channel(utm_source: Column | str, utm_medium: Column | str) -> Column:
    """Map utm_source to a channel, defaulting to ``{source}_{medium}``."""
    src = F.col(utm_source) if isinstance(utm_source, str) else utm_source
    med = F.col(utm_medium) if isinstance(utm_medium, str) else utm_medium
    expr: Column | None = None
    for source, channel in CHANNEL_BY_SOURCE.items():
        cond = src == F.lit(source)
        expr = F.when(cond, F.lit(channel)) if expr is None else expr.when(cond, F.lit(channel))
    assert expr is not None
    # reference default: fmt.Sprintf("%s_%s", source, medium)
    return expr.otherwise(F.concat_ws("_", src, med))
