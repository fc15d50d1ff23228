"""Derived marketing-metric math (reference F12) with guarded division.

Reference parity: ``calculateDerivedMetrics`` —
/root/reference/internal/etl/transformer.go:144-182 (duplicated at
internal/api/handlers.go:298-328).  Contract (SURVEY.md §7 decision 5):

    denominator <= 0  ⇒  ratio = 0.0   (never NULL, never Inf)

Spark's plain ``/`` yields NULL on /0 — NOT the reference semantics — so
every ratio is a ``CASE WHEN`` guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def safe_div(num: Column | str, den: Column | str) -> Column:
    """num/den with the reference's den<=0 ⇒ 0.0 guard (transformer.go:146-150)."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    return F.when(d > F.lit(0), n.cast("double") / d.cast("double")).otherwise(F.lit(0.0))


#: ratio name → (numerator, denominator), in reference declaration order
DERIVED_DEFS: dict[str, tuple[str, str]] = {
    "cpc": ("cost", "clicks"),                     # transformer.go:152-156
    "cpa": ("cost", "leads"),                      # transformer.go:158-162
    "cvr_lead_to_opp": ("opportunities", "leads"),  # transformer.go:164-168
    "cvr_opp_to_won": ("closed_won", "opportunities"),  # transformer.go:170-174
    "roas": ("revenue", "cost"),                   # transformer.go:176-180
}


def with_derived_metrics(df: DataFrame) -> DataFrame:
    """Append the 5 derived ratio columns (reference A2).

    Pure projection — row-local, no shuffle; Catalyst folds the whole chain
    into the enclosing whole-stage-codegen span.
    """
    return df.withColumns(
        {name: safe_div(num, den) for name, (num, den) in DERIVED_DEFS.items()}
    )
