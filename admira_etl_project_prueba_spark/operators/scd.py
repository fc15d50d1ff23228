"""Slowly-changing-dimension (type 2) handling over change logs.

Beyond the reference (whose CRM pull is stateless): warehouse pipelines
need attribute HISTORY — "what was this account's stage when the order
was placed", not "what is it now".  SCD2 turns a change log into
versioned validity intervals; point-in-time enrichment then joins facts
to the version valid at fact time.

Scale shapes:
* :func:`scd2_build` is window-only — ONE shuffle on the dimension key
  partitions all four steps (same-timestamp dedup, change compression,
  versioning, interval closing); nothing else ships.
* :func:`scd2_point_in_time` deliberately does NOT write the natural
  range-join predicate (``valid_from <= ts < valid_to``): a non-equi
  join degenerates to a nested loop at scale.  It reuses
  :func:`~admira_etl_project_prueba_spark.operators.asof.asof_join` —
  union both sides, one (key, time)-sorted window pass — which is the
  O(n log n), single-shuffle formulation of the same semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators.asof import asof_join


def scd2_build(
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    ts_us: str,
    tiebreak: str,
) -> DataFrame:
    """Change log → type-2 dimension with half-open validity intervals.

    ``ts_us`` is an epoch-microsecond BIGINT column (integer time keeps
    every downstream comparison and the oracle surface exact).  Within
    one (key, ts) instant only the ``tiebreak``-greatest update counts
    (keeps valid_from unique per key — an as-of probe must never see two
    versions starting at the same instant).  Consecutive versions whose
    attributes are null-safely equal are COMPRESSED away, so a noisy
    change log that mostly re-asserts the same values stores only real
    transitions.

    Output: key, attrs..., valid_from_us, valid_to_us (NULL = open),
    version (1-based per key), is_current.
    """
    a = list(attrs)
    wk = Window.partitionBy(key).orderBy("valid_from_us")
    latest = (
        updates.select(key, *a, F.col(ts_us).alias("valid_from_us"), tiebreak)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key, "valid_from_us").orderBy(F.col(tiebreak).desc())
            ),
        )
        .filter("_rn = 1")
        .drop("_rn", tiebreak)
    )
    cur = F.struct(*[F.col(c) for c in a])
    compressed = (
        latest.withColumn("_prev", F.lag(cur).over(wk))
        .filter(~cur.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    return compressed.select(
        key,
        *a,
        "valid_from_us",
        F.lead("valid_from_us").over(wk).alias("valid_to_us"),
        F.row_number().over(wk).cast("long").alias("version"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


def scd2_point_in_time(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts_us: str,
    payload: Sequence[str] = ("version",),
) -> DataFrame:
    """Enrich each fact with the dimension version valid at fact time.

    Version validity is half-open [valid_from, valid_to): a fact at
    exactly valid_from sees the NEW version (asof_join's non-strict tie
    rule).  Facts before the key's first version get NULL payload.
    """
    return asof_join(
        facts,
        dim,
        on=[key],
        left_ts=fact_ts_us,
        right_ts="valid_from_us",
        right_payload=list(payload),
    )
