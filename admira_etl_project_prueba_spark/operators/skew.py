"""Skew-mitigation utilities: salted two-phase aggregation and salted
broadcast-side replication.

AQE's skew handling covers *joins*; a pathological hot KEY in an
aggregation (one campaign with 40% of all rows) still funnels its partial
aggregates to one reducer.  Salting splits the hot key across ``salt_n``
reducers in phase 1 and merges the ``salt_n`` partials in phase 2 — total
work unchanged, max-reducer load divided by ``salt_n``.

Only worth it when |rows per hot key| ≫ salt_n × per-partition capacity;
for the additive SUM/COUNT measures of this engine the two-phase split is
lossless (associative merge).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str],
    counts: Sequence[str] = (),
    salt_n: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum/count) with a two-phase salted shuffle.

    Phase 1 groups by (keys, salt) — the hot key's rows spread over
    ``salt_n`` reducers; phase 2 merges the partials per key.  The salt is
    a uniform hash of a per-row discriminator (here: monotonically varying
    partition-local id), not rand(), so runs are deterministic.
    """
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt_n).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_s_{c}") for c in sums],
        *[F.count(F.when(F.col(c).isNotNull(), 1)).alias(f"_c_{c}") for c in counts],
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[F.sum(f"_s_{c}").alias(c) for c in sums],
        *[F.sum(f"_c_{c}").cast("long").alias(f"{c}_count") for c in counts],
    )
    return phase2


def replicate_broadcast_for_salt(
    small: DataFrame, salt_n: int, salt_col: str = "_salt"
) -> DataFrame:
    """Explode a broadcast-side table with salt ∈ [0, salt_n) so a salted
    big side can still equi-join it: join keys become (keys..., _salt)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))).alias(salt_col)
    return small.select("*", salts)
