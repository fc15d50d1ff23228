"""Scale-safe quantile bucket assignment (sampled ntile).

The exact ntile/percent_rank family plans a ``Window`` over an empty
``partitionBy()`` — physically an ``Exchange SinglePartition`` + full sort
of the input frame on ONE task.  Correct, and fine when the input is a
reduced per-user/per-doc aggregate at test scale, but at 10⁹ rows that
single task sorts everything (three times for RFM).  The standard trade
is a SAMPLED assignment:

1. ``approx_percentile`` (Greenwald-Khanna sketch) computes the n-1
   bucket edges as ONE mergeable aggregate — per-partition sketches merge
   in O(sketch), never a global sort; rank error is bounded by
   1/accuracy.
2. The 1-row edges frame broadcasts (``crossJoin(broadcast(...))`` — the
   same 1-row scalar shape as q22/q11/q15), and the bucket is a ROW-LOCAL
   fold over the edges array — zero additional shuffle, no global order
   anywhere in the plan.

Semantics vs exact ntile: ntile splits ties across buckets to equalize
bucket SIZES; range assignment puts equal values in the same bucket.  On
tie-free values the two agree wherever the sketch edges are exact
(accuracy=10000 makes them exact below 10k rows); the parity-tolerance
contract is pinned in tests/test_sampled_quantiles.py.  This sampled
form is the DEFAULT for every quantile-family operator (a bare call
must be scale-safe); the exact single-partition form is opt-in via
``exact=True`` and survives only as the DuckDB-oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_ACCURACY = 10_000


def edge_expr(value_col: str, n_buckets: int, accuracy: int = DEFAULT_ACCURACY) -> Column:
    """The n-1 interior quantile edges of ``value_col`` as ONE
    approx_percentile aggregate column (ascending DOUBLE array)."""
    probs = ", ".join(repr(i / n_buckets) for i in range(1, int(n_buckets)))
    return F.expr(
        f"approx_percentile(CAST({value_col} AS DOUBLE), array({probs}), {int(accuracy)})"
    )


def quantile_edges(
    df: DataFrame,
    value_cols: dict[str, str],
    n_buckets: int,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """1-row frame of quantile-edge arrays: ``{out_name: value_col}`` →
    one ascending edges array per entry, all from a single aggregate
    pass (mergeable sketches — no sort, no extra scan per metric)."""
    return df.agg(
        *[
            edge_expr(src, n_buckets, accuracy).alias(out)
            for out, src in value_cols.items()
        ]
    )


def bucket_expr(value_col: str, edges_col: str, descending: bool = False) -> str:
    """Row-local bucket assignment against a broadcast edges array —
    SQL-expression string for ``selectExpr``.

    Ascending (ntile ORDER BY v): bucket = 1 + |{e : v > e}| — the
    smallest values land in bucket 1, and a value EQUAL to an edge stays
    below it (ntile ranks it inside the lower bucket).  Descending
    (ntile ORDER BY v DESC): bucket = 1 + |{e : v <= e}| — the largest
    values land in bucket 1, and a value equal to an edge falls PAST it
    (desc rank order puts it after the strictly-greater values).

    NULL contract: a NULL VALUE yields a NULL bucket, explicitly.  The
    raw fold would put NULLs in bucket 1 in BOTH orientations (every
    IF(NULL cmp e) takes the else branch) — which happens to match
    exact ntile ascending (Spark default NULLS FIRST) but contradicts
    it descending (desc default NULLS LAST ⇒ last bucket), a silent
    per-orientation divergence.  Emitting NULL makes the seam visible
    instead; callers that need ntile's NULL placement must coalesce to
    an extreme value before bucketing (ascending: below the minimum;
    descending: also below the minimum, which desc ranks last).  A NULL
    EDGES array (empty input) also yields NULL, mirroring ntile over no
    rows.
    """
    cmp = "<=" if descending else ">"
    return (
        f"IF({value_col} IS NULL, NULL, "
        f"1 + aggregate({edges_col}, 0, "
        f"(acc, e) -> acc + IF(CAST({value_col} AS DOUBLE) {cmp} e, 1, 0)))"
    )


def with_sampled_buckets(
    df: DataFrame,
    specs: list[tuple[str, str, bool]],
    n_buckets: int,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Attach sampled ntile buckets for ``(out_col, value_col,
    descending)`` specs: one shared sketch aggregate, one 1-row
    broadcast, row-local assignment.  Output buckets are INT like
    ntile's."""
    edges = quantile_edges(
        df, {f"_e_{out}": src for out, src, _ in specs}, n_buckets, accuracy
    )
    out = df.crossJoin(F.broadcast(edges))
    for out_col, src, desc in specs:
        out = out.withColumn(
            out_col,
            F.expr(bucket_expr(src, f"_e_{out_col}", desc)).cast("int"),
        )
    return out.drop(*[f"_e_{out}" for out, _, _ in specs])
