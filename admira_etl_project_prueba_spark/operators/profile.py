"""One-pass column profiling — the data-quality sweep a 100 TB ingest
runs before anything else trusts the table.

``profile_columns`` computes row count, per-column non-null count, exact
distinct count, and lexicographic min/max of the string form — all in ONE
aggregation over ONE scan (a struct of aggregates, then ``stack`` to long
form).  Per-column passes (the naive loop) would scan the table once per
column; this shape is why profiling is affordable at scale.

min/max are over the STRING CAST deliberately: one output type for every
column, engine-portable ordering (lexicographic VARCHAR), and the profile
stays hash-comparable against the DuckDB oracle.  Numeric range checks
belong to typed queries, not the generic profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form profile: (column, n_rows, n_nonnull, n_distinct, min_str,
    max_str), one row per column, one scan total."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(s).alias(f"_mn_{c}"),
            F.max(s).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return row.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack}) AS (column, n_nonnull, n_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str")


def k_anonymity_audit(
    df: DataFrame, quasi_ids: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: how many
    records sit in equivalence classes smaller than ``k`` (re-identifiable
    under linkage attacks) — the release gate privacy reviews run before
    a dataset leaves the pipeline, complementing direct-identifier
    scrubbing (``redact_pii``), which does nothing about quasi-ids.

    One groupBy on the quasi-id tuple, then a tiny histogram-of-class-
    sizes aggregate: (class_size, n_classes, n_records, violates_k).
    The suppression list (which records to drop/generalize) is the same
    frame filtered to violators joined back — left to the caller, since
    the remedy (suppress vs generalize) is policy.
    """
    classes = df.groupBy(*quasi_ids).agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).cast("long").alias("n_records"),
            (F.col("class_size") < k).alias("violates_k"),
        )
    )


def with_quality_observation(df: DataFrame, cols: list[str], name: str = "quality"):
    """Attach ZERO-COST data-quality counters to a DataFrame: row count
    plus per-column null counts ride along with whatever action the
    caller runs next (``Observation`` metrics are accumulated inside the
    existing pass — no second scan), which is how a 100 TB pipeline gets
    its completeness dashboard for free instead of doubling its I/O.

    Batch: returns ``(df, observation)`` — read ``observation.get``
    AFTER an action has materialized the frame.  Streaming: Spark
    forbids ``Observation`` handles (one value per micro-batch is
    ill-posed), so the metrics are registered by NAME and surface per
    micro-batch in ``query.recentProgress[i].observedMetrics[name]``;
    the second tuple element is ``None``.
    """
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        for c in cols
    ]
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    columns: list[str] | None = None,
    null_rate_tol: float = 0.05,
    distinct_ratio_tol: float = 0.10,
) -> DataFrame:
    """Snapshot-to-snapshot data-contract audit: join the one-pass
    profiles of two corpus snapshots per column and flag what moved —
    null-rate shifts (a feed started emitting empties), distinct-ratio
    shifts (an id column started repeating / a category exploded), and
    string-range movement (new min/max — schema-ish drift visible
    without a schema).  The standing check an ingest pipeline runs
    before accepting a snapshot.

    Scale shape: each side is profile_columns' single scan + single
    aggregate; the join is |columns|-row × |columns|-row.  Rates are
    IEEE double divisions of exact counts — deterministic cross-engine.
    Flag logic: drifted = |Δnull_rate| > null_rate_tol OR
    |Δdistinct_ratio| > distinct_ratio_tol OR the string range moved.
    """
    po = profile_columns(old, columns).selectExpr(
        "column",
        "n_rows AS n_rows_old",
        "CASE WHEN n_rows > 0 THEN 1.0 - CAST(n_nonnull AS DOUBLE) / n_rows END"
        " AS null_rate_old",
        "CASE WHEN n_rows > 0 THEN CAST(n_distinct AS DOUBLE) / n_rows END"
        " AS distinct_ratio_old",
        "min_str AS min_str_old",
        "max_str AS max_str_old",
    )
    pn = profile_columns(new, columns).selectExpr(
        "column",
        "n_rows AS n_rows_new",
        "CASE WHEN n_rows > 0 THEN 1.0 - CAST(n_nonnull AS DOUBLE) / n_rows END"
        " AS null_rate_new",
        "CASE WHEN n_rows > 0 THEN CAST(n_distinct AS DOUBLE) / n_rows END"
        " AS distinct_ratio_new",
        "min_str AS min_str_new",
        "max_str AS max_str_new",
    )
    return po.join(pn, "column").selectExpr(
        "column",
        "n_rows_old",
        "n_rows_new",
        "null_rate_old",
        "null_rate_new",
        "null_rate_new - null_rate_old AS null_rate_delta",
        "distinct_ratio_old",
        "distinct_ratio_new",
        "distinct_ratio_new - distinct_ratio_old AS distinct_ratio_delta",
        # null-safe compares: an all-NULL column's (NULL, NULL) range is
        # unchanged, not unknown
        "NOT (min_str_old <=> min_str_new) OR NOT (max_str_old <=> max_str_new)"
        " AS range_moved",
        f"abs(null_rate_new - null_rate_old) > CAST({null_rate_tol!r} AS DOUBLE)"
        f" OR abs(distinct_ratio_new - distinct_ratio_old) > CAST({distinct_ratio_tol!r} AS DOUBLE)"
        " OR NOT (min_str_old <=> min_str_new) OR NOT (max_str_old <=> max_str_new)"
        " AS drifted",
    )


def corpus_health_report(documents: DataFrame) -> DataFrame:
    """The one-frame corpus health dashboard: every round-5 curation
    diagnostic rolled into long form (section, key, value) — size,
    duplication share, shingle-sharing rate, per-language tokenizer
    fertility, language/source contamination rate, and the quality-filter
    keep rate.  The single query an ingest owner runs (and a monitor
    diffs) before deciding what the corpus needs next.

    Every value is a ratio of EXACT integer aggregates with one IEEE
    divide at the end — no double accumulations — so the report is
    bit-identical on any engine and any partitioning, like the PSI/KL
    monitors.

    Scan structure (the 100 TB shape): Spark has no scan-sharing across
    union branches, so a naive union of per-section aggregates re-reads
    AND re-tokenizes the full corpus once per section.  Instead the four
    count-based sections (size, dup, fertility, contamination) share ONE
    materialized narrow projection — tokenize, normalize-hash and tag
    each row exactly once into (h, t, c, source, lang), localCheckpointed
    at ~a few dozen bytes/doc — and only the quality verdict (owned by
    quality_filter's signal expression) and the shingle-explode novelty
    section keep their own scans: 3 corpus passes total instead of 6,
    with one tokenization of the text instead of three.
    """
    from admira_etl_project_prueba_spark.operators import textops as tx

    base = documents.selectExpr(
        "md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) AS h",
        f"size({tx.TOKENS}) AS t",
        "length(text) AS c",
        f"coalesce(source, '{tx.UNKNOWN_SOURCE}') AS source",
        "coalesce(lang, '(unknown)') AS lang",
        # Eager on purpose: six downstream sections consume this frame, and
        # the round-13 lazy variant measured 0.64x at 32 cores (and ran
        # FASTER on 8 cores than 32) — piggybacking materialization on the
        # first consumer re-runs whichever partitions that job skips; the
        # one-shot eager job is the better trade here.
    ).localCheckpoint()
    size_f = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("tk"),
    ).selectExpr(
        "stack(3, 'size', 'n_docs', CAST(n AS DOUBLE),"
        " 'size', 'n_tokens', CAST(tk AS DOUBLE),"
        " 'size', 'tokens_per_doc', CAST(tk AS DOUBLE) / n)"
        " AS (section, key, value)"
    )
    dup_f = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("h").alias("d"),
    ).selectExpr(
        "stack(1, 'dup', 'dup_share', CAST(n - d AS DOUBLE) / n)"
        " AS (section, key, value)"
    )
    novelty_f = (
        tx.ngram_novelty_scores(documents)
        .agg(
            F.sum("n_shingles").alias("s"),
            F.sum("n_shared").alias("sh"),
        )
        .selectExpr(
            "stack(1, 'novelty', 'shared_shingle_rate',"
            " CASE WHEN s > 0 THEN CAST(sh AS DOUBLE) / s ELSE 0.0 END)"
            " AS (section, key, value)"
        )
    )
    # tokenizer_fertility's chars_per_token over the shared frame (same
    # coalesced lang, same exact integer sums, same single IEEE divide)
    fert_f = (
        base.groupBy("lang")
        .agg(
            F.sum("t").cast("long").alias("n_tokens"),
            F.sum("c").cast("long").alias("n_chars"),
        )
        .selectExpr(
            "'fertility' AS section",
            "lang AS key",
            "CAST(n_chars AS DOUBLE) / n_tokens AS value",
        )
    )
    tagged = base.select("source", "lang")
    counts = tagged.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    top_n = counts.groupBy("source").agg(F.max("n").alias("n"))
    dominant = (
        counts.join(top_n, ["source", "n"])
        .groupBy("source")
        .agg(F.min("lang").alias("dominant_lang"))
    )
    mm_f = (
        tagged.join(F.broadcast(dominant), "source")
        .agg(
            F.sum((F.col("lang") != F.col("dominant_lang")).cast("long")).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr(
            "stack(1, 'lang_mismatch', 'mismatch_rate', CAST(m AS DOUBLE) / n)"
            " AS (section, key, value)"
        )
    )
    quality_f = (
        tx.quality_filter(documents, langs=("en", "es", "de", "fr"))
        .agg(
            F.sum(F.col("kept").cast("long")).alias("k"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr(
            "stack(1, 'quality', 'kept_fraction', CAST(k AS DOUBLE) / n)"
            " AS (section, key, value)"
        )
    )
    return (
        size_f.unionByName(dup_f)
        .unionByName(novelty_f)
        .unionByName(fert_f)
        .unionByName(mm_f)
        .unionByName(quality_f)
        .orderBy("section", "key")
    )
