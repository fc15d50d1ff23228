"""End-to-end training-corpus assembly — the flagship composition.

``build_training_corpus`` chains the corpus-hygiene operators into the
standard LLM-data pipeline and emits ONE auditable decision record per
input document:

    quality filter  →  near-dup clustering (on the clean subset)  →
    quality-aware survivor election  →  leakage-safe split assignment

Every stage is the already-gated operator (quality_filter,
lsh_candidate_pairs, dedup_best_survivors, train_test_split) — this
module adds no new dataflow, only the composition and the per-document
``status`` verdict, so the whole pipeline stays declarative: Catalyst
sees a single plan and optimizes across stage boundaries (the quality
semi-join prunes the LSH input before anything is shingled).

Scale shape: the expensive stage (LSH) runs only on quality-kept docs;
everything else is row-local except the pair join and one window per
cluster component.  The output is exactly what a data lineage audit
wants: why did doc X not make the training set?
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators import graph, textops


def build_training_corpus(
    documents: DataFrame,
    langs: tuple[str, ...] = ("en", "es", "de", "fr"),
    threshold: float = 0.5,
    train_pct: int = 80,
    salt: str = "v1",
    min_source_kept_fraction: float | None = None,
) -> DataFrame:
    """Per-document pipeline verdicts: (doc_id, kept_quality,
    reject_reason, component, survivor, status) where status ∈
    {'rejected_quality', 'dup_removed', 'train', 'test'}.

    component/survivor are NULL for quality-rejected docs (they never
    reach dedup); split assignment is computed for all docs but only
    surfaces as status for surviving ones.

    ``min_source_kept_fraction`` (optional) prepends C4-style source
    curation: documents from sources whose quality-kept fraction falls
    below the threshold are rejected wholesale with reason
    ``'rejected_source'`` before per-document filtering — the cheap
    first cut on a crawl-shaped corpus.  The source verdict frame is
    domain-cardinality-sized and broadcast into the semi-join.
    """
    # The quality frame feeds EVERY consumer (verdict output join, the
    # dedup semi-join, the survivor token count via kept_docs, and — when
    # curation is on — the per-source rollup); Spark has no cross-join
    # CSE, so without materialization the full-text quality scoring would
    # be recomputed once per consumer.  Scored ONCE here, narrow columns
    # only — KBs per million docs — so localCheckpoint is the right trade
    # at any scale; source_reputation receives this frame instead of
    # re-running its own quality scan over the full corpus.
    # With curation OFF, only the 3 verdict columns survive the
    # checkpoint — the rollup's signal columns (n_tokens/ttr/…) are dead
    # weight there, and materializing them cost a measured ~9% of the
    # whole pipeline at sf0.1 (the round-4 bench regression).
    qual_cols = (
        ["doc_id", "kept", "reject_reason"]
        if min_source_kept_fraction is None
        else [
            "doc_id",
            "n_tokens",
            "ttr",
            "stopword_ratio",
            "lang_predicted",
            "kept",
            "reject_reason",
        ]
    )
    qual = (
        textops.quality_filter(documents, langs=langs)
        .select(*qual_cols)
        .localCheckpoint(eager=False)
    )
    bad_source_docs = None
    if min_source_kept_fraction is not None:
        bad_sources = (
            textops.source_reputation(
                documents,
                langs=langs,
                min_kept_fraction=min_source_kept_fraction,
                quality=qual,
            )
            .filter(~F.col("keep_source"))
            .select("source")
        )
        bad_source_docs = (
            documents.select(
                "doc_id",
                # same sentinel as source_reputation: NULL-source docs land
                # in the (unknown) bucket and stay curate-able
                F.coalesce("source", F.lit(textops.UNKNOWN_SOURCE)).alias("source"),
            )
            .join(F.broadcast(bad_sources), "source")
            .select("doc_id")
            .localCheckpoint(eager=False)  # narrow; consumed by the verdict override below
        )
    q = qual.select("doc_id", F.col("kept").alias("kept_quality"), "reject_reason")
    if bad_source_docs is not None:
        flagged = F.col("bad.doc_id").isNotNull()
        q = (
            q.join(bad_source_docs.alias("bad"), q["doc_id"] == F.col("bad.doc_id"), "left")
            .select(
                q["doc_id"],
                (F.col("kept_quality") & ~flagged).alias("kept_quality"),
                F.when(flagged, F.lit("rejected_source"))
                .otherwise(F.col("reject_reason"))
                .alias("reject_reason"),
            )
        )
    kept_docs = documents.join(
        q.filter("kept_quality").select("doc_id"), "doc_id", "left_semi"
    )
    surv = graph.dedup_best_survivors(
        kept_docs, textops.lsh_candidate_pairs(kept_docs), threshold
    ).select("doc_id", "component", F.col("keep").alias("survivor"))
    split = textops.train_test_split(
        documents, train_pct=train_pct, salt=salt
    ).select("doc_id", "split")
    return (
        q.join(surv, "doc_id", "left")
        .join(split, "doc_id")
        .select(
            "doc_id",
            "kept_quality",
            "reject_reason",
            "component",
            "survivor",
            F.expr(
                "CASE WHEN NOT kept_quality THEN "
                "  CASE WHEN reject_reason = 'rejected_source' "
                "       THEN 'rejected_source' ELSE 'rejected_quality' END "
                "WHEN NOT survivor THEN 'dup_removed' "
                "ELSE split END"
            ).alias("status"),
        )
    )


def build_retrieval_index(
    documents: DataFrame,
    path: str,
    embeddings: DataFrame | None = None,
    target_lang: str = "en",
    langs: tuple[str, ...] = ("en", "es", "de", "fr"),
    num_buckets: int = 64,
    n_centroids: int = 16,
) -> dict:
    """The INDEXING flagship: one once-per-ingest batch job that curates
    the corpus and materializes every query-time artifact of the
    persisted-store layer (docs/STORES.md) under ``path``:

    * ``<path>/text_index``  — inverted BM25 postings over the CURATED
      corpus (quality-kept, exact-dedup survivors), bucket-partitioned
      so queries read ~|terms|/num_buckets of the index;
    * ``<path>/ivf_index``   — IVF inverted lists over ``embeddings``
      (when supplied), partition-pruned at probe time;
    * ``<path>/dsir_model``  — the frozen DSIR mixture model
      (target = ``target_lang`` docs vs the full pool);
    * ``<path>/lm_model``    — the frozen reference LM (hashed-unigram
      logp over the ``target_lang`` slice) for perplexity-filter
      scoring of future ingest, batch or streaming;
    * ``<path>/manifest``    — 1-row parquet recording corpus/curation
      counts, so downstream jobs can sanity-check index freshness
      without rescanning anything.

    Composition, not new dataflow: every stage is an already-gated
    operator, and the curation semi-join (quality ∧ exact-survivor)
    prunes the corpus BEFORE tokenization, so the expensive index build
    runs over the documents a retrieval user would actually want served.
    Returns the manifest row as a dict.
    """
    from admira_etl_project_prueba_spark.operators import similarity

    kept_q = (
        textops.quality_filter(documents, langs=langs)
        .filter("kept")
        .select("doc_id")
    )
    survivors = textops.dedup_exact(documents).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    curated = documents.join(kept_q, "doc_id", "left_semi").join(
        survivors, "doc_id", "left_semi"
    )
    textops.write_text_index(curated, f"{path}/text_index", num_buckets=num_buckets)
    target = documents.filter(F.col("lang") == target_lang)
    textops.write_dsir_dists(documents, target, f"{path}/dsir_model")
    textops.write_lm_dists(target, f"{path}/lm_model")
    if embeddings is not None:
        similarity.write_ivf_index(
            embeddings, f"{path}/ivf_index", n_centroids=n_centroids
        )
    manifest = {
        "n_docs": documents.count(),
        "n_curated": curated.count(),
        "n_embeddings": embeddings.count() if embeddings is not None else 0,
        "text_index_buckets": num_buckets,
        "ivf_centroids": n_centroids if embeddings is not None else 0,
        "dsir_target_lang": target_lang,
        "lm_reference_lang": target_lang,
    }
    spark = documents.sparkSession
    spark.createDataFrame([manifest]).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/manifest"
    )
    return manifest
