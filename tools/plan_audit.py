"""Physical-plan audit over the whole query catalog.

Flags the antipatterns that kill 100 TB runs long before they show up at
test scale:

* ``CartesianProduct`` / un-allowlisted ``BroadcastNestedLoopJoin`` — an
  all-pairs join that will never finish at scale.  Allowlisted only where
  one side is provably tiny (a 1-row scalar aggregate or an explicitly
  bounded candidate universe).
* ``BatchEvalPython`` — row-at-a-time Python in the hot path (the 10-100×
  slow path).  Arrow-vectorized ``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas*`` are the sanctioned Python hops.
* ``Exchange SinglePartition`` feeding a ``Sort``/``Window`` — the global
  window sort: ONE task sorts the whole frame, the exact anti-pattern
  class where a correct-at-test-scale query dies at 100×.  Allowed only
  when the sorted set is bounded by construction: the exchange's subtree
  carries a ``Limit``/``TakeOrdered`` (k-row frame), or the query is
  allowlisted as model-sized with a pointer at its scale-safe sampled
  mode.  1-row scalar aggregates (whose parent is an Aggregate, not a
  Sort) are inherently fine and never flagged.
* per-query Exchange count — shuffles are the scale currency; printed so
  regressions are visible in review.

Usage: PYTHONPATH=/root/repo python tools/plan_audit.py [sf_dir]
Exit code 1 if any un-allowlisted antipattern is found.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from admira_etl_project_prueba_spark.plans.catalog import CATALOG
from admira_etl_project_prueba_spark.session import get_spark

# Queries where a nested-loop join is the *intended* plan because one side
# is bounded by construction (1-row scalar/limit, or an explicitly bounded
# candidate universe for an exact-baseline operator).
NESTED_LOOP_ALLOWED = {
    "ann_cosine_topk",          # 1-row query vector broadcast
    "ann_cosine_topk_batch",    # 8-row query side broadcast
    "ann_lsh_topk",             # 1-row query vector broadcast
    "ann_ivf_topk",             # 1-row query + n_probe-row probe list
    "ann_ivf_topk_indexed",     # same shape over the persisted index
    "ann_ivf_topk_index_only",  # same shape; candidates from pruned lists
    "ann_ivf_assignments",      # centroid side fixed at n_centroids rows
    "semantic_dedup_pairs",     # embeds the same n_centroids-row argmax
    "semantic_dedup_survivors", # ditto (pairs feed the anti-join)
    "ann_near_dup_pairs",       # bounded universe (vec_id < 200), a < b self-join
    "ngram_jaccard_pairs",      # bounded universe (doc_id < 500), exact baseline
    "q22_lapsed_customers",     # 1-row scalar AVG broadcast
    "q11_important_parts",      # 1-row scalar (total, n_parts) broadcast
    "q15_top_supplier",         # 1-row scalar MAX broadcast
    "tfidf_top_terms",          # 1-row corpus-size (N) broadcast
    "bm25_search",              # 1-row corpus-stats (N, avgdl) broadcast
    "bm25_search_indexed",      # same 1-row stats broadcast, postings-pruned
    "hybrid_search_rrf",        # embeds bm25's 1-row stats broadcast
    "kmeans_centroids",         # k-row (model-sized) centroid broadcast per round
    "dsir_importance_weights",  # two 1-row corpus-total broadcasts into the dist
    "lm_cross_entropy_scores",  # 1-row reference-total broadcast into the dist
    "source_token_kl",          # 1-row corpus-total broadcast into the terms
    "lsh_recall_report",        # 1-row x 1-row scalar combine of two aggregates
    "dup_cluster_profile",      # 1-row corpus-total broadcast into the histogram
    "knn_label_accuracy",       # embeds ivf_assign's n_centroids-row argmax
    "ivf_split_occupancy",      # embeds ivf_assign's n_centroids-row argmax
    "ann_ivfpq_topk",           # 1-row query + n_probe-row probe list
    "ann_ivfpq_topk_indexed",   # same shape over the persisted code store
    "pq_recall_report",         # embeds the 1-row-query exact/ADC/IVF-PQ top-k trio
    "ann_ivfpq_residual_topk",  # 1-row query + n_probe probe + n_centroids argmax
    "ann_ivfpq_rerank_topk",    # same 1-row query broadcasts + 50-row shortlist rerank
    "ann_ivfpq_rerank_indexed", # same shape over the persisted code store
    "pq_residual_reconstruction_error",  # embeds ivf_assign's n_centroids-row argmax
    "bpe_learned_merges",       # 1-row best-merge broadcast per trainer round
    "bpe_encode_stats",         # same 1-row merge broadcasts inside the encoder
    "vocab_growth_curve",       # 1-row (min,max doc_id) broadcast into the binning
    "mixture_plan",             # 1-row max_exact_budget broadcast into the plan
    "user_rfm_segments",        # 1-row anchor-date broadcast into the user frame
    "user_rfm_segments_sampled",     # same anchor broadcast + 1-row edges broadcast
    "user_value_quartiles_sampled",  # 1-row quantile-edges broadcast
    "curriculum_stages_sampled",     # 1-row quantile-edges broadcast
    "quality_calibrated_sampled",    # 1-row quantile-grid broadcast
    "supplier_revenue_distribution_sampled",  # 1-row quantile-grid broadcast
    "basket_part_lift",         # 1-row order-count broadcast into the pair frame
    "events_session_paths",     # 1-row session-total broadcast into the paths
    "ann_ivf_occupancy",        # 1-row vector-total broadcast into the per-list frame
    "ann_cosine_topk_queryvec",   # 1-row LITERAL query broadcast (external embedding)
    "ann_ivfpq_topk_queryvec",    # 1-row literal query + n_probe probe list
    "ann_ivfpq_queryvec_indexed", # same shape over the persisted code store
    "ann_ivfpq_rerank_queryvec",  # literal query broadcasts + 50-row shortlist rerank
    "kmeans_centroids_sampled",   # k-row (model-sized) centroid broadcast per round
    "pq_recall_report_normalized",  # embeds the 1-row-query exact/ADC/IVF-PQ trio
    "clustered_pq_recall",      # same trio over the clustered fixture
    "clustered_nn_integrity",   # bounded query sample (vec_id<1000, %29) broadcast
    "knn_join_bulk",            # probe assignment broadcasts the MODEL side
                                # (centroids) onto the distributed query frame
    "knn_join_rerank",          # same probe shape; the rerank stage adds only
                                # KEY joins (shortlist ⋈ corpus on vec_id,
                                # ⋈ query on query_id) — no new broadcasts
    "bpe_encode_from_artifact_deep",  # 1-row ordered merge-array frame
                                # broadcast onto the vocabulary (encode fold)
    "ann_pq_topk_normalized",     # 1-row query distance-table broadcast
    "pq_codebooks_sampled",       # model-sized codebook broadcast per Lloyd round
    "pq_codes_sampled_train",     # same broadcast in the frozen-model encode
    "ann_lsh_topk_queryvec",      # 1-row literal query broadcast into its bucket
    "ann_ivf_topk_queryvec",      # 1-row literal query + n_probe probe list
    "ann_ivfpq_topk_batch",       # 8-row query batch + per-query probe lists broadcast
    "ann_ivfpq_batch_indexed",    # same shape over the persisted code store
}

# Queries whose single-partition window sort is the INTENDED exact form:
# each runs on a reduced, model-thin frame (per-user / per-doc scalars,
# never text) and has a documented scale-safe sampled twin that assigns
# the same buckets from approx_percentile edges with no global order —
# the exact form stays ONLY because it is the DuckDB oracle.
SINGLE_PARTITION_SORT_ALLOWED = {
    "user_value_quartiles",   # sampled twin: user_value_quartiles_sampled
    "user_rfm_segments",      # sampled twin: user_rfm_segments_sampled
    "curriculum_stages",      # sampled twin: curriculum_stages_sampled
    "quality_calibrated",     # sampled twin: quality_calibrated_sampled
    "supplier_revenue_distribution",  # twin: supplier_revenue_distribution_sampled
    # day-grain time series: the window input is the post-aggregation
    # calendar frame — bounded by elapsed DAYS (36.5k rows/century), not
    # by fact-table size; an ordered global window over it is the
    # intended shape at any corpus scale
    "events_moving_avg",
    "events_daily_gapfill",
    # the offset-cumsum window runs over the per-partition COUNT frame
    # (one row per shuffle partition — thousands of rows at any scale);
    # the corpus itself is range-partitioned and never single-partitioned
    "documents_contiguous_ids",
    # the global seed-numbering window runs over the SPLIT DEFICIT frame
    # (one row per new inverted list, Σ(s-1) rows — model-sized by
    # construction, never the corpus; similarity._ivf_split_parts)
    "ivf_split_occupancy",
    # the cumulative fold runs over the n_bins-row (default 10) summary
    # frame — bounded by the bin count at any corpus size
    "vocab_growth_curve",
}


_ART = re.compile(r"^[\s:+*\-]*")


def _depth(line: str) -> int:
    """Tree depth of a plan line = width of the leading tree art."""
    return _ART.match(line).end()


def single_partition_sort_hits(plan: str) -> list[str]:
    """Occurrences of the global-window-sort anti-pattern: an ``Exchange
    SinglePartition`` whose parent chain is a Sort/Window and whose
    subtree is NOT bounded by a Limit/TakeOrdered.  Returns the parent
    operator line for each hit (empty list = plan is scale-clean)."""
    lines = plan.splitlines()
    hits = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = _depth(line)
        # nearest 2 ancestors: lines above with strictly smaller depth
        parents, cur = [], d
        for j in range(i - 1, -1, -1):
            pj = _depth(lines[j])
            if pj < cur:
                parents.append(_ART.sub("", lines[j]))
                cur = pj
            if len(parents) == 2 or cur == 0:
                break
        # "Sort [" / "Window [" are the window-sort operators; SortAggregate
        # (a 1-row scalar aggregate) must NOT match.  Whole-stage codegen
        # prints them as "*(3) Sort [...]" — the leading-art strip leaves
        # the "(3) " stage id, so the match allows that optional prefix
        if not any(
            re.match(r"(?:\(\d+\)\s*)?(Sort|Window)\s*\[", p) for p in parents
        ):
            continue  # scalar-aggregate / shuffle exchange — fine
        # bounded subtree? (a limit above a window is NOT a bound on the sort)
        subtree = []
        for j in range(i + 1, len(lines)):
            if _depth(lines[j]) <= d:
                break
            subtree.append(lines[j])
        if any(
            re.search(r"TakeOrderedAndProject|GlobalLimit|CollectLimit", s)
            for s in subtree
        ):
            continue  # sorts at most k rows by construction
        hits.append(parents[0] if parents else _ART.sub("", line))
    return hits


def audit(sf_dir: str) -> int:
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    # plan building is analyzer/optimizer work in the JVM (the py4j call
    # releases the GIL), so planning the 200+ entries from a thread pool
    # overlaps the per-query latency; results are re-sorted so the report
    # stays deterministic and the per-entry checks are unchanged
    from concurrent.futures import ThreadPoolExecutor

    def build_plan(item):
        name, entry = item
        return name, (
            entry.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )

    with ThreadPoolExecutor(max_workers=8) as pool:
        plans = dict(pool.map(build_plan, sorted(CATALOG.items())))
    for name in sorted(plans):
        plan = plans[name]
        exchanges = len(re.findall(r"\bExchange\b", plan))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_ALLOWED:
            flags.append("NESTED_LOOP")
        if "BatchEvalPython" in plan:
            flags.append("ROW_PYTHON")
        sp_hits = single_partition_sort_hits(plan)
        if sp_hits and name not in SINGLE_PARTITION_SORT_ALLOWED:
            flags.append(f"SINGLE_PARTITION_SORT×{len(sp_hits)}")
        elif sp_hits:
            print(f"      {name}: {len(sp_hits)} allowlisted single-partition "
                  f"sort(s) — see SINGLE_PARTITION_SORT_ALLOWED rationale")
        status = "FLAG" if flags else "ok"
        print(f"{status:4}  {name}: exchanges={exchanges}"
              + (f"  [{', '.join(flags)}]" if flags else ""))
        if flags:
            failures.append((name, flags))
    if failures:
        print(f"\n{len(failures)} queries with un-allowlisted antipatterns:")
        for name, flags in failures:
            print(f"  {name}: {flags}")
        return 1
    print(f"\nall {len(CATALOG)} plans clean")
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(audit(sf))
