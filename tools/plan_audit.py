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
    "mixture_plan",             # 1-row max_exact_budget broadcast into the plan
    "user_rfm_segments",        # 1-row anchor-date broadcast into the user frame
    "events_session_paths",     # 1-row session-total broadcast into the paths
}


def audit(sf_dir: str) -> int:
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, entry in sorted(CATALOG.items()):
        plan = entry.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        exchanges = len(re.findall(r"\bExchange\b", plan))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_ALLOWED:
            flags.append("NESTED_LOOP")
        if "BatchEvalPython" in plan:
            flags.append("ROW_PYTHON")
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
