"""Compare two bench detail files (e.g. sf0.1 vs sf1.0) against each
query's recorded growth law.

Usage:
    python tools/scale_compare.py BENCH_DETAIL.json docs/bench_sf1.0_detail.json [factor]

Prints a markdown table (slowest-at-target first) of per-query wall
ratios vs the law's allowance, and a verdict per query.  ``factor`` is
the data-size ratio between the two runs (default 10).

The law table below encodes each query's THEORETICAL scaling exponent
at a ``factor``× corpus, from docs/SCALE.md's measured rehearsals:

- linear        — work tracks rows: allowed ratio = factor (×  headroom)
- sublinear     — probe-/limit-/domain-bounded: allowed = factor/2
- nlogn         — sort-shaped: allowed = factor · log10 slack
- quad_fixed_k  — cluster-bounded op with a FIXED centroid/plane count
                  while the corpus grows: pair volume ~ factor² (the
                  documented provisioning hazard docs/SCALE.md measured
                  at 101.5×; the catalog entries pin k, so the BENCH
                  time follows the hazard law — the production posture
                  scales k with the corpus instead)
- pairs         — near-dup-pair ops with boundedness built in (prefix/
                  df caps): linear in pairs, allowed = factor
Headroom: measured wall ratios sit BELOW the semantic exponent when
fixed overheads (session, plan, small shuffles) amortize, and can sit
somewhat above on sub-second bases where constant costs double-count;
ALLOW = exponent × HEADROOM is the 2× review line the verdict asked
for ("any query >2× its law gets a plan fix or an updated-law cause").
"""

from __future__ import annotations

import json
import math
import sys

HEADROOM = 2.0

SUBLINEAR = {
    # top-k probes, point lookups, domain-bounded outputs
    "ann_cosine_topk", "ann_cosine_topk_batch", "ann_ivf_topk",
    "metrics_by_channel_page1", "export_day", "ingest_consolidate",
    "kmeans_centroids", "cms_stopword_counts", "events_hll_merge_days",
    "embeddings_random_projection", "embedding_drift",
}
QUAD_FIXED_K = {
    # Σ|cluster|² ops whose catalog entry pins k/planes while the corpus
    # grows — the measured 101.5×-at-10× hazard arm (docs/SCALE.md);
    # production scales k (ivf_split_occupancy / retrain close the loop)
    "semantic_dedup_survivors", "knn_label_accuracy",
    "contrastive_negative_samples", "leakage_safe_split",
    "simhash_near_dup_pairs", "sorted_neighborhood_pairs",
    "dup_cluster_profile", "lsh_near_dup_pairs", "lsh_incremental_pairs",
    "lsh_recall_report", "forget_propagation", "corpus_diff",
    "decontaminate", "contamination_scores", "prefix_jaccard_pairs",
    "containment_pairs", "token_typo_pairs", "bloom_dedup_prefilter",
    "phrase_search", "ngram_novelty_scores", "build_training_corpus",
    "line_dedup_stats",
}
NLOGN = {"events_zorder_keys", "events_sessionize", "events_session_paths"}
SUBLINEAR |= {
    # one corpus-sized word count, then every trainer round runs over the
    # VOCABULARY, which grows ~Heaps-sublinearly with the corpus
    "bpe_learned_merges",
    # bounded query sample (vec_id < 1000 cap) × corpus scan: the
    # broadcast side is FIXED as the corpus grows, so the pair volume —
    # and the ADC/probe work — track the corpus linearly at worst; the
    # recall report additionally caps at its k/depth constants
    "clustered_nn_integrity",
    "clustered_pq_recall",
}
QUAD_FIXED_K |= {
    # query side is a fixed FRACTION of the corpus (vec_id % 37) against
    # fixed-k lists: candidate volume ~ (n/37)·(n/k_lists) — the same
    # pinned-k hazard arm as the other pair ops (production scales k)
    "knn_join_bulk",
    # the rerank tier adds only shortlist-sized key joins (n_q·depth
    # rows) on top of the same ADC chain — the ADC stage dominates
    "knn_join_rerank",
}
# video_container_features: per-payload box walk, corpus-linear — the
# default linear law applies (no entry needed)
SUBLINEAR |= {
    # trainer rounds over the Heaps-sublinear vocabulary; the encode
    # fold is vocabulary-sized too (corpus enters via one hash join)
    "bpe_learned_merges_deep",
    "bpe_encode_from_artifact_deep",
}


def allowance(name: str, factor: float) -> tuple[str, float]:
    if name in QUAD_FIXED_K:
        return "quad(fixed-k/pairs)", factor * factor * HEADROOM
    if name in SUBLINEAR:
        return "sublinear", factor / 2 * HEADROOM
    if name in NLOGN:
        return "nlogn", factor * (1 + math.log10(factor)) * HEADROOM
    return "linear", factor * HEADROOM


def main() -> int:
    base_f, target_f = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    base = json.load(open(base_f))
    target = json.load(open(target_f))
    bq = base.get("best3") or base["queries"]
    tq = target.get("best3") or target["queries"]
    rows = []
    for name, t_sec in tq.items():
        if name not in bq:
            continue
        ratio = t_sec / max(bq[name], 1e-9)
        law, allow = allowance(name, factor)
        verdict = "OK" if ratio <= allow else "REVIEW"
        rows.append((t_sec, name, bq[name], ratio, law, allow, verdict))
    rows.sort(reverse=True)
    print("| query | base s | target s | ratio | law | allow | verdict |")
    print("|---|---|---|---|---|---|---|")
    for t_sec, name, b_sec, ratio, law, allow, verdict in rows:
        print(
            f"| {name} | {b_sec:.2f} | {t_sec:.2f} | {ratio:.1f}x "
            f"| {law} | {allow:.0f}x | {verdict} |"
        )
    n_bad = sum(1 for r in rows if r[-1] == "REVIEW")
    print(f"\n{len(rows)} compared, {n_bad} over allowance")
    return 0


if __name__ == "__main__":
    sys.exit(main())
