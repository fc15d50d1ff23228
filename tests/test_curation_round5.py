"""Round-5 curation operators — planted-fixture tests for the paths the
synthetic corpus doesn't exercise (it has no exact duplicates): the
duplication histogram, deletion propagation across duplicates, per-source
quality calibration, n-gram novelty, and BPE merge statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators import textops


def docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight nine ten"
    return docs(
        spark,
        [
            (1, a, "en", "feed_x"),
            (2, a, "en", "feed_y"),            # exact dup of 1, other source
            (3, "  " + a.upper() + " ", "en", "feed_y"),  # normalized dup of 1
            (4, b, "en", "feed_x"),
            (5, b, "en", "feed_x"),            # exact dup of 4
            (6, "unique words entirely here now", "en", "feed_y"),
            (7, "zz", "en", None),             # < 3 tokens ⇒ shingle-less
        ],
    )


def test_dup_cluster_profile_histogram(corpus):
    rows = {
        r["n_copies"]: r
        for r in textops.dup_cluster_profile(corpus).collect()
    }
    # exact (non-normalized): {a: docs 1,2} size 2, {b: docs 4,5} size 2,
    # docs 3, 6, 7 singletons
    assert rows[2]["n_clusters"] == 2 and rows[2]["n_docs"] == 4
    assert rows[1]["n_clusters"] == 3 and rows[1]["n_docs"] == 3
    assert abs(rows[2]["pct_docs"] - 4 / 7) < 1e-12
    assert sum(r["n_docs"] for r in rows.values()) == 7


def test_dup_cluster_profile_normalized_merges_case_variants(corpus):
    rows = {
        r["n_copies"]: r
        for r in textops.dup_cluster_profile(corpus, normalized=True).collect()
    }
    # normalized: doc 3 joins {1,2} ⇒ one size-3 cluster, one size-2, two singletons
    assert rows[3]["n_clusters"] == 1
    assert rows[2]["n_clusters"] == 1
    assert rows[1]["n_clusters"] == 2


def test_forget_propagation_reaches_duplicates(corpus):
    out = {
        r["doc_id"]: r["reason"]
        for r in textops.forget_propagation(corpus, [1]).collect()
    }
    # normalized propagation: listed doc 1, plus exact dup 2 AND case-variant 3
    assert out == {1: "listed", 2: "duplicate_of_listed", 3: "duplicate_of_listed"}


def test_forget_propagation_exact_mode_skips_case_variant(corpus):
    out = {
        r["doc_id"]: r["reason"]
        for r in textops.forget_propagation(corpus, [1], normalized=False).collect()
    }
    assert out == {1: "listed", 2: "duplicate_of_listed"}


def test_forget_propagation_empty_list_raises(corpus):
    with pytest.raises(ValueError):
        textops.forget_propagation(corpus, [])


def test_quality_calibrated_percentiles_are_source_relative(corpus):
    rows = {
        r["doc_id"]: r
        for r in textops.quality_calibrated(corpus, exact=True).collect()
    }
    assert rows[7]["source"] == textops.UNKNOWN_SOURCE
    # within each source the max-quality doc has pct 1.0 (unless alone)
    for src in {"feed_x", "feed_y"}:
        grp = [r for r in rows.values() if r["source"] == src]
        top = max(grp, key=lambda r: (r["quality_raw"], r["doc_id"]))
        assert top["q_pct_source"] == 1.0
    # the single (unknown)-source doc: percent_rank over n=1 is 0
    assert rows[7]["q_pct_source"] == 0.0
    # global percentile is a valid rank: all docs in [0, 1], exactly one 0
    pcts = sorted(r["q_pct_global"] for r in rows.values())
    assert pcts[0] == 0.0 and pcts[-1] == 1.0


def test_ngram_novelty_planted(corpus):
    rows = {
        r["doc_id"]: r for r in textops.ngram_novelty_scores(corpus).collect()
    }
    # docs 1/2/3 share ALL their shingles (same normalized text tokens
    # differ for 3 — uppercase is lowered by the tokenizer, so 3 matches too)
    assert rows[1]["novelty"] == 0.0 and rows[2]["novelty"] == 0.0
    assert rows[3]["novelty"] == 0.0
    # doc 6 is fully novel
    assert rows[6]["novelty"] == 1.0
    assert rows[6]["n_shared"] == 0
    # doc 7 has < 3 tokens: no shingles, NULL novelty (not a fake 1.0)
    assert rows[7]["n_shingles"] == 0 and rows[7]["novelty"] is None
    # every document appears exactly once
    assert sorted(rows) == [1, 2, 3, 4, 5, 6, 7]


def test_bpe_merge_candidates_counts_weighted_pairs(spark):
    d = docs(
        spark,
        [
            (1, "aaa ab", "en", "s"),
            (2, "aaa", "en", "s"),
            (3, "b", "en", "s"),  # length-1 token contributes no pair
        ],
    )
    out = {r["pair"]: r["freq"] for r in textops.bpe_merge_candidates(d).collect()}
    # 'aaa' occurs 2× and holds 2 'aa' pairs each ⇒ 4; 'ab' occurs once ⇒ 1
    assert out == {"aa": 4, "ab": 1}


def test_bpe_merge_candidates_top_n_and_determinism(corpus):
    top = textops.bpe_merge_candidates(corpus, top_n=5)
    rows = top.collect()
    assert len(rows) == 5
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # deterministic across runs (ordering ties broken by pair)
    assert rows == textops.bpe_merge_candidates(corpus, top_n=5).collect()


def test_curriculum_stages_orders_by_length(corpus):
    rows = {
        r["doc_id"]: r
        for r in textops.curriculum_stages(corpus, exact=True).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4, 5, 6, 7]
    # shortest doc (7: 'zz') is stage 1; longest (4/5: 10 tokens) stage 4
    assert rows[7]["stage"] == 1
    assert rows[5]["stage"] == 4
    # stages are monotone in (n_tokens, doc_id) order
    ordered = sorted(rows.values(), key=lambda r: (r["n_tokens"], r["doc_id"]))
    stages = [r["stage"] for r in ordered]
    assert stages == sorted(stages)
    # bucket sizes differ by at most one
    from collections import Counter
    sizes = Counter(stages)
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_tokenizer_fertility_exact_counts(spark):
    d = docs(
        spark,
        [
            (1, "aa bb", "en", "s"),      # 2 tokens, 5 chars
            (2, "ccc", "en", "s"),        # 1 token, 3 chars
            (3, "dddd", "fr", "s"),       # 1 token, 4 chars
            (4, "e f", None, "s"),        # lang NULL -> (unknown)
        ],
    )
    rows = {r["lang"]: r for r in textops.tokenizer_fertility(d).collect()}
    en = rows["en"]
    assert (en["n_docs"], en["n_tokens"], en["n_chars"]) == (2, 3, 8)
    assert en["chars_per_token"] == 8 / 3
    assert rows["fr"]["tokens_per_doc"] == 1.0
    assert rows["(unknown)"]["n_tokens"] == 2


def test_lang_source_mismatch_flags_minority_lang(spark):
    d = docs(
        spark,
        [
            (1, "x", "en", "a"),
            (2, "x", "en", "a"),
            (3, "x", "fr", "a"),   # minority in a -> flagged
            (4, "x", "fr", "b"),
            (5, "x", "en", "b"),   # 1-1 tie in b: dominant = min lang 'en'
        ],
    )
    out = {r["doc_id"]: r for r in textops.lang_source_mismatch(d).collect()}
    assert set(out) == {3, 4}
    assert out[3]["dominant_lang"] == "en"
    assert abs(out[3]["dominant_share"] - 2 / 3) < 1e-12
    # tie in source b resolves to the smaller lang -> fr doc flagged
    assert out[4]["dominant_lang"] == "en"
    assert out[4]["dominant_share"] == 0.5


def test_knn_label_accuracy_separable_clusters(spark):
    from admira_etl_project_prueba_spark.operators import similarity

    # two tight, well-separated label groups in 4-d; centroids are the
    # first 2 vectors (one per group) so IVF splits them cleanly
    rows = []
    for i in range(6):
        rows.append((i * 2, [10.0 + i * 0.01, 0.0, 0.0, 1.0], 0))
        rows.append((i * 2 + 1, [0.0, 10.0 + i * 0.01, 0.0, 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["label"]: r
        for r in similarity.knn_label_accuracy(emb, n_centroids=2, k=3).collect()
    }
    assert set(out) == {0, 1}
    for lbl in (0, 1):
        assert out[lbl]["n_vecs"] == 6
        assert out[lbl]["n_correct"] == 6
        assert out[lbl]["accuracy"] == 1.0


def test_knn_label_accuracy_excludes_neighborless_vectors(spark):
    from admira_etl_project_prueba_spark.operators import similarity

    # centroid universe = first 2 vectors; vec 2 sits alone in cluster 1
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 1),
            (2, [0.0, 0.9], 1),
            (3, [0.9, 0.1], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity.knn_label_accuracy(emb, n_centroids=2, k=3)
    total = sum(r["n_vecs"] for r in out.collect())
    assert total == 4  # every vector has >= 1 cluster-mate here


def test_round5_ops_are_partitioning_invariant(corpus, spark):
    """Deterministic tie-breaks make every round-5 op bit-stable under any
    physical layout — the property the oracle gate implicitly relies on."""
    from admira_etl_project_prueba_spark.operators import similarity

    for fn in (
        textops.curriculum_stages,
        textops.quality_calibrated,
        textops.ngram_novelty_scores,
        textops.tokenizer_fertility,
        textops.lang_source_mismatch,
        textops.dup_cluster_profile,
    ):
        base = sorted(map(tuple, fn(corpus).collect()))
        rep = sorted(map(tuple, fn(corpus.repartition(7)).collect()))
        assert base == rep, fn.__name__

    emb = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5), 1.0], i % 3) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    base = sorted(
        map(tuple, similarity.knn_label_accuracy(emb, n_centroids=4).collect())
    )
    rep = sorted(
        map(
            tuple,
            similarity.knn_label_accuracy(
                emb.repartition(11), n_centroids=4
            ).collect(),
        )
    )
    assert base == rep


def test_leakage_safe_split_keeps_clusters_together(spark):
    # 3 clusters of exact near-dups (high shingle overlap) + 2 singletons
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    did = 0
    for c in range(3):
        stem = base.replace("alpha", f"stem{c}")
        for j in range(4):
            rows.append((did, stem + f" tail{j}", "en", "s"))
            did += 1
    rows += [(100, "totally different words here now", "en", "s"),
             (101, "another unrelated document body text", "en", "s")]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = textops.leakage_safe_split(d).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    comp_of = {r["doc_id"]: r["component"] for r in out}
    # every member of a component shares its split — the leakage guard
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    # the three planted clusters are actually clusters (not all singletons)
    assert len(set(comp_of[i] for i in range(4))) == 1
    assert len(set(split_of.values())) >= 1  # both labels possible, not required


def test_oov_rate_planted(spark):
    ref = spark.createDataFrame(
        [(1, "known words only", "en", "r")],
        "doc_id long, text string, lang string, source string",
    )
    cur = spark.createDataFrame(
        [(2, "known words plus novel ones", "en", "a"),
         (3, "known known", "en", "b")],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["source"]: r for r in textops.oov_rate(cur, ref).collect()}
    # source a: 5 tokens, 'plus' 'novel' 'ones' unseen -> 3/5
    assert out["a"]["n_tokens"] == 5 and out["a"]["n_oov"] == 3
    assert out["a"]["oov_rate"] == 3 / 5
    assert out["b"]["n_oov"] == 0 and out["b"]["oov_rate"] == 0.0


def test_mixture_plan_rates_and_saturation(spark):
    d = spark.createDataFrame(
        [(i, "w " * 10, "en", "big") for i in range(10)]
        + [(100 + i, "w " * 10, "en", "small") for i in range(2)],
        "doc_id long, text string, lang string, source string",
    )
    # tokens: trim drops the trailing space, so 10 per doc: big=100, small=20
    plan = {r["source"]: r for r in textops.mixture_plan(
        d, {"big": 0.5, "small": 0.5}, budget_tokens=100
    ).collect()}
    assert plan["big"]["target_tokens"] == 50.0
    assert not plan["big"]["saturated"]
    assert plan["small"]["saturated"]  # target 50 > 22 available
    assert plan["small"]["rate"] == 1.0
    assert plan["small"]["expected_tokens"] == plan["small"]["n_tokens"]
    # max exact budget: small caps it at 20 / 0.5 = 40
    assert plan["big"]["max_exact_budget"] == 40.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        textops.mixture_plan(d, {"big": 1.0}, budget_tokens=0)


def test_mixture_plan_unweighted_source_is_audited_not_dropped(spark):
    d = spark.createDataFrame(
        [(1, "a b", "en", "x"), (2, "a b", "en", "y")],
        "doc_id long, text string, lang string, source string",
    )
    plan = {r["source"]: r for r in textops.mixture_plan(
        d, {"x": 1.0}, budget_tokens=10
    ).collect()}
    assert set(plan) == {"x", "y"}
    assert plan["y"]["weight"] == 0.0 and plan["y"]["rate"] == 0.0


def test_packing_stats_exact_counts(spark):
    # shard 0: doc 0 (3 tokens), doc 1 (4 tokens) with budget 5:
    # stream = 7 tokens -> 2 sequences, tail waste 3; doc 1 starts at
    # offset 3 and ends at 6 -> straddles the 5-token boundary
    d = spark.createDataFrame(
        [(0, "a b c", "en", "s"), (1, "d e f g", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    r = textops.packing_stats(d, token_budget=5, docs_per_shard=None).collect()[0]
    assert (r["n_docs"], r["total_tokens"]) == (2, 7)
    assert r["n_sequences"] == 2 and r["tail_waste_tokens"] == 3
    assert r["n_straddling"] == 1
    assert r["utilization"] == 7 / 10


def test_packing_stats_giant_doc_counts_all_sequences(spark):
    # one 23-token doc at budget 5 occupies ceil(23/5)=5 sequences even
    # though only one pack_id holds a document START
    d = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(23)), "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    r = textops.packing_stats(d, token_budget=5, docs_per_shard=None).collect()[0]
    assert r["n_sequences"] == 5 and r["tail_waste_tokens"] == 2
    assert r["n_straddling"] == 1


def test_corpus_health_report_planted(corpus):
    from admira_etl_project_prueba_spark.operators.profile import (
        corpus_health_report,
    )

    rows = {
        (r["section"], r["key"]): r["value"]
        for r in corpus_health_report(corpus).collect()
    }
    assert rows[("size", "n_docs")] == 7.0
    # exact normalized dup share: docs 2,3,5 are removable copies
    assert abs(rows[("dup", "dup_share")] - 3 / 7) < 1e-12
    assert ("fertility", "en") in rows
    assert 0.0 <= rows[("quality", "kept_fraction")] <= 1.0
    assert 0.0 <= rows[("novelty", "shared_shingle_rate")] <= 1.0
    assert rows[("lang_mismatch", "mismatch_rate")] == 0.0  # all en per source


def test_corpus_health_endpoint_envelope(spark, corpus):
    from admira_etl_project_prueba_spark.corpus_service import CorpusService

    out = CorpusService(spark, documents=corpus).health_report()
    assert out["request_id"]
    assert set(out["data"]) == {
        "size", "dup", "novelty", "fertility", "lang_mismatch", "quality"
    }
    assert out["data"]["size"]["n_docs"] == 7.0


def test_training_shards_round_trip(spark, tmp_path, sf_dir):
    """Shard sink round-trip: partition-pruned per-shard reads return the
    stream in doc order with offsets intact (cumulative-sum invariant),
    one parquet file per shard directory."""
    import glob

    from admira_etl_project_prueba_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    textops.write_training_shards(
        docs, path, token_budget=512, docs_per_shard=100
    )
    shard0 = textops.read_training_shard(spark, path, 0).collect()
    assert [r["doc_id"] for r in shard0] == sorted(r["doc_id"] for r in shard0)
    # offsets reconstruct the contiguous stream: start_{i+1} = start_i + n_i
    for a, b in zip(shard0, shard0[1:]):
        assert b["start_offset"] == a["start_offset"] + a["n_tokens"]
    assert shard0[0]["start_offset"] == 0
    # every doc_id 0..99 is in shard 0 and text survived
    assert len(shard0) == 100 and all(r["text"] for r in shard0)
    # one file per shard directory (repartition-before-partitionBy)
    for d in glob.glob(f"{path}/shard=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d
