"""Connected components + dedup clustering: planted-graph correctness and
the survivor-election contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_components_on_planted_shapes(spark):
    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, isolated pair {20,21}
    e = edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_long_chain_converges(spark):
    n = 12  # diameter > a couple of naive rounds
    e = edges(spark, [(i, i + 1) for i in range(n)])
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_components_unconverged_raises(spark):
    e = edges(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError):
        connected_components(e, max_iter=1)


def test_star_driver_fast_path_equals_distributed(spark, monkeypatch):
    """The bounded in-process union-find (edge set ≤ _CC_DRIVER_EDGE_MAX
    collected once, components closed on the driver) labels EXACTLY like
    the distributed large-star/small-star loop — same smallest-reachable-
    id contract, self-loop-only nodes labeled, string-typed ids intact —
    and the distributed loop still closes the 64-node chain within its
    logarithmic round budget (the coverage the fast path would otherwise
    absorb)."""
    from admira_etl_project_prueba_spark.operators import graph as G

    shapes = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        [(i, i + 1) for i in range(64)],                    # deep chain
        [(0, i) for i in range(1, 9)],                      # star, hub=min
        [(5, 5), (1, 2)],                                   # self-loop noise
    ]
    for rows in shapes:
        e = edges(spark, rows)
        fast = {
            r["node"]: r["component"]
            for r in G.connected_components_star(e, max_iter=12).collect()
        }
        monkeypatch.setattr(G, "_CC_DRIVER_EDGE_MAX", 0)
        slow = {
            r["node"]: r["component"]
            for r in G.connected_components_star(e, max_iter=12).collect()
        }
        monkeypatch.undo()
        assert fast == slow, rows

    # non-numeric ids survive the driver path (string ordering == Spark's)
    se = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "x")], "src string, dst string"
    )
    got = {
        r["node"]: r["component"]
        for r in G.connected_components_star(se).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x"}


def test_dedup_clusters_survivor_election(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # near-dups: {0,1,2} via transitivity (0-1, 1-2), {4,5}; 3 standalone;
    # the weak 2-3 edge is below threshold and must NOT merge
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.8), (4, 5, 0.95), (2, 3, 0.3)],
        "doc_a long, doc_b long, jaccard double",
    )
    out = {r["doc_id"]: (r["component"], r["keep"]) for r in dedup_clusters(docs, pairs).collect()}
    assert out == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (4, True), 5: (4, False),
    }


def test_best_survivor_prefers_longest(spark):
    """The longest member of a near-dup cluster survives, not the smallest
    id; ties fall back to smallest id; singletons keep themselves."""
    from admira_etl_project_prueba_spark.operators import textops
    from admira_etl_project_prueba_spark.operators.graph import dedup_best_survivors

    base = (
        "the quick brown fox jumps over the lazy dog while the spark engine "
        "aggregates partitions of shuffled data across the cluster nodes"
    )
    longer = base + " with extra trailing context that near dup truncated away"
    docs = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, longer, "en"),                 # near dup of 1, longer → wins
            (9, "a lonely unrelated doc about gardening in autumn rain", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_best_survivors(docs, textops.lsh_candidate_pairs(docs)).collect()
    }
    assert out[1]["component"] == out[2]["component"]
    assert not out[1]["keep"] and out[2]["keep"]   # longest wins despite id 2 > 1
    assert out[9]["keep"] and out[9]["component"] == 9

def test_star_components_match_label_propagation(spark):
    """large-star/small-star produces the identical labeling on planted
    shapes and seeded random graphs — same contract, different round
    complexity."""
    import random

    from admira_etl_project_prueba_spark.operators.graph import (
        connected_components_star,
    )

    shapes = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        [(i, i + 1) for i in range(12)],                    # chain
        [(0, i) for i in range(1, 9)],                      # star, hub = min
        [(9, i) for i in range(9)],                         # star, hub = max
        [(5, 5), (1, 2)],                                   # self-loop noise
    ]
    rng = random.Random(7)
    for _ in range(3):                                      # seeded random graphs
        n = 40
        shapes.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
        )
    # shapes are independent graphs — run each shape's pair of CC jobs on
    # its own thread (same graphs, same equality assertions; the iterative
    # per-round jobs of different shapes overlap instead of serializing)
    from concurrent.futures import ThreadPoolExecutor

    def check(rows):
        # self-loops reach both implementations unstripped — (5, 5) must
        # yield a self-labeled node from each, not get filtered here
        e = edges(spark, rows)
        lp = {r["node"]: r["component"] for r in connected_components(e).collect()}
        st = {
            r["node"]: r["component"]
            for r in connected_components_star(e).collect()
        }
        assert st == lp, rows

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(check, shapes))


def test_star_components_converge_on_deep_chain(spark):
    """The payoff: a 64-node chain (diameter 63) closes within the star
    variant's logarithmic round budget, where min-label propagation at the
    same max_iter provably cannot reach its fixed point."""
    from admira_etl_project_prueba_spark.operators.graph import (
        connected_components_star,
    )

    n = 64
    e = edges(spark, [(i, i + 1) for i in range(n - 1)])
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(e, max_iter=12).collect()
    }
    assert set(got.values()) == {0} and len(got) == n
    with pytest.raises(RuntimeError):
        connected_components(e, max_iter=12)


def test_pagerank_mass_conservation_and_structure(spark):
    from admira_etl_project_prueba_spark.operators.graph import pagerank

    # star: a -> b, a -> c; b and c are dangling
    r = {row["node"]: row["rank"]
         for row in pagerank(edges(spark, [(0, 1), (0, 2)]), iters=3).collect()}
    assert set(r) == {0, 1, 2}
    # symmetric sinks tie exactly; sinks outrank the source (they receive
    # contributions, the source only teleport + dangling share)
    assert r[1] == r[2]
    assert r[1] > r[0]
    # rank mass conserved up to the decimal(25,6) contribution quantization
    assert abs(sum(r.values()) - 1.0) < 1e-3
    # all ranks at least the teleport floor
    assert all(v > 0.15 / 3 - 1e-9 for v in r.values())


def test_pagerank_is_partitioning_invariant(spark):
    from admira_etl_project_prueba_spark.operators.graph import pagerank

    e = [(i, (i * 7) % 23) for i in range(60)] + [(3, 5), (5, 3), (11, 3)]
    one = {r["node"]: r["rank"]
           for r in pagerank(edges(spark, e), iters=3).collect()}
    many = {r["node"]: r["rank"]
            for r in pagerank(edges(spark, e).repartition(13), iters=3).collect()}
    assert one == many  # decimal sums: bit-identical at any partitioning


def test_triangle_counts_planted_graph(spark):
    """K4 on {1,2,3,4} + pendant 5 + isolated edge (6,7); duplicates,
    self-loops, and reversed orientations must not change the answer."""
    from admira_etl_project_prueba_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(4, 5), (6, 7), (2, 1), (3, 3), (1, 2)]  # noise
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r for r in triangle_counts(df).collect()}
    # K4: every node in C(3,2)=3 triangles; node 4 has degree 4 (pendant)
    for n in (1, 2, 3):
        assert got[n]["n_triangles"] == 3 and got[n]["degree"] == 3
        assert abs(got[n]["clustering_coeff"] - 1.0) < 1e-12
    assert got[4]["n_triangles"] == 3 and got[4]["degree"] == 4
    assert abs(got[4]["clustering_coeff"] - 0.5) < 1e-12
    assert got[5]["n_triangles"] == 0 and got[5]["clustering_coeff"] is None
    assert got[6]["n_triangles"] == 0 and got[7]["degree"] == 1
    # total triangles (each counted once per corner): 4 * 3 / 3 = 4 distinct
    assert sum(r["n_triangles"] for r in got.values()) == 3 * 4


def test_no_stale_label_cc_overrides_in_source():
    """dedup_clusters defaults to the O(log^2 n) star algorithm; no caller
    in the package may silently pin the diameter-dependent label
    propagation variant (round-3 advice: star is the 100 TB default)."""
    import pathlib

    import admira_etl_project_prueba_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = [
        str(p)
        for p in root.rglob("*.py")
        if 'algorithm="label"' in p.read_text() or "algorithm='label'" in p.read_text()
    ]
    assert offenders == []


def test_label_propagation_separates_planted_cliques(spark):
    """Two 4-cliques joined by one bridge edge: after 3 synchronous
    rounds each clique converges to its minimum node id and the bridge
    does not merge them; result is partitioning-invariant (deterministic
    min-label tie-break, no RNG)."""
    from admira_etl_project_prueba_spark.operators.graph import label_propagation

    def clique(nodes):
        return [(a, b) for a in nodes for b in nodes if a < b]

    edges_rows = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    edges = spark.createDataFrame(edges_rows, "u long, v long")
    got = {r["node"]: r["label"] for r in label_propagation(edges).collect()}
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}
    again = {
        r["node"]: r["label"]
        for r in label_propagation(edges.repartition(7)).collect()
    }
    assert again == got


def test_k_core_planted_core_and_cascade(spark):
    """A 4-clique (3-core) with a pendant chain: the chain peels away in
    CASCADING rounds (c depends on d's removal), the clique survives."""
    from admira_etl_project_prueba_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique
         (4, 5), (5, 6), (6, 7)],                          # pendant chain
        "u long, v long",
    )
    out = {r["node"]: r for r in k_core(edges, k=3, iters=8).collect()}
    assert sorted(out) == [1, 2, 3, 4, 5, 6, 7]
    for n in (1, 2, 3, 4):
        assert out[n]["in_kcore"] and out[n]["degree"] == 3
    for n in (5, 6, 7):
        assert not out[n]["in_kcore"] and out[n]["degree"] == 0
    # k=2: the chain still peels (leaf cascade), the clique survives
    out2 = {r["node"]: r for r in k_core(edges, k=2, iters=8).collect()}
    assert all(out2[n]["in_kcore"] for n in (1, 2, 3, 4))
    assert not any(out2[n]["in_kcore"] for n in (5, 6, 7))


def test_k_core_until_converged_beats_truncation(spark):
    """A 30-node path at k=2 peels two endpoints per round — deeper than
    the 8-round budget.  Fixed mode truncates (and says so in its
    contract); until_converged reaches the true (empty) 2-core.  On a
    shallow graph both modes agree, so the early-exit is a pure
    optimization."""
    from admira_etl_project_prueba_spark.operators.graph import k_core

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "u long, v long"
    )
    fixed = {r["node"]: r["in_kcore"] for r in k_core(path, k=2, iters=8).collect()}
    assert sum(fixed.values()) > 0  # truncated: middle of the path survives
    full = {
        r["node"]: r["in_kcore"]
        for r in k_core(path, k=2, until_converged=True).collect()
    }
    assert sum(full.values()) == 0  # the true 2-core of a path is empty
    # shallow cascade: fixed-8 and converged agree exactly
    clique = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7)],
        "u long, v long",
    )
    a = sorted(map(tuple, k_core(clique, k=3, iters=8).collect()))
    b = sorted(map(tuple, k_core(clique, k=3, until_converged=True).collect()))
    assert a == b


def test_label_propagation_string_ids(spark):
    """The min-label tie-break is type-agnostic: string node ids elect
    the lexicographically smallest community label (the old
    negate-the-label trick required numeric ids)."""
    from admira_etl_project_prueba_spark.operators.graph import label_propagation

    def clique(nodes):
        return [(a, b) for a in nodes for b in nodes if a < b]

    rows = clique(["ant", "bee", "cat", "dog"]) + clique(["wolf", "yak", "zebu"])
    edges = spark.createDataFrame(rows, "u string, v string")
    got = {r["node"]: r["label"] for r in label_propagation(edges).collect()}
    assert {got[n] for n in ("ant", "bee", "cat", "dog")} == {"ant"}
    assert {got[n] for n in ("wolf", "yak", "zebu")} == {"wolf"}
