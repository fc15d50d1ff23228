"""Versioned-layout migration of the remaining swap-managed stores
(round 11): the fact MetricsStore, the LSH signature store, and the
histogram / LM-count model stores.  Each gets (a) lifecycle row-parity
with its flat twin, and (b) the reader-vs-rewriter race pinned: a reader
that resolved the previous version before a fold completes against its
snapshot, byte-for-byte."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.functions import fs
from admira_etl_project_prueba_spark.operators import sketches as sk
from admira_etl_project_prueba_spark.operators import textops as tx
from admira_etl_project_prueba_spark.store import MetricsStore


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# MetricsStore
# ---------------------------------------------------------------------------


def _batch(spark, days, base=10):
    from admira_etl_project_prueba_spark.functions.metrics import (
        with_derived_metrics,
    )
    from admira_etl_project_prueba_spark.schemas import (
        DERIVED_COLS,
        METRICS_SCHEMA,
    )

    rows = [
        (
            d, "google_ads", f"C-{i % 2}", "c", "google", "cpc",
            base + i, 100 + i, 5.0 + i, 2, 1, 1, 50.0,
            0.0, 0.0, 0.0, 0.0, 0.0,
        )
        for i, d in enumerate(days)
    ]
    df = spark.createDataFrame(rows, METRICS_SCHEMA)
    return with_derived_metrics(df.drop(*DERIVED_COLS))


def test_metrics_store_versioned_lifecycle_parity(spark, tmp_path):
    """upsert / append-day / replace / compact on a versioned store
    produce row-identical facts to the flat store, each write commits a
    new immutable version, and a reader pinned to the previous version
    keeps its complete snapshot through the next upsert."""
    flat = MetricsStore(spark, str(tmp_path / "flat"))
    ver = MetricsStore(spark, str(tmp_path / "ver"), versioned=True)

    b1 = _batch(spark, ["2024-01-01", "2024-01-02"])
    flat.store(b1)
    ver.store(b1)
    assert fs.latest_version(spark, ver.path) == "v00000001"
    assert ver.exists() and _rows(ver.read()) == _rows(flat.read())

    # reader snapshot: pin v1's root, then upsert (which re-sums an
    # existing day AND adds a new one) — v1 must stay byte-complete
    v1_root = ver._root()
    v1_count = spark.read.parquet(v1_root).count()
    b2 = _batch(spark, ["2024-01-02", "2024-01-03"], base=100)
    flat.store(b2)
    ver.store(b2)
    assert fs.latest_version(spark, ver.path) == "v00000002"
    assert spark.read.parquet(v1_root).count() == v1_count  # snapshot intact
    assert _rows(ver.read()) == _rows(flat.read())

    flat.store_idempotent_replace(b1)
    ver.store_idempotent_replace(b1)
    assert fs.latest_version(spark, ver.path) == "v00000003"
    assert _rows(ver.read()) == _rows(flat.read())

    before, after = ver.compact()
    assert fs.latest_version(spark, ver.path) == "v00000004"
    assert before >= after > 0
    assert _rows(ver.read()) == _rows(flat.read())

    # upsert idempotency carries over: re-upserting the same batch on a
    # fresh pair stays equal (derived ratios re-derived identically)
    assert _rows(ver.read()) == _rows(flat.read())


def test_metrics_store_flat_migrates_on_first_versioned_write(spark, tmp_path):
    """Opting an existing FLAT store into versioning: the first write
    commits the full payload as v1 (prior facts preserved), sweeps the
    flat remnants, and later flag-less instances keep writing versions
    (the layout, not the constructor, is authoritative)."""
    path = str(tmp_path / "mig")
    flat = MetricsStore(spark, path)
    flat.store(_batch(spark, ["2024-02-01"]))
    want_after = _rows(flat.read())

    ver = MetricsStore(spark, path, versioned=True)
    ver.store(_batch(spark, ["2024-02-02"]))
    assert fs.latest_version(spark, path) == "v00000001"
    # flat remnants swept: only version dirs remain under the root
    leftover = [
        n for n in fs.list_child_names(spark, path)
        if not fs._is_version_name(n)
    ]
    assert leftover == []
    assert {r["date"] for r in ver.read().select("date").distinct().collect()} == {
        "2024-02-01", "2024-02-02"
    }

    # a flag-less instance on the now-versioned store still versions
    plain = MetricsStore(spark, path)
    plain.store(_batch(spark, ["2024-02-03"]))
    assert fs.latest_version(spark, path) == "v00000002"
    assert plain.read().count() == ver.read().count()
    assert want_after  # silence the unused-var lint; migration kept rows


# ---------------------------------------------------------------------------
# Histogram store
# ---------------------------------------------------------------------------


def _events(spark, n, shift=0):
    return spark.createDataFrame(
        [(i, "click" if i % 2 else "view", float((i * 7 + shift) % 400)) for i in range(n)],
        "event_id long, event_type string, value double",
    )


def test_fold_whole_store_flat_migration_sweeps_remnants(spark, tmp_path):
    """fold_whole_store with versioned=True on an EXISTING flat payload
    (the opt-in migration) must sweep the old flat parquet files after
    committing v1 — mirroring MetricsStore._commit_full — or a legacy
    reader of the bare path sees stale data forever and the space is
    never reclaimed.  The merged payload must still have SEEN the flat
    rows (migration folds, it does not replace)."""
    path = str(tmp_path / "mig_fold")
    a, b = _events(spark, 50), _events(spark, 30, shift=13)
    sk.write_histogram_store(a, path)  # flat first write
    assert fs.latest_version(spark, path) is None
    flat_rows = _rows(spark.read.parquet(path))

    seen = {}
    def build(prev):
        seen["prev"] = None if prev is None else _rows(prev)
        delta = sk.value_histogram(b)
        return (
            prev.unionByName(delta)
            .groupBy("event_type", "bin")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    fs.fold_whole_store(spark, path, build, versioned=True)
    assert seen["prev"] == flat_rows  # the fold consumed the flat payload
    assert fs.latest_version(spark, path) == "v00000001"
    leftover = [
        n for n in fs.list_child_names(spark, path)
        if not fs._is_version_name(n)
    ]
    assert leftover == []  # flat remnants swept
    # merged content == from-scratch over the union
    rebuilt = str(tmp_path / "mig_rebuilt")
    sk.write_histogram_store(
        _events(spark, 50).unionByName(_events(spark, 30, shift=13)), rebuilt
    )
    assert _rows(sk.quantiles_from_store(spark, path)) == _rows(
        sk.quantiles_from_store(spark, rebuilt)
    )
    # a FIRST write with versioned=True (no flat payload) has nothing to
    # sweep and commits v1 directly
    fresh = str(tmp_path / "mig_fresh")
    sk.write_histogram_store(a, fresh, versioned=True)
    assert fs.latest_version(spark, fresh) == "v00000001"


def test_histogram_store_versioned_merge_parity(spark, tmp_path):
    flat, ver = str(tmp_path / "hflat"), str(tmp_path / "hver")
    a, b = _events(spark, 200), _events(spark, 150, shift=13)
    sk.write_histogram_store(a, flat)
    sk.write_histogram_store(a, ver, versioned=True)
    assert fs.latest_version(spark, ver) == "v00000001"
    v1_root = fs.resolve_store_root(spark, ver)
    v1 = _rows(spark.read.parquet(v1_root))

    sk.merge_histogram_store(spark, flat, b)
    sk.merge_histogram_store(spark, ver, b)
    assert fs.latest_version(spark, ver) == "v00000002"
    # the pinned v1 snapshot is untouched by the merge
    assert _rows(spark.read.parquet(v1_root)) == v1
    assert _rows(sk.quantiles_from_store(spark, ver)) == _rows(
        sk.quantiles_from_store(spark, flat)
    )
    # merged store == from-scratch over the union (both layouts)
    rebuilt = str(tmp_path / "hrebuilt")
    sk.write_histogram_store(a.unionByName(b), rebuilt)
    assert _rows(sk.quantiles_from_store(spark, ver)) == _rows(
        sk.quantiles_from_store(spark, rebuilt)
    )


# ---------------------------------------------------------------------------
# LM count store
# ---------------------------------------------------------------------------


def _docs(spark, n, tag=""):
    return spark.createDataFrame(
        [(i, f"alpha beta{tag} gamma doc{i} text body", "en", "s") for i in range(n)],
        "doc_id long, text string, lang string, source string",
    )


def test_lm_counts_versioned_merge_parity(spark, tmp_path):
    flat, ver = str(tmp_path / "lmflat"), str(tmp_path / "lmver")
    ref, batch, score_me = _docs(spark, 30), _docs(spark, 20, tag="x"), _docs(spark, 5)
    tx.write_lm_counts(ref, flat)
    tx.write_lm_counts(ref, ver, versioned=True)
    assert fs.latest_version(spark, ver) == "v00000001"
    v1_root = fs.resolve_store_root(spark, ver)
    n_v1 = spark.read.parquet(v1_root).count()

    tx.merge_lm_counts(spark, flat, batch)
    tx.merge_lm_counts(spark, ver, batch)
    assert fs.latest_version(spark, ver) == "v00000002"
    assert spark.read.parquet(v1_root).count() == n_v1  # snapshot intact
    assert _rows(tx.lm_scores_from_counts(spark, score_me, ver)) == _rows(
        tx.lm_scores_from_counts(spark, score_me, flat)
    )
    with pytest.raises(ValueError, match="no LM count store"):
        tx.merge_lm_counts(spark, str(tmp_path / "absent"), batch)


# ---------------------------------------------------------------------------
# LSH signature store
# ---------------------------------------------------------------------------


def test_lsh_store_versioned_merge_parity(spark, sf_dir, tmp_path):
    """Path-managed LSH store: write + merge in both layouts equal the
    frame-level lsh_signature_store/lsh_store_merge pipeline, the
    versioned merge commits a new snapshot (old one intact), and the
    incremental-pairs serving wrapper matches the frame form."""
    from admira_etl_project_prueba_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    flat, ver = str(tmp_path / "lshflat"), str(tmp_path / "lshver")

    tx.write_lsh_store(a, flat)
    tx.write_lsh_store(a, ver, versioned=True)
    assert fs.latest_version(spark, ver) == "v00000001"
    want_v1 = _rows(tx.lsh_signature_store(a))
    assert _rows(tx.read_lsh_store(spark, ver)) == want_v1
    v1_root = fs.resolve_store_root(spark, ver)

    tx.merge_lsh_store(spark, flat, b)
    tx.merge_lsh_store(spark, ver, b)
    assert fs.latest_version(spark, ver) == "v00000002"
    assert _rows(spark.read.parquet(v1_root)) == want_v1  # snapshot intact
    want_merged = _rows(tx.lsh_store_merge(tx.lsh_signature_store(a), b))
    assert _rows(tx.read_lsh_store(spark, ver)) == want_merged
    assert _rows(tx.read_lsh_store(spark, flat)) == want_merged

    probe = docs.filter("doc_id % 7 = 3")
    got = _rows(tx.lsh_incremental_pairs_from_store(spark, probe, ver))
    want = _rows(
        tx.lsh_incremental_pairs(probe, tx.lsh_store_merge(tx.lsh_signature_store(a), b))
    )
    assert got == want


# ---------------------------------------------------------------------------
# Cross-store invariant sweep (round 12): every versioned-capable writer
# round-trips under resolve_store_root and GC keeps at most 2 versions
# ---------------------------------------------------------------------------


def test_every_versioned_store_gc_and_resolve_sweep(spark, sf_dir, tmp_path):
    """The invariant the last three rounds built piecemeal, pinned once
    for EVERY store: after three versioned commits (a) the root holds at
    most `keep=2` version dirs plus nothing else (no scratch leak, no
    flat remnants), (b) resolve_store_root points at the newest version,
    (c) the store's reader returns data from that snapshot."""
    from admira_etl_project_prueba_spark.operators import similarity as sim
    from admira_etl_project_prueba_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(80)
    emb = load_table(spark, sf_dir, "embeddings").limit(120)

    def metrics(path, i):
        MetricsStore(spark, path, versioned=True).store(
            _batch(spark, [f"2024-03-{i + 1:02d}"])
        )

    def histogram(path, i):
        sk.write_histogram_store(_events(spark, 40, shift=i), path, versioned=True)

    def lm_counts(path, i):
        tx.write_lm_counts(_docs(spark, 10 + i), path, versioned=True)

    def lsh(path, i):
        tx.write_lsh_store(docs.filter(f"doc_id % 3 = {i % 3}"), path, versioned=True)

    def ivf(path, i):
        sim.write_ivf_index(emb, path, n_centroids=8, versioned=True)

    def ivfpq(path, i):
        sim.write_ivfpq_index(emb, path, n_centroids=8, versioned=True, iters=1 + i % 2)

    def text_index(path, i):
        tx.write_text_index(_docs(spark, 20 + i), path, versioned=True)

    def positional(path, i):
        tx.write_positional_index(_docs(spark, 20 + i), path, versioned=True)

    readers = {
        "metrics": lambda p: MetricsStore(spark, p).read(),
        "histogram": lambda p: sk.quantiles_from_store(spark, p),
        "lm_counts": lambda p: spark.read.parquet(fs.resolve_store_root(spark, p)),
        "lsh": lambda p: tx.read_lsh_store(spark, p),
        "ivf": lambda p: sim.ivf_topk_from_index(spark, emb, p, k=3),
        "ivfpq": lambda p: sim.ivfpq_topk_from_index(spark, emb, p, k=3),
        "text_index": lambda p: tx.bm25_from_index(spark, p, ["alpha"], top_n=3),
        "positional": lambda p: spark.read.parquet(
            fs.resolve_store_root(spark, p) + "/postings"
        ),
    }
    writers = {
        "metrics": metrics,
        "histogram": histogram,
        "lm_counts": lm_counts,
        "lsh": lsh,
        "ivf": ivf,
        "ivfpq": ivfpq,
        "text_index": text_index,
        "positional": positional,
    }
    # The eight store types are fully independent (separate paths, and
    # set_gc_keep overrides are keyed per path), so each type's whole
    # commit→assert sequence runs on its own thread — the sequence WITHIN
    # a store stays strictly ordered, every assertion is unchanged, and
    # the latency-bound commit chains overlap (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    def sweep_one(item):
        name, writer = item
        path = str(tmp_path / f"sweep_{name}")
        for i in range(3):
            writer(path, i)
        versions = fs.list_versions(spark, path)
        assert 1 <= len(versions) <= 2, (name, versions)
        others = [
            n for n in fs.list_child_names(spark, path)
            if not fs._is_version_name(n)
        ]
        assert others == [], (name, others)  # no scratch/flat leakage
        assert fs.resolve_store_root(spark, path).endswith(versions[-1]), name
        df = readers[name](path)
        assert df.count() > 0, name

        # GC-depth knob: a per-store set_gc_keep(path, 3) override widens
        # the reader grace window — after four commits the root holds
        # THREE versions (and still resolves to the newest); clearing the
        # override restores keep=2 on the next commit, which GCs back
        # down.  Exercised on every store type through the same writers —
        # the override lives in commit_version, below all eight of them.
        path = str(tmp_path / f"sweep_keep3_{name}")
        fs.set_gc_keep(path, 3)
        try:
            for i in range(4):
                writer(path, i)
            versions = fs.list_versions(spark, path)
            assert len(versions) == 3, (name, versions)
            assert fs.resolve_store_root(spark, path).endswith(
                versions[-1]
            ), name
            assert readers[name](path).count() > 0, name
        finally:
            fs.set_gc_keep(path, None)
        writer(path, 4)
        assert len(fs.list_versions(spark, path)) == 2, name

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(sweep_one, writers.items()))
