"""Measure ANN serving recall on the CLUSTERED embedding fixture and
pick the serving defaults by measurement.

The shipped synthetic corpus is near-uniform unit noise — the hardest,
least representative input for a quantizer (round-11 verdict: recall on
it says nothing about real corpora).  This tool generates the seeded
Gaussian-mixture fixture (tools/gen_testdata.py --clustered), builds ONE
persisted IVF-PQ store per (m, ksub) — training amortized across the
probe/depth sweep, exactly how production would tune — then for each
(n_probe, rerank_depth) measures mean recall@10 of IVF-PQ ADC and of
exact-rerank against brute-force cosine over Q deterministic queries.
One batched pass per config, no per-query plans.  Output: one JSON line
per config plus a MEASURED-DEFAULTS line (cheapest config with rerank
recall ≥ 0.9).

Usage:
    PYTHONPATH=/root/repo python tools/ann_recall_measure.py [N] [Q]
    PYTHONPATH=/root/repo python tools/ann_recall_measure.py knn-join [N] [Q]
    PYTHONPATH=/root/repo python tools/ann_recall_measure.py serving [N] [Q]

N = corpus size (default 20000), Q = query count (default 16).

``knn-join`` measures the BULK curation path instead of the request
path: a store built at the shipped serving config
(write_serving_ivfpq_index), knn_join's ADC tier vs its rerank tier at
the store's OWN recommended_rerank_depth, recall@10 against brute
force — the round-13 gate for "the curation path serves the
high-recall tier" and for "the occupancy-derived depth actually
reaches the measured recall on a fixture whose cluster size ≠ 200"
(default fixture: N/50 = 400-member clusters).

``serving`` restricts the grid sweep to the shipped config plus the
m=16 rung — the scale-validation subset (run it at N=200000 to check
probe-insensitivity and the depth-vs-occupancy law at 10× the
round-12 grid).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from admira_etl_project_prueba_spark.operators import similarity as sim  # noqa: E402
from admira_etl_project_prueba_spark.session import get_spark  # noqa: E402
from admira_etl_project_prueba_spark.sources.tables import load_table  # noqa: E402
from tools.gen_testdata import generate_clustered_embeddings  # noqa: E402

K = 10


def serve_and_score(spark, emb, exact, path, q, n_probe, rerank_depth):
    """(ivfpq_recall, rerank_recall, sec) at recall@10 over q queries —
    served from the PERSISTED store; rerank recall computed frame-level
    from the batch shortlist (exact cosine of shortlist members, top-10),
    identical semantics to the rerank server without q separate plans."""
    t0 = time.monotonic()
    short = sim.ivfpq_topk_batch_from_index(
        spark, emb, path, n_queries=q, k=rerank_depth, n_probe=n_probe
    )
    ivf10 = short.filter(F.col("rnk") <= K).select("query_id", "vec_id")
    t = sim._as_double(emb, "v").select("vec_id", "v")
    qv = sim._as_double(emb.filter(F.col("vec_id") < q), "q").selectExpr(
        "vec_id AS query_id", "q"
    )
    cand = (
        short.select("query_id", "vec_id")
        .join(t, "vec_id")
        .join(F.broadcast(qv), "query_id")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    rr10 = (
        sim.with_cosine(cand, "q", "v")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K)
        .select("query_id", "vec_id")
    )
    n_ivf = ivf10.join(exact, ["query_id", "vec_id"], "left_semi").count()
    n_rr = rr10.join(exact, ["query_id", "vec_id"], "left_semi").count()
    sec = time.monotonic() - t0
    return n_ivf / (K * q), n_rr / (K * q), sec


def _fixture_session(n: int, n_clusters: int = 50):
    out = tempfile.mkdtemp(prefix="clustered_emb_")
    generate_clustered_embeddings(n, out, n_clusters=n_clusters)
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the generator writes ONE parquet file → Spark reads 1-2 input
    # partitions, and every narrow stage downstream (subvector explode,
    # codeword scoring, encode) inherits that — at n=200k the encode
    # serializes onto one core.  Spread it once up front; training and
    # codebooks are decimal-exact order-independent, so results are
    # bit-identical at any partitioning (pytest-pinned).
    emb = load_table(spark, out, "embeddings").repartition(32).cache()
    emb.count()
    return spark, emb, out


def knn_join_main():
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark, emb, out = _fixture_session(n)
    path = os.path.join(out, "serving_store")
    t0 = time.monotonic()
    sim.write_serving_ivfpq_index(emb, path)
    train_sec = time.monotonic() - t0
    depth = sim.recommended_rerank_depth(spark, path)
    exact = (
        sim.cosine_topk_batch(emb, n_queries=q, k=K)
        .select("query_id", "vec_id")
        .cache()
    )
    exact.count()
    qdf = emb.filter(F.col("vec_id") < q)
    t0 = time.monotonic()
    adc = sim.knn_join(
        spark, qdf, path, k=K, n_probe=sim.SERVING_N_PROBE
    ).select("query_id", "vec_id")
    n_adc = adc.join(exact, ["query_id", "vec_id"], "left_semi").count()
    adc_sec = time.monotonic() - t0
    t0 = time.monotonic()
    rr = sim.knn_join(
        spark, qdf, path, k=K, n_probe=sim.SERVING_N_PROBE,
        rerank_depth=depth, corpus=emb,
    ).select("query_id", "vec_id")
    n_rr = rr.join(exact, ["query_id", "vec_id"], "left_semi").count()
    rr_sec = time.monotonic() - t0
    print(
        json.dumps(
            {
                "mode": "knn_join", "n": n, "q": q,
                "n_probe": sim.SERVING_N_PROBE,
                "recommended_rerank_depth": depth,
                "cluster_size": n // 50,
                "adc_recall": round(n_adc / (K * q), 4),
                "rerank_recall": round(n_rr / (K * q), 4),
                "train_sec": round(train_sec, 2),
                "adc_sec": round(adc_sec, 2),
                "rerank_sec": round(rr_sec, 2),
            }
        ),
        flush=True,
    )


def main():
    mode = None
    args = sys.argv[1:]
    if args and args[0] in ("knn-join", "serving"):
        mode = args[0]
        if mode == "knn-join":
            return knn_join_main()
        args = args[1:]
    n = int(args[0]) if len(args) > 0 else 20000
    q = int(args[1]) if len(args) > 1 else 16
    # SPARK_GRAFT_N_CLUSTERS: vary planted cluster size independently of
    # corpus size — the round-13 control that separates "corpus grew
    # 10×" from "every near-dup cluster grew 10×" in the depth law
    n_clusters = int(os.environ.get("SPARK_GRAFT_N_CLUSTERS", "50"))
    spark, emb, out = _fixture_session(n, n_clusters=n_clusters)
    exact = (
        sim.cosine_topk_batch(emb, n_queries=q, k=K)
        .select("query_id", "vec_id")
        .cache()
    )
    exact.count()

    # provisioning rule: lists track the corpus at the measured
    # TARGET_VECTORS_PER_LIST occupancy
    nc = max(1, -(-n // sim.TARGET_VECTORS_PER_LIST))
    best = None
    serving_cfg = (sim.SERVING_PQ_M, sim.SERVING_PQ_KSUB, sim.SERVING_NORMALIZE)
    configs = (
        # unnormalized first (the round-11 default), then spherical: on
        # UNNORMALIZED clustered data the ADC shortlist ranks by L2 while
        # the served metric is cosine — the geometry mismatch caps rerank
        # recall no matter the probe/depth; normalize=True aligns them.
        # The shipped serving config is expressed through the SERVING_*
        # constants (and built via write_serving_ivfpq_index) so the
        # documented defaults and the measured sweep cannot drift apart.
        (4, 16, False),
        (4, 256, False),
        (8, 256, False),
        (4, 16, True),
        (4, 256, True),
        (8, 16, True),
        serving_cfg,
    )
    tf = None
    if mode == "serving":
        # scale-validation subset: the shipped config + the m=16 rung.
        # Optional third arg = train_fraction (hash-bucket sampled model
        # training, the production posture at 10× — encode stays full).
        # SPARK_GRAFT_SERVING_ONLY=1 drops the m=16 rung (control runs).
        configs = (serving_cfg, (16, 256, True))
        if os.environ.get("SPARK_GRAFT_SERVING_ONLY"):
            configs = (serving_cfg,)
        if len(args) > 2:
            tf = float(args[2])
    for m, ksub, normalize in configs:
            path = os.path.join(
                out, f"ivfpq_m{m}_k{ksub}{'_n' if normalize else ''}"
            )
            t0 = time.monotonic()
            if (m, ksub, normalize) == serving_cfg:
                sim.write_serving_ivfpq_index(
                    emb, path, n_centroids=nc, train_fraction=tf
                )
            else:
                sim.write_ivfpq_index(
                    emb, path, n_centroids=nc, m=m, ksub=ksub,
                    normalize=normalize, train_fraction=tf,
                )
            train_sec = time.monotonic() - t0
            print(
                json.dumps(
                    {"trained": {"m": m, "ksub": ksub, "n_centroids": nc,
                                 "normalize": normalize,
                                 "sec": round(train_sec, 2)}}
                ),
                flush=True,
            )
            for n_probe in (sim.SERVING_N_PROBE, 16, 32):
                for depth in (
                    50,
                    100,
                    sim.SERVING_RERANK_DEPTH,
                    2 * sim.SERVING_RERANK_DEPTH,
                ):
                    ivf, rr, sec = serve_and_score(
                        spark, emb, exact, path, q, n_probe, depth
                    )
                    row = {
                        "n": n, "q": q, "m": m, "ksub": ksub,
                        "normalize": normalize,
                        "n_centroids": nc, "n_probe": n_probe,
                        "rerank_depth": depth,
                        "ivfpq_recall": round(ivf, 4),
                        "rerank_recall": round(rr, 4),
                        "sec": round(sec, 2),
                    }
                    print(json.dumps(row), flush=True)
                    # pick: cheapest config with RERANK recall >= 0.9
                    # (the serving contract); cost = distance-table size,
                    # probed fraction, rerank depth
                    if rr >= 0.9:
                        cost = (m * ksub, n_probe, depth, -ivf)
                        if best is None or cost < best[0]:
                            best = (cost, row)
    if best:
        print("MEASURED-DEFAULTS " + json.dumps(best[1]), flush=True)


if __name__ == "__main__":
    main()
