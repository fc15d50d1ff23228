"""Measured scale experiments — evidence behind docs/SCALE.md's claims.

Runs A/B config experiments at $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints one JSON line.  Each experiment toggles ONE runtime knob around
the same query so the delta isolates that knob's effect — and reports
BOTH wall seconds and the scale-relevant physical metrics (bytes/records
shuffled, tasks launched) read from Spark's status REST API:

* broadcast_joins — dim-side broadcasts (hint-free q3/q5 SQL) vs forced
  shuffle joins (`autoBroadcastJoinThreshold=-1`).  At sf0.1 both are
  sub-second, so the deciding metric is shuffle VOLUME: it grows with
  the fact table (100 TB → the whole join input crosses the network)
  while the broadcast plan's exchange carries only the aggregate keys.
* aqe_coalesce — AQE on/off on an over-partitioned agg (512 shuffle
  partitions).  The metric is TASKS launched: AQE collapses hundreds of
  near-empty reducers; at 10k-partition cluster scale that is the
  difference between scheduler overhead dominating or not.
* shuffle_partitions — 8/32/128 static sweep (AQE off) for context.

Every session is warmed up on the experiment queries before timing
(min-of-3), so page-cache and codegen warmth don't bias the A/B order.

Usage: PYTHONPATH=/root/repo python tools/scale_experiments.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from admira_etl_project_prueba_spark.session import apply_runtime_confs, get_spark
from admira_etl_project_prueba_spark.sources.tables import register_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = 3

# q3/q5-shaped joins through the SQL front door (no broadcast() hints, so
# the threshold knob alone decides the join strategy)
Q3_SQL = """
SELECT l_orderkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS rev
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey
"""

Q5_SQL = """
SELECT n_name, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS rev
FROM region JOIN nation ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN customer ON c_nationkey = s_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1994-01-01'
  AND o_orderdate < DATE '1995-01-01'
GROUP BY n_name
"""

AGG_SQL = """
SELECT l_orderkey,
       SUM(CAST(l_quantity AS DECIMAL(25,6))) AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY l_orderkey
"""


def _stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        return json.load(r)


def _totals(spark) -> dict:
    t = {"shuffle_write_bytes": 0, "shuffle_write_records": 0, "tasks": 0}
    for s in _stages(spark):
        t["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        t["shuffle_write_records"] += s.get("shuffleWriteRecords", 0)
        t["tasks"] += s.get("numCompleteTasks", 0)
    return t


def run_measured(spark, sql: str) -> dict:
    """One metered execution (physical metrics) + min-of-N wall time."""
    before = _totals(spark)
    spark.sql(sql).collect()
    time.sleep(0.5)  # let the status store catch up
    after = _totals(spark)
    best = float("inf")
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        spark.sql(sql).collect()
        best = min(best, time.perf_counter() - t0)
    return {
        "sec": round(best, 4),
        "shuffle_mb": round(
            (after["shuffle_write_bytes"] - before["shuffle_write_bytes"]) / 1e6, 3
        ),
        "shuffle_records": after["shuffle_write_records"]
        - before["shuffle_write_records"],
        "tasks": after["tasks"] - before["tasks"],
    }


def plan_has(spark, sql: str, fragment: str) -> bool:
    return fragment in spark.sql(sql)._jdf.queryExecution().executedPlan().toString()


def fresh_session(**conf):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active:
        active.stop()
        time.sleep(1)
    extra = {k.replace("__", "."): str(v) for k, v in conf.items()}
    spark = get_spark(app_name="scale-exp", extra_conf=extra)
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, SF_DIR)
    # warm up: page cache + codegen for every experiment query
    for sql in (Q3_SQL, Q5_SQL, AGG_SQL):
        spark.sql(sql).collect()
    return spark


def _quality_sqls() -> tuple[str, str]:
    """(inlined, staged) formulations of the same quality+language scoring
    — SCALE.md 'expression-plan hygiene' rule 3's A/B.  The inlined form
    re-tokenizes per signal and re-evaluates every marker filter per CASE
    arm; the staged form projects tokens and the hits array once."""
    from admira_etl_project_prueba_spark.operators import textops as tx

    toks = tx.TOKENS
    stops = tx._stop_list_sql()
    counts = {
        l: "size(filter(%s, x -> array_contains(array(%s), x)))"
        % (toks, ", ".join(f"'{w}'" for w in tx.LANG_MARKERS[l]))
        for l in sorted(tx.LANG_MARKERS)
    }
    best = "greatest(" + ", ".join(counts.values()) + ")"
    pick = (
        "CASE "
        + " ".join(f"WHEN {c} = {best} THEN '{l}'" for l, c in counts.items())
        + " END"
    )
    inlined = (
        f"SELECT doc_id, size({toks}) AS n_tokens, "
        f"CAST(aggregate({toks}, 0L, (a, x) -> a + length(x)) AS DOUBLE) / size({toks}) AS mtl, "
        f"CAST(size(array_distinct({toks})) AS DOUBLE) / size({toks}) AS ttr, "
        f"CAST(size(filter({toks}, x -> array_contains({stops}, x))) AS DOUBLE) / size({toks}) AS swr, "
        f"CASE WHEN {best} = 0 THEN 'und' ELSE {pick} END AS lang "
        "FROM documents"
    )
    hits_expr, langs = tx._lang_hits_expr()
    pick_hits = " ".join(
        f"WHEN element_at(hits, {i + 1}) = best THEN '{l}'"
        for i, l in enumerate(langs)
    )
    staged = f"""SELECT doc_id, n_tokens, mtl, ttr, swr,
       CASE WHEN best = 0 THEN 'und' ELSE CASE {pick_hits} END END AS lang
FROM (
  SELECT *, array_max(hits) AS best FROM (
    SELECT doc_id, size(t) AS n_tokens,
           CAST(aggregate(t, 0L, (a, x) -> a + length(x)) AS DOUBLE) / size(t) AS mtl,
           CAST(size(array_distinct(t)) AS DOUBLE) / size(t) AS ttr,
           CAST(size(filter(t, x -> array_contains({stops}, x))) AS DOUBLE) / size(t) AS swr,
           {hits_expr} AS hits
    FROM (SELECT doc_id, {toks} AS t FROM documents)
  )
)"""
    return inlined, staged


def _hof_hash_sqls() -> tuple[str, str]:
    """(lambda_hashed, row_hashed) formulations of shingle-hash explode —
    SCALE.md 'expression-plan hygiene' rule 5's A/B.  Identical output
    (count + checksum over exploded 60-bit shingle hashes); the lambda
    form md5-hashes INSIDE transform() and explodes the result, the row
    form explodes raw shingle strings and hashes per exploded row."""
    from admira_etl_project_prueba_spark.operators.textops import (
        MERSENNE31,
        TOKENS,
        _shingle_expr,
        hex60,
    )

    k = 8
    base = f"""WITH tok AS (SELECT doc_id, {TOKENS} AS t FROM documents),
sg AS (SELECT doc_id, {_shingle_expr(k)} AS shingles FROM tok)"""
    lambda_hashed = f"""{base},
hs AS (SELECT doc_id,
       array_distinct(transform(shingles, s -> {hex60('s')} % {MERSENNE31})) AS sh
       FROM sg)
SELECT COUNT(*) AS n, SUM(h) AS checksum
FROM (SELECT doc_id, explode(sh) AS h FROM hs)"""
    row_hashed = f"""{base}
SELECT COUNT(*) AS n, SUM(h) AS checksum
FROM (SELECT doc_id, {hex60('s')} % {MERSENNE31} AS h
      FROM (SELECT doc_id, explode(array_distinct(shingles)) AS s FROM sg))"""
    return lambda_hashed, row_hashed


def main():
    results = {}

    # -- broadcast vs shuffle join -----------------------------------------
    spark = fresh_session()
    assert plan_has(spark, Q3_SQL, "BroadcastHashJoin")
    bcast = {"q3": run_measured(spark, Q3_SQL), "q5": run_measured(spark, Q5_SQL)}
    spark = fresh_session(
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__autoBroadcastJoinThreshold="-1",
    )
    assert not plan_has(spark, Q3_SQL, "BroadcastHashJoin")
    shuf = {"q3": run_measured(spark, Q3_SQL), "q5": run_measured(spark, Q5_SQL)}
    results["broadcast_joins"] = {
        "broadcast": bcast,
        "all_shuffle": shuf,
        "shuffle_volume_ratio": {
            q: (
                round(shuf[q]["shuffle_mb"] / bcast[q]["shuffle_mb"], 1)
                if bcast[q]["shuffle_mb"] > 0.001
                else "inf"
            )
            for q in bcast
        },
    }

    # -- AQE partition coalescing (runtime confs, one session) -------------
    spark = fresh_session()
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    spark.sql(AGG_SQL).collect()  # warm at this setting
    aqe_on = run_measured(spark, AGG_SQL)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql(AGG_SQL).collect()
    aqe_off = run_measured(spark, AGG_SQL)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    results["aqe_coalesce_512_parts"] = {
        "aqe_on": aqe_on,
        "aqe_off": aqe_off,
        "task_ratio": round(aqe_off["tasks"] / max(aqe_on["tasks"], 1), 1),
    }

    # -- shuffle partition sizing (runtime confs, one session) -------------
    sweep = {}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for n in (8, 32, 128):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        spark.sql(Q3_SQL).collect()  # re-warm at this setting
        sweep[str(n)] = run_measured(spark, Q3_SQL)
    results["shuffle_partitions_q3_no_aqe"] = sweep

    # -- staged vs inlined tokenizer projection (expression-plan hygiene) --
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    inlined_sql, staged_sql = _quality_sqls()
    spark.sql(staged_sql).collect()  # warm page cache on documents
    results["staged_vs_inlined_tokenizer"] = {
        "staged": run_measured(spark, staged_sql),
        "inlined": run_measured(spark, inlined_sql),
    }

    # -- md5 inside HOF lambda vs per-row after explode (hygiene rule 5) ---
    lambda_sql, row_sql = _hof_hash_sqls()
    spark.sql(row_sql).collect()  # warm
    row_res = run_measured(spark, row_sql)
    lambda_res = run_measured(spark, lambda_sql)
    assert spark.sql(row_sql).collect() == spark.sql(lambda_sql).collect()
    results["hof_lambda_vs_row_hashing"] = {
        "row_hashed": row_res,
        "lambda_hashed": lambda_res,
        "speedup": round(lambda_res["sec"] / max(row_res["sec"], 1e-9), 1),
    }

    print(json.dumps({"sf_dir": SF_DIR, "experiments": results}))


if __name__ == "__main__":
    main()
