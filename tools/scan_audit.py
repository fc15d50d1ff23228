"""Per-table FileScan counter over every catalog plan — the sweep behind
docs/SCALE.md expression-plan hygiene rule 8.

Spark has no cross-branch common-subexpression elimination, so a
union-of-aggregates report (or any op referencing a derived frame from
multiple consumers) silently re-scans — and re-tokenizes — its input
once per branch.  This audit counts physical `FileScan`s of the same
parquet table inside each catalog entry's executed plan and prints every
entry at or above the threshold, worst first.

A hit is a PROMPT, not a verdict: different-filter scans of small dims
are fine (fk_integrity_audit), and some entries share exchanges that the
static plan still prints as separate scans.  The question to ask per
hit: is the repeated subtree carrying expensive per-row work (tokenize /
shingle / md5 / embedding math) that a `localCheckpoint` of a narrow
intermediate would run once?  `containment_pairs` (6 scans → 36.2 s,
fixed to 3.4 s) and `corpus_health_report` (6 scans → 3 with one shared
projection, 1.27× at 200k docs) are the round-8 case studies.

Usage: PYTHONPATH=/root/repo python tools/scan_audit.py [threshold]
Exit code is always 0 — this is a review sweep, not a gate; the gate for
known-fixed entries is their bench/SCALE.md numbers.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from admira_etl_project_prueba_spark.session import get_spark
from admira_etl_project_prueba_spark.plans.catalog import CATALOG

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, entry in CATALOG.items():
        try:
            plan = (
                entry.fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # surface, keep sweeping
            print(f"ERR   {name}: {str(exc)[:100]}")
            continue
        tables = re.findall(r"(?:Scan parquet|FileScan).*?(\w+)\.parquet", plan)
        multi = {t: n for t, n in Counter(tables).items() if n >= threshold}
        if multi:
            rows.append((max(multi.values()), name, multi))
    for _, name, multi in sorted(rows, reverse=True):
        print(f"{name}: {multi}")
    print(f"\n{len(rows)} entries with >= {threshold} scans of one table "
          f"(prompt for review, not a failure)")


if __name__ == "__main__":
    main()
