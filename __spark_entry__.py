"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on sf0.001.
``queries()``    — every implemented operator from SURVEY.md §2 (+ the
                   beyond-reference data-pipeline ops), one callable each.
``oracle_sql()`` — the DuckDB-equivalent SQL per query where expressible.

Implementations live in admira_etl_project_prueba_spark/plans/catalog.py;
this file is a thin adapter over that catalog.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from admira_etl_project_prueba_spark.plans.catalog import CATALOG
from admira_etl_project_prueba_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full ads+CRM consolidation on sf0.001."""
    apply_runtime_confs(spark)
    return CATALOG["ingest_consolidate"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(e.fn) for name, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in CATALOG.items() if e.oracle is not None}
