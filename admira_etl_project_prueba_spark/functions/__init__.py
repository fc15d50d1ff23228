"""Scalar/column function library — all built-in Catalyst expressions.

Every function here returns a ``pyspark.sql.Column`` built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen; none of the
reference's scalar semantics need Python UDFs.
"""

from admira_etl_project_prueba_spark.functions.channels import infer_channel  # noqa: F401
from admira_etl_project_prueba_spark.functions.dates import (  # noqa: F401
    day_string,
    parse_flexible_timestamp,
)
from admira_etl_project_prueba_spark.functions.metrics import (  # noqa: F401
    safe_div,
    with_derived_metrics,
)
