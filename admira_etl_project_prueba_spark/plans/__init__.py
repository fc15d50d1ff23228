"""Query catalog and plan inspection helpers."""

from admira_etl_project_prueba_spark.plans.catalog import CATALOG  # noqa: F401
