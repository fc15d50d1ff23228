"""Dataflow operators: consolidation, queries, export, dedup, similarity,
text analysis, multimodal plumbing."""

from admira_etl_project_prueba_spark.operators.transform import (  # noqa: F401
    conform_ads,
    conform_crm,
    consolidate,
    filter_since,
    transform,
)
