"""Sources: HTTP JSON extraction, envelope decoding, parquet table loading."""

from admira_etl_project_prueba_spark.sources.json_source import (  # noqa: F401
    ads_from_payload,
    crm_from_payload,
)
from admira_etl_project_prueba_spark.sources.tables import load_tables  # noqa: F401
