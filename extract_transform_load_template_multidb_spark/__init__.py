"""PySpark-native analytics/ETL engine with the capability surface of
``zeinhasan/Extract-Transform-Load-Template-MultiDB`` (multi-DB batch ETL
templates), re-expressed Spark-first.

The reference (read-only at ``/root/reference``) is an Airflow DAG template
library: multi-source extract (BigQuery / SQL Server / PostgreSQL / MySQL /
Dynamics 365 OData), light transforms (±inf→NULL, metadata-column drop,
30-day rolling window), and four write semantics (append, truncate-load,
delete-old-then-append, idempotent window overwrite), plus a schema
introspection / cross-dialect DDL notebook.  This package maps each of those
onto Catalyst-optimized DataFrame plans (see SURVEY.md §2 for the operator
inventory and file:line citations) and extends them with the relational query
surface and large-scale training-data operators (dedup, similarity search,
text analysis) that a 100 TB Spark deployment needs.
"""

from extract_transform_load_template_multidb_spark.session import get_spark
from extract_transform_load_template_multidb_spark.catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
