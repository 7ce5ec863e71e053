"""Sources (SURVEY.md §2.1 S1–S13).

Fixture/file reads and JDBC specs map straight onto ``spark.read``; the
Dynamics 365 OData feed — the one source Spark has no connector for — is a
custom reader with manual ``$filter``/``$select`` pushdown and paging.
"""

from extract_transform_load_template_multidb_spark.sources.bigquery import (
    BigQuerySource,
)
from extract_transform_load_template_multidb_spark.sources.files import (
    FileSource,
)
from extract_transform_load_template_multidb_spark.sources.jdbc import (
    JdbcSource,
)
from extract_transform_load_template_multidb_spark.sources.odata import (
    ODataSource,
    render_odata_url,
)
from extract_transform_load_template_multidb_spark.sources.odata_datasource import (
    ODataDataSource,
)

__all__ = [
    "BigQuerySource",
    "FileSource",
    "JdbcSource",
    "ODataDataSource",
    "ODataSource",
    "render_odata_url",
]
