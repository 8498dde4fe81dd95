"""Connector surface: ORC read options, catalog registration, metadata/stats,
writer — the reference's own code layer (SURVEY.md §2A)."""

from datafusion_datasource_orc_spark.sources.orc import (  # noqa: F401
    OrcFormatOptions,
    OrcTableCatalog,
    write_orc,
    write_orc_bucketed,
)
from datafusion_datasource_orc_spark.sources.metadata import (  # noqa: F401
    read_orc_schema,
    read_orc_statistics,
    infer_merged_schema,
)
from datafusion_datasource_orc_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    orc_dir_for,
    register_views,
)
