from datafusion_datasource_orc_spark.plans.pushdown import (  # noqa: F401
    explain_formatted,
    pushed_filters,
    read_schema_columns,
    scan_summary,
    uses_whole_stage_codegen,
)
