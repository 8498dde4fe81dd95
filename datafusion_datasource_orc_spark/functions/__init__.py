"""Reusable Column-expression helpers. JVM-side (pyspark.sql.functions)
wherever possible — UDFs are the slow path."""

from datafusion_datasource_orc_spark.functions.portable import (  # noqa: F401
    money_sum,
    money_avg,
    money_sum_sql,
    money_avg_sql,
)
from datafusion_datasource_orc_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
