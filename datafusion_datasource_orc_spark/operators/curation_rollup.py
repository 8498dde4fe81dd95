"""Per-source rollup of the curation manifest — the dashboard certificate
a data lead reads after a selection run (round-14 candidate 3, landed
early): for each source, how many documents survived the three-way
quality × dedup × DSIR cut, the token budget they carry, and the score
mass that justified them.

Pure composition (the training_dsir_select rollup shape over the
round-13 manifest): the Spark side GROUPs the IMPORTED
``curation.curation_manifest`` result; the oracle wraps the registered
manifest oracle verbatim from the registry. Neither side re-implements a
single selection rule, so the rollup can only drift from the manifest by
failing the hash gate.

Determinism: every aggregate is an exact integer SUM/COUNT over the
manifest's already-exact integer micro-units (BIGINT-cast in the oracle —
the cookbook HUGEINT rule). Sources with zero selected documents do not
appear (inner GROUP BY semantics, identical on both engines).

Scale shape (100 TB): one map-side-combinable groupBy(source) over the
manifest — a few hundred rows out regardless of corpus size; the cost IS
the manifest, whose components carry their own certified shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators import curation  # noqa: F401
from datafusion_datasource_orc_spark.operators.curation import curation_manifest
from datafusion_datasource_orc_spark.operators.registry import ORACLES, query


def _rollup_oracle() -> str:
    return f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(tokens) AS BIGINT) AS sel_tokens,
           CAST(SUM(quality_micro) AS BIGINT) AS sum_quality_micro,
           CAST(SUM(dsir_weight_micro) AS BIGINT) AS sum_dsir_weight_micro
    FROM ({ORACLES["curation_manifest"]}) m
    GROUP BY source
    """


@query("curation_source_rollup", oracle=_rollup_oracle())
def curation_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — per-source selection accounting:
    (source, n_selected, sel_tokens, sum_quality_micro,
    sum_dsir_weight_micro)."""
    m = curation_manifest(spark, sf_dir)
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.sum("tokens").cast("bigint").alias("sel_tokens"),
        F.sum("quality_micro").cast("bigint").alias("sum_quality_micro"),
        F.sum("dsir_weight_micro").cast("bigint").alias("sum_dsir_weight_micro"),
    )
