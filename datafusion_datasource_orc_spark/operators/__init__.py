"""Operator inventory. Importing this package registers every query in
``registry.QUERIES`` / ``registry.ORACLES`` (see SURVEY.md §2 for the
line-by-line coverage map)."""

from datafusion_datasource_orc_spark.operators import (  # noqa: F401
    bm25,
    containment,
    countmin,
    curriculum,
    dedup,
    dsir,
    events,
    ewma,
    extras,
    hybrid,
    ingest,
    ingest_triage,
    ivf_kmeans,
    mips,
    multimodal,
    nbayes,
    orc_encodings,
    phash,
    pii,
    pipeline_e2e,
    relational,
    scan,
    semdedup,
    split_leakage,
    sharding,
    substring,
    substring_index,
    simsearch,
    textstats,
    tpcds,
    triage_index,
    tpch,
    tpch_more,
)
from datafusion_datasource_orc_spark.operators.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)
