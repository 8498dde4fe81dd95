"""Hybrid retrieval: lexical (tf-idf) + vector (L2) legs fused with
Reciprocal Rank Fusion — the retrieval shape RAG-style LLM pipelines run
(a BM25-class inverted index and an ANN index answering the same query,
ranks fused). Neither family member covers the COMPOSITION: tfidf_top_terms
ranks terms within a doc, the simsearch ladder ranks vectors; this query
ranks DOCUMENTS for a query against both indexes and fuses.

Queries are the first {HY_QUERIES} documents: each contributes its token
set as the lexical query and its embedding (vec_id = doc_id, the corpus's
1:1 mapping) as the vector query — so the whole composition is derivable
from the tables and the oracle replays it exactly.

Determinism discipline (both engines, identically):
- lexical term score = FLOOR(tf * ln(N/df) * 1e6) per (query-token, doc)
  as BIGINT, SUMMED as integers — the float work is per-term (one product
  of identical doubles, the tfidf_top_terms precedent), the aggregation is
  order-free integer addition, so cross-engine sum order cannot flip a
  rounding boundary.
- vector leg = ROUND(squared-L2, 6) with the fold-order-pinned aggregate
  both simsearch and the oracle's {{_SQL_L2SQ}} share.
- RRF contribution = 1_000_000 div ({HY_RRF_K} + rank) — integer division
  of integers, summed as integers. All rank windows tie-break on doc_id.

Scale shape: the lexical leg is the inverted-index pattern (postings
shuffle on token; query tokens are a broadcast — {HY_QUERIES} docs' worth);
the corpus-size N is a 1-row aggregate crossJoin (the tfidf_top_terms
allowlisted shape). The vector leg broadcasts {HY_QUERIES} query vectors
over one linear corpus scan. Fusion touches 2 x {HY_LEG_K} rows per query.
At 100 TB both legs read PERSISTED indexes (postings table, IVF/PQ codes);
the in-query builds exist so the oracle can replay the whole composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.operators.simsearch import _SQL_L2SQ, _l2_sq
from datafusion_datasource_orc_spark.sources.tables import load_table

HY_QUERIES = 3  # doc_id < 3 are the queries
HY_LEG_K = 20  # per-leg rank cut
HY_RRF_K = 60  # the standard RRF constant
HY_TOPK = 5  # fused results per query
_GRID = 1_000_000


def _vec_leg_cte(n_queries: int, leg_k: int) -> str:
    """DuckDB CTEs for the vector leg: ``vecr`` = per-query top-``leg_k``
    (q, doc_id, rk) by exact squared-L2. Shared with simsearch_hybrid_bm25
    so the two hybrid variants' vector legs cannot drift."""
    d2 = f"ROUND({_SQL_L2SQ.format(a='q.embedding', b='e.embedding')}, 6)"
    return f"""
    emb AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
    vec AS (
      SELECT q.vec_id AS q, e.vec_id AS doc_id, {d2} AS d2
      FROM emb q JOIN emb e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {n_queries}
    ),
    vecr AS (
      SELECT q, doc_id, rk FROM (
        SELECT q, doc_id,
               row_number() OVER (PARTITION BY q ORDER BY d2, doc_id) AS rk
        FROM vec
      ) WHERE rk <= {leg_k}
    )"""


def _rrf_fuse_sql(rrf_k: int, topk: int) -> str:
    """DuckDB fusion tail over a ``legs(q, doc_id, rk)`` CTE — integer RRF
    contributions summed, per-query top-``topk``. Shared with
    simsearch_hybrid_bm25 (identical fusion, different lexical leg)."""
    return f"""
    fused AS (
      SELECT q, doc_id,
             CAST(SUM({_GRID} // ({rrf_k} + rk)) AS BIGINT) AS rrf_score,
             COUNT(*) AS n_legs
      FROM legs GROUP BY 1, 2
    )
    SELECT q AS q_doc_id, doc_id, n_legs, rrf_score, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT q, doc_id, n_legs, rrf_score,
             row_number() OVER (PARTITION BY q ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= {topk}
    """


def vector_leg_ranks(emb: DataFrame, n_queries: int, leg_k: int) -> DataFrame:
    """Spark vector leg: embeddings → per-query top-``leg_k``
    (q, doc_id, rk) by exact squared-L2 (query vectors broadcast over one
    linear corpus scan). Shared with simsearch_hybrid_bm25."""
    qe = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q"), F.col("embedding").alias("qe")
    )
    d2 = F.round(
        _l2_sq(
            F.col("qe").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
        ),
        6,
    )
    wv = Window.partitionBy("q").orderBy("d2", "doc_id")
    return (
        emb.crossJoin(F.broadcast(qe))
        .filter(F.col("vec_id") != F.col("q"))
        .select("q", F.col("vec_id").alias("doc_id"), d2.alias("d2"))
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= leg_k)
        .select("q", "doc_id", "rk")
    )


def rrf_fuse(legs: DataFrame, rrf_k: int, topk: int) -> DataFrame:
    """Spark RRF fusion over stacked ``(q, doc_id, rk)`` legs: integer
    contributions ``1e6 div (rrf_k + rk)`` summed, per-query top-``topk``.
    Output: (q_doc_id, doc_id, n_legs, rrf_score, rnk)."""
    contrib = F.expr(f"{_GRID} div ({rrf_k} + rk)")
    fused = legs.groupBy("q", "doc_id").agg(
        F.sum(contrib).cast("bigint").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_legs"),
    )
    wf = Window.partitionBy("q").orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= topk)
        .select(
            F.col("q").alias("q_doc_id"),
            "doc_id",
            "n_legs",
            "rrf_score",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def _hybrid_oracle() -> str:
    return f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    n AS (SELECT COUNT(*) AS n FROM docs),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM docs
    ),
    t2 AS (SELECT doc_id, tok FROM toks WHERE tok != ''),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
    dfr AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
    qt AS (SELECT DISTINCT doc_id AS q, tok FROM t2 WHERE doc_id < {HY_QUERIES}),
    lex AS (
      SELECT qt.q, tf.doc_id,
             SUM(CAST(FLOOR((CAST(tf.tf AS DOUBLE)
                 * ln(CAST(n.n AS DOUBLE) / CAST(dfr.df AS DOUBLE)))
                 * {_GRID}.0) AS BIGINT)) AS score
      FROM qt JOIN tf USING (tok) JOIN dfr USING (tok) CROSS JOIN n
      WHERE tf.doc_id <> qt.q
      GROUP BY 1, 2
    ),
    lexr AS (
      SELECT q, doc_id, rk FROM (
        SELECT q, doc_id,
               row_number() OVER (PARTITION BY q ORDER BY score DESC, doc_id) AS rk
        FROM lex
      ) WHERE rk <= {HY_LEG_K}
    ),{_vec_leg_cte(HY_QUERIES, HY_LEG_K)},
    legs AS (
      SELECT q, doc_id, rk FROM lexr UNION ALL SELECT q, doc_id, rk FROM vecr
    ),{_rrf_fuse_sql(HY_RRF_K, HY_TOPK)}"""


@query("simsearch_hybrid_rrf", oracle=_hybrid_oracle())
def simsearch_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # NO materialization barrier here, deliberately (round-10 review
    # candidate, measured and rejected): tf's and qt's exchanges do share
    # this explode child and recompute it per branch, but the recompute is
    # one scan-bound split+explode — a localCheckpoint would write/read
    # the exploded token stream, which is LARGER than the corpus, so the
    # barrier loses at scale and measured a wash at sf0.1 (1.56 s vs
    # 1.61 s best-of-3). The shingle_postings precedent materializes
    # because md5-per-shingle is CPU-expensive; lowercasing is not.
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    qt = (
        toks.filter(F.col("doc_id") < HY_QUERIES)
        .select(F.col("doc_id").alias("q"), "tok")
        .distinct()
    )
    term = F.floor(
        (F.col("tf").cast("double") * F.log(F.col("n").cast("double") / F.col("df").cast("double")))
        * _GRID
    ).cast("bigint")
    lex = (
        F.broadcast(qt)
        .join(tf, "tok")
        .join(dfr, "tok")
        .crossJoin(F.broadcast(n))
        .filter(F.col("doc_id") != F.col("q"))
        .groupBy("q", "doc_id")
        .agg(F.sum(term).alias("score"))
    )
    wl = Window.partitionBy("q").orderBy(F.col("score").desc(), "doc_id")
    lexr = lex.withColumn("rk", F.row_number().over(wl)).filter(
        F.col("rk") <= HY_LEG_K
    ).select("q", "doc_id", "rk")

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    vecr = vector_leg_ranks(emb, HY_QUERIES, HY_LEG_K)
    return rrf_fuse(lexr.unionAll(vecr), HY_RRF_K, HY_TOPK)
