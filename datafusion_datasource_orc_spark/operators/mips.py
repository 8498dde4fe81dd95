"""Maximum inner-product search (MIPS) — the retrieval scoring ANN rung
the cosine ladder doesn't cover: recommendation / two-tower retrieval
ranks by RAW dot product, where a long vector can out-score a nearer unit
vector (cosine and MIPS disagree whenever norms vary, which is exactly
why the family needs both).

Exact top-k here (the brute-force baseline, same role as
simsearch_bruteforce in the cosine ladder); the documented scale path is
the standard norm-augmentation reduction (Bachrach et al., RecSys 2014):
append dim sqrt(M² − |x|²) to every corpus vector (M = max norm) and 0 to
the query — inner-product order becomes cosine order, so the existing
banded/bucketed rungs (simsearch_lsh, simsearch_ivf) apply unchanged.

Exactness discipline: the score is ROUND(dot, 6) with both engines
reading the same float32 embeddings as doubles and the ranking
tie-breaking on vec_id (the simsearch_lsh convention), so the oracle
hash-checks the full top-k."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_datasource_orc_spark.functions.vectors import dot_product
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

MIPS_QUERIES = 5
MIPS_K = 3

# DuckDB twin of functions.vectors.dot_product (the _SQL_COSINE numerator)
_SQL_DOT = """
    list_sum(list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])),
                            t -> t[1] * t[2]))
"""


@query(
    "simsearch_mips",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_vec_id, embedding AS qe FROM embeddings
      WHERE vec_id < {MIPS_QUERIES}
    )
    SELECT q_vec_id, vec_id, rnk, ip
    FROM (
      SELECT q.q_vec_id, e.vec_id,
             ROUND({_SQL_DOT.format(a='e.embedding', b='q.qe')}, 6) AS ip,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY ROUND({_SQL_DOT.format(a='e.embedding', b='q.qe')}, 6) DESC,
                        e.vec_id
             ) AS rnk
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id != q.q_vec_id AND e.embedding IS NOT NULL
    ) WHERE rnk <= {MIPS_K}
    """,
)
def simsearch_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — exact MIPS top-{MIPS_K} for the first
    {MIPS_QUERIES} query vectors: (q_vec_id, vec_id, rnk, ip)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < MIPS_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("qe")
    )
    ip = F.round(dot_product(F.col("embedding"), F.col("qe")), 6)
    w = Window.partitionBy("q_vec_id").orderBy(F.col("ip").desc(), "vec_id")
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "vec_id", ip.alias("ip"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= MIPS_K)
        .select("q_vec_id", "vec_id", "rnk", "ip")
    )
