"""Retrieval-quality evaluation for the ANN ladder: recall@k of every
approximate rung against the EXACT top-k under that rung's own metric
(judge r12 task 2).

The ladder's existing certificates pin *determinism* — each rung returns
bit-identical results on both engines — but say nothing about whether the
approximate index actually RETRIEVES the true neighbors, which is the one
property a 100 TB curation user buys. This query promotes the pytest-only
quality pin to a driver-certified, oracle-checked measurement: one row per
rung with its hit count and exact-integer recall in parts-per-million.

Method (standard ANN-benchmarks definition): for rung r with query set Q,
cutoff k, and distance metric m, recall@k = |approx_r(q) ∩ exact_m(q)| /
(|Q| * k), where exact_m(q) is the brute-force top-k under the SAME
rounded metric and tie-break ((ROUND(m, 6), vec_id) — the total order
every rung already uses). Rungs are compared against their OWN metric
(cosine for lsh/ivf/sq, squared-L2 for the k-means/PQ family, raw inner
product for MIPS) so a rung is never penalized for answering the question
it was built for. simsearch_bruteforce rides along as the harness
self-check — its recall is 1.0 by construction, so a non-1e6 ppm row
flags a broken comparison, not a broken index.

Composition discipline (the pipeline_end_to_end pattern): the Spark side
IMPORTS each registered rung function, and the oracle embeds each rung's
REGISTERED oracle SQL verbatim from the registry — the measurement can
never drift from the certified rungs because it has no private copy of
them.

Determinism: hit counts are exact integers; recall_ppm is integer
division of non-negative integers (Spark ``div`` == DuckDB ``//`` there).
No float crosses an engine boundary.

Scale shape (100 TB): recall evaluation is an OFFLINE QA job over a query
SAMPLE, not a serving path — the exact reference is one broadcast-query
corpus scan per metric with the two-phase top-k cut (partition-local
row_number prune, then a global window over <= k * n_partitions
survivors — the bm25_rank discipline; never a single-task per-query
sort), and each rung contributes its already-certified scale shape.
Cost = sum of the rung costs + THREE exact-reference corpus scans (one
per metric, r15): the 8 rungs share 5 distinct (metric, n_queries, k)
combos (r14 memoization), and within a metric every combo shares one
scored corpus and one total order, so the exact top-k runs once per
metric at (max n_q, max k) behind a lazy localCheckpoint and each
combo's reference is a (q_vec_id < n_q AND rk <= k) filter over the
materialized ranked rows — provably the same set _exact_topk(n_q, k)
returns, since a k_max local prune retains every k-prune survivor and
rank prefixes of the same total order agree. The rung pipelines
themselves share their codebook subtrees through the canonical builders
in simsearch.py (r15) — AQE's stage cache computes the ivf/ivfpq coarse
index and the pq/ivfpq PQ codebook once each inside this union plan.

Fixture-statistics note (the round-10 discipline): the synthetic
embeddings are near-isotropic unit vectors with NO planted neighborhood
structure, so heavily-compressed rungs measure what theory predicts on
isotropic data — sign-bit PQ codebooks retain little rank information
(recall_ppm ~1e5), a single LSH bucket of 2^4 hyperplane bits is near-
random (~0–7e4), while the near-lossless rungs stay high (SQ8 ≥ 9e5,
k-means IVF ≥ 9e5, multi-probe MIPS ≥ 5e5) and the exact rung is 1e6 by
construction. The measured ladder ORDER (exact > SQ/IVF-kmeans > MIPS >
IVF > PQ > LSH) is the real signal the floors in
tests/test_round13_ops.py pin; absolute PQ/LSH recall would rise on real
clustered embeddings.

No reference counterpart: extends the similarity-search family (SURVEY
§2C); the reference has no vector surface at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_datasource_orc_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
)
from datafusion_datasource_orc_spark.operators import ivf_kmeans as _ivfkm
from datafusion_datasource_orc_spark.operators import mips as _mips
from datafusion_datasource_orc_spark.operators import simsearch as _ss
from datafusion_datasource_orc_spark.operators.registry import ORACLES, query
from datafusion_datasource_orc_spark.sources.tables import load_table

# (rung, n_queries, k, metric, has q_vec_id column) — every value below is
# read off the rung's own registered constants so a rung retune updates
# the evaluation automatically.
_RUNGS: list[tuple[str, int, int, str, bool]] = [
    ("simsearch_bruteforce", 1, _ss.TOP_K, "cos", False),  # harness self-check
    ("simsearch_lsh", _ss.ANN_QUERIES, _ss.ANN_TOPK, "cos", True),
    ("simsearch_ivf", _ss.ANN_QUERIES, _ss.ANN_TOPK, "cos", True),
    ("simsearch_ivf_kmeans", _ivfkm.IVFKM_QUERIES, _ivfkm.IVFKM_TOPK, "l2", True),
    ("simsearch_pq", _ss.PQ_QUERIES, _ss.PQ_TOP_K, "l2", True),
    ("simsearch_ivfpq", _ss.PQ_QUERIES, _ss.PQ_TOP_K, "l2", True),
    ("simsearch_sq", 1, _ss.TOP_K, "cos", False),
    ("simsearch_mips_banded", _mips.MIPS_QUERIES, _mips.MIPS_K, "ip", True),
]

_METRIC_SQL = {
    "cos": _ss._SQL_COSINE,
    "l2": _ss._SQL_L2SQ,
    "ip": _mips._SQL_DOT,
}
_METRIC_DESC = {"cos": True, "l2": False, "ip": True}


def _exact_sql(n_q: int, k: int, metric: str) -> str:
    """Brute-force exact top-k per query under the rung's metric, with the
    ladder-wide (ROUND(m,6), vec_id) total order. NULL embeddings are
    excluded on BOTH sides (the mips rungs' contract): a NULL score would
    rank nulls-first under Spark's asc() but nulls-last under DuckDB's ASC
    — the one ordering divergence this corpus can't show today but a
    future fixture could."""
    m = _METRIC_SQL[metric].format(a="e.embedding", b="q.embedding")
    direction = "DESC" if _METRIC_DESC[metric] else "ASC"
    return f"""
      SELECT q_vec_id, vec_id FROM (
        SELECT q.vec_id AS q_vec_id, e.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND({m}, 6) {direction}, e.vec_id
               ) AS rk
        FROM embeddings e JOIN embeddings q
          ON q.vec_id < {n_q} AND e.vec_id != q.vec_id
        WHERE e.embedding IS NOT NULL AND q.embedding IS NOT NULL
      ) WHERE rk <= {k}
    """


def _recall_oracle() -> str:
    parts = []
    for name, n_q, k, metric, has_q in _RUNGS:
        rung_sql = ORACLES[name]
        approx = (
            f"SELECT q_vec_id, vec_id FROM ({rung_sql})"
            if has_q
            else f"SELECT 0 AS q_vec_id, vec_id FROM ({rung_sql})"
        )
        parts.append(
            f"""
      SELECT '{name}' AS rung,
             CAST({n_q} AS BIGINT) AS n_queries,
             CAST({k} AS BIGINT) AS k,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM ({approx}) a JOIN ({_exact_sql(n_q, k, metric)}) e
                USING (q_vec_id, vec_id)) AS hits"""
        )
    return (
        "SELECT rung, n_queries, k, hits, "
        "hits * 1000000 // (n_queries * k) AS recall_ppm FROM ("
        + " UNION ALL ".join(parts)
        + ")"
    )


def _exact_topk(emb: DataFrame, n_q: int, k: int, metric: str) -> DataFrame:
    """Spark twin of _exact_sql: (q_vec_id, vec_id, rk) exact ranked
    neighbor rows (rk <= k).

    Two-phase top-k (the bm25_rank/mips discipline): a window partitioned
    by q_vec_id alone would sort the whole scored corpus in ONE task per
    query at scale. Phase 1 cuts each (q, partition-id) group to its local
    top-k — distributing the per-q sort across partitions — phase 2 ranks
    the <= k * n_partitions survivors. Identical results: no row outside a
    partition-local top-k can enter the global top-k, and the
    (ROUND(m,6), vec_id) tie-break is total."""
    nn = emb.filter(F.col("embedding").isNotNull())
    q = nn.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("qe")
    )

    def score() -> Column:
        a, b = F.col("embedding"), F.col("qe")
        if metric == "cos":
            return cosine_similarity(a, b)
        if metric == "ip":
            return dot_product(a, b)
        return _ss._l2_sq(a, b)

    scored = (
        nn.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "vec_id", F.round(score(), 6).alias("s"))
    )
    order = F.col("s").desc() if _METRIC_DESC[metric] else F.col("s").asc()
    local = Window.partitionBy("q_vec_id", F.spark_partition_id()).orderBy(
        order, F.col("vec_id")
    )
    pruned = (
        scored.withColumn("lrk", F.row_number().over(local))
        .filter(F.col("lrk") <= k)
        .drop("lrk")
    )
    w = Window.partitionBy("q_vec_id").orderBy(order, F.col("vec_id"))
    return (
        pruned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_vec_id", "vec_id", "rk")
    )


_RUNG_FNS = {
    "simsearch_bruteforce": _ss.simsearch_bruteforce,
    "simsearch_lsh": _ss.simsearch_lsh,
    "simsearch_ivf": _ss.simsearch_ivf,
    "simsearch_ivf_kmeans": _ivfkm.simsearch_ivf_kmeans,
    "simsearch_pq": _ss.simsearch_pq,
    "simsearch_ivfpq": _ss.simsearch_ivfpq,
    "simsearch_sq": _ss.simsearch_sq,
    "simsearch_mips_banded": _mips.simsearch_mips_banded,
}


@query("simsearch_recall_at_k", oracle=_recall_oracle())
def simsearch_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — one row per ANN rung:
    (rung, n_queries, k, hits, recall_ppm)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out: DataFrame | None = None
    # exact references: ONE pipeline PER METRIC (r15, guide §2.4 — the r14
    # memoization already collapsed 8 refs to the 5 distinct
    # (metric, n_q, k) combos; within a metric every combo shares the same
    # scored corpus and the same total order, so the broadcast-query scan
    # + two-phase top-k now runs once at (max n_q, max k) and each combo's
    # reference is a FILTER over the materialized (q_vec_id, vec_id, rk)
    # rows: value-identical, because a local k_max-prune survivor set
    # contains every k-prune survivor and rank prefixes of the same total
    # order agree, so (q < n_q AND rk <= k) selects exactly _exact_topk's
    # rows. 5 corpus pipelines → 3, each behind one lazy localCheckpoint
    # of <= n_max*k_max rows.
    by_metric: dict[str, tuple[int, int]] = {}
    for _, n_q, k, metric, _ in _RUNGS:
        n0, k0 = by_metric.get(metric, (0, 0))
        by_metric[metric] = (max(n0, n_q), max(k0, k))
    metric_refs = {
        m: _exact_topk(emb, n_max, k_max, m).localCheckpoint(eager=False)
        for m, (n_max, k_max) in by_metric.items()
    }
    for name, n_q, k, metric, has_q in _RUNGS:
        approx = _RUNG_FNS[name](spark, sf_dir)
        if has_q:
            approx = approx.select("q_vec_id", "vec_id")
        else:
            approx = approx.select(
                F.lit(0).cast("long").alias("q_vec_id"), "vec_id"
            )
        exact = (
            metric_refs[metric]
            .filter((F.col("q_vec_id") < n_q) & (F.col("rk") <= k))
            .select("q_vec_id", "vec_id")
        )
        row = (
            approx.join(exact, ["q_vec_id", "vec_id"])
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(
                F.lit(name).alias("rung"),
                F.lit(n_q).cast("long").alias("n_queries"),
                F.lit(k).cast("long").alias("k"),
                F.col("hits"),
                F.expr(f"hits * 1000000 div ({n_q} * {k})").alias("recall_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
