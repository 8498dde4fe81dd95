"""The composed end-to-end training-data build (judge r07 task 6).

One oracle-checked query chaining the pipeline families the way a real
100 TB pre-training data build runs them:

    ingest -> quality gate -> repetition filter -> exact dedup (normalized
    content hash) -> MinHash-LSH near-dedup -> benchmark-contamination
    screen -> weighted per-source mix sample -> pack manifest

emitting per-stage survivor counts + token budgets AND the final per-source
manifest in one DataFrame. The individual stages exist as standalone queries
(pipeline_filter_funnel, dedup_exact_norm, dedup_minhash_lsh,
contamination_eval_overlap, training_mix_sample, training_pack_sequences);
what this adds is the CROSS-FAMILY composition — survivor sets flowing
between families, and checkpoint placement between stages — which is the
query a production pipeline actually runs.

Scale shape (the 100 TB story, stage by stage):
- quality/repetition flags are row-local array math in one scan;
- exact-dedup keep is ONE window over the 16-byte content hash (shuffle
  moves hashes, never text);
- near-dedup reuses dedup.minhash_lsh_pairs on the EXACT-DEDUP SURVIVOR
  shingle arrays (banding shuffle + broadcast verify, never all-pairs);
- contamination broadcasts the tiny eval trigram set (hashed trigrams —
  the SAME arrays the LSH stage shingled, one shingling pass feeds both);
- mix sampling is a row-local multiplicative hash (no RNG state, exactly
  reproducible on any cluster layout);
- the funnel report is ONE 1-row conditional aggregate over the per-doc
  flags table; the manifest is one groupBy(source).
localCheckpoint barriers sit where consumers fan out (flags table, shingle
arrays) — at 100 TB the same barriers are persist(DISK_ONLY)/checkpoint.

Column-name contract: stage rows and manifest rows share one schema
(stage_no, stage, source, n_docs, n_tokens, n_packs); stage rows use
source='*'; n_packs is the 2048-token sequence-pack estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_datasource_orc_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _SQL_SHINGLES,
    minhash_lsh_pairs,
    shingle_docs,
)
from datafusion_datasource_orc_spark.functions.portable import (
    knuth_hash32,
    knuth_hash32_sql,
    norm_fingerprint,
    norm_fingerprint_sql,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.operators.textstats import (
    EVAL_MOD,
    SOURCE_TIER_SQL,
    source_tier,
    _ngrams_linear,
    _words,
)
from datafusion_datasource_orc_spark.sources.tables import load_table

_KH = knuth_hash32_sql("doc_id")

_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, n_chars // 4 AS toks,
         len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
         {{bigrams}} AS bg,
         {norm_fingerprint_sql("text")} AS content_hash,
         (doc_id % {EVAL_MOD} = 0) AS is_eval,
         {_KH} <
           (10 + 4 * {SOURCE_TIER_SQL})
           * 42949672 AS sampled
  FROM (SELECT *, string_split_regex(lower(text), '\\s+') AS w FROM documents)
),
flags1 AS (
  SELECT *,
         CASE WHEN n_words BETWEEN 20 AND 1000
                   AND CAST(n_distinct AS DOUBLE) / n_words > 0.2
              THEN 1 ELSE 0 END AS q,
         CASE WHEN n_words < 2 OR
                   1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / (n_words - 1) < 0.6
              THEN 1 ELSE 0 END AS r
  FROM base
),
flags2 AS (
  SELECT *, q * r AS qr,
         CASE WHEN q * r = 1 AND doc_id =
                   min(CASE WHEN q * r = 1 THEN doc_id END)
                       OVER (PARTITION BY content_hash)
              THEN 1 ELSE 0 END AS keep_exact
  FROM flags1
),
sh AS ({_SQL_SHINGLES}),
s4 AS (SELECT doc_id FROM flags2 WHERE qr = 1 AND keep_exact = 1),
sh4 AS (SELECT sh.doc_id, sh.s FROM sh JOIN s4 USING (doc_id) WHERE len(sh.s) > 0),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh4 a JOIN sh4 b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        >= {JACCARD_THRESHOLD}
),
dupb AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
evalg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {EVAL_MOD} = 0),
s5 AS (SELECT doc_id FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM dupb)),
cont AS (
  SELECT DISTINCT x.doc_id
  FROM (SELECT s5.doc_id, unnest(sh4.s) AS g
        FROM sh4 JOIN s5 USING (doc_id)) x
  JOIN evalg e ON x.g = e.g
),
final AS (
  SELECT f.*,
         CASE WHEN qr = 1 AND keep_exact = 1 THEN 1 ELSE 0 END AS s4f,
         CASE WHEN qr = 1 AND keep_exact = 1
                   AND doc_id NOT IN (SELECT doc_id FROM dupb)
              THEN 1 ELSE 0 END AS s5f
  FROM flags2 f
),
final2 AS (
  SELECT *,
         CASE WHEN s5f = 1 AND NOT is_eval
                   AND doc_id NOT IN (SELECT doc_id FROM cont)
              THEN 1 ELSE 0 END AS s6f
  FROM final
),
final3 AS (
  SELECT *, CASE WHEN s6f = 1 AND sampled THEN 1 ELSE 0 END AS s7f FROM final2
),
agg AS (
  SELECT COUNT(*) AS c1, SUM(toks) AS t1,
         SUM(q) AS c2, SUM(q * toks) AS t2,
         SUM(qr) AS c3, SUM(qr * toks) AS t3,
         SUM(s4f) AS c4, SUM(s4f * toks) AS t4,
         SUM(s5f) AS c5, SUM(s5f * toks) AS t5,
         SUM(s6f) AS c6, SUM(s6f * toks) AS t6,
         SUM(s7f) AS c7, SUM(s7f * toks) AS t7
  FROM final3
),
stages AS (
  SELECT 1 AS stage_no, 'ingested' AS stage, '*' AS source, c1 AS n_docs, t1 AS n_tokens FROM agg
  UNION ALL SELECT 2, 'quality', '*', c2, t2 FROM agg
  UNION ALL SELECT 3, 'repetition', '*', c3, t3 FROM agg
  UNION ALL SELECT 4, 'exact_dedup', '*', c4, t4 FROM agg
  UNION ALL SELECT 5, 'near_dedup', '*', c5, t5 FROM agg
  UNION ALL SELECT 6, 'decontaminated', '*', c6, t6 FROM agg
  UNION ALL SELECT 7, 'mix_sample', '*', c7, t7 FROM agg
),
manifest AS (
  SELECT 8 AS stage_no, 'manifest' AS stage, source,
         COUNT(*) AS n_docs, SUM(toks) AS n_tokens
  FROM final3 WHERE s7f = 1 GROUP BY source
),
unioned AS (SELECT * FROM stages UNION ALL SELECT * FROM manifest)
SELECT stage_no, stage, source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((n_tokens + 2047) // 2048 AS BIGINT) AS n_packs
FROM unioned
"""


@query(
    "pipeline_end_to_end",
    # The near-dedup stage's oracle is the EXACT Jaccard pair set over the
    # exact-dedup survivors — legitimate for the same reason as
    # dedup_minhash_lsh's oracle: LSH candidates are exact-verified
    # (precision 1.0) and banding recall is 100% at the gate scales (a
    # full-corpus property that carries to any subset: co-bucketing is
    # per-pair). A recall regression reds the gate rather than hiding.
    # Cap caveat (round-10 review): the LSH_BUCKET_PAIR_CAP star-collapse
    # preserves CONNECTED COMPONENTS, not the pairwise doc_b removal set
    # this stage consumes — a bucket wider than the cap whose star center
    # fails the verify could drop a true (doc_a, doc_b) removal the
    # oracle's all-pairs dupb contains, redding the gate. Below the cap
    # (always at the test scales; force-bind behavior pinned in
    # tests/test_round8_ops.py) removals are exact; at cap-binding scale
    # the clustering form (dedup_connected_components_lsh) is the
    # keep-one-per-component production path.
    oracle=_ORACLE.format(
        bigrams="list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])"
    ),
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — the composed training-data build, one query."""
    docs = load_table(spark, sf_dir, "documents")

    w = _words(F.col("text"))
    base = docs.select(
        "doc_id",
        "source",
        F.expr("n_chars div 4").alias("toks"),
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        _ngrams_linear(w, 2).alias("bg"),
        norm_fingerprint(F.col("text")).alias("content_hash"),
        (F.col("doc_id") % EVAL_MOD == 0).alias("is_eval"),
        (
            # overflow-safe Knuth hash (functions.portable.knuth_hash32)
            knuth_hash32(F.col("doc_id"))
            < (
                F.lit(10)
                + F.lit(4)
                * source_tier()
            )
            * F.lit(42949672)
        ).alias("sampled"),
    )
    q = (
        F.col("n_words").between(20, 1000)
        & (F.col("n_distinct").cast("double") / F.col("n_words") > 0.2)
    ).cast("int")
    dup_bg = 1.0 - F.size(F.array_distinct("bg")).cast("double") / (
        F.col("n_words") - 1
    )
    r = ((F.col("n_words") < 2) | (dup_bg < 0.6)).cast("int")
    # flags table: row-local columns only, arrays projected AWAY before the
    # barrier (bg exists only to compute r) — the checkpoint materializes
    # ~50 bytes/doc, not the documents
    flags = base.select(
        "doc_id",
        "source",
        "toks",
        "content_hash",
        "is_eval",
        "sampled",
        q.alias("q"),
        r.alias("r"),
    ).withColumn("qr", F.col("q") * F.col("r"))
    # exact dedup among quality survivors: ONE window over the content
    # hash; min is taken over qr docs only (min ignores the others' NULLs).
    # The ONLY barrier sits AFTER the window — the pre-window flags are
    # consumed exactly once, so an earlier checkpoint would materialize an
    # intermediate for nothing
    wh = Window.partitionBy("content_hash")
    flags = flags.withColumn(
        "keep_exact",
        (
            (F.col("qr") == 1)
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("qr") == 1, F.col("doc_id"))).over(wh)
            )
        ).cast("int"),
    ).localCheckpoint(eager=False)

    # ONE shingling pass (hashed trigrams) feeds BOTH the near-dedup stage
    # (survivor arrays) and the contamination screen (eval trigram set)
    sh_all = (
        shingle_docs(docs, hashed=True)
        .filter(F.size("s") > 0)
        .select("doc_id", F.size("s").alias("n"), "s")
        .localCheckpoint(eager=False)
    )
    s4_ids = flags.filter(F.col("keep_exact") == 1).select("doc_id")
    sh4 = sh_all.join(s4_ids, "doc_id").localCheckpoint(eager=False)

    pairs = minhash_lsh_pairs(sh4)
    # r15 (stage breakdown, OPTIMIZATION_r15.md): dup_b has TWO consumers
    # (the s5 anti-join feeding the contamination screen, and the final
    # flags fold), each re-deriving the ~2.4 s LSH band + exact-verify
    # pipeline above it (AQE's stage cache does not fully collapse the two
    # copies — the verify side's broadcast subtrees differ per consumer).
    # The barrier materializes the tiny distinct dup-id set once (~dup
    # rows, a few bytes each; at 100 TB the same barrier is a persist of
    # the removal list). Measured: full pipeline 5.91 → 5.15 s warm best
    # at sf0.1; the remaining cost decomposes as pairs ~2.4 s,
    # contamination-own ~1.6 s (eval-gram distinct + survivor explode
    # join), shingling ~0.6 s, flags/folds ~0.3 s — each stage's shape is
    # its family's certified one, so that is the composition floor.
    dup_b = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    # inner-join membership probe (no 'hit' marker column — that idiom
    # belongs to contamination_eval_overlap's LEFT join, where null-ness
    # is tested; here only doc_id survives the join)
    eval_grams = (
        sh_all.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    s5_ids = s4_ids.join(dup_b, "doc_id", "left_anti")
    cont_ids = (
        sh4.join(s5_ids, "doc_id")
        .select("doc_id", F.explode("s").alias("g"))
        .join(F.broadcast(eval_grams), "g")
        .select("doc_id")
        .distinct()
    )

    final = (
        flags.join(dup_b.withColumn("is_dup", F.lit(1)), "doc_id", "left")
        .join(cont_ids.withColumn("is_cont", F.lit(1)), "doc_id", "left")
        .withColumn("s4f", F.col("keep_exact"))
        .withColumn(
            "s5f",
            (F.col("keep_exact") == 1) & F.col("is_dup").isNull(),
        )
        .withColumn(
            "s6f",
            F.col("s5f") & ~F.col("is_eval") & F.col("is_cont").isNull(),
        )
        .withColumn("s7f", F.col("s6f") & F.col("sampled"))
        .select(
            "source",
            "toks",
            "q",
            "qr",
            F.col("s4f").cast("long").alias("s4f"),
            F.col("s5f").cast("long").alias("s5f"),
            F.col("s6f").cast("long").alias("s6f"),
            F.col("s7f").cast("long").alias("s7f"),
        )
        .localCheckpoint(eager=False)
    )

    agg = final.agg(
        F.count(F.lit(1)).alias("c1"),
        F.sum("toks").alias("t1"),
        F.sum("q").alias("c2"),
        F.sum(F.col("q") * F.col("toks")).alias("t2"),
        F.sum("qr").alias("c3"),
        F.sum(F.col("qr") * F.col("toks")).alias("t3"),
        F.sum("s4f").alias("c4"),
        F.sum(F.col("s4f") * F.col("toks")).alias("t4"),
        F.sum("s5f").alias("c5"),
        F.sum(F.col("s5f") * F.col("toks")).alias("t5"),
        F.sum("s6f").alias("c6"),
        F.sum(F.col("s6f") * F.col("toks")).alias("t6"),
        F.sum("s7f").alias("c7"),
        F.sum(F.col("s7f") * F.col("toks")).alias("t7"),
    )
    stage_rows = agg.selectExpr(
        "stack(7, "
        "1, 'ingested', c1, t1, "
        "2, 'quality', c2, t2, "
        "3, 'repetition', c3, t3, "
        "4, 'exact_dedup', c4, t4, "
        "5, 'near_dedup', c5, t5, "
        "6, 'decontaminated', c6, t6, "
        "7, 'mix_sample', c7, t7) "
        "AS (stage_no, stage, n_docs, n_tokens)"
    ).select("stage_no", "stage", F.lit("*").alias("source"), "n_docs", "n_tokens")
    manifest = (
        final.filter(F.col("s7f") == 1)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
        )
        .select(
            F.lit(8).alias("stage_no"),
            F.lit("manifest").alias("stage"),
            "source",
            "n_docs",
            "n_tokens",
        )
    )
    return stage_rows.unionAll(manifest).select(
        "stage_no",
        "stage",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr("(n_tokens + 2047) div 2048").cast("long").alias("n_packs"),
    )
