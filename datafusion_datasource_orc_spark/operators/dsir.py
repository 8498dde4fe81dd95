"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") over the
documents corpus: estimate hashed bag-of-ngrams distributions for a
TARGET corpus and the RAW pool, weight every raw doc by its
log-likelihood ratio, and keep the top quantile — the pretraining-data
selection pass that sits between crawling and training.

Target fixture: the corpus is deliberately homogeneous (one 31-token
vocabulary at uniform frequencies), so a naturally-distinct target slice
does not exist; the target is PLANTED in-query (the pii/phash twin-fixture
precedent): docs with knuth_hash32(doc_id) % 17 == 0 form the target, with
a fixed formal-register suffix appended before tokenization. The suffix's
tokens all occur naturally, so the learned weights transfer: raw docs
whose own text is richer in the marker tokens genuinely scores higher —
selection is discriminative, not vacuous (pinned in pytest: the selected
slice's marker-token rate strictly exceeds the rejected slice's).

Variant note: the paper resamples with Gumbel noise; this operator takes
the deterministic top-quantile form (the common production simplification)
so both engines agree bit-for-bit. Features are hashed UNIGRAMS at D=64
(the paper's space is hashed n-grams, n <= 2, at D=10^4; bigrams were
built and measured first — at gate scale their bucket occupancy is so
sparse that per-bucket ratio noise reaches +-0.4 nats and drowns the
planted shift, so the registered form uses the dense unigram buckets,
where selection measures 1.45x marker-rate enrichment vs the ~1.6x
information-theoretic ceiling for a quartile cut on this corpus). The
per-doc weight is the exact integer dot product DIVIDED by the doc's
token count (one FLOOR(double/int) on both engines): the ordinary-bucket
drift ln(1-alpha) otherwise makes raw weight scale with length and the
quantile tail fills with short docs instead of target-like docs.

Determinism discipline: per-bucket log ratios snapped to the integer
micro-unit grid (ln computed once per bucket in a fixed association
order, CAST(ROUND(x*1e6) AS BIGINT) — the text_quality_nb hardening of
the tfidf ROUND-6 ln precedent); every per-doc weight is then an exact
integer dot product. The selection cutoff is the exact interpolated 0.75
quantile of those integers, ROUNDed to 4 dp on both engines before the
strict comparison (the training_curriculum_quantiles pair).

Scale shape (100 TB): one scan builds both 64-row histograms (map-side
combinable; the target side is the tiny slice), the model broadcasts,
scoring is one explode + per-(doc,bucket) count + broadcast join + per-doc
sum, the cutoff is a 1-row broadcast aggregate, and the manifest is a
per-source rollup. No global sort, no window, no pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.functions.portable import (
    knuth_hash32,
    knuth_hash32_sql,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

DSIR_D = 64  # hashed unigram buckets
DSIR_TARGET_MOD = 17  # knuth(doc_id) % 17 == 0 -> target slice (~6%)
DSIR_Q = 0.75  # keep raw docs above this weight quantile
DSIR_SUFFIX = "query sort order group filter"  # formal-register fixture

_NIB = "(strpos('0123456789abcdef', substr(md5(g), {j}, 1)) - 1)"
_SQL_BUCKET = (
    "(" + " + ".join(_NIB.format(j=j + 1) + f" * {16 ** (3 - j)}" for j in range(4))
    + f") % {DSIR_D}"
)


def dsir_ctes() -> str:
    """The importance-weight CTE chain (ds_lab … ds_sc, ds_cut) with
    collision-safe ds_-prefixed names — shared by the per-source rollup
    oracle here and the curation-manifest oracle (operators/curation.py),
    so both replay the ONE weight model (round-13 composition
    discipline). ds_sc scores RAW docs only (the target slice is the
    reference distribution, never a selection candidate)."""
    return f"""
    ds_lab AS (
      SELECT doc_id, source, n_chars,
             ({knuth_hash32_sql('doc_id')}) % {DSIR_TARGET_MOD} = 0 AS is_tgt,
             CASE WHEN ({knuth_hash32_sql('doc_id')}) % {DSIR_TARGET_MOD} = 0
                  THEN lower(text) || ' {DSIR_SUFFIX}' ELSE lower(text) END AS t
      FROM documents WHERE text IS NOT NULL
    ),
    ds_base AS (SELECT doc_id, source, n_chars, is_tgt,
                    string_split_regex(t, '\\s+') AS w FROM ds_lab),
    ds_grams AS (SELECT doc_id, is_tgt, unnest(w) AS g FROM ds_base),
    ds_bg AS (SELECT doc_id, is_tgt, {_SQL_BUCKET} AS bucket, COUNT(*) AS x
           FROM ds_grams GROUP BY 1, 2, 3),
    ds_dom AS (SELECT CAST(range AS BIGINT) AS bucket FROM range({DSIR_D})),
    ds_hist AS (
      SELECT d.bucket,
             COALESCE(SUM(CASE WHEN b.is_tgt THEN b.x END), 0) + 1 AS ct,
             COALESCE(SUM(CASE WHEN NOT b.is_tgt THEN b.x END), 0) + 1 AS cr
      FROM ds_dom d LEFT JOIN ds_bg b USING (bucket) GROUP BY 1
    ),
    ds_tot AS (SELECT SUM(ct) AS st, SUM(cr) AS sr FROM ds_hist),
    ds_lw AS (
      SELECT h.bucket,
             CAST(ROUND((ln(CAST(h.ct AS DOUBLE)) - ln(CAST(t.st AS DOUBLE))
                       - ln(CAST(h.cr AS DOUBLE)) + ln(CAST(t.sr AS DOUBLE)))
                        * 1000000) AS BIGINT) AS lw
      FROM ds_hist h CROSS JOIN ds_tot t
    ),
    ds_sc AS (
      SELECT b.doc_id,
             CAST(FLOOR(CAST(SUM(b.x * l.lw) AS DOUBLE) / SUM(b.x)) AS BIGINT) AS s
      FROM ds_bg b JOIN ds_lw l USING (bucket) WHERE NOT b.is_tgt GROUP BY 1
    ),
    ds_cut AS (SELECT ROUND(quantile_cont(s, {DSIR_Q}), 4) AS cut FROM ds_sc)"""


def _dsir_oracle() -> str:
    return f"""
    WITH {dsir_ctes()},
    sel AS (
      SELECT l.source, l.n_chars, s.s, s.s > c.cut AS keep
      FROM ds_sc s JOIN ds_lab l USING (doc_id) CROSS JOIN ds_cut c
    )
    SELECT source,
           COUNT(*) AS n_raw,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(SUM(CASE WHEN keep THEN n_chars // 4 ELSE 0 END) AS BIGINT)
               AS sel_tokens,
           CAST(SUM(CASE WHEN keep THEN s ELSE 0 END) AS BIGINT)
               AS sum_sel_weight_micro
    FROM sel GROUP BY 1
    """


def _labeled(docs: DataFrame) -> DataFrame:
    """(doc_id, text, source, n_chars) → labels + fixture-augmented text
    for any doc batch (row-local; the knuth slice marker travels with the
    doc, so batches label identically to the whole corpus)."""
    is_tgt = knuth_hash32(F.col("doc_id")) % DSIR_TARGET_MOD == 0
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        is_tgt.alias("is_tgt"),
        F.when(
            is_tgt, F.concat(F.lower("text"), F.lit(" " + DSIR_SUFFIX))
        )
        .otherwise(F.lower("text"))
        .alias("t"),
    )


def _bucket_counts(lab: DataFrame) -> DataFrame:
    """Hashed unigram counts per (doc_id, is_tgt, bucket)."""
    grams = lab.select(
        "doc_id", "is_tgt",
        F.explode(F.split(F.col("t"), r"\s+")).alias("g"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 4), 16, 10)
        .cast("bigint")
        % F.lit(DSIR_D)
    )
    return (
        grams.select("doc_id", "is_tgt", bucket.alias("bucket"))
        .groupBy("doc_id", "is_tgt", "bucket")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def _weights(spark: SparkSession, bg: DataFrame) -> DataFrame:
    """The 64-row integer micro-unit log-ratio table from the two
    histograms (add-1 smoothed over the full bucket domain)."""
    dom = spark.range(DSIR_D).select(F.col("id").alias("bucket"))
    hist = dom.join(
        bg.groupBy("bucket").agg(
            F.sum(F.when(F.col("is_tgt"), F.col("x"))).alias("ct0"),
            F.sum(F.when(~F.col("is_tgt"), F.col("x"))).alias("cr0"),
        ),
        "bucket",
        "left",
    ).select(
        "bucket",
        (F.coalesce(F.col("ct0"), F.lit(0)) + 1).alias("ct"),
        (F.coalesce(F.col("cr0"), F.lit(0)) + 1).alias("cr"),
    )
    tot = hist.agg(F.sum("ct").alias("st"), F.sum("cr").alias("sr"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            (
                F.log(F.col("ct").cast("double"))
                - F.log(F.col("st").cast("double"))
                - F.log(F.col("cr").cast("double"))
                + F.log(F.col("sr").cast("double"))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("lw"),
    )


def _raw_scores(bg: DataFrame, lw: DataFrame) -> DataFrame:
    """Length-normalized integer importance per raw doc."""
    return (
        bg.filter(~F.col("is_tgt"))
        .join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.sum(F.col("x") * F.col("lw")).cast("double") / F.sum("x")
            )
            .cast("bigint")
            .alias("s")
        )
    )


def dsir_model(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Train the selection model over the corpus: returns (lw, cut) — the
    64-row weight table and the 1-row frozen quantile cutoff. The
    production/streaming shape: the model and cut are computed once on a
    calibration pass, then applied to any batch or stream (the twin in
    tests/test_streaming.py pins stream == batch under the frozen pair)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bg = _bucket_counts(_labeled(docs))
    lw = _weights(spark, bg)
    cut = _raw_scores(bg, lw).agg(
        F.round(F.percentile("s", F.lit(DSIR_Q)), 4).alias("cut")
    )
    return lw, cut


def dsir_score_batch(docs: DataFrame, lw: DataFrame, cut: DataFrame) -> DataFrame:
    """Score an arbitrary doc batch against a frozen (lw, cut) pair — one
    row per RAW doc in the batch: (doc_id, source, n_chars, s, keep).
    Scoring is per-doc against frozen broadcasts, so batch boundaries
    cannot change any row."""
    lab = _labeled(docs.filter(F.col("text").isNotNull()))
    sc = _raw_scores(_bucket_counts(lab), lw)
    return (
        sc.join(lab.select("doc_id", "source", "n_chars"), "doc_id")
        .crossJoin(F.broadcast(cut))
        .select(
            "doc_id", "source", "n_chars", "s",
            (F.col("s") > F.col("cut")).alias("keep"),
        )
    )


def dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-raw-doc importance weights and keep flags:
    (doc_id, source, n_chars, s, keep) — the selection the manifest rolls
    up, exposed for the discriminativeness pin in pytest. Single lineage:
    bg is materialized once behind a lazy localCheckpoint and reused by the
    histogram build, the cutoff pass, and the scoring pass — checkpoint,
    not cache(): a cache with no unpersist path accumulates a fresh plan
    instance in executor storage per invocation (gate + bench iterations),
    while checkpoint RDDs are released with the DataFrame reference."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    lab = _labeled(docs)
    bg = _bucket_counts(lab).localCheckpoint(eager=False)
    lw = _weights(spark, bg)
    sc = _raw_scores(bg, lw)
    cut = sc.agg(F.round(F.percentile("s", F.lit(DSIR_Q)), 4).alias("cut"))
    return (
        sc.join(lab.select("doc_id", "source", "n_chars"), "doc_id")
        .crossJoin(F.broadcast(cut))
        .select(
            "doc_id", "source", "n_chars", "s",
            (F.col("s") > F.col("cut")).alias("keep"),
        )
    )


@query("training_dsir_select", oracle=_dsir_oracle())
def training_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — per-source selection manifest:
    (source, n_raw, n_selected, sel_tokens, sum_sel_weight_micro)."""
    sel = dsir_scores(spark, sf_dir)
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_selected"),
        F.sum(F.when(F.col("keep"), F.expr("n_chars div 4")).otherwise(0))
        .cast("bigint")
        .alias("sel_tokens"),
        F.sum(F.when(F.col("keep"), F.col("s")).otherwise(0))
        .cast("bigint")
        .alias("sum_sel_weight_micro"),
    )
