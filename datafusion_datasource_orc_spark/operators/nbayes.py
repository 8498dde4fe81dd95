"""Distributed multinomial Naive Bayes quality classifier over the
documents corpus — the train-a-classifier-then-score-the-corpus pass every
large-scale curation pipeline runs (fastText/DCLM/FineWeb-Edu style: weak
labels seed a cheap linear model that then scores everything). The
reference engine has no model-training surface at all; this is the
beyond-reference training-pipeline family (SURVEY §2 north star), sibling
to `embedding_kmeans` (the clustering trainer) and `embedding_power_iteration`.

Weak labels: a deterministic row-local seed rule — y=+1 iff
count('hash')+count('group') > count('join')+count('merge') over the doc's
tokens. In production this slot is "wiki-vs-crawl" or an LLM-judged slice;
here the rule is chosen so BOTH engines derive the identical label and the
task is genuinely learnable from the hashed-bag features (the four marker
tokens occupy collision-free buckets at NB_D=32 over this corpus's 31-token
vocabulary — verified offline; held-out accuracy 0.90-0.99 at
sf0.001/0.01/0.1 vs a 0.57-0.59 majority baseline, so the certificate pins
a model that actually learned, not a constant predictor).

Features: hashed bag-of-words, bucket = conv(md5(tok)[1:4], 16) % NB_D —
the engine-portable md5 idiom (dedup_simhash precedent). Train/test split:
knuth_hash32(doc_id) % 10 < 8 (the certified overflow-safe split primitive,
split_leakage precedent).

Determinism discipline: log-likelihood ratios are computed ONCE per bucket
(32 values) as ln(cp)-ln(sp)-ln(cn)+ln(sn) in the identical association
order on both engines, then snapped to an INTEGER micro-unit grid
(CAST(ROUND(x*1e6) AS BIGINT)). Every per-doc score is then an exact
integer dot product Sum(x_b * llr_b) — order-independent, no float
accumulation anywhere (the tfidf ROUND-6 ln precedent, hardened to the
integer grid so even the SUM is exact).

Scale shape (100 TB): tokenize+bucket is one scan; per-(doc,bucket) counts
is one map-side-combinable shuffle. Train (`nb_train`) and score
(`nb_score`) are separate passes over it — the production split: the model
trains offline once and the scorer runs over any batch or stream (the
streaming twin in tests/test_streaming.py scores micro-batches against the
frozen broadcast model). The model is 32 rows + 1 prior row. Scoring is
a broadcast join + per-doc agg; the confusion rollup is a 4-row groupBy.
Two passes over the corpus total, both whole-stage-codegen; no iteration,
no driver-side loop, no UDF.
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

NB_D = 32  # hashed feature buckets; marker tokens are collision-free here
NB_POS = ("hash", "group")  # seed-rule markers, +1 side
NB_NEG = ("join", "merge")  # seed-rule markers, -1 side

# bucket of a DuckDB column `tok`: first 4 md5 hex digits as an integer
# (exact, <= 65535) mod NB_D — nibble arithmetic, the _bloom_poss_sql idiom
_NIB = "(strpos('0123456789abcdef', substr(md5(tok), {j}, 1)) - 1)"
_SQL_BUCKET = (
    "(" + " + ".join(_NIB.format(j=j + 1) + f" * {16 ** (3 - j)}" for j in range(4))
    + f") % {NB_D}"
)


def _sql_cnt(w: str, t: str) -> str:
    return f"len(list_filter({w}, t -> t = '{t}'))"


def _label_sql(w: str) -> str:
    pos = " + ".join(_sql_cnt(w, t) for t in NB_POS)
    neg = " + ".join(_sql_cnt(w, t) for t in NB_NEG)
    return f"CASE WHEN {pos} > {neg} THEN 1 ELSE -1 END"


def nb_model_ctes() -> str:
    """The trained-model CTE chain (nb_base … nb_llr, nb_pri) with
    collision-safe nb_-prefixed names — shared by the confusion-matrix
    oracle here and the curation-manifest oracle (operators/curation.py),
    so both replay the ONE trained model (round-13 composition
    discipline)."""
    return f"""
    nb_base AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    nb_lab AS (
      SELECT doc_id, {_label_sql('w')} AS y,
             ({knuth_hash32_sql('doc_id')}) % 10 < 8 AS is_train
      FROM nb_base
    ),
    nb_tok AS (SELECT doc_id, unnest(w) AS tok FROM nb_base),
    nb_feat AS (
      SELECT doc_id, {_SQL_BUCKET} AS bucket, COUNT(*) AS x
      FROM nb_tok GROUP BY 1, 2
    ),
    nb_dom AS (SELECT CAST(range AS BIGINT) AS bucket FROM range({NB_D})),
    nb_cnt AS (
      SELECT f.bucket,
             SUM(CASE WHEN l.y = 1 THEN f.x ELSE 0 END) AS cp0,
             SUM(CASE WHEN l.y = -1 THEN f.x ELSE 0 END) AS cn0
      FROM nb_feat f JOIN nb_lab l USING (doc_id) WHERE l.is_train GROUP BY 1
    ),
    nb_sm AS (
      SELECT d.bucket, COALESCE(c.cp0, 0) + 1 AS cp, COALESCE(c.cn0, 0) + 1 AS cn
      FROM nb_dom d LEFT JOIN nb_cnt c USING (bucket)
    ),
    nb_tot AS (SELECT SUM(cp) AS sp, SUM(cn) AS sn FROM nb_sm),
    nb_llr AS (
      SELECT s.bucket,
             CAST(ROUND((ln(CAST(s.cp AS DOUBLE)) - ln(CAST(t.sp AS DOUBLE))
                       - ln(CAST(s.cn AS DOUBLE)) + ln(CAST(t.sn AS DOUBLE)))
                        * 1000000) AS BIGINT) AS llr
      FROM nb_sm s CROSS JOIN nb_tot t
    ),
    nb_pri AS (
      SELECT CAST(ROUND((ln(CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE))
                       - ln(CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS DOUBLE)))
                        * 1000000) AS BIGINT) AS prior,
             SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS ntp,
             SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS ntn
      FROM nb_lab WHERE is_train
    )"""


def _nbayes_oracle() -> str:
    return f"""
    WITH {nb_model_ctes()},
    sc AS (
      SELECT f.doc_id, SUM(f.x * r.llr) AS s
      FROM nb_feat f JOIN nb_llr r USING (bucket) JOIN nb_lab l USING (doc_id)
      WHERE NOT l.is_train GROUP BY 1
    ),
    ev AS (
      SELECT l.y AS y_true,
             CASE WHEN s.s + p.prior > 0 THEN 1 ELSE -1 END AS y_pred,
             s.s + p.prior AS total,
             p.ntp, p.ntn
      FROM sc s JOIN nb_lab l USING (doc_id) CROSS JOIN nb_pri p
    )
    SELECT y_true, y_pred,
           COUNT(*) AS n_docs,
           CAST(SUM(total) AS BIGINT) AS sum_score_micro,
           CAST(MIN(ntp) AS BIGINT) AS n_train_pos,
           CAST(MIN(ntn) AS BIGINT) AS n_train_neg
    FROM ev GROUP BY 1, 2
    """


def _base(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )


def _labels(base: DataFrame) -> DataFrame:
    """Row-local weak labels + knuth 80/20 split flags for any doc batch."""

    def cnt(t: str):
        return F.expr(f"size(filter(w, t -> t = '{t}'))")

    pos = sum((cnt(t) for t in NB_POS[1:]), cnt(NB_POS[0]))
    neg = sum((cnt(t) for t in NB_NEG[1:]), cnt(NB_NEG[0]))
    return base.select(
        "doc_id",
        F.when(pos > neg, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
        (knuth_hash32(F.col("doc_id")) % 10 < 8).alias("is_train"),
    )


def _features(base: DataFrame) -> DataFrame:
    """Hashed bag-of-words counts per (doc_id, bucket) for any doc batch."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("bigint")
        % F.lit(NB_D)
    )
    return (
        base.select("doc_id", F.explode("w").alias("tok"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def nb_score(docs: DataFrame, llr: DataFrame, pri: DataFrame) -> DataFrame:
    """Score an arbitrary doc batch (doc_id, text) against a trained model
    — the production/streaming shape: the 32-row llr table and the 1-row
    prior broadcast onto the batch; returns one row per held-out doc:
    (doc_id, y_true, y_pred, total, ntp, ntn) in exact integer
    micro-units. Batch boundaries cannot change any row (the model is
    frozen and scoring is per-doc), which is what the streaming twin
    pins."""
    base = _base(docs.filter(F.col("text").isNotNull()))
    lab = _labels(base)
    feat = _features(base)
    sc = (
        feat.join(lab.filter(~F.col("is_train")), "doc_id")
        .join(F.broadcast(llr), "bucket")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("x") * F.col("llr")).alias("s"))
    )
    return sc.crossJoin(F.broadcast(pri)).select(
        "doc_id",
        F.col("y").alias("y_true"),
        F.when(F.col("s") + F.col("prior") > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y_pred"),
        (F.col("s") + F.col("prior")).alias("total"),
        "ntp",
        "ntn",
    )


def nb_train(spark: SparkSession, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train the model over a corpus (doc_id, text): returns (llr, pri) —
    the 32-row integer-LLR table and the 1-row prior/count row. One
    map-side-combinable aggregate over the tokenized train split."""
    base = _base(docs.filter(F.col("text").isNotNull()))
    lab = _labels(base)
    labeled = _features(base).join(lab, "doc_id")
    cnts = (
        labeled.filter("is_train")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("y") == 1, F.col("x")).otherwise(0)).alias("cp0"),
            F.sum(F.when(F.col("y") == -1, F.col("x")).otherwise(0)).alias("cn0"),
        )
    )
    dom = spark.range(NB_D).select(F.col("id").alias("bucket"))
    sm = dom.join(cnts, "bucket", "left").select(
        "bucket",
        (F.coalesce(F.col("cp0"), F.lit(0)) + 1).alias("cp"),
        (F.coalesce(F.col("cn0"), F.lit(0)) + 1).alias("cn"),
    )
    tot = sm.agg(F.sum("cp").alias("sp"), F.sum("cn").alias("sn"))
    # identical association order to the oracle: ln(cp)-ln(sp)-ln(cn)+ln(sn)
    llr = sm.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            (
                F.log(F.col("cp").cast("double"))
                - F.log(F.col("sp").cast("double"))
                - F.log(F.col("cn").cast("double"))
                + F.log(F.col("sn").cast("double"))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("llr"),
    )
    pri = lab.filter("is_train").agg(
        F.round(
            (
                F.log(F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("double"))
                - F.log(F.sum(F.when(F.col("y") == -1, 1).otherwise(0)).cast("double"))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("prior"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("ntp"),
        F.sum(F.when(F.col("y") == -1, 1).otherwise(0)).alias("ntn"),
    )

    return llr, pri


@query("text_quality_nb", oracle=_nbayes_oracle())
def text_quality_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — held-out confusion matrix of the trained
    classifier: (y_true, y_pred, n_docs, sum_score_micro, n_train_pos,
    n_train_neg); scores are exact integer micro-units."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    llr, pri = nb_train(spark, docs)
    ev = nb_score(docs, llr, pri)
    return ev.groupBy("y_true", "y_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("total").cast("bigint").alias("sum_score_micro"),
        F.min("ntp").cast("bigint").alias("n_train_pos"),
        F.min("ntn").cast("bigint").alias("n_train_neg"),
    )
