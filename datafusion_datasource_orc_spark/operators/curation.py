"""Curation-manifest composition — the one selection table a training-data
build ships (judge r12 task 4): quality-classifier keep × dedup-canonical
keep × DSIR importance keep, per document, with the scores that justified
each admission.

A real data build does not run its scorers in isolation: the corpus that
reaches tokenization is the INTERSECTION of a quality cut, a dedup
survivor set, and a target-distribution importance cut. This operator
composes the three certified round-10/11 scorers into that manifest:

1. quality — the trained Naive-Bayes scorer (``nbayes.nb_train`` /
   ``nbayes._features``), scored over EVERY document (the confusion-matrix
   query scores held-out docs only; a curation pass scores the corpus);
   keep = integer micro-unit score > 0 (the classifier's own decision
   boundary).
2. dedup — ``extras.dedup_keep_canonical``: keep = the document IS its
   exact-norm cluster's canonical representative.
3. DSIR — ``dsir.dsir_scores``: keep = importance weight above the
   {DSIR_Q} quantile. Target-slice documents are the reference
   distribution, never selection candidates, so the manifest covers raw
   documents only (the dsir module's contract).

Every stage is an IMPORT, never a re-implementation: the Spark side calls
the registered functions / shared trainers, and the oracle composes
``nbayes.nb_model_ctes()``, ``dsir.dsir_ctes()``, and the REGISTERED
``dedup_keep_canonical`` oracle verbatim from the registry — so the
manifest can only drift from its components by failing the hash gate.

Determinism: quality_micro and dsir_weight_micro are the components' own
exact integer micro-units; tokens is non-negative integer division; the
only float (the DSIR quantile cut) is 4dp-rounded on both engines inside
the shared dsir machinery (cookbook rule).

Scale shape (100 TB): three doc-keyed corpus tables joined on doc_id —
co-partitioned hash joins (AQE), no broadcast of corpus-sized frames, no
window wider than the components' own; each component keeps its certified
scale shape (NB: one train aggregate + broadcast 32-row model; dedup: one
fingerprint shuffle; DSIR: broadcast 64-row weight table + one 1-row
quantile). The manifest adds two joins and a filter on top.

No reference counterpart: extends the training-pipeline family
(SURVEY §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.dsir import (
    DSIR_Q,
    dsir_ctes,
    dsir_scores,
)
from datafusion_datasource_orc_spark.operators.extras import dedup_keep_canonical
from datafusion_datasource_orc_spark.operators.nbayes import (
    _base,
    _features,
    nb_model_ctes,
    nb_train,
)
from datafusion_datasource_orc_spark.operators.registry import ORACLES, query
from datafusion_datasource_orc_spark.sources.tables import load_table


def _curation_oracle() -> str:
    return f"""
    WITH {nb_model_ctes()},
    {dsir_ctes()},
    nb_sc_all AS (
      SELECT f.doc_id, CAST(SUM(f.x * r.llr) AS BIGINT) AS s0
      FROM nb_feat f JOIN nb_llr r USING (bucket) GROUP BY 1
    ),
    quality AS (
      SELECT doc_id, s0 + p.prior AS quality_micro
      FROM nb_sc_all CROSS JOIN nb_pri p
    ),
    canon AS (
      SELECT doc_id, canonical_id FROM ({ORACLES["dedup_keep_canonical"]})
    ),
    dsel AS (
      SELECT s.doc_id, l.source, l.n_chars, s.s AS dsir_weight_micro,
             s.s > c.cut AS ds_keep
      FROM ds_sc s JOIN ds_lab l USING (doc_id) CROSS JOIN ds_cut c
    )
    SELECT d.doc_id, d.source, CAST(d.n_chars // 4 AS BIGINT) AS tokens,
           q.quality_micro, d.dsir_weight_micro
    FROM dsel d JOIN quality q USING (doc_id) JOIN canon c USING (doc_id)
    WHERE q.quality_micro > 0 AND d.ds_keep AND c.canonical_id = d.doc_id
    """


@query("curation_manifest", oracle=_curation_oracle())
def curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — one row per SELECTED document:
    (doc_id, source, tokens, quality_micro, dsir_weight_micro)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())

    # stage 1: quality over EVERY doc with the shared trained model
    llr, pri = nb_train(spark, docs)
    base = _base(docs)
    quality = (
        _features(base)
        .join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("llr")).cast("bigint").alias("s0"))
        .crossJoin(F.broadcast(pri))
        .select("doc_id", (F.col("s0") + F.col("prior")).alias("quality_micro"))
    )

    # stage 2: dedup canonical flag (the registered query, imported)
    canon = dedup_keep_canonical(spark, sf_dir).select("doc_id", "canonical_id")

    # stage 3: DSIR weights + keep (the registered scorer, imported)
    ds = dsir_scores(spark, sf_dir)

    return (
        ds.filter(F.col("keep"))
        .join(quality, "doc_id")
        .filter(F.col("quality_micro") > 0)
        .join(canon, "doc_id")
        .filter(F.col("canonical_id") == F.col("doc_id"))
        .select(
            "doc_id",
            "source",
            F.expr("n_chars div 4").cast("bigint").alias("tokens"),
            "quality_micro",
            F.col("s").alias("dsir_weight_micro"),
        )
    )
