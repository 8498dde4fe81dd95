"""Train/val/test split assignment + near-duplicate LEAKAGE audit — the
check every training-data pipeline must run before a split ships: a
held-out document whose near-duplicate sits in train is contamination the
eval can't see (the split boundary version of contamination_eval_overlap,
which screens against an external benchmark rather than the split itself).

Composition: the split is a row-local deterministic multiplicative hash
(the training_mix_sample discipline — no RNG state, identical on any
cluster layout: Knuth's 2654435761 fixed-point hash on doc_id, 80/10/10
on the 2^32 grid); the near-dup pair set comes from the SAME
minhash-LSH edge generator as dedup_minhash_lsh (banding shuffle +
broadcast exact verify, never all-pairs). The audit emits one row per
near-dup pair that CROSSES splits, labeled with both endpoints' splits —
the actionable manifest (move/drop these docs) rather than a bare count.

Oracle: exact-Jaccard pair set (the dedup_minhash_lsh precedent —
precision 1.0 by construction, 100% banding recall at gate scales) with
the identical integer split arithmetic, so the full composition is
hash-checked.

Scale shape: split assignment is row-local; the pair generator is the
measured near-linear LSH path (SCALE.md); the final split join moves only
(doc_id, split) pairs against the tiny verified pair set (broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _SQL_SHINGLES,
    checkpointed_shingles,
    minhash_lsh_pairs,
)
from datafusion_datasource_orc_spark.functions.portable import (
    knuth_hash32,
    knuth_hash32_sql,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

# 80/10/10 on the 2^32 multiplicative-hash grid; integer cutpoints so both
# engines compare exactly (42949672 = floor(2^32 / 100)).
#
# OVERFLOW-SAFE form (caught by the round-9 hypothesis test): the naive
# `doc_id * 2654435761` overflows INT64 at doc_id > ~3.47e9 — and a 100 TB
# corpus holds ~50e9 documents, so both engines (Spark ANSI, DuckDB) would
# ERROR at target scale. Since only the value mod 2^32 matters, reduce
# doc_id mod 2^32 and split it into 16-bit limbs:
#   h = (lo16·K + hi16·(K·2^16 mod 2^32)) mod 2^32,  K = 2654435761
# with K·2^16 mod 2^32 = 2041643008. Every product stays < 2^48 —
# ANSI-safe for the full non-negative int64 doc_id domain, and
# bit-identical to the naive form wherever it didn't overflow (pure
# modular-arithmetic identity, pinned by the hypothesis replica).
# Single-sourced from functions/portable.py since the round-10 review:
# this module originated the limb-split form (round 9) and the e655c9c
# propagation migrated every OTHER call site onto knuth_hash32 but left
# this origin copy behind — without the pmod normalization, so Spark
# shiftright (floor) and DuckDB // (truncate toward zero) diverged on
# negative doc_id. Identical for all non-negative ids (gate hashes
# unchanged); the full-int64 property tests now cover this site too.
_SPLIT_HASH = knuth_hash32_sql("doc_id")
_TRAIN_CUT = 80 * 42949672
_VAL_CUT = 90 * 42949672


def split_of(doc_id: Column) -> Column:
    h = knuth_hash32(doc_id)
    return (
        F.when(h < _TRAIN_CUT, F.lit("train"))
        .when(h < _VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sql_split_of(expr: str) -> str:
    """DuckDB twin of split_of over an integer SQL expression — column-
    parameterized (round-12 review pass 3 finding 4a) so the oracle can
    evaluate the split ROW-LOCALLY on the pair endpoints instead of joining
    a corpus-sized split table in twice."""
    h = knuth_hash32_sql(expr)
    return (
        f"CASE WHEN {h} < {_TRAIN_CUT} THEN 'train' "
        f"WHEN {h} < {_VAL_CUT} THEN 'val' ELSE 'test' END"
    )


_SQL_SPLIT = sql_split_of("doc_id")


@query(
    "training_split_leakage",
    # The `len(a.s) > 0 AND len(b.s) > 0` guard (round-12 review pass 3
    # finding 4b): a <=2-word doc has an EMPTY 3-shingle set, and for two
    # such docs the Jaccard is 0/0 = NaN, which DuckDB's total order ranks
    # >= any threshold — phantom oracle rows the Spark side (NULL-dropping
    # filter) would never emit. Splits are evaluated row-locally on the
    # pair endpoints (finding 4a): split_of(doc_id) is a deterministic
    # expression of a column the pair rows already carry, so no corpus-
    # sized split table is ever joined.
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(a.s) > 0 AND len(b.s) > 0
        AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            >= {JACCARD_THRESHOLD}
    )
    SELECT doc_a, doc_b,
           {sql_split_of("doc_a")} AS split_a,
           {sql_split_of("doc_b")} AS split_b,
           jaccard
    FROM pairs
    WHERE {sql_split_of("doc_a")} <> {sql_split_of("doc_b")}
    """,
)
def training_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — near-dup pairs that cross the deterministic
    80/10/10 split: (doc_a, doc_b, split_a, split_b, jaccard).

    Splits are computed ROW-LOCALLY on the tiny verified pair set —
    split_of is a deterministic hash of the endpoint ids the pair rows
    already carry, so the old corpus-sized split-table double join
    (round-12 review pass 3 finding 4a) is gone entirely: after the LSH
    pair generator, this query moves zero corpus rows."""
    docs = load_table(spark, sf_dir, "documents")
    # empty-shingle guard (finding 4b): <=2-word docs have no 3-shingles;
    # two of them would pair at 0/0 Jaccard — NULL in Spark, NaN (ranked
    # above threshold) in DuckDB. Exclude them before banding: a doc with
    # no shingles cannot be a near-dup of anything.
    sh = checkpointed_shingles(docs).filter(F.col("n") > 0)
    pairs = minhash_lsh_pairs(sh)
    return pairs.select(
        "doc_a",
        "doc_b",
        split_of(F.col("doc_a")).alias("split_a"),
        split_of(F.col("doc_b")).alias("split_b"),
        "jaccard",
    ).filter(F.col("split_a") != F.col("split_b"))
