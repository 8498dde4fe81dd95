"""Epoch shard assignment + load-balance audit — the "distribute the packed
corpus to W workers" step a real training-data build runs after sampling
(training_mix_sample) and packing (training_pack_sequences).

Each sampled document is assigned to one of SHARD_WORKERS shards by an
md5-based hash of its doc_id (INDEPENDENT of the Knuth sampling hash — a
correlated shard key would fold the mixture weights into the shard sizes);
the output is the per-shard manifest row a dataloader consumes: document
count, token budget, and the shard's token share as an exact
parts-per-million ratio against a perfectly balanced split.

Exactness discipline: the balance ratio is PURE INTEGER arithmetic —
ratio_ppm = (shard_tokens * W * 1,000,000) div total_tokens — so both
engines produce identical BIGINTs with no float rounding to emulate
(the text_bigram_commonness floor-grid lesson, minus the floats).

Scale shape (100 TB): hash + token heuristic are row-local map-side
expressions; ONE groupBy(shard) shuffle of W partial rows per executor
(map-side combinable); the total for the ratio is a 1-row aggregate
broadcast back over the W-row result (allowlisted tiny crossJoin, the
tfidf_top_terms shape). No sort, no skew surface — the audit itself proves
the shards are skew-free before 1,000 dataloader workers each read one.

No reference counterpart: extends the training-pipeline family
(SURVEY §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.functions.portable import (
    knuth_hash32,
    knuth_hash32_sql,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.operators.textstats import (
    SOURCE_TIER_SQL,
    source_tier,
)
from datafusion_datasource_orc_spark.sources.tables import load_table

SHARD_WORKERS = 16
# the training_mix_sample membership test (Knuth multiplicative hash),
# shared so the sharded corpus IS the sampled corpus. The tier expression
# is textstats.SOURCE_TIER_SQL VERBATIM (round-12 review pass 3 finding 1):
# a hand-inlined unguarded cast here would crash the DuckDB oracle on a
# digitless `source` while training_mix_sample still samples it — a
# cross-query invariant break. Sharing the guarded helper makes drift
# impossible.
_SAMPLE_RATE_SQL = f"(10 + 4 * {SOURCE_TIER_SQL})"


_KH = knuth_hash32_sql("doc_id")


def _shard_oracle() -> str:
    # md5 of the DECIMAL doc_id string: 4 hex chars -> 16-bit value mod W
    nib = "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {j}, 1)) - 1)"
    val = " + ".join(f"({nib.format(j=c + 1)} * {16 ** (3 - c)})" for c in range(4))
    return f"""
    WITH sampled AS (
      SELECT doc_id, n_chars // 4 AS toks,
             (({val}) % {SHARD_WORKERS}) AS shard_id
      FROM documents
      WHERE {_KH} < {_SAMPLE_RATE_SQL} * 42949672
    ),
    per AS (
      SELECT shard_id, COUNT(*) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS shard_tokens
      FROM sampled GROUP BY shard_id
    ),
    tot AS (SELECT CAST(SUM(shard_tokens) AS BIGINT) AS total_tokens FROM per)
    SELECT shard_id, n_docs, shard_tokens,
           CAST((CAST(shard_tokens AS HUGEINT) * {SHARD_WORKERS} * 1000000)
               // total_tokens AS BIGINT) AS balance_ppm
    FROM per, tot
    """


@query("training_epoch_shard", oracle=_shard_oracle())
def training_epoch_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. balance_ppm = 1,000,000 means the shard holds
    exactly its fair 1/W share of tokens; the spread across shards is the
    skew a dataloader would see per epoch."""
    docs = load_table(spark, sf_dir, "documents")
    # shared guarded tier (textstats.source_tier): digitless sources are
    # tier 0, never a crashed cast / silently-dropped shard row
    rate_pct = F.lit(10) + F.lit(4) * source_tier()
    # overflow-safe Knuth hash (functions.portable.knuth_hash32)
    sampled_f = knuth_hash32(F.col("doc_id")) < (rate_pct * F.lit(42949672))
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % SHARD_WORKERS
    )
    sampled = docs.filter(sampled_f).select(
        shard.alias("shard_id"), F.expr("n_chars div 4").alias("toks")
    )
    # W-row aggregate materialized once (lazy localCheckpoint): it feeds
    # both the ratio join and the total, so unmaterialized the corpus scan
    # would run twice
    per = (
        sampled.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("shard_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    # total from the 16-row per-shard aggregate, NOT a second corpus scan
    # (round-12 review pass 3 finding 9)
    tot = per.agg(F.sum("shard_tokens").alias("total_tokens"))
    return per.join(F.broadcast(tot)).select(
        "shard_id",
        "n_docs",
        "shard_tokens",
        # DECIMAL(38) widening (DuckDB: HUGEINT): shard_tokens*16e6
        # overflows INT64 at ~5.8e11 tokens/shard — i.e. exactly at the
        # module's 100 TB story. Exact-floor parity across Spark's decimal
        # IntegralDivide, DuckDB HUGEINT //, and unbounded Python ints is
        # pinned in tests/test_properties.py at 100 TB magnitudes.
        F.expr(
            f"cast(shard_tokens as decimal(38,0)) * {SHARD_WORKERS} * 1000000"
            " div total_tokens"
        ).alias("balance_ppm"),
    )
