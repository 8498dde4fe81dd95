"""Cross-document duplicated-SPAN coverage — the exact-substring dedup
signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better"), re-expressed over hashed rolling token windows instead of
a suffix array (the suffix-array form is a single-machine construction; the
rolling-window form is the shuffle-native equivalent at W-token
granularity and is what distributed curation pipelines actually run).

Per document: every overlapping W-token window (stride 1) is hashed; a
span is DUPLICATED when its hash occurs in >= 2 DISTINCT documents (an
md5 span key — collisions over 128 bits are negligible and identical in
both engines). The per-doc deliverable is exact duplicated-TOKEN coverage:
the size of the UNION of the [pos, pos+W-1] intervals of its duplicated
spans — computed row-locally from the doc's own duplicated positions, not
by exploding W rows per span.

Distinct from the existing dedup family on purpose: `dedup_chunks` keys
NON-overlapping fixed char windows (the C4 line-dedup analogue, a
chunk-level pair finder); `text_repetition` measures INTRA-doc n-gram
repetition; this operator measures CROSS-doc span sharing with exact token
coverage — the quantity Lee et al. threshold on.

Scale shape (100 TB): spans ≈ one row per token (explode), the
duplicated-hash decision is one map-side-combinable groupBy(h) — the "df
over distinct docs >= 2" rule is evaluated as min(doc_id) != max(doc_id),
which is the same predicate (>= 2 distinct non-null doc ids) but combines
to ONE row per hash per map task instead of expanding distinct
(h, doc_id) pairs through the exchange — and the dup join back is 1:1 per
span row; there is NO doc x doc pair join anywhere, so boilerplate spans
with huge df cannot quadratically explode this plan (unlike shingle pair
joins, which need the SHINGLE_DF_CAP guard). Both full-form exchanges key
on unhex(h) (the 16 raw md5 bytes — bijective with the 32-char hex, so
grouping classes are identical) rather than the hex string, halving the
key bytes shuffled. Coverage union is row-local array arithmetic. Two
shuffles total, both on the span hash / doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

SPAN_W = 6  # tokens per rolling window
SPAN_DUP_PPM = 300000  # flag docs with > 30% duplicated-token coverage


def _substring_oracle(final_where: str = "") -> str:
    """The exact-coverage oracle; ``final_where`` restricts the manifest
    rows (the incremental twin selects the batch split) while df counts
    stay corpus-wide."""
    w1 = SPAN_W - 1
    return f"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    sp AS (
      SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+{w1}], ' ')) AS h
      FROM base
      CROSS JOIN UNNEST(generate_series(1, greatest(len(w) - {w1}, 0))) AS t(i)
    ),
    dfh AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY 1),
    dup AS (SELECT s.doc_id, s.pos FROM sp s JOIN dfh USING (h) WHERE dfh.df > 1),
    cov AS (
      SELECT doc_id, COUNT(DISTINCT pos) AS n_dup_spans,
             COUNT(DISTINCT p) AS n_dup_tokens
      FROM (
        SELECT doc_id, pos, UNNEST(generate_series(pos, pos + {w1})) AS p
        FROM dup
      ) GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(len(b.w) AS BIGINT) AS n_tokens,
           CAST(greatest(len(b.w) - {w1}, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(c.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(c.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
           CAST(COALESCE(c.n_dup_tokens, 0) * 1000000 // len(b.w) AS BIGINT)
               AS dup_ppm,
           COALESCE(c.n_dup_tokens, 0) * 1000000 // len(b.w) > {SPAN_DUP_PPM}
               AS flagged
    FROM base b LEFT JOIN cov c USING (doc_id)
    {final_where}
    """


def span_base(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, w): the tokenized base every span consumer
    shares (one definition so the tokenizer cannot drift between the full
    and incremental forms)."""
    return docs.select("doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("w"))


def doc_spans(base: DataFrame) -> DataFrame:
    """(doc_id, w) → exploded (doc_id, pos, h): every overlapping W-token
    window, md5-hashed. Spark sequence(1, stop) DESCENDS when stop < 1 —
    short docs are guarded with an explicit empty array (mirrors the
    oracle's greatest(..., 0))."""
    positions = F.expr(
        f"CASE WHEN size(w) >= {SPAN_W} THEN sequence(1, size(w) - {SPAN_W - 1}) "
        "ELSE array() END"
    )
    return base.select("doc_id", "w", F.explode(positions).alias("pos")).select(
        "doc_id",
        "pos",
        F.md5(
            F.expr(f"array_join(slice(w, pos, {SPAN_W}), ' ')").cast("binary")
        ).alias("h"),
    )


def span_coverage(dup: DataFrame) -> DataFrame:
    """(doc_id, pos) duplicated positions → per-doc (n_dup_spans,
    n_dup_tokens): row-local interval union — the doc's duplicated
    positions are bounded by its own token count, so collect_set stays
    document-sized."""
    return dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.expr(
            "size(array_distinct(flatten(transform("
            f"collect_set(pos), p -> sequence(p, p + {SPAN_W - 1})))))"
        )
        .cast("bigint")
        .alias("n_dup_tokens"),
    )


def span_manifest(base: DataFrame, cov: DataFrame) -> DataFrame:
    """Assemble the per-doc deliverable from the tokenized base and the
    coverage rows: (doc_id, n_tokens, n_spans, n_dup_spans, n_dup_tokens,
    dup_ppm, flagged)."""
    n = F.size("w").cast("bigint")
    covered = F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("bigint")
    ppm = F.expr(
        "coalesce(n_dup_tokens, 0) * 1000000 div size(w)"
    ).cast("bigint")
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        n.alias("n_tokens"),
        F.greatest(n - (SPAN_W - 1), F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("bigint").alias("n_dup_spans"),
        covered.alias("n_dup_tokens"),
        ppm.alias("dup_ppm"),
        (ppm > SPAN_DUP_PPM).alias("flagged"),
    )


@query("dedup_substring_spans", oracle=_substring_oracle())
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — full per-doc manifest: (doc_id, n_tokens,
    n_spans, n_dup_spans, n_dup_tokens, dup_ppm, flagged); coverage is the
    exact union of the doc's duplicated-span intervals."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = span_base(docs)
    # narrow the internal key before the two big exchanges: unhex(h) is the
    # 16 raw md5 bytes (bijective with the hex form doc_spans emits — the
    # incremental index stores hex because its directory key hb reads the
    # first two hex chars; the full form never persists h, so it shuffles
    # the narrow form)
    sp = doc_spans(base).select("doc_id", "pos", F.unhex("h").alias("h"))
    # ">= 2 distinct doc ids" as min != max: identical predicate (both
    # ignore NULLs), but min/max partial-combine map-side to one row per h
    # per task — no two-phase distinct expansion of (h, doc_id) pairs
    dfh = sp.groupBy("h").agg(
        F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max")
    )
    dup = sp.join(
        dfh.filter(F.col("d_min") != F.col("d_max")).select("h"), "h"
    ).select("doc_id", "pos")
    return span_manifest(base, span_coverage(dup))
