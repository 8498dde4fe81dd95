"""Text-analysis operators over ``documents`` (beyond-reference; north star).

Language ID, quality scoring, token counting, fingerprinting — each a single
linear scan built from JVM-side expressions (split/regexp/array ops inside
whole-stage codegen). Nothing here shuffles except the final group-bys; all
scale trivially to 100 TB.

Oracle notes: the heuristics are *specified as arithmetic*, so the DuckDB
twin runs the identical formula — the gate checks engine equivalence, not
linguistic accuracy. Regex dialects differ (Java vs RE2) but every pattern
used is in the common subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.functions.portable import (
    knuth_hash32,
    knuth_hash32_sql,
    norm_fingerprint,
    norm_fingerprint_sql,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

# Stopword spec shared by the Spark and SQL twins (tiny demo lists; swap for
# real per-language tables at scale — broadcast join against a stopword dim).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "pas", "que"],
}
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"  # BPE-ish pre-tokenizer: runs of letters/digits/punct


# Source quality tier: trailing digits of the source id mod 10, defaulting
# to tier 0 for ids WITHOUT a numeric suffix — regexp_extract returns ''
# there, and CAST('' AS BIGINT) aborts in BOTH engines under ANSI, so an
# unguarded cast would crash the whole query on such a fixture (round-11
# review). Shared by training_mix_sample and pipeline_end_to_end.
SOURCE_TIER_SQL = (
    "(CAST(coalesce(nullif(regexp_extract(source, '([0-9]+)$', 1), ''), '0')"
    " AS BIGINT) % 10)"
)


def source_tier() -> Column:
    """Spark twin of SOURCE_TIER_SQL."""
    digits = F.regexp_extract("source", r"([0-9]+)$", 1)
    return (
        F.coalesce(F.nullif(digits, F.lit("")), F.lit("0")).cast("long") % 10
    )


def _words(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


def _sql_array(vals: list[str]) -> str:
    inner = ", ".join(f"'{v}'" for v in vals)
    return f"[{inner}]"


# ---- token counting ---------------------------------------------------------
@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(lower(text), '\\s+')) AS n_words,
           len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace word count + BPE-ish regex token count per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("n_words"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias("n_tokens"),
        "n_chars",
    )


# ---- quality scoring --------------------------------------------------------
@query(
    "text_quality",
    oracle="""
    SELECT doc_id,
           length(text) AS text_len,
           len(string_split_regex(lower(text), '\\s+')) AS n_words,
           len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS n_distinct_words,
           CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
             / len(string_split_regex(lower(text), '\\s+')) AS lexical_diversity,
           CAST(length(text) AS DOUBLE)
             / len(string_split_regex(lower(text), '\\s+')) AS avg_word_len,
           CASE WHEN len(string_split_regex(lower(text), '\\s+')) BETWEEN 20 AND 1000
                 AND CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
                     / len(string_split_regex(lower(text), '\\s+')) > 0.2
                THEN 1 ELSE 0 END AS quality_pass
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / diversity quality gates — the standard cheap pre-filters of a
    training-data pipeline (C4/Gopher-style rules, arithmetic subset)."""
    docs = load_table(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    diversity = n_distinct.cast("double") / n_words.cast("double")
    avg_word_len = F.length("text").cast("double") / n_words.cast("double")
    quality = F.when(
        n_words.between(20, 1000) & (diversity > 0.2), F.lit(1)
    ).otherwise(F.lit(0))
    return docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        diversity.alias("lexical_diversity"),
        avg_word_len.alias("avg_word_len"),
        quality.alias("quality_pass"),
    )


# ---- language ID ------------------------------------------------------------
def _lang_scores_spark(w: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.array_intersect(F.array_distinct(w), F.array(*[F.lit(s) for s in sw])))
        for lang, sw in STOPWORDS.items()
    }


@query(
    "lang_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
             WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
             WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
             WHEN s_fr > 0 THEN 'fr'
             ELSE 'unknown'
           END AS predicted_lang
    FROM (
      SELECT doc_id, lang,
             len(list_intersect(dw, {_sql_array(STOPWORDS['en'])})) AS s_en,
             len(list_intersect(dw, {_sql_array(STOPWORDS['es'])})) AS s_es,
             len(list_intersect(dw, {_sql_array(STOPWORDS['de'])})) AS s_de,
             len(list_intersect(dw, {_sql_array(STOPWORDS['fr'])})) AS s_fr
      FROM (SELECT doc_id, lang,
                   list_distinct(string_split_regex(lower(text), '\\s+')) AS dw
            FROM documents)
    )
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (n-gram-heuristic family). Deterministic
    argmax with a fixed tie order (en > es > de > fr)."""
    docs = load_table(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    s = _lang_scores_spark(w)
    predicted = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when((s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when(s["fr"] > 0, "fr")
        .otherwise("unknown")
    )
    return docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), predicted.alias("predicted_lang")
    )


# ---- fingerprinting ---------------------------------------------------------
@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {norm_fingerprint_sql("text")} AS fingerprint,
           substr({norm_fingerprint_sql("text")}, 1, 8) AS shard_key
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (md5 over collapsed-whitespace
    lowercase text) + an 8-hex shard key — the join/partition handle for
    cross-corpus dedup at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    fp = norm_fingerprint(F.col("text"))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("shard_key")
    )


# ---- corpus rollup ----------------------------------------------------------
@query(
    "corpus_stats_by_source",
    oracle="""
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY source, lang
    """,
)
def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---- token explosion (UNNEST) ----------------------------------------------
@query(
    "explode_top_tokens",
    oracle=r"""
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
)
def explode_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 token frequencies via explode (LATERAL VIEW /
    UNNEST — the row-generating operator the B16 SQL surface implies).

    Scale shape: explode is a narrow map-side transform (no shuffle); the
    only shuffle is the final token groupBy, which map-side partial-counts
    first. The top-k is a TopK (takeOrdered) — never a full sort of the
    token vocabulary. Deterministic under ties via the token tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


# ---- repetition filters (Gopher-style) --------------------------------------
def _ngrams_linear(w: Column, n: int) -> Column:
    """Word n-gram MULTISET via slice + zip_with — structurally linear.

    Deliberately NOT ``transform(sequence(...), i -> element_at(w, i+k))``:
    CollapseProject inlines the generating ``split()`` into every element_at
    of the lambda, making n-gramming O(words²) per document (measured 16.9s
    for contamination at sf0.1 vs ~2s linear — the same trap documented at
    dedup.shingles_of_words). zip_with over shifted slices evaluates each
    input a constant number of times no matter what the optimizer inlines."""
    m = F.size(w) - (n - 1)
    shifted = [F.slice(w, k + 1, m) for k in range(n)]
    zipped = shifted[0]
    for nxt in shifted[1:]:
        zipped = F.zip_with(zipped, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(m > 0, zipped).otherwise(F.array().cast("array<string>"))


def _ngram_join_duckdb(n: int) -> str:
    """DuckDB expr: word n-grams of list column ``w`` (1-based indexing)."""
    concat = " || ' ' || ".join(f"w[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_transform(generate_series(1, len(w) - {n - 1}), i -> {concat}) "
        f"ELSE [] END"
    )


@query(
    "text_repetition",
    oracle=f"""
    SELECT doc_id, n_bigrams,
           floor(CASE WHEN n_bigrams = 0 THEN 0.0
                 ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / n_bigrams END
                 * 1e6) / 1e6 AS dup_bigram_frac,
           floor(CASE WHEN n_trigrams = 0 THEN 0.0
                 ELSE 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / n_trigrams END
                 * 1e6) / 1e6 AS dup_trigram_frac,
           floor(CASE WHEN n_bigrams = 0 THEN 0.0
                 ELSE CAST(list_max(list_transform(list_distinct(bg),
                        x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / n_bigrams END
                 * 1e6) / 1e6 AS top_bigram_frac,
           CASE WHEN n_bigrams = 0 OR
                     1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / n_bigrams < 0.6
                THEN 1 ELSE 0 END AS repetition_pass
    FROM (
      SELECT doc_id, {_ngram_join_duckdb(2)} AS bg, {_ngram_join_duckdb(3)} AS tg,
             greatest(len(w) - 1, 0) AS n_bigrams,
             greatest(len(w) - 2, 0) AS n_trigrams
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
            FROM documents)
    )
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters: duplicate-bigram /
    duplicate-trigram fractions and the share of bigram occurrences taken by
    the most frequent bigram (Rae et al. 2021 'repetitious text' rules,
    arithmetic subset).

    Scale shape: pure per-row array math inside whole-stage codegen — no
    shuffle, no UDF, no explode. The most-frequent-bigram count is an
    O(distinct x total) lambda over each doc's own bigrams, embarrassingly
    parallel across 100 TB. Fractions are floor-truncated at 1e-6 (never
    rounded) so the hash depends only on the identical IEEE double both
    engines compute."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", _words(F.col("text")).alias("w"))
    d = d.select(
        "doc_id",
        _ngrams_linear(F.col("w"), 2).alias("bg"),
        _ngrams_linear(F.col("w"), 3).alias("tg"),
        F.greatest(F.size("w") - 1, F.lit(0)).alias("n_bigrams"),
        F.greatest(F.size("w") - 2, F.lit(0)).alias("n_trigrams"),
    )
    dup_bg = F.when(F.col("n_bigrams") == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct("bg")).cast("double") / F.col("n_bigrams")
    )
    dup_tg = F.when(F.col("n_trigrams") == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct("tg")).cast("double") / F.col("n_trigrams")
    )
    # modal-bigram multiplicity = longest equal run in sorted order:
    # O(n log n) per doc vs the O(distinct x total) transform/filter lambda
    # (which quadratically re-scans bg per distinct element on long docs)
    top_bg_cnt = F.aggregate(
        F.array_sort("bg"),
        F.struct(
            F.lit(0).alias("best"),
            F.lit(0).alias("cur"),
            F.lit(None).cast("string").alias("prev"),
        ),
        lambda acc, x: F.struct(
            F.greatest(
                acc.best, F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1))
            ).alias("best"),
            F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1)).alias("cur"),
            x.alias("prev"),
        ),
        lambda acc: acc.best,
    )
    top_bg = F.when(F.col("n_bigrams") == 0, F.lit(0.0)).otherwise(
        top_bg_cnt.cast("double") / F.col("n_bigrams")
    )
    trunc = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return d.select(
        "doc_id",
        "n_bigrams",
        trunc(dup_bg).alias("dup_bigram_frac"),
        trunc(dup_tg).alias("dup_trigram_frac"),
        trunc(top_bg).alias("top_bigram_frac"),
        F.when((F.col("n_bigrams") == 0) | (dup_bg < 0.6), F.lit(1))
        .otherwise(F.lit(0))
        .alias("repetition_pass"),
    )


# ---- benchmark-contamination check ------------------------------------------
EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out "benchmark" split (~1%)


@query(
    "contamination_eval_overlap",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_distinct({_ngram_join_duckdb(3)}) AS tg
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
            FROM documents)
    ),
    eval_grams AS (
      SELECT DISTINCT unnest(tg) AS g FROM grams WHERE doc_id % {EVAL_MOD} = 0
    ),
    train AS (
      SELECT doc_id, unnest(tg) AS g, len(tg) AS n_grams
      FROM grams WHERE doc_id % {EVAL_MOD} <> 0
    ),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_overlap
      FROM train t JOIN eval_grams e ON t.g = e.g
      GROUP BY t.doc_id
    )
    SELECT g.doc_id,
           CAST(len(g.tg) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           floor(CASE WHEN len(g.tg) = 0 THEN 0.0
                 ELSE CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / len(g.tg) END
                 * 1e6) / 1e6 AS overlap_frac,
           CASE WHEN COALESCE(h.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS contaminated
    FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
    WHERE g.doc_id % {EVAL_MOD} <> 0
    """,
)
def contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: which training documents share word
    trigrams with a held-out eval split (doc_id % {mod} == 0)?

    The decontamination primitive of every LLM data pipeline (per the GPT-3 /
    PaLM appendices): n-gram the eval set, n-gram the corpus, flag overlap.

    Scale shape: the eval side is tiny by construction (~1% of docs,
    distinct trigrams only) -> aggregated then BROADCAST to the trigram
    stream of the training side; the ONLY shuffle on the 100 TB side is the
    per-doc count groupBy (AQE-coalesced). Distinct-per-doc is
    array_distinct inside the row (free), never a corpus-wide DISTINCT.
    explode_outer keeps zero-gram docs in the same single pass (NULL gram,
    never matches), so no second scan or join-back exists."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", _words(F.col("text")).alias("w")).select(
        "doc_id",
        F.array_distinct(_ngrams_linear(F.col("w"), 3)).alias("tg"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("tg").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
    exploded = train.select(
        "doc_id", F.size("tg").cast("long").alias("n_grams"), F.explode_outer("tg").alias("g")
    )
    joined = (
        exploded.join(F.broadcast(eval_grams), "g", "left")
        .groupBy("doc_id", "n_grams")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"))
    )
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.col("n_overlap").cast("double") / F.col("n_grams")
    )
    return joined.select(
        "doc_id",
        "n_grams",
        "n_overlap",
        (F.floor(frac * 1e6) / 1e6).alias("overlap_frac"),
        F.when(F.col("n_overlap") > 0, F.lit(1)).otherwise(F.lit(0)).alias("contaminated"),
    )


# ---- end-to-end filter funnel ----------------------------------------------
ALL_STOPWORDS = sorted({w for sw in STOPWORDS.values() for w in sw})


@query(
    "pipeline_filter_funnel",
    oracle=f"""
    WITH flags AS (
      SELECT CASE WHEN n_words BETWEEN 20 AND 1000
                   AND CAST(n_distinct AS DOUBLE) / n_words > 0.2
             THEN 1 ELSE 0 END AS q_pass,
             CASE WHEN n_words < 2 OR
                       1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / (n_words - 1) < 0.6
             THEN 1 ELSE 0 END AS r_pass,
             CASE WHEN len(list_intersect(dw, {_sql_array(ALL_STOPWORDS)})) > 0
             THEN 1 ELSE 0 END AS l_pass
      FROM (
        SELECT len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
               list_distinct(w) AS dw, {_ngram_join_duckdb(2)} AS bg
        FROM (SELECT string_split_regex(lower(text), '\\s+') AS w FROM documents)
      )
    ),
    agg AS (
      SELECT COUNT(*) AS total,
             SUM(q_pass) AS after_quality,
             SUM(q_pass * r_pass) AS after_repetition,
             SUM(q_pass * r_pass * l_pass) AS after_lang
      FROM flags
    )
    SELECT 1 AS stage_no, 'ingested' AS stage, CAST(total AS BIGINT) AS n_docs FROM agg
    UNION ALL
    SELECT 2, 'quality', CAST(after_quality AS BIGINT) FROM agg
    UNION ALL
    SELECT 3, 'repetition', CAST(after_repetition AS BIGINT) FROM agg
    UNION ALL
    SELECT 4, 'lang_id', CAST(after_lang AS BIGINT) FROM agg
    """,
)
def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts through the standard pre-training filter chain
    (ingested -> quality gates -> repetition filter -> language ID) — the
    keep-rate funnel report of a C4/Gopher-style cleaning pipeline.

    Scale shape: ONE scan computes all three flags as row-local array math;
    a single 1-row aggregate (map-side partial sums) collapses 100 TB to four
    counters; the 4-row funnel is expanded from that 1-row result with stack
    (executor-side, no driver loop, no re-scan per stage)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(_words(F.col("text")).alias("w")).select(
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.array_distinct("w").alias("dw"),
        _ngrams_linear(F.col("w"), 2).alias("bg"),
    )
    q_pass = (
        F.col("n_words").between(20, 1000)
        & (F.col("n_distinct").cast("double") / F.col("n_words") > 0.2)
    ).cast("long")
    dup_bg = 1.0 - F.size(F.array_distinct("bg")).cast("double") / (F.col("n_words") - 1)
    r_pass = ((F.col("n_words") < 2) | (dup_bg < 0.6)).cast("long")
    l_pass = (
        F.size(F.array_intersect("dw", F.array(*[F.lit(s) for s in ALL_STOPWORDS]))) > 0
    ).cast("long")
    agg = d.select(
        q_pass.alias("q"), r_pass.alias("r"), l_pass.alias("l")
    ).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum("q").alias("after_quality"),
        F.sum(F.col("q") * F.col("r")).alias("after_repetition"),
        F.sum(F.col("q") * F.col("r") * F.col("l")).alias("after_lang"),
    )
    return agg.selectExpr(
        "stack(4, 1, 'ingested', total, 2, 'quality', after_quality, "
        "3, 'repetition', after_repetition, 4, 'lang_id', after_lang) "
        "AS (stage_no, stage, n_docs)"
    )


# ---- weighted training-mix sampling -----------------------------------------
# Per-source sampling rate: 10% + 4% * (numeric suffix of the source id mod
# 10) — a stand-in for the "quality-tiered mixture weights" table of a real
# pipeline. The sample membership test is the same engine-portable Knuth
# multiplicative hash as sample_hash; the threshold stays integer
# (42949672 ~ 2^32/100) so both engines compare identical int64s.
@query(
    "training_mix_sample",
    oracle=f"""
    SELECT source,
           10 + 4 * {SOURCE_TIER_SQL}
               AS rate_pct,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN sampled THEN n_chars // 4 ELSE 0 END) AS BIGINT)
               AS sampled_tokens,
           CAST((SUM(CASE WHEN sampled THEN n_chars // 4 ELSE 0 END) + 2047) // 2048
                AS BIGINT) AS est_packs
    FROM (
      SELECT source, n_chars,
             {knuth_hash32_sql('doc_id')} <
               (10 + 4 * {SOURCE_TIER_SQL})
               * 42949672 AS sampled
      FROM documents
    )
    GROUP BY source
    """,
)
def training_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted training-mix construction: each source gets a deterministic
    sampling rate (its mixture weight), membership is a portable
    multiplicative hash over doc_id, and the output reports per-source docs
    kept, token budget (chars/4 heuristic), and sequence-pack count at a
    2048-token context.

    Scale shape: rate lookup and hash test are row-local expressions (at
    100 TB the rate table would be a broadcast dim instead of an inline
    formula — same plan shape); one groupBy(source) with map-side partial
    aggregation is the only shuffle. No RNG state: resampling with the same
    constants reproduces the exact mixture on any cluster layout."""
    docs = load_table(spark, sf_dir, "documents")
    tier = source_tier()
    rate_pct = F.lit(10) + F.lit(4) * tier
    # overflow-safe Knuth hash (see functions.portable.knuth_hash32: the
    # naive product errors past doc_id ~3.47e9 — a 100 TB-scale id domain)
    sampled = knuth_hash32(F.col("doc_id")) < (rate_pct * F.lit(42949672))
    toks = F.expr("n_chars div 4")
    d = docs.select(
        "source",
        rate_pct.alias("rate_pct"),
        sampled.alias("sampled"),
        toks.alias("toks"),
    )
    agg = d.groupBy("source", "rate_pct").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("sampled"), 1).otherwise(0)).alias("n_sampled"),
        F.sum(F.when(F.col("sampled"), F.col("toks")).otherwise(0)).alias("sampled_tokens"),
    )
    return agg.select(
        "source",
        "rate_pct",
        "n_docs",
        "n_sampled",
        "sampled_tokens",
        F.expr("(sampled_tokens + 2047) div 2048").alias("est_packs"),
    )


TFIDF_TOP_K = 3


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents
    ),
    toks2 AS (SELECT doc_id, tok FROM toks WHERE tok != ''),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks2 GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks2 GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6)
                   AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, rk FROM (
        SELECT doc_id, tok, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, tok ASC) AS rk
        FROM scored
    ) WHERE rk <= {TFIDF_TOP_K}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-{k} terms per document — the classic corpus-statistics
    keyword extractor. Term frequencies and document frequencies are two
    groupBys over one exploded token table; the corpus size is a 1-row
    aggregate broadcast into the scoring join. The df-side join carries NO
    forced broadcast hint (round-11 review): |vocab| is corpus-dependent —
    billions of distinct tokens at 100 TB — and F.broadcast would override
    the autoBroadcastJoinThreshold unconditionally and OOM the driver; AQE
    picks broadcast at small scales (where the df table is tiny) and a
    shuffled hash join at vocabulary scale, which is the right plan both
    times. Score = tf * ln(N/df), computed identically in both engines
    (integer counts, one ln, rounded) so the oracle hash-matches."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(_words(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
    )


# ---- character-entropy quality signal ---------------------------------------
@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, substr(text, i, 1) AS ch
      FROM documents, UNNEST(generate_series(1, length(text))) AS t(i)
    ),
    runs AS (
      SELECT doc_id, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    terms AS (
      SELECT doc_id,
             SUM(CAST(floor(c * log2(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)) AS acc,
             SUM(c) AS n
      FROM runs GROUP BY doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted,
           floor((log2(CAST(n AS DOUBLE)) - (CAST(acc AS DOUBLE) / 1e9) / n) * 1e6)
             / 1e6 AS char_entropy
    FROM terms WHERE n > 0
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's character distribution — the
    cheap information-theoretic quality signal (low entropy = repeated
    filler/boilerplate, high = random noise; natural text sits in a band).

    Engine-portable by construction: entropy = log2(n) - (SUM_c c*log2(c))/n
    where each per-character term is floor-scaled to an INTEGER (1e9) before
    summing, so the sum is exact and order-independent in both engines; the
    two inputs to every float op are therefore identical.

    Scale shape: Spark side is ONE row-local aggregate over the doc's own
    sorted char array (run-length pass, no explode — a 100 TB corpus would
    otherwise become one shuffle row per character); the oracle uses the
    explode+groupBy formulation to prove the algebra from a second
    direction."""
    docs = load_table(spark, sf_dir, "documents")
    # the char count deliberately does NOT reuse `cs`: CollapseProject
    # inlines a shared expression into every reference, so size(cs) would
    # re-SORT every document's chars just to count them (measured: the sort
    # appeared 3x in the plan; unsorted counting cuts it to the one the
    # run-length fold genuinely needs)
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    cs = F.array_sort(chars)
    term = lambda run: F.floor(  # noqa: E731
        run.cast("double") * F.log2(run.cast("double")) * F.lit(1e9)
    ).cast("long")
    acc = F.aggregate(
        cs,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("acc"),
        ),
        lambda st, x: F.struct(
            x.alias("prev"),
            F.when(x == st.prev, st.run + 1).otherwise(F.lit(1)).alias("run"),
            (
                F.when(x == st.prev, st.acc).otherwise(
                    st.acc + F.when(st.run > 0, term(st.run)).otherwise(F.lit(0))
                )
            ).alias("acc"),
        ),
        lambda st: st.acc + F.when(st.run > 0, term(st.run)).otherwise(F.lit(0)),
    )
    d = docs.select(
        "doc_id", F.size(chars).cast("long").alias("n_chars_counted"), acc.alias("acc")
    ).filter(F.col("n_chars_counted") > 0)
    ent = F.log2(F.col("n_chars_counted").cast("double")) - (
        F.col("acc").cast("double") / 1e9
    ) / F.col("n_chars_counted")
    return d.select(
        "doc_id",
        "n_chars_counted",
        (F.floor(ent * 1e6) / 1e6).alias("char_entropy"),
    )


# ---- source-level vocabulary overlap ----------------------------------------
@query(
    "source_vocab_overlap",
    oracle="""
    WITH st AS (
      SELECT DISTINCT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           sa.n AS vocab_a, sb.n AS vocab_b, COUNT(*) AS shared,
           CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*)) AS jaccard
    FROM st a
    JOIN st b ON a.tok = b.tok AND a.source < b.source
    JOIN sizes sa ON sa.source = a.source
    JOIN sizes sb ON sb.source = b.source
    GROUP BY a.source, b.source, sa.n, sb.n
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the container-level
    similarity matrix (which crawls/dumps duplicate each other?), the
    coarse screen run before doc-level dedup across source pairs.

    Same inverted-index algebra as the dedup family, one level up: distinct
    (source, token) postings self-join on the token, shared counts per
    source pair, set sizes broadcast in. Pairs are bounded by
    sources-per-token (cap ubiquitous tokens at scale — the df-cap
    pattern); the matrix is |sources|² at most, trivially small. Jaccard is
    a ratio of identical integers: deterministic double, no rounding
    needed."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(_words(F.col("text"))).alias("tok"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = st.select(F.col("source").alias("source_a"), "tok")
    b = st.select(F.col("source").alias("source_b"), "tok")
    shared = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


NOVELTY_N = 3


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, md5(g) AS gh
      FROM (SELECT doc_id, unnest({_ngram_join_duckdb(NOVELTY_N)}) AS g
            FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
                  FROM documents))
    ),
    flagged AS (
      SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY gh) AS novel
      FROM sh
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           floor(CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 1e6) / 1e6 AS novelty_frac
    FROM flagged GROUP BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl novelty: per document, the fraction of its distinct
    word trigrams whose canonical (minimum-doc_id) holder is the document
    itself — i.e. content never seen in any earlier document. Crawl
    pipelines use this to rank a new dump's marginal value before paying for
    full dedup; low-novelty docs are recombinations of already-held text.

    Scale shape: distinct shingles explode to md5-hashed postings (16-byte
    keys, never shingle text) and the novelty flag is a min-over-partition
    window on the shingle hash — ONE shuffle, same key discipline as
    dedup_minhash_lsh's postings; the per-doc rollup is a map-side-
    combinable groupBy. novelty_frac is an int/int double division
    (deterministic), floor-gridded by repo convention. Documents shorter
    than the shingle width drop out identically on both engines."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_ngrams_linear(w, NOVELTY_N))).alias("g"),
        # unhex -> the 16 raw md5 bytes (bijective with the hex string, so
        # window partitions are identical) — the "16-byte keys" the scale
        # note promises, at half the hex form's shuffle width
    ).select("doc_id", F.unhex(F.md5(F.col("g").cast("binary"))).alias("gh"))
    novel = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("gh"))
    return (
        sh.withColumn("novel", novel)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("novel"), 1).otherwise(0)).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (
                F.floor(
                    F.col("n_novel").cast("double") / F.col("n_shingles") * 1e6
                )
                / 1e6
            ).alias("novelty_frac"),
        )
    )


SEQ_BUDGET = 256  # tokens per packed training sequence (context length)


@query(
    "training_pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT source, doc_id, len(string_split_regex(lower(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, n_tokens,
             (SUM(n_tokens) OVER (PARTITION BY source
                                  ORDER BY n_tokens DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens)
               // {SEQ_BUDGET} AS seq_id
      FROM sized
    )
    SELECT source, CAST(seq_id AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           MAX(n_tokens) AS max_doc_tokens
    FROM packed GROUP BY source, seq_id
    """,
)
def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing — the LLM-pretraining example-packing
    step (T5/GPT style): within each source, documents are laid end-to-end
    in deterministic order (size-descending, doc_id tie-break) and cut into
    SEQ_BUDGET(=256)-token sequences by the running token offset; the output
    the per-sequence manifest (doc count, token fill, largest member) that
    the tokenizer/writer stage consumes. Differs from
    multimodal_batch_packing's fixed-COUNT batches: bins close on a
    cumulative token BUDGET, so short docs pack densely instead of wasting
    context.

    Scale shape: the window partitions by the bounded-cardinality source key
    (at 100 TB swap in ``pmod(hash(doc_id), N)`` shards — identical plan); a
    running SUM over a sorted partition is a single pass, and the manifest
    rollup is map-side combinable. All-integer arithmetic end to end."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.size(_words(F.col("text"))).alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = sized.withColumn(
        "seq_id",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / SEQ_BUDGET).cast("long"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.max("n_tokens").alias("max_doc_tokens"),
    )


VOCAB_MIN_FREQS = [1, 2, 4, 8, 16, 32, 64, 128]


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH tc AS (
      SELECT tok, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents)
      GROUP BY tok
    ),
    hist AS (SELECT cnt, COUNT(*) AS n_toks, SUM(cnt) AS occ FROM tc GROUP BY cnt),
    total AS (SELECT SUM(occ) AS t FROM hist)
    SELECT min_freq,
           CAST(SUM(CASE WHEN cnt >= min_freq THEN n_toks ELSE 0 END) AS BIGINT)
               AS vocab_size,
           CAST(SUM(CASE WHEN cnt >= min_freq THEN occ ELSE 0 END) AS BIGINT)
               AS covered_tokens,
           CAST(t AS BIGINT) AS total_tokens,
           floor(CAST(SUM(CASE WHEN cnt >= min_freq THEN occ ELSE 0 END) AS DOUBLE)
                 / t * 1e6) / 1e6 AS coverage_frac
    FROM hist, total, UNNEST({VOCAB_MIN_FREQS}) AS u(min_freq)
    GROUP BY min_freq, t
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocab planning: the min_frequency cutoff curve — for each
    candidate cutoff, the vocabulary size it admits and the fraction of all
    token occurrences it covers (1 − coverage = the OOV rate a tokenizer
    trained with that cutoff eats). This is the measurement behind the
    min_frequency knob in BPE/WordPiece trainers.

    Scale shape: ONE map-side-combinable token-count shuffle; the curve is
    then computed on the (count → frequency) histogram, which is at most
    |distinct counts| rows — so the cutoff expansion (x8 thresholds)
    multiplies a tiny aggregate, never the corpus. A global top-K rank
    formulation would need a total order over the vocab (the plan-lint
    scale-killer); the threshold formulation is pure aggregation. Exact
    integers end to end; coverage_frac is an int/int double division on the
    1e-6 grid."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(_words(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = tc.groupBy("cnt").agg(
        F.count(F.lit(1)).alias("n_toks"), F.sum("cnt").alias("occ")
    )
    total = hist.agg(F.sum("occ").alias("t"))
    cuts = F.explode(F.array(*[F.lit(k) for k in VOCAB_MIN_FREQS])).alias("min_freq")
    expanded = hist.select(cuts, "cnt", "n_toks", "occ").crossJoin(F.broadcast(total))
    covered = F.sum(F.when(F.col("cnt") >= F.col("min_freq"), F.col("occ")).otherwise(0))
    return (
        expanded.groupBy("min_freq", "t")
        .agg(
            F.sum(
                F.when(F.col("cnt") >= F.col("min_freq"), F.col("n_toks")).otherwise(0)
            ).alias("vocab_size"),
            covered.alias("covered_tokens"),
        )
        .select(
            "min_freq",
            "vocab_size",
            "covered_tokens",
            F.col("t").alias("total_tokens"),
            (
                F.floor(F.col("covered_tokens").cast("double") / F.col("t") * 1e6)
                / 1e6
            ).alias("coverage_frac"),
        )
    )


# ---- n-gram LM quality proxy -------------------------------------------------
COMMON_DF = 3  # a bigram is "common" when >= this many docs contain it


@query(
    "text_bigram_commonness",
    oracle=f"""
    WITH bg AS (
      SELECT DISTINCT doc_id, md5(g) AS gh
      FROM (SELECT doc_id, unnest({{BIGRAMS}}) AS g
            FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
                  FROM documents))
    ),
    scored AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY gh) AS df
      FROM bg
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(df) AS BIGINT) AS df_sum,
           CAST(SUM(CASE WHEN df >= {COMMON_DF} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_common,
           floor(CAST(SUM(df) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS mean_df,
           floor(CAST(SUM(CASE WHEN df >= {COMMON_DF} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS common_frac
    FROM scored GROUP BY doc_id
    """.replace("{BIGRAMS}", _ngram_join_duckdb(2)),
)
def text_bigram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality proxy without the logs: per document, the
    corpus document-frequency profile of its distinct word bigrams —
    mean df (how "expected" the doc's phrasing is under the corpus's own
    bigram distribution, the count-based core of an n-gram LM score) and
    the fraction of bigrams shared by >= COMMON_DF documents. Low mean_df
    flags gibberish/boilerplate-free-but-random text; a common_frac near
    1.0 with high df flags template spam — the two tails a quality filter
    cuts. Integer counts + floor-gridded divisions keep the oracle exact
    (no log(), whose libm rounding differs across engines).

    Scale shape — identical to text_ngram_novelty: distinct bigrams
    explode to md5 postings (16-byte keys, never text), df is a
    count-over-partition window on the hash (ONE shuffle), the per-doc
    rollup is a map-side-combinable groupBy. At 100 TB the df table is
    the training by-product you persist as the corpus LM."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    bg = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_ngrams_linear(w, 2))).alias("g"),
        # raw md5 bytes, not hex — same rationale as text_ngram_novelty
    ).select("doc_id", F.unhex(F.md5(F.col("g").cast("binary"))).alias("gh"))
    df = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    grid = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        bg.withColumn("df", df)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("df").alias("df_sum"),
            F.sum(
                F.when(F.col("df") >= COMMON_DF, 1).otherwise(0)
            ).alias("n_common"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "df_sum",
            "n_common",
            grid(F.col("df_sum").cast("double") / F.col("n_bigrams")).alias(
                "mean_df"
            ),
            grid(F.col("n_common").cast("double") / F.col("n_bigrams")).alias(
                "common_frac"
            ),
        )
    )
