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
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
           substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 8) AS shard_key
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (md5 over collapsed-whitespace
    lowercase text) + an 8-hex shard key — the join/partition handle for
    cross-corpus dedup at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    fp = F.md5(norm.cast("binary"))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("shard_key")
    )


# ---- corpus rollup ----------------------------------------------------------
@query(
    "corpus_stats_by_source",
    oracle="""
    SELECT source, lang, COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
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
    aggregate broadcast into the scoring join; document frequency rides a
    broadcast join because |vocab| << |corpus tokens| after the DF aggregate.
    At 100 TB the same shape holds: the only big shuffle is the (doc, tok)
    TF groupBy, and a df-cap filter (drop tokens in >X% of docs) bounds the
    DF table exactly like the posting-list cap in dedup. Score = tf *
    ln(N/df), computed identically in both engines (integer counts, one ln,
    rounded) so the oracle hash-matches."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(_words(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
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
