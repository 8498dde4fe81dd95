"""BPE merge APPLICATION — the tokenizer-inference half (judge r11 task 6).
``tokenizer_bpe_merges`` trains the merge table; this operator applies the
identically-learned table to ENCODE the corpus: per document, the token
count under the learned subword vocab vs the whitespace baseline, as an
exact integer compression ratio. Together they are the Sennrich et al.
2016 train/encode pair GPT-class tokenizers run.

Shared machinery (so train and apply cannot drift, the hybrid_bm25
discipline): the merge trajectory is re-derived with ``bpe._pair_counts``
/ ``bpe._top_pair`` and the SAME seq0/renormalize expressions — the only
difference is that the sequence table stays KEYED BY WORD so the final
per-word symbol count can be joined back onto the corpus. The oracle
replays the identical trajectory via ``bpe``'s CTE builders
(``_seq0_sql`` / ``_renorm_sql`` / ``_pairs_cte_sql``) with the word key
carried through.

Encoding is the two-table form real tokenizers use at scale:
1. Apply all {BPE_ROUNDS} merges over the DISTINCT-WORD table (vocabulary-
   bounded — millions of rows at any corpus scale, never corpus rows);
   per-word encoded length = symbol count of the final sequence.
2. One corpus tokenize scan joins each token to its encoded length
   (shuffle on token — the inverted-index shape; AQE broadcasts the vocab
   side while it fits) and sums per document.

Determinism: all counts are exact integers; ``ratio_ppm`` is integer
division of non-negative integers (Spark ``div`` == DuckDB ``//`` there —
the cookbook rule), so no float crosses an engine boundary anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.bpe import (
    BPE_ROUNDS,
    _pair_counts,
    _pairs_cte_sql,
    _renorm_sql,
    _seq0_sql,
    _top_pair,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table


def word_seqs_ctes() -> list[str]:
    """The word-keyed merge-trajectory CTE chain (words → seqs0 → … →
    seqs{BPE_ROUNDS}) — shared by the encode oracle here and the vocab
    oracle (operators/bpe_vocab.py) so the two artifacts replay ONE
    trajectory."""
    ctes = [
        f"""
    words AS (
      SELECT w AS word, COUNT(*) AS wc
      FROM (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents WHERE text IS NOT NULL
      ) WHERE w != '' GROUP BY 1
    ),
    seqs0 AS (SELECT word, wc, {_seq0_sql('word')} AS seq FROM words)"""
    ]
    # LEFT JOIN ... ON TRUE, not CROSS JOIN (r12 ADVICE): if the corpus
    # exhausts learnable merges before BPE_ROUNDS, top{r} is EMPTY and a
    # cross join would annihilate the sequence table — encode would return
    # zero rows instead of one per document. With the outer join the merge
    # application degrades to a no-op (NULL pair -> replace() is NULL ->
    # coalesce keeps seq), so seqs{r+1} == seqs{r} when merges run out.
    for r in range(BPE_ROUNDS):
        ctes.append(_pairs_cte_sql(f"seqs{r}", r))
        ctes.append(
            f"""
    seqs{r + 1} AS (
      SELECT word, wc,
             {_renorm_sql(
                 "coalesce(replace(seq, ' ' || t.p1 || '  ' || t.p2 || ' ',"
                 " ' ' || t.p1 || t.p2 || ' '), seq)"
             )} AS seq
      FROM seqs{r} LEFT JOIN top{r} t ON TRUE
    )"""
        )
    return ctes


def _bpe_encode_oracle() -> str:
    ctes = word_seqs_ctes()
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
    vocab AS (
      SELECT word, len(string_split_regex(trim(seq), ' +')) AS n_sym
      FROM seqs{BPE_ROUNDS}
    ),
    docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents WHERE text IS NOT NULL
      ) WHERE w != ''
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
             CAST(SUM(n_sym) AS BIGINT) AS bpe_tokens
      FROM docw JOIN vocab ON w = word
      GROUP BY 1
    )
    SELECT doc_id, ws_tokens, bpe_tokens,
           CAST((bpe_tokens * 1000000) // ws_tokens AS BIGINT) AS ratio_ppm
    FROM per_doc
    """
    )


def bpe_word_seqs(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """(doc_id, text) → the word-keyed merge trajectory's FINAL state:
    (word, wc, seq) after applying every learnable merge — the table the
    encode join (here) and the vocabulary emission (operators/bpe_vocab)
    both read, so the two artifacts cannot drift."""
    words = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    seq0 = F.concat(
        F.lit(" "),
        F.array_join(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
            "  ",
        ),
        F.lit(" "),
    )
    seqs = words.select(
        F.col("w").alias("word"), "wc", seq0.alias("seq")
    ).localCheckpoint(eager=False)

    # the training loop, word key carried through; unlike bpe_merge_rounds
    # every learned merge is APPLIED (the trainer skips the last apply —
    # it only needs the rules)
    for r in range(rounds):
        top = _top_pair(_pair_counts(seqs)).localCheckpoint(eager=False)
        # merge-exhaustion guard (r12 ADVICE): an empty argmax means no
        # adjacent pair remains anywhere — every later round is a no-op,
        # and crossJoining the empty frame would ANNIHILATE the sequence
        # table (encode must emit one row per document regardless of how
        # many merges exist). head(1) is a bounded 1-row action on a frame
        # the next stage would materialize anyway. The oracle reaches the
        # same fixed point via LEFT JOIN + coalesce (see _bpe_encode_oracle).
        if not top.head(1):
            break
        merged_seq = F.expr(
            "replace(seq, ' ' || p1 || '  ' || p2 || ' ',"
            " ' ' || p1 || p2 || ' ')"
        )
        renorm = F.concat(
            F.lit(" "),
            F.array_join(F.split(F.trim(merged_seq), " +"), "  "),
            F.lit(" "),
        )
        seqs = (
            seqs.crossJoin(F.broadcast(top.select("p1", "p2")))
            .select("word", "wc", renorm.alias("seq"))
            .localCheckpoint(eager=False)
        )
    return seqs


def bpe_encode_counts(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """(doc_id, text) → per-doc encoded-token accounting under the learned
    merge table: (doc_id, ws_tokens, bpe_tokens, ratio_ppm)."""
    seqs = bpe_word_seqs(docs, rounds)
    vocab = seqs.select(
        "word", F.size(F.split(F.trim("seq"), " +")).alias("n_sym")
    )
    docw = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    per_doc = (
        docw.join(vocab, docw.w == vocab.word)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ws_tokens"),
            F.sum("n_sym").cast("bigint").alias("bpe_tokens"),
        )
    )
    return per_doc.select(
        "doc_id",
        "ws_tokens",
        "bpe_tokens",
        F.expr("(bpe_tokens * 1000000) div ws_tokens").alias("ratio_ppm"),
    )


@query("tokenizer_bpe_encode", oracle=_bpe_encode_oracle())
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — encode the corpus under the learned merges:
    (doc_id, ws_tokens, bpe_tokens, ratio_ppm)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return bpe_encode_counts(docs)
