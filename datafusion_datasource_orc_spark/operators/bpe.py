"""BPE merge induction — the tokenizer-TRAINING kernel (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"; the
byte-pair-encoding loop GPT/Llama tokenizers are trained with). The repo's
text family consumes tokenizations (token counts, vocab coverage, packing);
this operator PRODUCES one: the first {BPE_ROUNDS} merge rules learned from
the corpus, each an exact corpus-wide argmax.

Algorithm (distributed form):
1. ONE corpus scan builds the word-frequency table (word, wc) — BPE trains
   on distinct words weighted by frequency, so every subsequent round
   touches the (much smaller) word table, never the corpus again.
2. Each word's symbol sequence is a string: symbols joined by TWO spaces
   with one space at each edge (`' a  b  c '`). Adjacency is then a pure
   string property: a pair (p1, p2) is adjacent iff `' p1  p2 '` occurs —
   the single-space flanks anchor symbol boundaries (no mid-symbol or
   prefix/suffix false matches), and replace()'s left-to-right
   non-overlapping scan IS the greedy merge order BPE specifies
   ('a a a a' merges to 'aa aa', not 'aa a a').
3. Per round: explode adjacent pairs from the current sequences, count
   them weighted by wc (map-side-combinable groupBy), take the argmax
   with a deterministic tie-break (count DESC, merged string ASC — a
   1-row aggregate), apply the merge with one string replace per word,
   and re-normalize the spacing invariant.

Exactness: pair counts are exact integers; the argmax tie-break is total;
the merge/renormalize string ops have identical semantics in both engines
(replace() scans left-to-right over non-overlapping literal matches in
Spark and DuckDB alike; the renormalize regex is an explicit `' +'`).
The DuckDB oracle replays the identical {BPE_ROUNDS}-round trajectory as
an unrolled CTE chain — the embedding_power_iteration / kmeans_train
unrolled-iteration precedent.

Scale shape (100 TB): round r is one groupBy over the DISTINCT-WORD table
(bounded by vocabulary size — millions of rows at any corpus scale, not
corpus rows) plus a 1-row argmax crossJoin'd back as a broadcast; the
corpus itself is scanned exactly once, for the word counts. R rounds = R
passes over the word table, the same iterate-over-small-state shape as
the Lloyd trainer. The word table is materialized once behind a lazy
localCheckpoint; per-round sequences chain map-side string ops on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

BPE_ROUNDS = 3  # unrolled merge rounds (the power-iteration precedent)


def _seq0_sql(w: str) -> str:
    """DuckDB: word → initial symbol-sequence string (chars joined by two
    spaces, one space at each edge)."""
    return (
        f"' ' || array_to_string(list_transform(range(1, len({w}) + 1),"
        f" i -> {w}[i]), '  ') || ' '"
    )


def _renorm_sql(s: str) -> str:
    """DuckDB: restore the double-space join invariant after a merge."""
    return f"' ' || array_to_string(string_split_regex(trim({s}), ' +'), '  ') || ' '"


def _pairs_cte_sql(seqs: str, r: int) -> str:
    """DuckDB: adjacent-pair counts + the round-r argmax (two CTEs)."""
    return f"""
    pairs{r} AS (
      SELECT s1 AS p1, s2 AS p2, SUM(wc) AS cnt
      FROM (
        SELECT wc, syms[i] AS s1, syms[i + 1] AS s2
        FROM (SELECT wc, string_split_regex(trim(seq), ' +') AS syms FROM {seqs})
        CROSS JOIN UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
        WHERE len(syms) >= 2
      ) GROUP BY 1, 2
    ),
    top{r} AS (
      SELECT p1, p2, cnt FROM pairs{r}
      ORDER BY cnt DESC, p1 || p2 ASC, p1 ASC LIMIT 1
    )"""


def _bpe_oracle() -> str:
    ctes = [
        f"""
    words AS (
      SELECT w AS word, COUNT(*) AS wc
      FROM (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents WHERE text IS NOT NULL
      ) WHERE w != '' GROUP BY 1
    ),
    seqs0 AS (SELECT wc, {_seq0_sql('word')} AS seq FROM words)"""
    ]
    rows = []
    for r in range(BPE_ROUNDS):
        ctes.append(_pairs_cte_sql(f"seqs{r}", r))
        ctes.append(
            f"""
    seqs{r + 1} AS (
      SELECT wc,
             {_renorm_sql(
                 "replace(seq, ' ' || t.p1 || '  ' || t.p2 || ' ',"
                 " ' ' || t.p1 || t.p2 || ' ')"
             )} AS seq
      FROM seqs{r} CROSS JOIN top{r} t
    )"""
        )
        rows.append(
            f"SELECT {r + 1} AS merge_round, p1 AS left_sym, p2 AS right_sym,"
            f" p1 || p2 AS merged, CAST(cnt AS BIGINT) AS pair_count FROM top{r}"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the current sequences (weighted by wc).

    Two-step projection (the shingles_of_words discipline): the symbol
    array is materialized ONCE per row before the pair lambda references
    it. Writing split(trim(seq)) inline inside the transform would
    re-split the whole sequence string per pair index — O(len²) per word
    per round, and crawl corpora contain pathological unsplittable 'words'
    (base64 blobs, URLs) where that stalls a stage."""
    return (
        seqs.select("wc", F.split(F.trim("seq"), " +").alias("syms"))
        .select(
            "wc",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN "
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i - 1] AS p1, syms[i] AS p2)) "
                    "ELSE array() END"
                )
            ).alias("pr"),
        )
        .select("wc", F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.sum("wc").alias("cnt"))
    )


def _top_pair(pairs: DataFrame) -> DataFrame:
    """The round's argmax as a 1-row DataFrame (count DESC, merged ASC)."""
    return pairs.orderBy(
        F.col("cnt").desc(), F.concat("p1", "p2").asc(), F.col("p1").asc()
    ).limit(1)


def bpe_merge_rounds(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """(doc_id, text) → the first ``rounds`` learned merge rules:
    (merge_round, left_sym, right_sym, merged, pair_count)."""
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        )
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
    # the word table is scanned once per round — materialize it once
    seqs = words.select("wc", seq0.alias("seq")).localCheckpoint(eager=False)

    out = None
    for r in range(rounds):
        top = _top_pair(_pair_counts(seqs)).localCheckpoint(eager=False)
        row = top.select(
            F.lit(r + 1).alias("merge_round"),
            F.col("p1").alias("left_sym"),
            F.col("p2").alias("right_sym"),
            F.concat("p1", "p2").alias("merged"),
            F.col("cnt").cast("bigint").alias("pair_count"),
        )
        out = row if out is None else out.unionAll(row)
        if r + 1 < rounds:
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
                .select("wc", renorm.alias("seq"))
                .localCheckpoint(eager=False)
            )
    return out


@query("tokenizer_bpe_merges", oracle=_bpe_oracle())
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring — the first {BPE_ROUNDS} BPE merge rules
    learned from the corpus: (merge_round, left_sym, right_sym, merged,
    pair_count)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return bpe_merge_rounds(docs)
