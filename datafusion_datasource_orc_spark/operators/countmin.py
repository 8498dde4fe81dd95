"""Count-Min sketch over document tokens — the frequency-estimation member
of the sketch family (next to HLL++ `approx_distinct`, GK
`approx_percentile_prices`, and freqItems `approx_heavy_hitters`).

A CMS answers "how often does token t occur?" from D x W integer counters
instead of a |vocab|-sized exact table: counter[d][h_d(t) % W] += 1 per
occurrence, estimate = min_d counter[d][h_d(t)]. The estimate NEVER
undercounts (every occurrence of t lands in all D of its counters) and
overcounts only by colliding tokens — the guarantee this query proves
row-by-row against the exact counts.

Engine-portable hashing: h_d(t) is 4 hex chars of md5(t) at offset 4*d
(the dedup_simhash/bloom discipline — Spark's md5 and DuckDB's md5 agree),
so the DuckDB oracle replicates every counter exactly and the driver gate
hash-checks estimate values, not just bounds.

Scale shape (100 TB): one token explode + groupBy(token) shuffle builds the
exact counts (map-side combinable; in a pure-sketch deployment this
collapses to groupBy(d, bucket) — 4,096 counters TOTAL regardless of corpus
size, the point of the sketch); the counter aggregation shuffles at most
D x W = 4,096 rows; the top-k probe joins a 20-row broadcast against the
broadcast counter table. In production the counter table is the mergeable
per-partition state — partial sketches bit-add across executors.

No reference counterpart: DataFusion's ORC connector has no sketch surface;
this extends SURVEY §2C's approx family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

CMS_DEPTH = 4  # D independent hash rows (md5 hex offsets 1, 5, 9, 13)
CMS_WIDTH = 1024  # W buckets per row
CMS_TOP_K = 20  # report the exact top-k tokens' estimates


def _bucket_sql(d: int) -> str:
    """DuckDB: 16-bit value of md5 hex chars [4d+1, 4d+4] of column ``tok``,
    mod CMS_WIDTH — nibble arithmetic, the _bloom_poss_sql discipline."""
    nib = "(strpos('0123456789abcdef', substr(md5(tok), {j}, 1)) - 1)"
    val = " + ".join(f"({nib.format(j=4 * d + c + 1)} * {16 ** (3 - c)})" for c in range(4))
    return f"(({val}) % {CMS_WIDTH})"


def cms_bucket(d: int) -> "F.Column":
    """Row d's bucket for string column ``tok``: 4 md5 hex chars at offset
    4d as a 16-bit value, mod CMS_WIDTH — the Spark twin of _bucket_sql."""
    return (
        F.conv(F.substring(F.md5("tok"), 4 * d + 1, 4), 16, 10).cast("bigint")
        % CMS_WIDTH
    )


def explode_cms_buckets() -> "F.Column":
    """explode() of the CMS_DEPTH (d, bucket) structs for column ``tok`` —
    shared by the batch query and the streaming twin
    (streaming/sketches.py) so both build bit-identical counters."""
    return F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("d"), cms_bucket(d).alias("bucket"))
                for d in range(CMS_DEPTH)
            ]
        )
    )


def _countmin_oracle() -> str:
    buckets = " UNION ALL ".join(
        f"SELECT tok, cnt, {d} AS d, {_bucket_sql(d)} AS bucket FROM cnt"
        for d in range(CMS_DEPTH)
    )
    return f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents WHERE text IS NOT NULL
    ),
    t2 AS (SELECT tok FROM toks WHERE tok != ''),
    cnt AS (SELECT tok, COUNT(*) AS cnt FROM t2 GROUP BY tok),
    bk AS MATERIALIZED ({buckets}),
    counters AS (
      SELECT d, bucket, CAST(SUM(cnt) AS BIGINT) AS c
      FROM bk GROUP BY d, bucket
    ),
    topk AS (
      SELECT tok, cnt FROM (
        SELECT tok, cnt,
               row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rk
        FROM cnt
      ) WHERE rk <= {CMS_TOP_K}
    )
    SELECT t.tok, t.cnt AS exact_cnt, MIN(c.c) AS cms_estimate,
           MIN(c.c) >= t.cnt AS never_underestimates
    FROM topk t
    JOIN bk ON bk.tok = t.tok
    JOIN counters c ON c.d = bk.d AND c.bucket = bk.bucket
    GROUP BY t.tok, t.cnt
    """


@query("approx_countmin_tokens", oracle=_countmin_oracle())
def approx_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. Output: the exact top-{CMS_TOP_K} tokens with
    exact count, CMS estimate, and the (provably TRUE) no-undercount flag —
    the oracle computes the estimate from the SAME counters, so a hash
    mismatch catches any drift in the sketch arithmetic itself."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    # cnt feeds THREE consumers (bk -> counters, topk, the final join);
    # unmaterialized, the corpus tokenize+groupBy would execute three times
    # per run — a genuine 3x at 100 TB (round-12 review pass 3 finding 2).
    # One lazy localCheckpoint materializes the |vocab|-sized table once.
    cnt = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    bk = cnt.select(
        "tok",
        "cnt",
        explode_cms_buckets().alias("db"),
    ).select("tok", "cnt", F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
    counters = bk.groupBy("d", "bucket").agg(F.sum("cnt").alias("c"))

    # top-k via orderBy().limit() -> TakeOrderedAndProject: each partition
    # keeps its local top-k, the driver merges k-sized heaps — never a
    # single-task total sort. (cnt DESC, tok ASC) is a strict total order,
    # so the cut is deterministic and matches the oracle's row_number().
    topk = cnt.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(CMS_TOP_K)

    return (
        bk.join(F.broadcast(topk.select("tok")), "tok")
        .join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("cms_estimate"))
        .join(F.broadcast(topk), "tok")
        .select(
            "tok",
            F.col("cnt").alias("exact_cnt"),
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("cnt")).alias("never_underestimates"),
        )
    )
