"""Exact-rational data probes for the q6/q44/q65 correlated-threshold
boundary sensitivity (the documented divergence class in tpcds.py: Spark
compares these thresholds in exact decimal, DuckDB in double).

The templates filter on `value <op> k * AVG(...)`. If a value landed
EXACTLY on its threshold — or within the ~1e-12 relative band where
double rounding could disagree with exact decimal — row membership could
flip between the engines while both are "right". Rather than normalize
inside the verbatim template (forfeiting verbatim status), this probe
recomputes every threshold with Fraction arithmetic (values are exact
decimals, so scaled integers are lossless) and asserts each compared value
clears its threshold by >= 1e-9 relative margin at ALL THREE testdata
scales — 1000x the widest double-noise band, and ~5e4x below the observed
minimum margin (5e-5 at sf0.1), so the assert has real detection power
without being flaky.

q44 additionally RANKs over the surviving per-item averages: ties resolve
differently between Spark's DECIMAL(20,10) half-up average and DuckDB's
double average, so the probe asserts the survivors are pairwise distinct
in exact rationals, as doubles, AND after quantizing to Spark's
decimal(20,10) grid.
"""

from __future__ import annotations

import os
from fractions import Fraction

import duckdb
import pytest

from datafusion_datasource_orc_spark.operators.tpcds import _DDB_DIMS
from datafusion_datasource_orc_spark.sources.tables import TABLES

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# minimum allowed relative margin between a compared value and its
# threshold: >= 1000x the band where double-vs-decimal comparison could
# disagree (~1e-12 relative for these aggregate depths)
MIN_REL_MARGIN = Fraction(1, 10**9)


@pytest.fixture(scope="module", params=SF_DIRS)
def probe_con(request):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{request.param}/{t}.parquet')"
        )
    yield con
    con.close()


def _min_rel_margin(values: list[Fraction], threshold: Fraction) -> Fraction:
    assert threshold != 0
    return min(abs(v - threshold) / abs(threshold) for v in values)


def test_q6_category_price_threshold(probe_con):
    rows = probe_con.execute(
        f"WITH {_DDB_DIMS} "
        "SELECT i_category, CAST(i_current_price*100 AS BIGINT) FROM item"
    ).fetchall()
    by_cat: dict[str, list[int]] = {}
    for cat, cents in rows:
        by_cat.setdefault(cat, []).append(cents)
    for cat, cs in by_cat.items():
        thr = Fraction(6, 5) * Fraction(sum(cs), 100 * len(cs))  # 1.2 * AVG
        margin = _min_rel_margin([Fraction(c, 100) for c in cs], thr)
        assert margin >= MIN_REL_MARGIN, (
            f"q6 category {cat}: a price sits {float(margin):.2e} relative "
            "from the 1.2*AVG threshold — inside engine-divergence range"
        )


def test_q44_item_profit_threshold_and_rank_ties(probe_con):
    rows = probe_con.execute(
        f"WITH {_DDB_DIMS} "
        "SELECT ss_item_sk, ss_customer_sk IS NULL, "
        "CAST(ss_net_profit*1000000 AS BIGINT) "
        "FROM store_sales WHERE ss_store_sk = 4"
    ).fetchall()
    base_n = base_s = 0
    items: dict[int, tuple[int, int]] = {}
    for item, isnull, v in rows:
        if isnull:
            base_n += 1
            base_s += v
        s, n = items.get(item, (0, 0))
        items[item] = (s + v, n + 1)
    assert base_n > 0, "q44 baseline (NULL-customer walk-ins) is empty"
    thr = Fraction(9, 10) * Fraction(base_s, 10**6 * base_n)  # 0.9 * AVG
    avgs = [Fraction(s, 10**6 * n) for s, n in items.values()]
    margin = _min_rel_margin(avgs, thr)
    assert margin >= MIN_REL_MARGIN, (
        f"q44: an item average sits {float(margin):.2e} relative from the "
        "0.9*baseline threshold"
    )
    # rank keys of the HAVING survivors must not tie under ANY of the three
    # arithmetics the two engines use
    survivors = [a for a in avgs if a > thr]
    as_double = {float(a) for a in survivors}
    # Spark's AVG(decimal) output is decimal(20,10), HALF_UP (= round half
    # AWAY FROM ZERO — ss_net_profit averages are often negative, and
    # Python's floor division alone would round negative halves toward
    # +infinity instead)
    def _half_up_10(a: Fraction) -> int:
        num, den = abs(a.numerator), a.denominator
        q = (2 * num * 10**10 + den) // (2 * den)
        return q if a >= 0 else -q

    as_dec10 = {_half_up_10(a) for a in survivors}
    assert len(set(survivors)) == len(survivors), "q44: exact rank-key tie"
    assert len(as_double) == len(survivors), "q44: double rank-key collision"
    assert len(as_dec10) == len(survivors), "q44: decimal(20,10) rank-key collision"


def test_q65_store_revenue_threshold(probe_con):
    rows = probe_con.execute(
        f"""WITH {_DDB_DIMS}
        SELECT ss_store_sk, CAST(SUM(ss_sales_price)*1000000 AS BIGINT)
        FROM store_sales, date_dim
        WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 120 AND 131
        GROUP BY ss_store_sk, ss_item_sk"""
    ).fetchall()
    by_store: dict[int, list[int]] = {}
    for st, v in rows:
        by_store.setdefault(st, []).append(v)
    for st, vs in by_store.items():
        thr = Fraction(1, 10) * Fraction(sum(vs), 10**6 * len(vs))  # 0.1 * AVG
        margin = _min_rel_margin([Fraction(v, 10**6) for v in vs], thr)
        assert margin >= MIN_REL_MARGIN, (
            f"q65 store {st}: a revenue sits {float(margin):.2e} relative "
            "from the 0.1*ave threshold"
        )


def test_q36_gross_margin_rank_ties(probe_con):
    """q36 RANKs SUM(ss_net_profit)/SUM(ss_ext_sales_price) within each
    ROLLUP rank partition. Spark evaluates the ratio in exact decimal,
    DuckDB in double — a tie in one arithmetic that is distinct in the
    other would flip rank_within_parent between engines and shift the
    ORDER BY cut. Assert every partition's margins are pairwise distinct
    in exact rationals, as doubles, AND on a decimal(20,10) half-up grid
    (the q44 triple-arithmetic discipline). Round-13 review: the module
    comment used to CLAIM this probe existed; now it does."""
    rows = probe_con.execute(
        f"""WITH {_DDB_DIMS}
        SELECT i_category, i_class,
               CAST(SUM(ss_net_profit) * 1000000 AS BIGINT),
               CAST(SUM(ss_ext_sales_price) * 1000000 AS BIGINT),
               GROUPING(i_category) + GROUPING(i_class)
        FROM store_sales, date_dim d1, item, store
        WHERE d1.d_year = 1998
          AND d1.d_date_sk = ss_sold_date_sk
          AND i_item_sk = ss_item_sk
          AND ss_store_sk = s_store_sk
          AND s_state IN ('TN', 'SD', 'AL', 'GA', 'KY')
        GROUP BY ROLLUP(i_category, i_class)"""
    ).fetchall()

    def _half_up_10(a: Fraction) -> int:
        num, den = abs(a.numerator), a.denominator
        q = (2 * num * 10**10 + den) // (2 * den)
        return q if a >= 0 else -q

    parts: dict[tuple, list[Fraction]] = {}
    for cat, cls, np, sp, loch in rows:
        assert sp != 0, "q36: zero sales-price denominator"
        # rank partition = (lochierarchy, category when class-level else NULL)
        key = (loch, cat if loch == 0 else None)
        parts.setdefault(key, []).append(Fraction(np, sp))
    assert parts, "q36 probe query returned nothing"
    for key, margins in parts.items():
        assert len(set(margins)) == len(margins), f"q36 {key}: exact tie"
        assert len({float(m) for m in margins}) == len(margins), (
            f"q36 {key}: double rank-key collision"
        )
        assert len({_half_up_10(m) for m in margins}) == len(margins), (
            f"q36 {key}: decimal(20,10) rank-key collision"
        )
