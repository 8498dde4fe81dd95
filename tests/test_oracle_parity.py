"""Oracle parity at sf0.001 for every oracle-declared query — the same
row-count + sorted-columns + order-insensitive value-hash comparison the
driver runs at sf0.01 (tools/check_oracles.py is the shared implementation).

This is the repo-local correctness gate: a failure here means the driver's
CORRECTNESS_r{N}.json would flag the query."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracles import value_hash  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, sf_dir, ddb):
    # pandas on BOTH sides — the driver's comparator converts to pandas
    # frames, which changes cell types (DuckDB HUGEINT -> float64, NULLable
    # ints -> float64/NaN); fetchall()/collect() would hide those mismatches.
    sdf = _QUERIES[name](spark, sf_dir)
    spdf = sdf.toPandas()
    srows = list(spdf.itertuples(index=False, name=None))
    scols = list(spdf.columns)

    opdf = ddb.execute(_ORACLES[name]).df()
    ocols = list(opdf.columns)
    orows = list(opdf.itertuples(index=False, name=None))

    assert len(srows) == len(orows), f"rowcount spark={len(srows)} duckdb={len(orows)}"
    assert sorted(scols) == sorted(ocols)
    assert value_hash(srows, scols) == value_hash(orows, ocols), "value hash mismatch"


def test_every_query_has_oracle_or_documented_weak_check():
    weak = set(_QUERIES) - set(_ORACLES)
    # Since round 5 EVERY registered query is oracle-checked: the last
    # holdout (multimodal_decode) computes its stub-decode features as exact
    # integer byte sums + single IEEE divisions, which DuckDB reproduces
    # bit-for-bit from the hex-encoded payload.
    assert weak == set(), f"unexpected weak-check queries: {weak}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"l_returnflag", "cnt"}
