"""Driver-contract shape tests for __spark_entry__.

The external driver imports entry/queries/oracle_sql and relies on: a stable
entry() schema, every queries() value being a (spark, sf_dir) callable, and
oracle keys being a subset of query names. A regression here fails the
driver's gate before any correctness comparison even runs — cheapest
possible guard.
"""

from __future__ import annotations

import inspect

import __spark_entry__ as entrymod


def test_entry_returns_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.schema.simpleString() == "struct<l_returnflag:string,cnt:bigint>"
    assert len(df.collect()) >= 1


def test_queries_are_two_arg_callables():
    q = entrymod.queries()
    assert len(q) >= 144
    for name, fn in q.items():
        assert callable(fn), name
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (inspect.Parameter.POSITIONAL_ONLY, inspect.Parameter.POSITIONAL_OR_KEYWORD)
        ]
        assert len(params) == 2, f"{name} must take exactly (spark, sf_dir)"


def test_oracle_keys_subset_of_queries_and_nonempty_sql():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH")) for s in o.values())


def test_query_names_are_identifier_like():
    for name in entrymod.queries():
        assert name.replace("_", "").isalnum() and name == name.lower(), name


def test_no_nested_or_date_output_columns(spark, sf_dir):
    """Driver-comparator conventions, enforced at the schema level (plans
    are built, never executed):

    - no array/map/struct outputs — the pandas-based canonicalizer crashes
      on list/dict cells; serialize at the boundary (array_join/to_json);
    - no DATE outputs — Spark dates reach pandas as datetime.date objects
      while DuckDB DATE becomes datetime64 midnight Timestamps, which can
      never hash-match; emit TIMESTAMP_NTZ (Spark) / TIMESTAMP (DuckDB)
      instead (naive datetime64 on both engines)."""
    from pyspark.sql import types as T

    offenders = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType, T.DateType)
            ):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


def test_gate_rotation_ledger_policy(tmp_path, monkeypatch):
    """The rotation ledger counts only hash-matched stamps as HARD; weaker
    records (no_oracle, comparator errors, red rows) re-front the query —
    unless it still has no oracle (permanently weak rows keep their
    rows-only stamp instead of burning gate slots forever)."""
    import json

    art = {
        "hard_green": {"hash_match": True, "err": None},
        "red_row": {"hash_match": False, "err": None},
        "errored": {"hash_match": None, "err": "boom"},
        "weak_with_oracle_now": {"hash_match": None, "err": "no_oracle"},
        "weak_still_no_oracle": {"hash_match": None, "err": "no_oracle"},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(art))
    monkeypatch.setattr(
        entrymod.os.path, "dirname", lambda _: str(tmp_path)
    )
    monkeypatch.setattr(
        "datafusion_datasource_orc_spark.operators.ORACLES",
        {"hard_green": "SELECT 1", "red_row": "SELECT 1",
         "errored": "SELECT 1", "weak_with_oracle_now": "SELECT 1"},
    )
    led = entrymod._driver_ledger()
    assert "hard_green" in led
    assert "weak_still_no_oracle" in led  # permanently weak → keeps stamp
    assert "red_row" not in led  # red → resample until green
    assert "errored" not in led
    assert "weak_with_oracle_now" not in led  # earned an oracle → re-front


def test_gate_rotation_legacy_list_artifact(tmp_path, monkeypatch):
    """A legacy list-format artifact carries no per-row status, so it can
    never grant a HARD stamp: names route through the weak-row path and
    stay fronted unless they (still) have no oracle (ADVICE r04)."""
    import json

    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps(["listed_with_oracle", "listed_no_oracle"])
    )
    monkeypatch.setattr(entrymod.os.path, "dirname", lambda _: str(tmp_path))
    monkeypatch.setattr(
        "datafusion_datasource_orc_spark.operators.ORACLES",
        {"listed_with_oracle": "SELECT 1"},
    )
    led = entrymod._driver_ledger()
    assert "listed_with_oracle" not in led  # no proof of a hash match → re-front
    assert "listed_no_oracle" in led  # permanently weak → keeps its stamp
