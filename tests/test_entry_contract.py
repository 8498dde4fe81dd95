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


def test_git_blob_sha_matches_git_hash_object(tmp_path):
    """_git_blob_sha replicates `git hash-object` without a git binary; the
    stale-stamp rule compares it against `git ls-tree` shas, so the two
    implementations must agree byte-for-byte."""
    import subprocess

    p = tmp_path / "blob.bin"
    p.write_bytes(b"stale-stamp probe \x00\xff\n")
    expect = subprocess.run(
        ["git", "hash-object", str(p)], capture_output=True, text=True, check=True
    ).stdout.strip()
    assert entrymod._git_blob_sha(str(p)) == expect
    assert entrymod._git_blob_sha(str(tmp_path / "missing")) is None


def test_stale_stamps_refront_on_module_change(tmp_path, monkeypatch):
    """Re-front-on-material-change (judge r05 task 3): a stamped query whose
    module blob sha no longer matches its recorded stamp-time sha is stale;
    matching shas and sidecar-absent names keep their stamp."""
    import json
    import sys
    import types

    mod_ok = tmp_path / "mod_ok.py"
    mod_ok.write_bytes(b"A = 1\n")
    mod_changed = tmp_path / "mod_changed.py"
    mod_changed.write_bytes(b"B = 2\n")

    for modname, path in (("_stale_ok", mod_ok), ("_stale_chg", mod_changed)):
        m = types.ModuleType(modname)
        m.__file__ = str(path)
        monkeypatch.setitem(sys.modules, modname, m)

    def fake_q(modname):
        def fn(spark, sf_dir):  # pragma: no cover - shape only
            raise NotImplementedError

        fn.__module__ = modname
        return fn

    monkeypatch.setattr(
        "datafusion_datasource_orc_spark.operators.QUERIES",
        {
            "q_unchanged": fake_q("_stale_ok"),
            "q_changed": fake_q("_stale_chg"),
            "q_unrecorded": fake_q("_stale_ok"),
        },
    )
    (tmp_path / "stamp_hashes.json").write_text(
        json.dumps(
            {
                "q_unchanged": {"round": 5, "blob": entrymod._git_blob_sha(str(mod_ok))},
                "q_changed": {"round": 5, "blob": "0" * 40},
                "q_gone_from_registry": {"round": 3, "blob": "1" * 40},
            }
        )
    )
    monkeypatch.setattr(entrymod.os.path, "dirname", lambda _: str(tmp_path))
    stale = entrymod._stale_stamps({"q_unchanged", "q_changed", "q_unrecorded"})
    assert stale == {"q_changed"}


def test_round_priority_names_are_registered():
    """A typo in _ROUND_PRIORITY silently no-ops (the list is filtered
    against the fresh pool), which would quietly demote a query this round
    meant to front — so every listed name must exist in the registry."""
    from datafusion_datasource_orc_spark.operators import QUERIES

    unknown = [n for n in entrymod._ROUND_PRIORITY if n not in QUERIES]
    assert not unknown, f"_ROUND_PRIORITY names not in registry: {unknown}"


def test_queries_order_fresh_then_stale_then_stamped():
    """Ordering contract over the REAL registry + committed artifacts:
    never-stamped first (first stamps outrank everything), then stale
    re-fronts (material change since stamp), then current stamps."""
    stamped = entrymod._driver_ledger()
    stale = entrymod._stale_stamps(stamped)
    tiers = [
        0 if n not in stamped else (1 if n in stale else 2)
        for n in entrymod.queries()
    ]
    assert tiers == sorted(tiers), "queries() must order fresh < stale < stamped"


def test_stamp_hashes_sidecar_is_current():
    """The committed sidecar must equal a rebuild over the artifact rounds it
    claims to cover (rounds newer than its max are tolerated — the driver
    writes its artifact before the builder can regenerate the sidecar)."""
    import json
    import os

    from tools.stamp_ledger import SIDECAR, build

    if not os.path.exists(SIDECAR):
        import pytest

        pytest.skip("no sidecar committed yet")
    with open(SIDECAR) as f:
        sidecar = json.load(f)
    max_round = max((r.get("round", 0) for r in sidecar.values()), default=0)
    assert sidecar == build(max_round=max_round), (
        "stamp_hashes.json is stale; run python tools/stamp_ledger.py"
    )


def test_every_registered_query_is_nontrivial_at_some_scale():
    """Judge r08 task 5: a 0-row hash match is a weak certificate. Every
    registered query must return >0 rows at at least one committed scale,
    as recorded in sweep_rows.json (written by
    `tools/check_oracles.py --rows-out <sf_dir>` during the per-round
    sweeps — table-driven off the sweep ledger, so the assertion tracks
    exactly what the sweeps measured, not a hand-maintained list)."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "sweep_rows.json")) as f:
        ledger = json.load(f)
    names = set(entrymod.queries())
    missing = sorted(names - set(ledger))
    assert not missing, (
        f"{len(missing)} queries have no recorded sweep row count "
        f"(e.g. {missing[:5]}); run tools/check_oracles.py --rows-out"
    )
    trivial = sorted(
        n for n in names if not any(v > 0 for v in ledger[n].values())
    )
    assert not trivial, (
        f"{len(trivial)} queries return 0 rows at every recorded scale: "
        f"{trivial} — extend the fixture (the multimodal_phash_neardup twin "
        "precedent) or tighten the query"
    )
