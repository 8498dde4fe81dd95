"""Round-13 mechanics: sweep-evidence integrity (run-time module blobs +
scope meta, r12 ADVICE), the bounded tier-1.5 re-front, and the
duration-balanced sweep sharding."""

from __future__ import annotations

import json as _json


_OK = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "spark_rows": 5,
    "oracle_rows": 5,
    "err": None,
}


def _build_ledger(monkeypatch, artifacts, blobs, queries_mods):
    """Run tools.stamp_ledger.build over synthetic artifacts.

    artifacts: list of (round, kind, rows-dict); kind 0 = CORRECTNESS,
    kind 1 = SWEEP. blobs: {(commit, relpath): sha} for the legacy
    blob_at resolution. queries_mods: {query_name: module_relpath}."""
    import sys
    import types

    import tools.stamp_ledger as sl

    paths = {}
    for rnd, kind, rows in artifacts:
        name = ("CORRECTNESS_r%d.json" if kind == 0 else "SWEEP_r%d.json") % rnd
        paths[name] = rows

    def fake_rounds():
        out = []
        for rnd, kind, rows in artifacts:
            name = ("CORRECTNESS_r%d.json" if kind == 0 else "SWEEP_r%d.json") % rnd
            out.append((rnd, kind, name))
        return sorted(out)

    import builtins

    real_open = builtins.open

    def fake_open(path, *a, **kw):
        import io
        import os as _os

        base = _os.path.basename(str(path))
        if base in paths:
            return io.StringIO(_json.dumps(paths[base]))
        return real_open(path, *a, **kw)

    fake_queries = {}
    for i, (qname, relpath) in enumerate(queries_mods.items()):
        modname = f"_r13_{i}_{qname}"
        m = types.ModuleType(modname)
        m.__file__ = relpath
        monkeypatch.setitem(sys.modules, modname, m)

        def fn(spark, sf_dir):  # pragma: no cover
            raise NotImplementedError

        fn.__module__ = modname
        fake_queries[qname] = fn
    monkeypatch.setattr(
        "datafusion_datasource_orc_spark.operators.QUERIES", fake_queries
    )
    monkeypatch.setattr(
        sl.os.path,
        "relpath",
        lambda p, _repo: __import__("os").path.basename(p),
        raising=True,
    )
    monkeypatch.setattr(sl, "artifact_rounds", fake_rounds)
    monkeypatch.setattr(sl, "introducing_commit", lambda p: "c_" + p)
    monkeypatch.setattr(sl, "blob_at", lambda commit, rel: blobs.get((commit, rel)))
    monkeypatch.setattr("builtins.open", fake_open)
    return sl.build()


class TestSweepEvidenceIntegrity:
    def test_partial_sweep_grants_no_recert(self, monkeypatch):
        """r12 ADVICE: a --front/named-query/--shard run writes
        full_registry=false meta; the ledger must ignore it entirely —
        the driver's round-5 blob stays the record."""
        artifacts = [
            (5, 0, {"q": _OK}),
            (
                13,
                1,
                {
                    "__meta__": {"full_registry": False, "n_registry": 2, "n_run": 1},
                    "q": {**_OK, "module_blob": "sha_ran", "module": "m.py"},
                },
            ),
        ]
        blobs = {("c_CORRECTNESS_r5.json", "m.py"): "sha_r5"}
        records = _build_ledger(monkeypatch, artifacts, blobs, {"q": "m.py"})
        assert records["q"]["round"] == 5
        assert records["q"]["blob"] == "sha_r5"
        assert "evidence" not in records["q"]

    def test_full_sweep_certifies_the_blob_that_ran(self, monkeypatch):
        """The committed sweep's introducing commit may contain a
        POST-SWEEP edit of the module; the ledger must certify the
        run-time module_blob recorded in the sweep row, so the edited
        file correctly reads as stale."""
        artifacts = [
            (5, 0, {"q": _OK}),
            (
                13,
                1,
                {
                    "__meta__": {"full_registry": True, "n_registry": 1, "n_run": 1},
                    "q": {**_OK, "module_blob": "sha_ran", "module": "m.py"},
                },
            ),
        ]
        blobs = {
            ("c_CORRECTNESS_r5.json", "m.py"): "sha_r5",
            # the sweep's introducing commit holds DIFFERENT (post-edit)
            # bytes — the old blob_at path would have certified these
            ("c_SWEEP_r13.json", "m.py"): "sha_post_edit",
        }
        records = _build_ledger(monkeypatch, artifacts, blobs, {"q": "m.py"})
        assert records["q"]["round"] == 13
        assert records["q"]["evidence"] == "sweep"
        assert records["q"]["blob"] == "sha_ran", (
            "ledger certified the committed blob, not the one that ran"
        )

    def test_legacy_sweep_without_meta_keeps_old_resolution(self, monkeypatch):
        """SWEEP_r12.json predates the meta/module_blob format and was
        judge-adjudicated under the introducing-commit rule — grandfather
        it."""
        artifacts = [
            (5, 0, {"q": _OK}),
            (12, 1, {"q": _OK}),
        ]
        blobs = {
            ("c_CORRECTNESS_r5.json", "m.py"): "sha_r5",
            ("c_SWEEP_r12.json", "m.py"): "sha_r12",
        }
        records = _build_ledger(monkeypatch, artifacts, blobs, {"q": "m.py"})
        assert records["q"]["round"] == 12
        assert records["q"]["blob"] == "sha_r12"

    def test_sweep_out_records_meta_and_runtime_blobs(self, tmp_path):
        """End-to-end over the real registry, no Spark: a named-query
        check_oracles invocation must stamp full_registry=false and the
        CURRENT on-disk module blob into the sweep row."""
        import os
        import subprocess
        import sys

        out = tmp_path / "sweep_partial.json"
        # tokenizer-free pick: orc_count_star is the cheapest registered
        # query; the run still needs Spark, so instead exercise the
        # writer path pure-python by running the tool with a query that
        # exists — cost ~tens of seconds is acceptable once per suite.
        r = subprocess.run(
            [
                sys.executable,
                "tools/check_oracles.py",
                "--sweep-out",
                str(out),
                "/root/testdata/sf0.001",
                "orc_count_star",
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=600,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        rows = _json.loads(out.read_text())
        assert rows["__meta__"]["full_registry"] is False
        rec = rows["orc_count_star"]
        assert rec["hash_match"] is True
        assert rec["module"].startswith("datafusion_datasource_orc_spark/")
        assert isinstance(rec["module_blob"], str) and len(rec["module_blob"]) == 40
        assert rec["secs"] >= 0


class TestBoundedZeroRowRefront:
    def _stamps(self, monkeypatch, histories):
        """histories: {name: [spark_rows per round, oldest..newest]} —
        synthesize one CORRECTNESS artifact per round index."""
        import builtins
        import io
        import os as _os

        import __spark_entry__ as entry

        n_rounds = max(len(h) for h in histories.values())
        arts = []
        for r in range(n_rounds):
            rows = {}
            for name, h in histories.items():
                if r < len(h):
                    rows[name] = {**_OK, "spark_rows": h[r], "oracle_rows": h[r]}
            arts.append((f"CORRECTNESS_r{r + 1}.json", rows))
        paths = dict(arts)
        monkeypatch.setattr(
            entry, "_artifact_paths", lambda here: [p for p, _ in arts]
        )
        real_open = builtins.open

        def fake_open(path, *a, **kw):
            base = _os.path.basename(str(path))
            if base in paths:
                return io.StringIO(_json.dumps(paths[base]))
            return real_open(path, *a, **kw)

        monkeypatch.setattr("builtins.open", fake_open)
        return entry._zero_row_stamps()

    def test_single_zero_row_stamp_refronts(self, monkeypatch):
        got = self._stamps(monkeypatch, {"a": [3, 0], "b": [3, 3]})
        assert got == {"a"}

    def test_twice_confirmed_zero_exits_tier(self, monkeypatch):
        """r12 ADVICE: a 0-row stamp RE-confirmed 0-row by the next driver
        examination is by-nature-empty — it must stop occupying front
        gate-window slots."""
        got = self._stamps(monkeypatch, {"a": [0, 0], "b": [0]})
        assert got == {"b"}

    def test_nonzero_then_zero_refronts_again(self, monkeypatch):
        """A zero AFTER a nonzero certificate is fresh news (possible
        regression) — one re-front is warranted even if an older zero
        exists further back."""
        got = self._stamps(monkeypatch, {"a": [0, 4, 0]})
        assert got == {"a"}


class TestRecallAtK:
    def test_per_rung_recall_floors(self, spark, sf_dir):
        """The measured ladder order on isotropic fixtures (see
        operators/recall.py docstring): exact rung is 1.0 BY CONSTRUCTION
        (a miss means the harness, not the index, broke); near-lossless
        rungs stay high; every value is a valid ppm."""
        from datafusion_datasource_orc_spark.operators.recall import (
            simsearch_recall_at_k,
        )

        rows = {r.rung: r for r in simsearch_recall_at_k(spark, sf_dir).collect()}
        assert rows["simsearch_bruteforce"].recall_ppm == 1_000_000
        assert rows["simsearch_sq"].recall_ppm >= 900_000
        assert rows["simsearch_ivf_kmeans"].recall_ppm >= 900_000
        assert rows["simsearch_mips_banded"].recall_ppm >= 500_000
        assert rows["simsearch_ivf"].recall_ppm >= 300_000
        for r in rows.values():
            assert 0 <= r.recall_ppm <= 1_000_000
            assert r.hits <= r.n_queries * r.k
            # exact integer arithmetic: ppm is reproducible from the parts
            assert r.recall_ppm == r.hits * 1_000_000 // (r.n_queries * r.k)
        assert len(rows) == 8

    def test_exact_topk_is_bruteforce(self, spark, sf_dir):
        """_exact_topk('cos', q<1, k=10) must equal the registered
        simsearch_bruteforce neighbor set — the reference the whole
        evaluation stands on."""
        from datafusion_datasource_orc_spark.operators.recall import _exact_topk
        from datafusion_datasource_orc_spark.operators.simsearch import (
            TOP_K,
            simsearch_bruteforce,
        )
        from datafusion_datasource_orc_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        got = {
            r.vec_id for r in _exact_topk(emb, 1, TOP_K, "cos").collect()
        }
        want = {r.vec_id for r in simsearch_bruteforce(spark, sf_dir).collect()}
        assert got == want


class TestSemdedupBanded:
    def test_banded_drops_subset_of_allpairs_truth(self, spark, sf_dir):
        """Banding may MISS pairs (probabilistic recall, documented) but can
        never invent one: every (drop, kept, cosine) row must appear in the
        exhaustive all-pairs keep-lowest manifest computed directly."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from datafusion_datasource_orc_spark.functions.vectors import (
            cosine_similarity,
        )
        from datafusion_datasource_orc_spark.operators.semdedup import (
            SEMDEDUP_THRESHOLD,
        )
        from datafusion_datasource_orc_spark.operators.semdedup_banded import (
            embedding_semdedup_banded,
        )
        from datafusion_datasource_orc_spark.sources.tables import load_table

        got = {
            (r.drop_vec_id, r.cosine)
            for r in embedding_semdedup_banded(spark, sf_dir).collect()
        }
        assert got, "gate-scale manifest must be non-empty"
        emb = load_table(spark, sf_dir, "embeddings")
        a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
        cos = F.round(cosine_similarity(F.col("ea"), F.col("eb")), 6)
        allq = (
            a.join(b, F.col("va") < F.col("vb"))
            .select("va", "vb", cos.alias("c"))
            .filter(F.col("c") >= SEMDEDUP_THRESHOLD)
        )
        # all-pairs qualifying (drop, cosine-of-lowest-kept) truth
        w = Window.partitionBy("vb").orderBy("va")
        truth = {
            (r.vb, r.c)
            for r in allq.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .collect()
        }
        # a banded drop row's kept may be a HIGHER-id candidate than the
        # all-pairs lowest (if banding missed the lowest), so compare on
        # the drop ids against the full qualifying-pair truth instead
        truth_drops = {r.vb for r in allq.select("vb").distinct().collect()}
        assert {d for d, _ in got} <= truth_drops
        # and where banding found the SAME kept, the cosine must agree
        agree = got & truth
        assert agree, "banding found none of the all-pairs keep rows"

    def test_recall_on_near_identical_pairs(self, spark, sf_dir):
        """The SemDeDup regime is near-identical embeddings: for qualifying
        pairs at cosine >= 0.55 (p_plane ~ 0.70 on this isotropic fixture),
        banding must catch a clear majority at gate scale."""
        from pyspark.sql import functions as F

        from datafusion_datasource_orc_spark.functions.vectors import (
            cosine_similarity,
        )
        from datafusion_datasource_orc_spark.operators.semdedup_banded import (
            embedding_semdedup_banded,
        )
        from datafusion_datasource_orc_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
        cos = F.round(cosine_similarity(F.col("ea"), F.col("eb")), 6)
        tight = (
            a.join(b, F.col("va") < F.col("vb"))
            .select("va", "vb", cos.alias("c"))
            .filter(F.col("c") >= 0.55)
            .collect()
        )
        if not tight:
            return  # no near-identical pairs at this scale — nothing to pin
        dropped = {
            r.drop_vec_id for r in embedding_semdedup_banded(spark, sf_dir).collect()
        }
        caught = sum(1 for r in tight if r.vb in dropped)
        assert caught / len(tight) >= 0.5, (caught, len(tight))


class TestBpeVocab:
    def test_vocab_counts_reconcile_with_encode(self, spark, sf_dir):
        """SUM(n_occurrences) over the vocabulary must equal
        SUM(bpe_tokens) over the encode manifest — the two artifacts count
        the SAME symbol stream (shared bpe_word_seqs trajectory), grouped
        differently."""
        from pyspark.sql import functions as F

        from datafusion_datasource_orc_spark.operators.bpe_apply import (
            tokenizer_bpe_encode,
        )
        from datafusion_datasource_orc_spark.operators.bpe_vocab import (
            tokenizer_bpe_vocab,
        )

        vocab = tokenizer_bpe_vocab(spark, sf_dir)
        total_vocab = vocab.agg(F.sum("n_occurrences")).collect()[0][0]
        total_encode = (
            tokenizer_bpe_encode(spark, sf_dir).agg(F.sum("bpe_tokens")).collect()[0][0]
        )
        assert total_vocab == total_encode
        rows = vocab.collect()
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1)), "rank must be dense"
        assert any(r.is_merged for r in rows), "no merged symbol survived"
        syms = [r.sym for r in rows]
        assert len(set(syms)) == len(syms)


class TestCurationManifest:
    def test_selection_is_intersection_of_component_keeps(self, spark, sf_dir):
        """Every manifest row must be kept by ALL THREE imported components,
        and no doc kept by all three may be missing — the manifest is
        exactly the intersection."""
        from pyspark.sql import functions as F

        from datafusion_datasource_orc_spark.operators.curation import (
            curation_manifest,
        )
        from datafusion_datasource_orc_spark.operators.dsir import dsir_scores
        from datafusion_datasource_orc_spark.operators.extras import (
            dedup_keep_canonical,
        )

        got = {r.doc_id: r for r in curation_manifest(spark, sf_dir).collect()}
        assert got, "gate-scale manifest must be non-empty"
        ds = {r.doc_id: r for r in dsir_scores(spark, sf_dir).collect()}
        canon = {
            r.doc_id
            for r in dedup_keep_canonical(spark, sf_dir).collect()
            if r.canonical_id == r.doc_id
        }
        for doc_id, r in got.items():
            assert ds[doc_id].keep, doc_id
            assert ds[doc_id].s == r.dsir_weight_micro
            assert doc_id in canon, doc_id
            assert r.quality_micro > 0
        # the intersection is a strict subset of each leg (the filters all
        # bind at gate scale — a vacuous leg would mean a broken fixture)
        kept_dsir = {d for d, r in ds.items() if r.keep}
        assert set(got) < kept_dsir
        assert set(got) < canon

    def test_source_rollup_reconciles_with_manifest(self, spark, sf_dir):
        """The per-source rollup must be EXACTLY the manifest grouped —
        same doc counts, token sums, and score mass per source."""
        from collections import defaultdict

        from datafusion_datasource_orc_spark.operators.curation import (
            curation_manifest,
        )
        from datafusion_datasource_orc_spark.operators.curation_rollup import (
            curation_source_rollup,
        )

        want = defaultdict(lambda: [0, 0, 0, 0])
        for r in curation_manifest(spark, sf_dir).collect():
            w = want[r.source]
            w[0] += 1
            w[1] += r.tokens
            w[2] += r.quality_micro
            w[3] += r.dsir_weight_micro
        got = {
            r.source: [
                r.n_selected,
                r.sel_tokens,
                r.sum_quality_micro,
                r.sum_dsir_weight_micro,
            ]
            for r in curation_source_rollup(spark, sf_dir).collect()
        }
        assert got == dict(want)


class TestSweepScheduling:
    def test_shard_split_is_disjoint_and_complete(self):
        """--shard I/K must partition the query set exactly (greedy LPT
        over recorded durations) — replicated here against the same
        algorithm to pin the contract."""
        secs = {"a": 100.0, "b": 50.0, "c": 40.0, "d": 30.0, "e": 1.0}
        names = ["a", "b", "c", "d", "e", "new1"]
        ordered = sorted(names, key=lambda n: (n in secs, -secs.get(n, 60.0), n))
        assert ordered[0] == "new1"  # unknown-duration queries first
        k = 2
        loads = [0.0] * k
        shards = [[] for _ in range(k)]
        for n in ordered:
            tgt = loads.index(min(loads))
            loads[tgt] += secs.get(n, 60.0)
            shards[tgt].append(n)
        assert sorted(shards[0] + shards[1]) == sorted(names)
        assert not (set(shards[0]) & set(shards[1]))
        # LPT keeps the split balanced within the largest single item
        assert abs(loads[0] - loads[1]) <= 100.0
