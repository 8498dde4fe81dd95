"""Behavioral tests for the round-9 operators, beyond the oracle gate:
cross-variant equivalences and structural invariants the hash comparison
can't articulate on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.sources.tables import load_table


class TestConnectedComponentsLsh:
    def test_lsh_clusters_equal_exact_clusters(self, spark, sf_dir):
        """The LSH edge generator must reach the SAME connected components
        as the exact-Jaccard generator at test scale (banding recall is
        100% there and precision is 1.0 by construction) — the equivalence
        the shared oracle certifies, pinned engine-side too."""
        from datafusion_datasource_orc_spark.operators.dedup import (
            dedup_connected_components,
            dedup_connected_components_lsh,
        )

        exact = {
            (r.cluster_id, r.members)
            for r in dedup_connected_components(spark, sf_dir).collect()
        }
        lsh = {
            (r.cluster_id, r.members)
            for r in dedup_connected_components_lsh(spark, sf_dir).collect()
        }
        assert exact == lsh and len(exact) > 0
        assert dedup_connected_components_lsh.last_converged


class TestSemanticDedup:
    def test_drop_manifest_invariants(self, spark, sf_dir):
        """Every drop row names a LOWER-id keeper in the SAME trained
        cluster at cosine >= threshold; a vector is dropped at most once;
        and the keeper is the MINIMUM qualifying lower id."""
        from datafusion_datasource_orc_spark.operators.semdedup import (
            SEMDEDUP_THRESHOLD,
            embedding_semantic_dedup,
        )
        from datafusion_datasource_orc_spark.operators.simsearch import (
            kmeans_train,
        )

        rows = embedding_semantic_dedup(spark, sf_dir).collect()
        assert rows, "fixture should contain semantic dups at every scale"
        assert all(r.kept_vec_id < r.drop_vec_id for r in rows)
        assert all(r.cosine >= SEMDEDUP_THRESHOLD for r in rows)
        drops = [r.drop_vec_id for r in rows]
        assert len(drops) == len(set(drops)), "a vector dropped twice"
        _, _, assigned = kmeans_train(spark, sf_dir)
        cid = {r.vec_id: r.cid for r in assigned.collect()}
        assert all(
            cid[r.drop_vec_id] == cid[r.kept_vec_id] == r.cluster_id
            for r in rows
        )


class TestSplitLeakage:
    def test_leaks_are_cross_split_near_dup_pairs(self, spark, sf_dir):
        """Every leak row crosses splits, carries the deterministic split
        of each endpoint, and is a member of the minhash near-dup pair set;
        the split assignment itself partitions the corpus."""
        from datafusion_datasource_orc_spark.operators.dedup import (
            dedup_minhash_lsh,
        )
        from datafusion_datasource_orc_spark.operators.split_leakage import (
            split_of,
            training_split_leakage,
        )

        leaks = training_split_leakage(spark, sf_dir).collect()
        assert leaks, "fixture plants near-dups; some must cross splits"
        assert all(r.split_a != r.split_b for r in leaks)
        pairs = {
            (r.doc_a, r.doc_b)
            for r in dedup_minhash_lsh(spark, sf_dir).collect()
        }
        assert {(r.doc_a, r.doc_b) for r in leaks} <= pairs

        docs = load_table(spark, sf_dir, "documents")
        sp = docs.select(split_of(F.col("doc_id")).alias("split"))
        dist = {r.split: r.n for r in sp.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(dist) <= {"train", "val", "test"}
        assert sum(dist.values()) == docs.count()
        # 80/10/10 within loose tolerance at 500+ docs
        total = sum(dist.values())
        assert dist.get("train", 0) / total > 0.7

        recomputed = {
            r.doc_id: r.split
            for r in docs.select(
                "doc_id", split_of(F.col("doc_id")).alias("split")
            ).collect()
        }
        assert all(
            recomputed[r.doc_a] == r.split_a and recomputed[r.doc_b] == r.split_b
            for r in leaks
        )


class TestCurriculumQuantiles:
    def test_phases_partition_the_corpus(self, spark, sf_dir):
        """The four phases partition the corpus exactly; score ranges are
        ordered and non-overlapping across phases; token/pack arithmetic
        is consistent."""
        from datafusion_datasource_orc_spark.operators.curriculum import (
            training_curriculum_quantiles,
        )

        rows = sorted(
            training_curriculum_quantiles(spark, sf_dir).collect(),
            key=lambda r: r.phase,
        )
        assert [r.phase for r in rows] == [1, 2, 3, 4]
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        assert sum(r.n_docs for r in rows) == docs.count()
        for a, b in zip(rows, rows[1:]):
            assert a.max_score <= b.min_score
        assert all(
            r.n_packs == (r.n_tokens + 2047) // 2048 and r.min_score <= r.max_score
            for r in rows
        )


class TestIngestTriage:
    def test_statuses_and_matches_are_consistent(self, spark, sf_dir):
        """Every incoming doc appears exactly once; exact_dup rows share an
        md5 with their matched existing doc (and name the minimum such);
        near_dup rows correspond to a cross-boundary minhash pair; new rows
        carry the sentinel match."""
        from datafusion_datasource_orc_spark.operators.dedup import (
            dedup_minhash_lsh,
        )
        from datafusion_datasource_orc_spark.operators.ingest_triage import (
            ingest_triage,
        )

        rows = ingest_triage(spark, sf_dir).collect()
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        incoming = {
            r.doc_id for r in docs.filter(F.col("doc_id") % 10 == 0).collect()
        }
        assert {r.doc_id for r in rows} == incoming and len(rows) == len(incoming)
        md5s = {
            r.doc_id: r.h
            for r in docs.select("doc_id", F.md5("text").alias("h")).collect()
        }
        pairs = {
            frozenset((r.doc_a, r.doc_b))
            for r in dedup_minhash_lsh(spark, sf_dir).collect()
        }
        for r in rows:
            if r.status == "new":
                assert r.match_doc_id == -1 and r.jaccard == 0.0
            elif r.status == "exact_dup":
                assert md5s[r.match_doc_id] == md5s[r.doc_id]
                assert r.match_doc_id % 10 != 0 and r.jaccard == 1.0
                better = [
                    d
                    for d, h in md5s.items()
                    if h == md5s[r.doc_id] and d % 10 != 0
                ]
                assert r.match_doc_id == min(better)
            else:
                assert r.status == "near_dup"
                assert r.match_doc_id % 10 != 0
                assert frozenset((r.doc_id, r.match_doc_id)) in pairs
