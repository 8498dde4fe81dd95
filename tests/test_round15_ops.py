"""Round-15 optimization mechanism tests: the bounded-gather routing in
embedding_semdedup_banded / embedding_semantic_dedup (r14 VERDICT "what's
wrong" #1 — a degenerate bucket/cluster must never materialize an
unbounded collect_list row).

Both helpers are exercised at a tiny pair_cap with a degenerate group at
2× the cap (the VERDICT's prescribed mechanism case: all-identical
embeddings), so the over-cap path actually runs — at the shipped cap the
test fixtures never exceed it (asserted for the LSH buckets in
tests/test_pipeline.py), which is exactly why the routing needs its own
mechanism test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.functions.vectors import l2_norm


def _vec(i: int, dims: int = 4) -> list[float]:
    """Deterministic distinct unit-ish vectors (no RNG)."""
    return [float((i * 7 + d * 3) % 11 + 1) for d in range(dims)]


class TestBandedBoundedGather:
    def _bands_df(self, spark, rows):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, band int, bh int"
        )
        return df.select(
            "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm"),
            "band", "bh",
        )

    def test_overcap_bucket_takes_star_path_undercap_all_pairs(self, spark):
        from datafusion_datasource_orc_spark.operators.semdedup_banded import (
            _banded_verified_pairs,
        )

        cap = 8
        # degenerate bucket: 2× cap IDENTICAL embeddings in one bucket
        # (identical signature is exactly how a real degenerate bucket
        # forms); plus one under-cap bucket of 4 distinct members.
        same = [1.0, 2.0, 2.0, 4.0]
        rows = [(i, same, 0, 3) for i in range(2 * cap)]
        rows += [(100 + i, _vec(i), 1, 5) for i in range(4)]
        pairs = {
            (r.vec_a, r.vec_b): r.cosine
            for r in _banded_verified_pairs(
                self._bands_df(spark, rows), pair_cap=cap
            ).collect()
        }
        # over-cap bucket: STAR pairs only — (min member, every other)
        star_expected = {(0, b) for b in range(1, 2 * cap)}
        got_star = {p for p in pairs if p[0] == 0 or p[1] == 0}
        assert got_star == star_expected
        for p in star_expected:
            assert pairs[p] == 1.0  # identical vectors
        # no non-star pair from the degenerate bucket leaked through
        assert not any(
            a < 100 and b < 100 and a != 0 for (a, b) in pairs
        )
        # under-cap bucket: ALL qualifying ordered pairs (τ = 0.4 keeps
        # these near-parallel positive vectors)
        small = {p for p in pairs if p[0] >= 100}
        assert small == {
            (100 + i, 100 + j) for i in range(4) for j in range(i + 1, 4)
        }

    def test_exactly_at_cap_still_expands_all_pairs(self, spark):
        from datafusion_datasource_orc_spark.operators.semdedup_banded import (
            _banded_verified_pairs,
        )

        cap = 4
        same = [3.0, 1.0, 2.0, 1.0]
        rows = [(i, same, 2, 7) for i in range(cap)]  # width == cap
        pairs = {
            (r.vec_a, r.vec_b)
            for r in _banded_verified_pairs(
                self._bands_df(spark, rows), pair_cap=cap
            ).collect()
        }
        assert pairs == {(i, j) for i in range(cap) for j in range(i + 1, cap)}


class TestClusteredBoundedGather:
    def _members_df(self, spark, rows):
        df = spark.createDataFrame(
            rows, "cid int, vec_id long, embedding array<double>"
        )
        return df.select(
            "cid", "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
        )

    @pytest.mark.parametrize("width", [16, 17])  # 2× cap, and non-multiple
    def test_chunked_equals_unchunked_all_pairs(self, spark, width):
        """The clustered contract is ALL C(w,2) pairs — the chunked
        over-cap path must emit exactly the set the single-gather path
        emits, each pair once, with identical cosines."""
        from datafusion_datasource_orc_spark.operators.semdedup import (
            _clustered_verified_pairs,
        )

        cap = 8
        rows = [(0, i, _vec(i)) for i in range(width)]  # over-cap cluster
        rows += [(1, 200 + i, _vec(i + 3)) for i in range(5)]  # small cluster
        m = self._members_df(spark, rows)
        chunked = sorted(
            (r.cluster_id, r.vec_a, r.vec_b, r.cosine)
            for r in _clustered_verified_pairs(m, pair_cap=cap).collect()
        )
        unchunked = sorted(
            (r.cluster_id, r.vec_a, r.vec_b, r.cosine)
            for r in _clustered_verified_pairs(m, pair_cap=10**6).collect()
        )
        assert chunked == unchunked
        # every pair exactly once (no duplicate orientations from the
        # two-direction cross-chunk expansion)
        keys = [(c, a, b) for (c, a, b, _) in chunked]
        assert len(keys) == len(set(keys))

    def test_degenerate_identical_cluster_at_twice_cap(self, spark):
        """The VERDICT mechanism case: one cluster of all-identical
        embeddings at 2× cap → all C(2cap, 2) pairs at cosine 1.0."""
        from datafusion_datasource_orc_spark.operators.semdedup import (
            _clustered_verified_pairs,
        )

        cap = 8
        same = [2.0, 1.0, 0.5, 1.5]
        rows = [(7, i, same) for i in range(2 * cap)]
        out = _clustered_verified_pairs(
            self._members_df(spark, rows), pair_cap=cap
        ).collect()
        n = 2 * cap
        assert len(out) == n * (n - 1) // 2
        assert {(r.vec_a, r.vec_b) for r in out} == {
            (i, j) for i in range(n) for j in range(i + 1, n)
        }
        assert all(r.cosine == 1.0 for r in out)
