"""Invariants for the round-8 family extensions (the oracle gate proves
engine equivalence; these pin the SEMANTIC contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.sources.tables import load_table


class TestContainment:
    def test_directional_and_bounded(self, spark, sf_dir):
        """Exact-duplicate pairs must appear in BOTH directions with
        containment 1.0; every row respects the threshold and bounds."""
        from datafusion_datasource_orc_spark.operators.containment import (
            CONTAIN_DEN,
            CONTAIN_MIN_SHINGLES,
            CONTAIN_NUM,
            dedup_containment,
        )

        rows = dedup_containment(spark, sf_dir).collect()
        assert rows, "testdata plants duplicate docs"
        pairs = {(r.doc_a, r.doc_b) for r in rows}
        for r in rows:
            assert r.doc_a != r.doc_b
            assert r.n_a >= CONTAIN_MIN_SHINGLES
            assert CONTAIN_DEN * r.n_shared >= CONTAIN_NUM * r.n_a
            assert 0 < r.containment <= 1.0 + 1e-12
        # exact dups (same text) are mutually contained: both directions
        docs = load_table(spark, sf_dir, "documents")
        dup = (
            docs.groupBy("text")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.col("ids")[0].alias("a"), F.col("ids")[1].alias("b"))
            .first()
        )
        if dup:  # only if the slice plants an exact dup with >= 5 shingles
            both = (dup.a, dup.b) in pairs and (dup.b, dup.a) in pairs
            neither = (dup.a, dup.b) not in pairs and (dup.b, dup.a) not in pairs
            assert both or neither  # symmetric for identical shingle sets
            if both:
                c = {(r.doc_a, r.doc_b): r.containment for r in rows}
                assert c[(dup.a, dup.b)] == 1.0 and c[(dup.b, dup.a)] == 1.0

    def test_asymmetry_vs_jaccard(self, spark, sf_dir):
        """The reason this operator exists: synthetic small-in-big embedding
        has containment 1.0 but Jaccard well under the 0.5 dedup threshold."""
        from datafusion_datasource_orc_spark.operators.containment import (
            dedup_containment,
        )
        from datafusion_datasource_orc_spark.operators.dedup import load_table as _  # noqa: F401

        small = "alpha beta gamma delta epsilon zeta eta theta"
        big = small + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(30))
        docs = spark.createDataFrame(
            [(1, small, "s", len(small)), (2, big, "s", len(big))],
            "doc_id long, text string, source string, n_chars long",
        )
        import tempfile

        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {(r.doc_a, r.doc_b): r.containment for r in dedup_containment(spark, d).collect()}
        assert out.get((1, 2)) == 1.0  # small fully contained in big
        assert (2, 1) not in out  # big not contained in small


class TestEwma:
    def test_window_bounds_and_exactness(self, spark, sf_dir):
        from datafusion_datasource_orc_spark.operators.ewma import (
            EWMA_WINDOW,
            events_ewma_smooth,
        )

        rows = events_ewma_smooth(spark, sf_dir).collect()
        assert rows
        for r in rows[:500]:
            assert 1 <= r.n_window <= EWMA_WINDOW
            assert r.denom == 2**r.n_window - 1
            # ewma is exactly the two-division sequence of the integers
            assert r.ewma == r.numer / r.denom / 100
        # first event per user has window 1: ewma == value
        ev = load_table(spark, sf_dir, "events")
        first = (
            ev.groupBy("user_id").agg(F.min("event_id").alias("event_id")).collect()
        )
        firsts = {(r.user_id, r.event_id) for r in first}
        vals = {
            (r.user_id, r.event_id): r.value
            for r in ev.select("user_id", "event_id", "value").collect()
        }
        for r in rows:
            if (r.user_id, r.event_id) in firsts:
                assert r.n_window == 1
                assert abs(r.ewma - round(vals[(r.user_id, r.event_id)] * 100) / 100) < 1e-9

    def test_recency_weighting(self, spark):
        """A spike in the MOST RECENT event moves the EWMA more than the
        same spike 7 events back — the defining property."""
        import tempfile

        from datafusion_datasource_orc_spark.operators.ewma import events_ewma_smooth

        base = [(i, f"2024-01-01 00:0{i}:00", 1, "t", 1.0, "{}") for i in range(8)]
        spike_recent = [list(r) for r in base]
        spike_recent[7][4] = 100.0
        spike_old = [list(r) for r in base]
        spike_old[0][4] = 100.0
        d = tempfile.mkdtemp()
        for tag, data in (("recent", spike_recent), ("old", spike_old)):
            df = spark.createDataFrame(
                [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in data],
                "event_id long, ts string, user_id long, event_type string, value double, props string",
            ).withColumn("ts", F.to_timestamp("ts"))
            df.write.mode("overwrite").parquet(f"{d}/{tag}/events.parquet")
        last = lambda p: [  # noqa: E731
            r.ewma
            for r in events_ewma_smooth(spark, f"{d}/{p}").collect()
            if r.event_id == 7
        ][0]
        assert last("recent") > last("old") > 1.0
