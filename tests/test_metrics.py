"""Metrics parity (reference src/metrics.rs tests, :220-318): row counters via
Observation, per-file stats, scan_efficiency math."""

from __future__ import annotations

import pytest

from datafusion_datasource_orc_spark.metrics import QueryMetrics, ScanMetrics, scan_efficiency
from datafusion_datasource_orc_spark.sources.metadata import directory_statistics
from datafusion_datasource_orc_spark.sources.tables import load_orc_table, orc_dir_for


def test_observation_row_counter(spark, sf_dir):
    sm = ScanMetrics()
    df = sm.observe(load_orc_table(spark, sf_dir, "lineitem"), "scan")
    m = sm.run("lineitem_scan", df)
    assert isinstance(m, QueryMetrics)
    assert m.row_count == 6000
    assert m.observed["scan"]["rows_decoded"] == 6000
    assert m.elapsed_sec > 0


def test_observation_bytes_counter(spark, sf_dir):
    from datafusion_datasource_orc_spark.operators.multimodal import with_payload
    from datafusion_datasource_orc_spark.sources.tables import load_table

    sm = ScanMetrics()
    df = sm.observe(with_payload(load_table(spark, sf_dir, "documents")), "pay", bytes_col="payload")
    m = sm.run("payload_scan", df)
    assert m.observed["pay"]["rows_decoded"] == 500
    assert m.observed["pay"]["bytes_scanned"] > 0


def test_scan_efficiency_math():
    # reference src/metrics.rs:203-217: ratio, None on unknown size
    assert scan_efficiency(50, 100) == 0.5
    assert scan_efficiency(0, 100) == 0.0
    assert scan_efficiency(10, 0) is None


def test_per_file_row_counts(spark, sf_dir):
    from datafusion_datasource_orc_spark.metrics import per_file_row_counts

    df = load_orc_table(spark, sf_dir, "orders")
    counts = per_file_row_counts(df)
    assert sum(counts.values()) == 1500
    assert all(p.endswith(".orc") or ".orc" in p for p in counts)


def test_per_file_metrics_labels(spark, sf_dir):
    # per-file granularity (the reference labels metrics per filename,
    # src/metrics.rs:128-201) — from footer stats
    d = orc_dir_for(spark, sf_dir, "orders")
    stats = directory_statistics(d)
    assert stats["num_rows"] == 1500
    for s in stats["files"]:
        assert s.path.startswith(d)
        assert s.num_stripes >= 1
        assert s.total_byte_size > 0
