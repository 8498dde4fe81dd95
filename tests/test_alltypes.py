"""Type-system parity: recreate the reference's fixtures and golden-test the
ORC roundtrip through Spark.

- alltypes: 11 rows x 12 cols, NULL first/last rows, type extremes, ±inf,
  decimal(15,5), unicode CJK + emoji, dates 1582-10-15..9999-12-31, and a
  TIMESTAMP column with sub-second precision — the reference doc-claims
  TIMESTAMP support (src/lib.rs:153) but ships no fixture for it; this
  roundtrip + pushed timestamp predicate closes that type-table row
  (FIXTURES.md A1; reference goldens tests/basic_reading.rs:192, :259-275).
- map_list: map/list/struct nested types (FIXTURES.md A2,
  tests/basic_reading.rs:233, :402-410).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

ALLTYPES_SCHEMA = T.StructType(
    [
        T.StructField("boolean", T.BooleanType()),
        T.StructField("int8", T.ByteType()),
        T.StructField("int16", T.ShortType()),
        T.StructField("int32", T.IntegerType()),
        T.StructField("int64", T.LongType()),
        T.StructField("float32", T.FloatType()),
        T.StructField("float64", T.DoubleType()),
        T.StructField("decimal", T.DecimalType(15, 5)),
        T.StructField("binary", T.BinaryType()),
        T.StructField("utf8", T.StringType()),
        T.StructField("date32", T.DateType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_NULL = Row(*[None] * 12)


def _ts(y, mo, dy, h=0, m=0, s=0, us=0):
    return datetime.datetime(y, mo, dy, h, m, s, us)


def _alltypes_rows():
    d = datetime.date
    return [
        tuple(_NULL),
        (True, 0, 0, 0, 0, 0.0, 0.0, Decimal("0.00000"), b"\x00", "", d(1970, 1, 1),
         _ts(1970, 1, 1)),
        (False, 1, 1, 1, 1, 1.0, 1.0, Decimal("1.00000"), b"a", "a", d(1970, 1, 2),
         _ts(1970, 1, 2, 0, 0, 1)),
        (True, -1, -1, -1, -1, -1.0, -1.0, Decimal("-1.00000"), b"b", "b", d(1969, 12, 31),
         _ts(1969, 12, 31, 23, 59, 59)),
        (
            False, 127, 32767, 2**31 - 1, 2**63 - 1, float("inf"), float("inf"),
            Decimal("123456789.12345"), b"max", "max", d(9999, 12, 31),
            _ts(2262, 4, 11, 23, 47, 16, 854775),
        ),
        (
            True, -128, -32768, -(2**31), -(2**63), float("-inf"), float("-inf"),
            Decimal("-999999999.99999"), b"min", "min", d(1582, 10, 15),
            _ts(1900, 1, 1),
        ),
        (
            False, 3, 3, 3, 3, 3.1415927, 3.141592653589793,
            Decimal("3.14159"), b"pi", "pi", d(2024, 3, 14),
            _ts(2024, 3, 14, 15, 9, 26, 535898),
        ),
        (True, 10, 10, 10, 10, 1.5, 1.5, Decimal("1.50000"), b"\xde\xad", "大熊和奏", d(2020, 1, 1),
         _ts(2020, 1, 1, 12, 0, 0, 1)),
        (False, 11, 11, 11, 11, 2.5, 2.5, Decimal("2.50000"), b"\xbe\xef", "斉藤朱夏", d(2021, 6, 15),
         _ts(2021, 6, 15, 6, 30, 0, 500000)),
        (True, 12, 12, 12, 12, -2.5, -2.5, Decimal("-2.50000"), b"ok", "鈴原希実🤔", d(2022, 12, 31),
         _ts(2022, 12, 31, 23, 59, 59, 999999)),
        tuple(_NULL),
    ]


@pytest.fixture(scope="module")
def alltypes_orc(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("alltypes") / "alltypes_orc")
    df = spark.createDataFrame(_alltypes_rows(), ALLTYPES_SCHEMA)
    df.coalesce(1).write.mode("overwrite").option("compression", "snappy").orc(path)
    return path


class TestAlltypesRoundtrip:
    def test_schema_preserved(self, spark, alltypes_orc):
        back = spark.read.orc(alltypes_orc)
        assert back.schema == ALLTYPES_SCHEMA  # golden: basic_reading.rs:192

    def test_full_scan_golden(self, spark, alltypes_orc):
        # full-table-scan golden of all 11 rows (basic_reading.rs:259-277)
        back = spark.read.orc(alltypes_orc).orderBy(F.col("int8").asc_nulls_first(), "utf8")
        rows = back.collect()
        assert len(rows) == 11
        assert rows[0].int8 is None and rows[1].int8 is None  # NULL rows
        by_utf8 = {r.utf8: r for r in rows if r.utf8 is not None}
        assert by_utf8["max"].int64 == 2**63 - 1
        assert by_utf8["min"].int64 == -(2**63)
        assert math.isinf(by_utf8["max"].float32)
        assert by_utf8["min"].float32 == float("-inf")
        assert by_utf8["max"].decimal == Decimal("123456789.12345")
        assert by_utf8["min"].date32 == datetime.date(1582, 10, 15)
        assert by_utf8["max"].date32 == datetime.date(9999, 12, 31)
        assert "鈴原希実🤔" in by_utf8  # unicode golden (basic_reading.rs:772-794)

    def test_null_filters(self, spark, alltypes_orc):
        # NULL-only filters (basic_reading.rs:656-675)
        back = spark.read.orc(alltypes_orc)
        assert back.filter(F.col("int32").isNull()).count() == 2
        assert back.filter(F.col("int32").isNotNull()).count() == 9

    def test_decimal_precision_filter(self, spark, alltypes_orc):
        # decimal golden (basic_reading.rs:743-770); Spark pushes decimals
        # exactly — improvement over the reference's lossy f64 conversion
        # (src/predicate.rs:224-237)
        back = spark.read.orc(alltypes_orc)
        got = back.filter(F.col("decimal") == Decimal("3.14159")).collect()
        assert len(got) == 1 and got[0].utf8 == "pi"

    def test_extreme_value_predicates(self, spark, alltypes_orc):
        back = spark.read.orc(alltypes_orc)
        assert back.filter(F.col("int64") == 2**63 - 1).count() == 1
        assert back.filter(F.col("float64") == float("inf")).count() == 1
        assert back.filter(F.col("date32") == datetime.date(9999, 12, 31)).count() == 1

    def test_unicode_equality_filter(self, spark, alltypes_orc):
        back = spark.read.orc(alltypes_orc)
        assert back.filter(F.col("utf8") == "大熊和奏").count() == 1

    def test_timestamp_roundtrip_microseconds(self, spark, alltypes_orc):
        # TIMESTAMP with sub-second (µs) precision survives the ORC
        # roundtrip bit-exactly (reference doc-claim src/lib.rs:153)
        back = spark.read.orc(alltypes_orc)
        by_utf8 = {r.utf8: r for r in back.collect() if r.utf8 is not None}
        assert by_utf8["pi"].ts == _ts(2024, 3, 14, 15, 9, 26, 535898)
        assert by_utf8["鈴原希実🤔"].ts == _ts(2022, 12, 31, 23, 59, 59, 999999)
        assert by_utf8["b"].ts == _ts(1969, 12, 31, 23, 59, 59)  # pre-epoch
        nulls = [r for r in back.collect() if r.utf8 is None]
        assert all(r.ts is None for r in nulls)

    def test_timestamp_predicate_pushed_and_correct(self, spark, alltypes_orc):
        from datafusion_datasource_orc_spark.plans import pushed_filters

        back = spark.read.orc(alltypes_orc)
        cutoff = _ts(2021, 1, 1)
        q = back.filter(F.col("ts") > cutoff)
        pushed = pushed_filters(q)
        assert any("ts" in p for p in pushed), f"timestamp filter not pushed: {pushed}"
        got = {r.utf8 for r in q.collect()}
        assert got == {"max", "pi", "斉藤朱夏", "鈴原希実🤔"}
        # equality on a µs-precision value also pushes and matches exactly one
        eq = back.filter(F.col("ts") == _ts(2020, 1, 1, 12, 0, 0, 1))
        assert any("ts" in p for p in pushed_filters(eq))
        assert [r.utf8 for r in eq.collect()] == ["大熊和奏"]

    @pytest.mark.parametrize(
        "unit,value",
        [
            # the reference converts predicate literals from ALL FOUR
            # timestamp units into the scan's comparable domain
            # (src/predicate.rs:218-221: TimestampSecond/Millisecond/
            # Microsecond/Nanosecond → Int64); Spark's comparable domain is
            # µs, so each unit's literal is expressed as its epoch count and
            # floor-converted — the same normalization, same fixture.
            ("s", 1623738600),  # 2021-06-15T06:30:00 — includes the .5s row
            ("ms", 1672531199999),  # 2022-12-31T23:59:59.999 — .999999 row
            ("us", 1577880000000001),  # 2020-01-01T12:00:00.000001 exactly
            ("ns", 1577880000000001499),  # ns literal floors to the µs above
        ],
    )
    def test_timestamp_predicate_pushed_at_every_unit(
        self, spark, alltypes_orc, unit, value
    ):
        from datafusion_datasource_orc_spark.plans import pushed_filters

        scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        micros = value * 10**6 // scale  # floor into Spark's µs domain
        cutoff = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=micros
        )
        back = spark.read.orc(alltypes_orc)
        q = back.filter(F.col("ts") >= cutoff)
        pushed = pushed_filters(q)
        assert any("ts" in p for p in pushed), f"{unit} filter not pushed: {pushed}"
        got = {r.utf8 for r in q.collect()}
        # parity oracle: the same predicate applied row-at-a-time in Python
        want = {
            r.utf8
            for r in back.collect()
            if r.ts is not None and r.ts >= cutoff
        }
        assert got == want and got, (unit, got, want)


MAP_LIST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
        T.StructField("l", T.ArrayType(T.StringType())),
        T.StructField("s", T.StringType()),
    ]
)


class TestMapList:
    def test_map_list_roundtrip(self, spark, tmp_path):
        # map_list fixture golden (basic_reading.rs:402-410)
        path = str(tmp_path / "map_list_orc")
        df = spark.createDataFrame(
            [(1, {"one": "1", "zero": "0"}, ["test", "blaze"], "blaze")], MAP_LIST_SCHEMA
        )
        df.write.mode("overwrite").option("compression", "snappy").orc(path)
        back = spark.read.orc(path)
        assert back.schema == MAP_LIST_SCHEMA
        row = back.collect()[0]
        assert row.id == 1
        assert row.m == {"one": "1", "zero": "0"}
        assert row.l == ["test", "blaze"]
        assert row.s == "blaze"

    def test_nested_struct_roundtrip(self, spark, tmp_path):
        # STRUCT is README-⏳ in the reference (README.md:113) — works here
        path = str(tmp_path / "struct_orc")
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "nested",
                    T.StructType(
                        [
                            T.StructField("a", T.IntegerType()),
                            T.StructField("b", T.StringType()),
                        ]
                    ),
                ),
            ]
        )
        df = spark.createDataFrame([(1, (7, "x"))], schema)
        df.write.mode("overwrite").orc(path)
        row = spark.read.orc(path).collect()[0]
        assert row.nested.a == 7 and row.nested.b == "x"

    def test_nested_field_projection_prunes(self, spark, tmp_path):
        from datafusion_datasource_orc_spark.plans import read_schema_columns

        path = str(tmp_path / "struct_prune_orc")
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "nested",
                    T.StructType(
                        [
                            T.StructField("a", T.IntegerType()),
                            T.StructField("b", T.StringType()),
                        ]
                    ),
                ),
            ]
        )
        spark.createDataFrame([(1, (7, "x"))], schema).write.mode("overwrite").orc(path)
        df = spark.read.orc(path).select("nested.a")
        schemas = read_schema_columns(df)
        # nested schema pruning: only nested.a read, not nested.b
        assert schemas and schemas[0] == ["nested"]


class TestSchemaMerge:
    def test_merge_schema_across_files(self, spark, tmp_path):
        # A3: multi-file schema merge (src/file_format.rs:137-162);
        # Spark: mergeSchema option / spark.sql.orc.mergeSchema
        p = str(tmp_path / "merged")
        spark.createDataFrame([(1, "a")], ["id", "x"]).write.orc(f"{p}/part1")
        spark.createDataFrame([(2, 3.5)], ["id", "y"]).write.orc(f"{p}/part2")
        merged = (
            spark.read.option("mergeSchema", "true")
            .option("recursiveFileLookup", "true")
            .orc(p)
        )
        assert set(merged.columns) == {"id", "x", "y"}
        rows = {r.id: r for r in merged.collect()}
        assert rows[1].x == "a" and rows[1].y is None
        assert rows[2].y == 3.5 and rows[2].x is None


class TestFooterStatsAllTypes:
    def test_footer_statistics_across_the_full_type_table(self, spark, alltypes_orc):
        """sources/orcfooter against the alltypes fixture: every statistic
        kind the type table produces — int (3 widths + int64 extremes),
        double (±inf), decimal (string min/max), string (unicode), date
        (epoch days), bool/binary (counted, no min/max) — parsed from the
        Spark-written footer and checked against the known fixture values,
        NULL rows reflected in num_values/has_null."""
        import datetime
        import glob as _glob

        from datafusion_datasource_orc_spark.sources.orcfooter import (
            read_column_statistics,
        )

        f = [p for p in _glob.glob(alltypes_orc + "/*") if p.endswith(".orc") or "part-" in p]
        f = [p for p in f if not p.endswith(".crc") and "_SUCCESS" not in p]
        meta = read_column_statistics(f[0])
        assert meta["num_rows"] == 11
        st = meta["stats"]
        # 9 non-null rows everywhere; NULL first/last rows must show up
        for c in ("int8", "int64", "float64", "decimal", "utf8", "date32"):
            assert st[c]["num_values"] == 9, c
            assert st[c]["has_null"] is True, c
        assert (st["int8"]["kind"], st["int8"]["min"], st["int8"]["max"]) == (
            "int", -128, 127
        )
        assert (st["int64"]["min"], st["int64"]["max"]) == (-(2**63), 2**63 - 1)
        assert st["float64"]["kind"] == "double"
        assert st["float64"]["min"] == float("-inf")
        assert st["float64"]["max"] == float("inf")
        # decimal stats are decimal STRINGS per the spec
        assert st["decimal"]["kind"] == "decimal"
        assert float(st["decimal"]["min"]) == -999999999.99999
        assert float(st["decimal"]["max"]) == 123456789.12345
        assert (st["utf8"]["kind"], st["utf8"]["min"]) == ("string", "")
        assert st["utf8"]["max"] == "鈴原希実🤔"  # max under UTF-8 byte order
        # date stats are epoch DAYS (sint32); 1582-10-15 is pre-epoch
        assert st["date32"]["kind"] == "date"
        epoch = datetime.date(1970, 1, 1)
        assert st["date32"]["min"] == (datetime.date(1582, 10, 15) - epoch).days
        assert st["date32"]["max"] == (datetime.date(9999, 12, 31) - epoch).days
