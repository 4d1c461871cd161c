"""IO-surface robustness gates beyond the registered roundtrip faces:
parquet compression codecs and the CSV options a real feed needs
(multiline quoted fields, embedded separators/quotes/newlines).

A 100 TB lake mixes codecs (zstd for cold data, snappy for hot) and
its CSV landing zone WILL contain quoted newlines; both must be
value-invariant, not just loadable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from tests.oracle_check import canon_rows

CODECS = ("snappy", "zstd", "gzip", "lz4")


@pytest.mark.parametrize("codec", CODECS)
def test_parquet_codec_roundtrip_value_identical(spark, sf_dir, tmp_path, codec):
    """Every supported parquet codec reproduces the exact row multiset
    (canonicalized with the driver-gate comparator, so float bits and
    dtypes count, not just counts)."""
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / f"orders_{codec}")
    src.write.option("compression", codec).parquet(path)
    back = spark.read.parquet(path)
    assert canon_rows(back.toPandas()) == canon_rows(src.toPandas())


def test_csv_multiline_quoted_roundtrip(spark, tmp_path):
    """Quoted fields containing the delimiter, the quote char (doubled),
    and EMBEDDED NEWLINES survive a CSV write/read roundtrip when the
    reader is told multiLine=true — and the same file read WITHOUT
    multiLine visibly shreds rows (guarding against the option silently
    becoming a no-op)."""
    rows = [
        (1, 'plain'),
        (2, 'comma, inside'),
        (3, 'quote " inside'),
        (4, 'line\nbreak inside'),
        (5, 'both, "and"\ntogether'),
    ]
    src = spark.createDataFrame(rows, "id int, payload string")
    path = str(tmp_path / "csv_multiline")
    src.coalesce(1).write.option("header", True).option("quoteAll", True).csv(path)

    good = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema("id int, payload string")
        .csv(path)
    )
    assert sorted(map(tuple, good.collect())) == sorted(rows)

    naive = (
        spark.read.option("header", True)
        .schema("id int, payload string")
        .csv(path)
    )
    assert naive.count() != len(rows), (
        "single-line mode parsed embedded newlines cleanly - the "
        "multiLine fixture no longer exercises the option"
    )


def test_csv_custom_delimiter_and_null_token(spark, tmp_path):
    """Pipe-delimited CSV with an explicit NULL token: values
    containing the delimiter stay quoted-intact and NULLs survive as
    NULLs (not empty strings) through the write/read pair. (The
    empty-string-vs-NULL distinction is deliberately NOT asserted:
    Spark's CSV writer/reader emptyValue handling is asymmetric by
    design — SPARK-25241 — and the lake convention is 'CSV has no
    empty strings, only NULLs'.)"""
    src = spark.createDataFrame(
        [(1, "a|b", None), (2, None, 3.5), (3, "x", 0.0)],
        "id int, s string, v double",
    )
    path = str(tmp_path / "csv_pipe")
    (
        src.coalesce(1)
        .write.option("header", True)
        .option("sep", "|")
        .option("nullValue", "\\N")
        .csv(path)
    )
    back = (
        spark.read.option("header", True)
        .option("sep", "|")
        .option("nullValue", "\\N")
        .schema("id int, s string, v double")
        .csv(path)
    )
    got = {r.id: (r.s, r.v) for r in back.collect()}
    assert got[1] == ("a|b", None)
    assert got[2] == (None, 3.5)
    assert got[3] == ("x", 0.0)


def test_parquet_dictionary_vs_plain_value_identical(spark, sf_dir, tmp_path):
    """Dictionary encoding on/off must be invisible to readers — the
    encoding knob a lake flips for high-cardinality columns."""
    src = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    a = str(tmp_path / "dict_on")
    b = str(tmp_path / "dict_off")
    src.write.parquet(a)
    src.write.option("parquet.enable.dictionary", "false").parquet(b)
    assert canon_rows(spark.read.parquet(b).toPandas()) == canon_rows(
        spark.read.parquet(a).toPandas()
    )
