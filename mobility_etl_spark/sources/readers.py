"""Edge readers: CSV with explicit schema, zip archive expansion,
binary scans (SURVEY.md §2.B E1/E3/E4, §2.A R1–R4/R10).

The reference downloads a GTFS zip, unzips it driver-side, and
re-uploads members verbatim (dags/warsaw-gtfs.py:49-96). At 100 TB the
archive set itself is data, so expansion is an *executor-side* operator
here: `binaryFile` scan → `mapInPandas` that opens each zip from its
bytes and emits one row per member — the archive never lands on the
driver and N zips expand with N-way parallelism.
"""

from __future__ import annotations

import io as _io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mobility_etl_spark.session import ensure_session_defaults
from mobility_etl_spark.sources.schemas import GTFS_SCHEMAS


def read_csv_table(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """E1: CSV scan with explicit schema + header (engine rule: never
    ``inferSchema`` — a second full scan and nondeterministic typing at
    scale; reference CSVs at dags/warsaw-gtfs.py:90,
    dags/warsaw-delays.py:196)."""
    ensure_session_defaults(spark)
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """E4: binary scan → (path, modificationTime, length, content).

    100 TB note: `binaryFile` loads whole objects; for multi-GB blobs
    prefer the pointer-not-payload pattern (store URI + hash, stream
    bytes inside mapInPandas) — SURVEY.md §2.C N4.
    """
    ensure_session_defaults(spark)
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


#: Output schema of :func:`expand_zip_members`.
ZIP_MEMBER_SCHEMA = StructType(
    [
        StructField("archive_path", StringType()),
        StructField("member_name", StringType()),
        StructField("member_bytes", LongType()),
        StructField("content", BinaryType()),
    ]
)


def expand_zip_members(binary_df: DataFrame) -> DataFrame:
    """R4 at scale: one row per zip member, expanded on executors.

    Input: a `binaryFile` DataFrame (path, content). The reference's
    driver-side ``zipfile.ZipFile(...).extractall`` (dags/warsaw-gtfs.py:82-85)
    becomes an Arrow-batched ``mapInPandas`` — archives are partitioned
    across executors and never centralize.
    """

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "archive_path": [],
                "member_name": [],
                "member_bytes": [],
                "content": [],
            }
            for path, blob in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(_io.BytesIO(blob)) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        out["archive_path"].append(path)
                        out["member_name"].append(info.filename)
                        out["member_bytes"].append(info.file_size)
                        out["content"].append(zf.read(info))
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(
        _expand, ZIP_MEMBER_SCHEMA
    )


def gtfs_tables_from_zip(spark: SparkSession, zip_path: str) -> dict[str, DataFrame]:
    """R1+R4+R10: GTFS zip(s) → dict of up to 8 typed DataFrames.

    Members expand executor-side; each ``<table>.txt`` is line-split
    (GTFS forbids embedded newlines), header lines dropped by value
    (GTFS headers are exactly the spec field names — multi-archive
    safe, unlike positional header skipping), and parsed by the
    distributed CSV reader against the table's explicit schema. The
    ``.txt``→table rename is the reference's ``.txt``→``.csv``
    re-format (R10, dags/warsaw-gtfs.py:89-90) collapsed into the read.
    """
    members = expand_zip_members(read_binary_files(spark, zip_path))
    present = {
        r.member_name
        for r in members.select("member_name").distinct().collect()
    }
    tables: dict[str, DataFrame] = {}
    for name, schema in GTFS_SCHEMAS.items():
        if f"{name}.txt" not in present:
            continue
        header = ",".join(schema.fieldNames())
        lines = (
            members.filter(F.col("member_name") == f"{name}.txt")
            .select(
                F.explode(
                    F.split(F.col("content").cast("string"), r"\r?\n")
                ).alias("line")
            )
            .filter((F.length("line") > 0) & (F.col("line") != header))
        )
        tables[name] = (
            spark.read.schema(schema)
            .option("header", False)
            .csv(lines.rdd.map(lambda r: r.line))
        )
    return tables
