"""Multimodal binary-column plumbing (SURVEY.md §2.C N4) + the pandas
UDF surface (E38–E39).

Pattern for image/audio/video at 100 TB: payloads are opaque
``binary`` columns (or pointers: URI + hash, loaded inside the UDF),
metadata is a typed struct, and decode/feature-extraction runs in
Arrow-batched ``mapInPandas`` — the only place Python belongs in the
hot path. The decode step itself is STUBBED here (no image/audio libs
in this container, by design); everything Spark-side — schema, batch
iteration, partitioning, output contract — is real and oracle-checked
because the stub features (byte length, sha256) are deterministic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

#: Output contract of the feature extractor (schema-on-write, §1.3).
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload_sha256", StringType()),
        StructField("codec", StringType()),
    ]
)


def decode_payload(payload: bytes) -> object:
    """Modality decode stub — image/audio libs are not in this container.

    In production this is Pillow/torchaudio/av; the engine only cares
    that it runs inside the Arrow batch loop below.
    """
    raise NotImplementedError("decode stub: no media libraries in this environment")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow-batched, vectorized per batch.

    Real plumbing: iterates record batches, computes per-payload
    features without collecting to the driver. sha256/len stand in for
    the decode step (deterministic → oracle-checkable).
    """
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "payload_sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
                "codec": "stub",
            }
        )


@register(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256,
           'stub' AS codec
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("N4", "E38", "E39"),
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through mapInPandas: cast text
    to ``binary`` (standing in for image/audio payloads), run the
    Arrow-batched extractor, return the typed feature table. The
    deterministic stub features make the full Python-UDF path
    hash-checkable against DuckDB."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct("lang", "source").alias("meta"),
    )
    return payloads.mapInPandas(_extract_features, FEATURE_SCHEMA)
