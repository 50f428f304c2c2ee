"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A large-scale training pipeline carries images/audio/video as ``binary``
columns with a metadata struct alongside; decode/feature-extraction runs as
Arrow-batched Pandas functions over ``mapInPandas``. The image/audio codecs
aren't available in this environment, so the decode step is a clearly
marked STUB producing deterministic fake features — the Spark-side
contract (schema, batch iteration, partitioning) is real and tested.

``multimodal_meta`` (oracle-checked) proves the binary column path through
both engines; ``multimodal_decode`` (rows-only) proves the mapInPandas
plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from ..registry import register_df, register_sql


def _meta(d: str) -> str:
    payload = "CAST(text AS BINARY)" if d == "spark" else "encode(text)"
    return f"""
SELECT doc_id,
       CAST(octet_length({payload}) AS BIGINT) AS n_bytes,
       'text/plain' AS mime,
       md5(text) AS content_hash
FROM documents
"""


register_sql(
    "multimodal_meta",
    _meta,
    doc="Binary payload column + typed metadata (octet_length/mime/hash).",
)


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("feat_sum", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder.

    A real pipeline would decode the payload here (PIL/ffmpeg/soundfile) and
    emit features; those libs aren't in this container, so we emit
    deterministic fake features (byte-sum, 64-byte frame count) with the
    exact batch shape a real decoder would use. Swap the body, keep the
    contract.
    """
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.map(len).astype("int64"),
                "feat_sum": payload.map(lambda b: int(sum(b)) % 2**31).astype("int64"),
                "n_frames": payload.map(lambda b: len(b) // 64).astype("int64"),
            }
        )


def _decode(spark, sf_dir) -> DataFrame:
    docs = spark.table("documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    # Arrow-batched; each partition streams through the stub decoder.
    return docs.mapInPandas(_decode_stub, schema=DECODE_SCHEMA)


register_df(
    "multimodal_decode",
    _decode,
    doc="mapInPandas decode pipeline over binary payloads (deterministic stub codec).",
)
