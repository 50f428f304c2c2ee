"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A large-scale training pipeline carries images/audio/video as ``binary``
columns with a metadata struct alongside; decode/feature-extraction runs as
Arrow-batched Pandas functions over ``mapInPandas``. The image/audio codecs
aren't available in this environment, so the decode step is a clearly
marked STUB producing deterministic fake features — the Spark-side
contract (schema, batch iteration, partitioning) is real and tested.

``multimodal_meta`` proves the binary column path through both engines;
``multimodal_decode`` / ``multimodal_framesample`` prove the mapInPandas
plumbing — all three value-checked (the stub features are deterministic
byte math a SQL oracle replays).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
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


#: The stub's fake features are themselves deterministic byte math, so the
#: whole mapInPandas path gets a value-level oracle (payloads are ASCII ⇒
#: code points == bytes).
_DECODE_ORACLE = """
WITH ch AS (
    SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
sums AS (SELECT doc_id, SUM(ascii(c)) AS s FROM ch GROUP BY doc_id)
SELECT d.doc_id,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       CAST(s % 2147483648 AS BIGINT) AS feat_sum,
       CAST(length(d.text) // 64 AS BIGINT) AS n_frames
FROM documents d
JOIN sums USING (doc_id)
"""


register_df(
    "multimodal_decode",
    _decode,
    oracle_body=_DECODE_ORACLE,
    doc="mapInPandas decode pipeline over binary payloads (deterministic stub codec).",
)


FRAME_BYTES = 64  # stand-in frame size
FRAME_STRIDE = 4  # sample every 4th frame
THUMB_BYTES = 8  # stand-in "resize": leading slice of the frame

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("thumb", StringType()),
        StructField("frame_hash", StringType()),
    ]
)


def _framesample_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame-sample + resize over mapInPandas — N input rows → M output
    rows (one per sampled frame), the cardinality-changing shape a video
    pipeline needs. The 'decode' is a deterministic byte-slice stand-in
    (payloads are ASCII here), so the whole Python path is value-checkable
    against a SQL oracle — swap the slicing for ffmpeg frame extraction
    and PIL resizing, keep the contract.
    """
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "thumb": [], "frame_hash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                frame = bytes(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["thumb"].append(frame[:THUMB_BYTES].decode("utf-8"))
                out["frame_hash"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(out)


def _framesample(spark, sf_dir) -> DataFrame:
    docs = spark.table("documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return docs.mapInPandas(_framesample_fn, schema=FRAMES_SCHEMA)


_FRAMES_ORACLE = f"""
WITH fr AS (
    SELECT doc_id, text,
           unnest(generate_series(0, CAST(length(text) // {FRAME_BYTES} AS INT) - 1,
                                  {FRAME_STRIDE})) AS i
    FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       substring(text, CAST(i * {FRAME_BYTES} + 1 AS INT), {THUMB_BYTES}) AS thumb,
       md5(substring(text, CAST(i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS frame_hash
FROM fr
"""


register_df(
    "multimodal_framesample",
    _framesample,
    oracle_body=_FRAMES_ORACLE,
    doc="Frame-sample + thumbnail via mapInPandas (N→M rows), value-checked vs SQL oracle.",
)
