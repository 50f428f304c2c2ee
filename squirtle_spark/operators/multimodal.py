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
    deterministic fake features (code-point sum, 64-symbol frame count)
    with the exact batch shape a real decoder would use. Swap the body,
    keep the contract. Two robustness rules a real codec needs too, both
    found by the r12 randomized differential lane: a NULL payload (missing
    asset) yields the row with NULL features — it must not crash the batch
    or silently vanish — and features are defined over DECODED symbols
    (code points), not raw bytes, so multi-byte UTF-8 payloads score
    identically in the stub and the SQL oracle. ``n_bytes`` stays the true
    byte length (the one genuinely byte-level fact).
    """
    for pdf in batches:
        n_bytes, feat, frames = [], [], []
        for b in pdf["payload"]:
            if b is None:
                n_bytes.append(None), feat.append(None), frames.append(None)
                continue
            try:
                s = bytes(b).decode("utf-8")
            except UnicodeDecodeError:
                # Corrupt asset (not valid UTF-8): the realistic failure a
                # real codec hits too. Contract: the row survives with its
                # true byte length and NULL features — one bad payload must
                # never kill the Arrow batch (same class as the NULL path).
                n_bytes.append(len(b)), feat.append(None), frames.append(None)
                continue
            n_bytes.append(len(b))
            feat.append(sum(ord(c) for c in s) % 2**31)
            frames.append(len(s) // 64)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.array(n_bytes, dtype="Int64"),
                "feat_sum": pd.array(feat, dtype="Int64"),
                "n_frames": pd.array(frames, dtype="Int64"),
            }
        )


def _decode(spark, sf_dir) -> DataFrame:
    docs = spark.table("documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    # Arrow-batched; each partition streams through the stub decoder.
    return docs.mapInPandas(_decode_stub, schema=DECODE_SCHEMA)


#: The stub's fake features are deterministic code-point math, so the
#: whole mapInPandas path gets a value-level oracle (DuckDB ``ascii()``
#: returns the full code point, not just 0-127). LEFT JOIN + the null
#: pass-through keeps missing-payload rows present with NULL features,
#: matching the stub. Empty text: string_split('','') = [''] with
#: ascii('') = 0, so the sum is 0, matching the stub's empty decode.
_DECODE_ORACLE = """
WITH ch AS (
    SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
sums AS (SELECT doc_id, SUM(ascii(c)) AS s FROM ch GROUP BY doc_id)
SELECT d.doc_id,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE CAST(s % 2147483648 AS BIGINT) END AS feat_sum,
       CAST(length(d.text) // 64 AS BIGINT) AS n_frames
FROM documents d
LEFT JOIN sums USING (doc_id)
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
            if payload is None:
                continue  # missing asset: no frames (oracle: NULL series)
            try:
                sym = bytes(payload).decode("utf-8")
            except UnicodeDecodeError:
                continue  # corrupt asset: zero frames, batch survives
            # frames are DECODED-symbol windows, not raw byte windows: a
            # byte slice can cut a multi-byte UTF-8 code point in half
            # (the first cut crashed `.decode()` mid-rocket-emoji in the
            # r12 randomized lane) and is unreplayable in the SQL oracle,
            # which slices by character.
            n_frames = len(sym) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                frame = sym[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["thumb"].append(frame[:THUMB_BYTES])
                out["frame_hash"].append(
                    hashlib.md5(frame.encode("utf-8")).hexdigest()
                )
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
