"""Multimodal column handling — SURVEY.md §2.C C13 plus the driver-brief
binary-decode pipeline. Media bytes are opaque ``binary`` columns with typed
metadata; decode/feature-extract runs as Arrow-batched Pandas in
``mapInPandas`` (the real 100 TB pattern: the Python stage sees columnar
batches, never rows).

The container has no image/audio libraries (standing per-round check —
re-verified 2026-08-16, round 12, 10th consecutive round: PIL, cv2 and
soundfile all raise ModuleNotFoundError), so the decoder is a
deterministic fake (documented
below) — the Spark-side plumbing (binary schema, Arrow batch shape,
partition-parallel decode) is real and oracle-verified because the fake
is mirrorable in SQL. Swap the fake for the real codec the round a
library appears.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "llm_multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, e.label, d.n_chars,
           len(e.embedding) AS dim,
           round(sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def llm_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: text ⋈ embedding modality join with typed metadata projection.
    Embedding side is broadcast at dim-table size; at corpus scale both
    sides co-bucket on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.transform(ed, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return d.join(F.broadcast(e), d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "label",
        "n_chars",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(norm, 4).alias("norm"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE image decoder (no image libs in this container — see module
    docstring). Deterministically derives "dimensions" from the first bytes
    of the payload; a real decoder (PIL/libvips) drops in here unchanged:
    same signature, same Arrow batch flow.
    """
    for pdf in batches:
        payload = pdf["img"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": payload.apply(lambda b: b[0]).astype("int32"),
                "height": payload.apply(lambda b: b[1]).astype("int32"),
                "channels": payload.apply(lambda b: b[2] % 4 + 1).astype("int32"),
                "n_bytes": payload.apply(len).astype("int32"),
            }
        )


_HEX = "0123456789abcdef"


def _hexpair_sql(col: str, i: int) -> str:
    """DuckDB: value of hex byte at 1-based string position i (oracle mirror
    of `payload[k]` byte indexing in the decoder)."""
    return (
        f"(instr('{_HEX}', substr({col}, {i}, 1)) - 1) * 16"
        f" + instr('{_HEX}', substr({col}, {i + 1}, 1)) - 1"
    )


@query(
    "llm_multimodal_decode",
    oracle=f"""
    SELECT doc_id,
           {_hexpair_sql("md5(text)", 1)} AS width,
           {_hexpair_sql("md5(text)", 3)} AS height,
           ({_hexpair_sql("md5(text)", 5)}) % 4 + 1 AS channels,
           16 AS n_bytes
    FROM documents
    """,
)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: synthesize a binary payload
    (md5 digest bytes — deterministic fake "image"), then decode it with an
    Arrow-batched ``mapInPandas`` stage extracting typed metadata. The
    oracle recomputes the same bytes from the hex digest — verifying the
    binary plumbing end-to-end, not just the row count."""
    d = load_table(spark, sf_dir, "documents")
    with_img = d.select("doc_id", F.unhex(F.md5("text")).alias("img"))
    decoded = with_img.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
    return decoded


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("lead_byte", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_FRAME_SIZE = 5
_FRAME_STRIDE = 2


def _framesample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE video frame sampler (no media libs in this container): the
    payload is treated as a sequence of fixed-size frames; every STRIDE-th
    frame is emitted as its own output row (row-expanding mapInPandas — the
    real frame-extraction plumbing shape). A real decoder (ffmpeg) drops in
    here with the same signature and batch flow."""
    for pdf in batches:
        out_doc, out_idx, out_byte, out_n = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["video"]):
            n_frames = len(payload) // _FRAME_SIZE
            for i in range(0, n_frames, _FRAME_STRIDE):
                out_doc.append(doc_id)
                out_idx.append(i)
                out_byte.append(payload[i * _FRAME_SIZE])
                out_n.append(n_frames)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "lead_byte": pd.Series(out_byte, dtype="int32"),
                "n_frames": pd.Series(out_n, dtype="int32"),
            }
        )


@query(
    "llm_multimodal_framesample",
    oracle=f"""
    WITH v AS (SELECT doc_id, md5(text) || md5(upper(text)) AS hx FROM documents),
    idx AS (SELECT unnest(generate_series(0, 5, {_FRAME_STRIDE})) AS frame_idx)
    SELECT v.doc_id, idx.frame_idx,
           (instr('{_HEX}', substr(v.hx, idx.frame_idx * {_FRAME_SIZE} * 2 + 1, 1)) - 1) * 16
             + instr('{_HEX}', substr(v.hx, idx.frame_idx * {_FRAME_SIZE} * 2 + 2, 1)) - 1
             AS lead_byte,
           6 AS n_frames
    FROM v CROSS JOIN idx
    WHERE idx.frame_idx < 6
    """,
)
def llm_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary "video" column: a 32-byte deterministic
    payload (two md5 digests) is cut into 5-byte frames and every 2nd frame
    is sampled into its own row via Arrow-batched mapInPandas. The oracle
    recomputes each sampled frame's lead byte from the hex digest —
    value-verifying the byte indexing, row expansion, and batch plumbing."""
    d = load_table(spark, sf_dir, "documents")
    with_video = d.select(
        "doc_id",
        F.concat(F.unhex(F.md5("text")), F.unhex(F.md5(F.upper("text")))).alias("video"),
    )
    return with_video.mapInPandas(_framesample_batches, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_bytes", T.IntegerType()),
        T.StructField("out_hex", T.StringType()),
    ]
)

# fake "image": 32-byte payload (md5 ‖ md5) viewed as 4 rows × 8 cols,
# 1 byte/pixel; resize = 2× stride subsample → 2×4 output, 8 bytes
_IMG_W, _IMG_H, _STRIDE2 = 8, 4, 2


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE resize (no image libs — module docstring): nearest-neighbor
    2× downsample by byte striding over the row-major pixel buffer. A real
    implementation (PIL.Image.resize) drops in unchanged — same signature,
    same Arrow batch flow, same schema."""
    def shrink(b: bytes) -> bytes:
        return bytes(
            b[r * _IMG_W + c]
            for r in range(0, _IMG_H, _STRIDE2)
            for c in range(0, _IMG_W, _STRIDE2)
        )

    for pdf in batches:
        small = pdf["img"].apply(shrink)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "out_w": _IMG_W // _STRIDE2,
                "out_h": _IMG_H // _STRIDE2,
                "out_bytes": small.apply(len).astype("int32"),
                "out_hex": small.apply(bytes.hex),
            }
        )


# byte i (0-based) of the 32-byte payload lives at hex chars [2i+1, 2i+2]
# of md5(text) ‖ md5(text); the resize keeps bytes {0,2,4,6, 16,18,20,22}
_KEPT_BYTES = [r * _IMG_W + c for r in range(0, _IMG_H, _STRIDE2)
               for c in range(0, _IMG_W, _STRIDE2)]
_RESIZED_HEX = " || ".join(
    f"substr(md5(text) || md5(text), {2 * i + 1}, 2)" for i in _KEPT_BYTES
)


@query(
    "llm_multimodal_resize",
    oracle=f"""
    SELECT doc_id, 4 AS out_w, 2 AS out_h, 8 AS out_bytes,
           {_RESIZED_HEX} AS out_hex
    FROM documents
    """,
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline stage: 32-byte synthetic pixel buffers
    downsampled 2× by an Arrow-batched mapInPandas stage. The oracle
    reassembles the exact surviving bytes from the hex digest — the
    resized payload is verified byte-for-byte, proving the
    binary plumbing (schema, batch shape, row-major indexing) and not just
    counts. Map-only at 100 TB; payload bytes never cross a shuffle."""
    d = load_table(spark, sf_dir, "documents")
    img = F.unhex(F.concat(F.md5("text"), F.md5("text"))).alias("img")
    return d.select("doc_id", img).mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE feature extractor: per-payload byte statistics stand in for a
    CNN embedding head; numpy-vectorized per Arrow batch."""
    import numpy as np

    for pdf in batches:
        arr = np.stack(pdf["img"].apply(lambda b: np.frombuffer(b, dtype=np.uint8)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mean_byte": arr.mean(axis=1).round(4),
                "min_byte": arr.min(axis=1).astype("int32"),
                "max_byte": arr.max(axis=1).astype("int32"),
            }
        )


_BYTES16 = ", ".join(_hexpair_sql("md5(text)", 2 * i + 1) for i in range(16))


@query(
    "llm_multimodal_features",
    oracle=f"""
    SELECT doc_id,
           round(list_avg([{_BYTES16}]), 4) AS mean_byte,
           list_min([{_BYTES16}]) AS min_byte,
           list_max([{_BYTES16}]) AS max_byte
    FROM documents
    """,
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads: per-image byte statistics
    (mean/min/max) computed numpy-vectorized inside mapInPandas — the
    shape of a real embedding/feature head (binary in, fixed-width typed
    vector out). Values verified against the oracle's byte-level
    recomputation. Mean is over 16 exact integers ÷ 16 — bit-identical
    across engines."""
    d = load_table(spark, sf_dir, "documents")
    with_img = d.select("doc_id", F.unhex(F.md5("text")).alias("img"))
    return with_img.mapInPandas(_feature_batches, schema=_FEAT_SCHEMA)
