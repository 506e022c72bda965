"""Multimodal columns: image/audio/video payloads as opaque binary + typed
metadata (training-data-pipeline tier).

The container ships no image/audio codecs, so the DECODE step is stubbed —
deterministic synthetic decode for fixture payloads, ``NotImplementedError``
for real media — while everything Spark-side is real and tested: schema,
partitioning, Arrow batch shape, UDF signatures, and the metadata
extraction that CAN be done on raw bytes (magic sniffing, dimensions from
container headers we synthesise).

Fixture format ("SIMG"): ``b"SIMG" + width:u32 + height:u32 + channels:u8
+ payload`` — a stand-in container whose header parsing is real byte-level
work with a DuckDB-checkable oracle.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

SIMG_MAGIC = b"SIMG"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


def build_simg(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic synthetic image container (fixture generator)."""
    n = width * height * channels
    payload = bytes((seed * 2654435761 + i * 40503) & 0xFF for i in range(min(n, 4096)))
    return SIMG_MAGIC + struct.pack("<IIB", width, height, channels) + payload


def _media_rows(n: int = 200, seed: int = 42) -> list[dict]:
    """Deterministic fixture rows — shared by the Spark table builder and
    the DuckDB oracle generator so both engines see the exact same bytes."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "junk")[i % 3]
        if kind == "image":
            blob = build_simg(rng.randint(8, 512), rng.randint(8, 512), rng.choice([1, 3]), i)
        elif kind == "audio":
            blob = b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt " + bytes(16)
        else:
            blob = bytes([i % 256]) * rng.randint(1, 64)
        rows.append({"media_id": i, "kind": kind, "blob": blob})
    return rows


def media_table(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Fixture media table: (media_id, kind, blob)."""
    rows = _media_rows(n, seed)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("blob", T.BinaryType(), False),
        ]
    )
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


def parse_media_metadata(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Byte-level header parse → typed metadata rows (mapInPandas).

    Real work: magic sniff + header decode; malformed blobs become error
    ROWS (status), mirroring the extraction pipeline's errors-are-data
    contract."""
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                blob = bytes(row.blob)
                rec = {
                    "media_id": row.media_id,
                    "format": "unknown",
                    "width": None,
                    "height": None,
                    "channels": None,
                    "n_bytes": len(blob),
                    "status": "ok",
                }
                try:
                    if blob[:4] == SIMG_MAGIC:
                        w, h, c = struct.unpack_from("<IIB", blob, 4)
                        rec.update(format="simg", width=w, height=h, channels=c)
                    elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                        rec.update(format="wav")
                    else:
                        rec.update(status="unrecognized container")
                except Exception as e:
                    rec.update(status=f"parse error: {e}")
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.repartition(n_parts, "media_id").mapInPandas(parse, IMAGE_META_SCHEMA)


def decode_image(blob: bytes) -> "object":
    """STUB — real pixel decode needs PIL/libjpeg, absent in this sandbox.

    The SIMG fixture path decodes deterministically (so the Spark plumbing
    around decode is testable); any real container raises, clearly marked.
    On a cluster image, swap the body for ``PIL.Image.open``."""
    if blob[:4] == SIMG_MAGIC:
        w, h, c = struct.unpack_from("<IIB", blob, 4)
        return {"width": w, "height": h, "channels": c, "pixels": blob[13:]}
    raise NotImplementedError("real image decode requires PIL/libjpeg (not in sandbox)")


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def image_features(df: DataFrame, target: int = 32) -> DataFrame:
    """Decode → "resize" (dimension math) → tiny byte-histogram feature.

    The batch shape is the real thing (Arrow in/out, one init per
    partition); only the pixel decode is the deterministic stub."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                rec = {"media_id": row.media_id, "out_width": None,
                       "out_height": None, "feature": None, "status": "ok"}
                try:
                    img = decode_image(bytes(row.blob))
                    scale = target / max(img["width"], img["height"])
                    rec["out_width"] = max(1, round(img["width"] * min(scale, 1.0)))
                    rec["out_height"] = max(1, round(img["height"] * min(scale, 1.0)))
                    hist = np.bincount(
                        np.frombuffer(img["pixels"], dtype=np.uint8) >> 4, minlength=16
                    ).astype("float32")
                    total = float(hist.sum()) or 1.0
                    rec["feature"] = (hist / total).tolist()
                except NotImplementedError:
                    rec["status"] = "decode not available"
                except Exception as e:
                    rec["status"] = f"error: {e}"
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.filter(F.col("kind") == "image").mapInPandas(featurize, RESIZE_SCHEMA)


# --- video: fixture container + frame sampling (1 blob → N frame rows) ---

SVID_MAGIC = b"SVID"

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_sec", T.DoubleType(), False),
        T.StructField("frame_bytes", T.IntegerType(), False),
        T.StructField("frame_hash", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


def build_svid(fps: int, n_frames: int, frame_bytes: int, seed: int) -> bytes:
    """Deterministic synthetic video container:
    ``SVID + fps:u32 + n_frames:u32 + frame_bytes:u32 + frames…``."""
    head = SVID_MAGIC + struct.pack("<III", fps, n_frames, frame_bytes)
    frames = bytearray()
    for f in range(n_frames):
        frames += bytes(((seed + f) * 2654435761 + i * 97) & 0xFF for i in range(frame_bytes))
    return head + bytes(frames)


def sample_video_frames(df: DataFrame, stride: int = 5) -> DataFrame:
    """Frame sampling as a 1→N mapInPandas expansion: every ``stride``-th
    frame becomes a row with its timestamp and a content hash.

    This is the real Spark plumbing for video pipelines — per-blob frame
    slicing inside the Arrow batch, rows out, errors as rows.  Real codec
    decode (ffmpeg) would replace the byte-slice body; the container
    header math and the batch shape are what the engine owns."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                blob = bytes(row.blob)
                if blob[:4] != SVID_MAGIC:
                    out.append({"media_id": row.media_id, "frame_idx": -1,
                                "t_sec": 0.0, "frame_bytes": 0, "frame_hash": 0,
                                "status": "not a video container"})
                    continue
                try:
                    fps, n_frames, frame_bytes = struct.unpack_from("<III", blob, 4)
                    base = 4 + 12
                    for f in range(0, n_frames, stride):
                        frame = blob[base + f * frame_bytes: base + (f + 1) * frame_bytes]
                        # C-speed content hash (no per-byte Python)
                        h = zlib.crc32(frame)
                        out.append({
                            "media_id": row.media_id,
                            "frame_idx": f,
                            "t_sec": f / fps if fps else 0.0,
                            "frame_bytes": len(frame),
                            "frame_hash": h,
                            "status": "ok",
                        })
                except Exception as e:
                    out.append({"media_id": row.media_id, "frame_idx": -1,
                                "t_sec": 0.0, "frame_bytes": 0, "frame_hash": 0,
                                "status": f"parse error: {e}"})
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(sample, FRAME_SCHEMA)


def _video_rows(n: int = 40, seed: int = 7) -> list[dict]:
    """Deterministic fixture rows — shared with the oracle generator."""
    import random

    rng = random.Random(seed)
    return [
        {
            "media_id": i,
            "blob": build_svid(rng.choice([10, 24, 30]), rng.randint(10, 60), 128, i)
            if i % 5 != 4
            else b"JUNK" + bytes(8),  # planted non-video rows
        }
        for i in range(n)
    ]


def video_table(spark: SparkSession, n: int = 40, seed: int = 7) -> DataFrame:
    """Fixture video table (media_id, blob)."""
    rows = _video_rows(n, seed)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("blob", T.BinaryType(), False),
        ]
    )
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


def q_video_frame_sample(spark, sf_dir):
    """Rows-only driver check: sampled-frame accounting per video."""
    frames = sample_video_frames(video_table(spark), stride=5)
    return frames.groupBy("media_id", "status").agg(
        F.count("*").alias("n_frames_sampled"),
        F.round(F.max("t_sec"), 3).alias("last_t_sec"),
    )


def q_media_metadata(spark, sf_dir):
    """Rows-only driver check over the fixture media table (byte-header
    parsing; pinned by tests/test_ops_multimodal.py)."""
    return parse_media_metadata(media_table(spark)).groupBy("format", "status").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def _hex_values(rows: list[dict]) -> str:
    """(media_id, hex-blob) VALUES list — the oracle re-parses the exact
    fixture bytes, as hex text (this DuckDB build has no blob slicing;
    2 hex chars = 1 byte, so header fields live at fixed substr offsets)."""
    return ",\n  ".join(
        f"({r['media_id']}, '{r['blob'].hex().upper()}')" for r in rows
    )


def _le32(hex_char_offset: int) -> str:
    """SQL expr: little-endian u32 at a 1-based hex-string offset."""
    o = hex_char_offset
    return (
        f"CAST('0x' || substr(h,{o + 6},2) || substr(h,{o + 4},2)"
        f" || substr(h,{o + 2},2) || substr(h,{o},2) AS BIGINT)"
    )


def _media_oracle_sql() -> str:
    """Full value oracle for q_media_metadata: the deterministic fixture
    blobs are embedded as hex literals and the SIMG/WAV header sniff is
    re-done in SQL ('53494D47' = SIMG, '52494646'+'57415645' = RIFF/WAVE)."""
    return f"""
WITH media(media_id, h) AS (VALUES
  {_hex_values(_media_rows())}
),
parsed AS (
  SELECT media_id,
    CASE WHEN substr(h, 1, 8) = '53494D47' THEN 'simg'
         WHEN substr(h, 1, 8) = '52494646' AND substr(h, 17, 8) = '57415645' THEN 'wav'
         ELSE 'unknown' END AS format,
    CASE WHEN substr(h, 1, 8) = '53494D47'
           OR (substr(h, 1, 8) = '52494646' AND substr(h, 17, 8) = '57415645')
         THEN 'ok' ELSE 'unrecognized container' END AS status,
    length(h) // 2 AS n_bytes
  FROM media
)
SELECT format, status, count(*) AS n, sum(n_bytes)::BIGINT AS total_bytes
FROM parsed GROUP BY 1, 2
"""


def _video_oracle_sql(stride: int = 5) -> str:
    """Full value oracle for q_video_frame_sample: SVID headers
    ('53564944') re-parsed in SQL; sampled-frame count = ceil(n/stride),
    last timestamp = stride*floor((n-1)/stride) / fps."""
    return f"""
WITH vids(media_id, h) AS (VALUES
  {_hex_values(_video_rows())}
),
parsed AS (
  SELECT media_id,
    substr(h, 1, 8) = '53564944' AS is_vid,
    {_le32(9)} AS fps,
    {_le32(17)} AS n_frames
  FROM vids
)
SELECT media_id::BIGINT AS media_id,
  CASE WHEN is_vid THEN 'ok' ELSE 'not a video container' END AS status,
  (CASE WHEN is_vid THEN (n_frames + {stride} - 1) // {stride} ELSE 1 END)::BIGINT
    AS n_frames_sampled,
  CASE WHEN is_vid
       THEN round(({stride} * ((n_frames - 1) // {stride}))::DOUBLE / fps, 3)
       ELSE 0.0 END AS last_t_sec
FROM parsed
"""


QUERIES = {
    "media_metadata": q_media_metadata,
    "media_video_frame_sample": q_video_frame_sample,
}
ORACLES: dict[str, str] = {
    # fixture bytes embedded as hex literals; header parsing re-done in SQL
    "media_metadata": _media_oracle_sql(),
    "media_video_frame_sample": _video_oracle_sql(),
}
