"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design for 100 TB of images/audio/video:

* payloads travel as parquet ``binary`` columns (or pointers to object
  storage — same plumbing, the bytes just arrive later),
* every per-payload transform is an Arrow-batched ``mapInPandas`` so
  bytes cross the JVM↔Python boundary once per record batch, never per
  row,
* decode / resize / frame-sample are pluggable: the Spark-side schema,
  partitioning and batch shape are real and tested; the actual codecs
  (Pillow / torchaudio / pyav) are NOT in this container, so the decode
  step is stubbed behind ``NotImplementedError`` with a deterministic
  fake available for plumbing tests.

The reference (JaromirKoflak/gdp-etl) has no binary columns at all; this
module is part of the beyond-reference LLM-data-pipeline surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Stand-in payload producer: UTF-8 bytes of a text column as a
    ``binary`` column.  In production the payload arrives from the source
    (parquet binary / object-store fetch); the downstream plumbing is
    identical."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", IntegerType()),
        StructField("magic", StringType()),
    ]
)


def binary_meta(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Typed metadata per payload (length + leading "magic" bytes) via a
    single mapInPandas pass — the canonical shape for any per-payload
    extractor: project only (id, payload) into the UDF, return a typed
    struct, let Catalyst prune everything else."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload_len": payloads.map(len).astype("int32"),
                    "magic": payloads.map(lambda b: bytes(b)[:4].hex()),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, META_SCHEMA
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    dim: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Payload → fixed-dim float feature vector.

    ``decoder="fake"`` produces a deterministic hash-derived vector —
    the real image/audio decode is stubbed because the codec libraries
    are not in this container.  The Spark-side contract (schema,
    Arrow batching, column pruning) is exactly what a real decoder
    plugs into.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real codecs (Pillow/pyav/torchaudio) are "
            "not available in this environment; only the deterministic "
            "'fake' decoder is implemented"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                # deterministic fake: md5-seeded bytes -> dim floats in [0,1)
                raw = hashlib.md5(bytes(b)).digest()
                need = dim * 4
                buf = (raw * (need // len(raw) + 1))[:need]
                vec = np.frombuffer(buf, dtype=np.uint32).astype(np.float32)
                feats.append(vec / np.float32(2**32))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        decode, FEATURE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_n: int = 10,
    decoder: str = "fake",
) -> DataFrame:
    """Video frame sampling: one payload row fans out to every
    ``every_n``-th frame as a typed (doc_id, frame_idx, frame) row —
    the mapInPandas 1→N shape every frame-level pipeline builds on.

    Real container demuxing needs pyav (not in this container), so the
    default ``decoder="fake"`` treats the payload as a flat stream of
    fixed-size fake "frames" (16-byte chunks) — the fan-out, schema and
    Arrow batching are exactly what a real decoder plugs into."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real video demuxing (pyav) is not "
            "available in this environment; only the deterministic "
            "'fake' chunk decoder is implemented"
        )
    frame_bytes = 16

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    frames.append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            ).astype({"doc_id": "int64", "frame_idx": "int32"})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        sample, FRAME_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("resized", BinaryType()),
        StructField("orig_len", IntegerType()),
        StructField("resized_len", IntegerType()),
    ]
)


def resize_payload(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    factor: int = 4,
    decoder: str = "fake",
) -> DataFrame:
    """Payload "resize": binary in → smaller binary out, per row, Arrow
    batched — the shape of every image-resize / audio-downsample stage.
    Real pixel-aware resizing needs Pillow (not in this container); the
    deterministic ``fake`` kernel keeps every ``factor``-th byte so the
    plumbing (binary→binary schema, size accounting, batching) is real
    and testable."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real image resize (Pillow) is not "
            "available in this environment; only the deterministic "
            "'fake' byte-downsample kernel is implemented"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, olens, rlens = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                small = raw[::factor]
                ids.append(int(doc_id))
                outs.append(small)
                olens.append(len(raw))
                rlens.append(len(small))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "resized": outs,
                    "orig_len": olens,
                    "resized_len": rlens,
                }
            ).astype({"doc_id": "int64", "orig_len": "int32", "resized_len": "int32"})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        resize, RESIZED_SCHEMA
    )


def payload_stats(df: DataFrame, payload_col: str) -> DataFrame:
    """Corpus-level payload size stats — pure JVM expressions, no UDF."""
    size = F.length(F.col(payload_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum(size.cast("bigint")).alias("total_bytes"),
        F.min(size).alias("min_bytes"),
        F.max(size).alias("max_bytes"),
    )


def le_hex(n, width_bytes: int):
    """Little-endian hex encoding of an int column (JVM-side): pad the
    big-endian hex to ``width_bytes`` and reverse the byte pairs."""
    h = F.lpad(F.lower(F.hex(n)), width_bytes * 2, "0")
    pairs = [
        F.substring(h, i * 2 + 1, 2) for i in reversed(range(width_bytes))
    ]
    return F.concat(*pairs)


def parse_fixed_header(
    df: DataFrame, payload_col: str, id_col: str
) -> DataFrame:
    """Parse a RIFF-style fixed-offset container header ENTIRELY
    JVM-side — binary metadata extraction needs no Python when offsets
    are static: ``hex(payload)`` once, then string slices + base-16
    parses inside whole-stage codegen.

    Layout (12-byte header): bytes 0-3 ASCII magic, 4-7 u32-LE payload
    size, 8-9 u16-LE channels, 10-11 u16-LE rate/256.  Returns
    (id, is_riff, declared_size, channels, rate_div256, total_bytes).
    """
    hx = F.lower(F.hex(F.col(payload_col)))

    def le_int(char_pos: int, nbytes: int):
        pairs = [
            F.substring(hx, char_pos + 2 * i, 2)
            for i in reversed(range(nbytes))
        ]
        return F.conv(F.concat(*pairs), 16, 10).cast("long")

    return df.select(
        F.col(id_col),
        (F.substring(hx, 1, 8) == "52494646").alias("is_riff"),
        le_int(9, 4).alias("declared_size"),
        le_int(17, 2).alias("channels"),
        le_int(21, 2).alias("rate_div256"),
        (F.length(hx) / 2).cast("long").alias("total_bytes"),
    )
