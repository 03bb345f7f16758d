"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design for 100 TB of images/audio/video:

* payloads travel as parquet ``binary`` columns (or pointers to object
  storage — same plumbing, the bytes just arrive later),
* every per-payload transform is an Arrow-batched ``mapInPandas`` so
  bytes cross the JVM↔Python boundary once per record batch, never per
  row,
* decode / resize / frame-sample are pluggable: the Spark-side schema,
  partitioning and batch shape are real and tested.  Each transform
  ships a REAL codec path (``decoder="pillow"`` for image decode /
  resize, ``decoder="pyav"`` for video demux) behind an optional-dep
  import gate plus a deterministic ``"fake"`` decoder that is always
  available.  This container has no codec libs, so here the real paths
  raise ``NotImplementedError`` and tests ``importorskip`` them; in an
  environment with Pillow/pyav installed they run real bytes unchanged.

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
    DoubleType,
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


#: features travel as float64: the fake decoder's uint32/2^32 values and
#: the pillow path's intensity/255 are then EXACT (not rounded through a
#: 24-bit mantissa), which is what lets the DuckDB oracle reproduce the
#: fake-decoded features bit-for-bit.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
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

    Decoders:

    * ``"fake"`` (default) — deterministic hash-derived vector; always
      available, used by plumbing tests and the registered query.
    * ``"pillow"`` — REAL image decode: PIL opens the payload bytes,
      grayscales, resizes to a ``dim``-cell grid and emits normalized
      mean intensities.  Optional dependency: raises
      ``NotImplementedError`` when Pillow is absent (it is not baked
      into this container; tests ``importorskip`` it).

    Either way the Spark-side contract (schema, Arrow batching, column
    pruning) is identical — the decoder is a per-batch pure function.
    """
    if decoder == "pillow":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='pillow' needs the optional Pillow dependency, "
                "which is not installed in this environment; use "
                "decoder='fake' for codec-free plumbing"
            ) from exc
    elif decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: supported decoders are 'fake' "
            "(deterministic, always available) and 'pillow' (optional)"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if decoder == "pillow":
            import io

            from PIL import Image

        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                if decoder == "pillow":
                    img = Image.open(io.BytesIO(bytes(b))).convert("L")
                    img = img.resize((dim, 1))
                    vec = np.asarray(img, dtype=np.float64).reshape(dim)
                    feats.append(vec / 255.0)
                else:
                    # deterministic fake: md5-seeded bytes -> dim floats
                    # in [0,1); uint32/2^32 is exact in float64, so the
                    # SQL oracle reproduces these bit-for-bit
                    raw = hashlib.md5(bytes(b)).digest()
                    need = dim * 4
                    buf = (raw * (need // len(raw) + 1))[:need]
                    vec = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
                    feats.append(vec / float(2**32))
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

    Decoders: ``"fake"`` (default, always available) treats the payload
    as a flat stream of fixed-size 16-byte "frames"; ``"pyav"`` does
    REAL container demuxing — every ``every_n``-th decoded video frame
    re-encoded as PNG bytes.  pyav is an optional dependency: absent
    (as in this container) that path raises ``NotImplementedError`` and
    tests ``importorskip`` it.  The 1→N fan-out, schema and Arrow
    batching are identical either way."""
    if decoder == "pyav":
        try:
            import av  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='pyav' needs the optional pyav dependency, which "
                "is not installed in this environment; use decoder='fake' "
                "for codec-free plumbing"
            ) from exc
    elif decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: supported decoders are 'fake' "
            "(deterministic, always available) and 'pyav' (optional)"
        )
    frame_bytes = 16

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pyav":
            import io

            import av

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if decoder == "pyav":
                    with av.open(io.BytesIO(raw)) as container:
                        for fi, frame in enumerate(container.decode(video=0)):
                            if fi % every_n:
                                continue
                            img = frame.to_image()
                            buf = io.BytesIO()
                            img.save(buf, format="PNG")
                            ids.append(int(doc_id))
                            idxs.append(fi)
                            frames.append(buf.getvalue())
                    continue
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
    Decoders: ``"fake"`` (default, always available) keeps every
    ``factor``-th byte; ``"pillow"`` does a REAL pixel-aware resize —
    decode, scale both dimensions by ``1/factor`` (floor 1 px),
    re-encode as PNG.  Pillow is an optional dependency: absent (as in
    this container) the pillow path raises ``NotImplementedError`` and
    tests ``importorskip`` it."""
    if decoder == "pillow":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='pillow' needs the optional Pillow dependency, "
                "which is not installed in this environment; use "
                "decoder='fake' for codec-free plumbing"
            ) from exc
    elif decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: supported decoders are 'fake' "
            "(deterministic, always available) and 'pillow' (optional)"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pillow":
            import io

            from PIL import Image

        for pdf in batches:
            ids, outs, olens, rlens = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if decoder == "pillow":
                    img = Image.open(io.BytesIO(raw))
                    img = img.resize(
                        (max(1, img.width // factor), max(1, img.height // factor))
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    small = buf.getvalue()
                else:
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


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    decoder: str = "fake",
) -> DataFrame:
    """64-bit block-mean perceptual hash (aHash) per binary payload —
    the image-dedup signature: decode to an 8×8 intensity grid, set
    bit i iff pixel i is strictly above the grid mean (integer
    comparison ``pixel·64 > Σpixels`` — no float boundary), pack two's
    complement into an int64.  Visually identical images hash equal;
    small edits flip few bits, so near-dups surface at low Hamming
    distance via :func:`~gdp_etl_spark.operators.dedup.hamming_pairs`.

    Decoders, same gate as :func:`decode_features`: ``"fake"``
    (default, always available) derives pixel ``i`` from
    ``md5(payload + b":<i//4>")`` — 16 md5s of the payload, 4
    little-endian uint32 pixels each — deterministic and replayed
    bit-for-bit by the SQL oracle; ``"pillow"`` decodes real image
    bytes to an 8×8 grayscale resize (optional dependency, raises a
    clear error when absent).

    One Arrow-batched mapInPandas pass; output is (id, int64) — the
    cheapest possible shuffle rows for the downstream pairing.
    """
    if decoder == "pillow":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "decoder='pillow' needs the optional Pillow dependency, "
                "which is not installed in this environment; use "
                "decoder='fake' for codec-free plumbing"
            ) from exc
    elif decoder != "fake":
        raise ValueError(
            f"decoder={decoder!r}: supported decoders are 'fake' "
            "(deterministic, always available) and 'pillow' (optional)"
        )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if decoder == "pillow":
            import io

            from PIL import Image

        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                if decoder == "pillow":
                    img = Image.open(io.BytesIO(bytes(b))).convert("L")
                    img = img.resize((8, 8))
                    pix = np.asarray(img, dtype=np.int64).reshape(64)
                else:
                    pix = np.empty(64, dtype=np.int64)
                    raw = bytes(b)
                    for g in range(16):
                        digest = hashlib.md5(
                            raw + b":" + str(g).encode()
                        ).digest()
                        for j in range(4):
                            pix[g * 4 + j] = int.from_bytes(
                                digest[4 * j : 4 * j + 4], "little"
                            )
                total = int(pix.sum())
                h = 0
                for i in range(63):
                    if int(pix[i]) * 64 > total:
                        h |= 1 << i
                if int(pix[63]) * 64 > total:
                    h -= 1 << 63
                out.append(h)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "phash": out}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        hash_batch, PHASH_SCHEMA
    )


def image_near_dup_pairs(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    max_hamming: int = 3,
    decoder: str = "fake",
) -> DataFrame:
    """Image near-duplicate pairs: :func:`perceptual_hash` + the
    pigeonhole Hamming pairing shared with SimHash
    (``dedup.hamming_pairs`` — max_hamming+1 chunk equi-joins, exact
    bit_count verify, never all-pairs).  The persist barrier keeps the
    hash UDF from running once per self-join side."""
    from pyspark.storagelevel import StorageLevel

    from .dedup import hamming_pairs

    sig = perceptual_hash(df, payload_col, id_col, decoder=decoder).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return hamming_pairs(sig, "phash", id_col, max_hamming)
