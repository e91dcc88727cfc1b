"""Multimodal column plumbing — binary payloads with typed metadata.

Driver-mandated extension (BASELINE.json north_star): at 100 TB, image/audio/
video travel as opaque ``binary`` columns next to typed metadata, and the
decode / feature-extract / resize / frame-sample stages are Arrow-batched
Python UDFs over ``mapInPandas``. The media libraries are not in this
container, so the *decode* step is stubbed (``decode_image`` raises
``NotImplementedError`` unless ``fake=True``), but everything Spark-side —
schema, batch shape, partitioning, UDF signatures — is real and tested.

The synthetic payload derives from ``documents.text`` (utf-8 bytes), which
keeps the oracle-checkable part (payload sizing / metadata profiling) exact
across engines.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table, spread

FEATURE_DIM = 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table shape: (media_id, payload BINARY, meta STRUCT).
    Payload = utf-8 bytes of the document text (deterministic synthetic
    media); meta carries format/bytes the way an ingest service would."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            F.octet_length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata profiling over the binary column — per origin: count, total
    and mean payload bytes. Pure JVM; the oracle-checked face of the
    multimodal surface."""
    media = media_table(spark, sf_dir)
    return (
        media.groupBy(F.col("meta.origin").alias("origin"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 6).alias("avg_bytes"),
        )
        .orderBy("origin")
    )


MEDIA_STATS_ORACLE = """
SELECT source AS origin,
       COUNT(*) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       ROUND(AVG(octet_length(encode(text))), 6) AS avg_bytes
FROM documents
GROUP BY source ORDER BY origin
"""


def _try_pil():
    """Call-time import probe: the container has no codec libraries, but
    ``decode_image`` (the real-decode escape hatch) works wherever PIL
    exists — no fork of the pipeline. The REGISTERED ``media_features``
    query stays on the digest double (``fake=True``) by design: its
    DuckDB oracle replays md5-hex arithmetic, which must hold in every
    environment; real decode is a caller opt-in."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode a media payload into pixel features.

    Escape hatch first: if PIL is importable at CALL time, decode for
    real (open → grayscale → FEATURE_DIM×1 thumbnail → normalized pixel
    vector). Otherwise this is an environment-blocked STUB: with
    ``fake=True`` it returns a deterministic FEATURE_DIM-vector derived
    from the payload digest — stable across runs/executors, so downstream
    plumbing is fully testable — and without it, it raises."""
    pil = _try_pil()
    if pil is not None and not fake:
        import io

        img = pil.open(io.BytesIO(payload)).convert("L").resize((FEATURE_DIM, 1))
        return [b / 255.0 for b in img.tobytes()[:FEATURE_DIM]]
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present here; "
            "pass fake=True for the deterministic test double"
        )
    d = hashlib.md5(payload).digest()
    return [d[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the binary column: Arrow batches
    in, (media_id, feature ARRAY<DOUBLE>, n_bytes) out. This is the real
    100 TB decode-stage shape — per-partition batched Python, no collect,
    payload never leaves the executor."""
    media = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=True) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return spread(media.select("media_id", "payload")).mapInPandas(
        extract, "media_id long, feature array<double>, n_bytes long"
    )


def media_features_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``extract_features`` posexploded to long form (media_id, dim_idx,
    value, n_bytes) — the registered, ORACLE-CHECKED face of the decode
    stage. The mapInPandas Arrow decode still runs inside this plan (the
    100 TB stage shape is exercised by the driver); the digest double is
    md5-hex arithmetic, which DuckDB replays bit-exactly, so the check
    upgrades from rows-only to a full value hash. Long form because the
    engines' pandas reprs of array columns differ (ndarray vs list) —
    same trade ``hashed_tf_vectors`` makes."""
    return (
        extract_features(spark, sf_dir)
        .select("media_id", "n_bytes", F.posexplode("feature"))
        .select(
            "media_id",
            F.col("pos").alias("dim_idx"),
            F.col("col").alias("value"),
            "n_bytes",
        )
    )


MEDIA_FEATURES_LONG_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST(i AS INT) AS dim_idx,
       (strpos('123456789abcdef', substr(md5(text), CAST(2*i+1 AS INT), 1)) * 16
        + strpos('123456789abcdef', substr(md5(text), CAST(2*i+2 AS INT), 1)))
       / 255.0 AS value,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
CROSS JOIN (SELECT unnest(range(0, {FEATURE_DIM})) AS i) r
"""


def resize_media(
    spark: SparkSession, sf_dir: str, target_bytes: int = 64
) -> DataFrame:
    """Resize stage: payload → fixed-size payload. Real resize needs codec
    libraries (absent here); the deterministic double truncates or right-pads the
    byte stream to ``target_bytes``, which preserves exactly what the
    pipeline cares about — a binary-in/binary-out Arrow-batched stage whose
    output schema and sizing downstream stages can rely on."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                bytes(p[:target_bytes]).ljust(target_bytes, b"\0")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "orig_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    media = media_table(spark, sf_dir)
    return spread(media.select("media_id", "payload")).mapInPandas(
        resize, "media_id long, payload binary, orig_bytes long"
    )


def resize_media_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable face of ``resize_media``: identical stage, payload
    upper-hex encoded. Binary survives Arrow fine but ``toPandas``
    materializes it as unhashable ``bytearray``, which no value-hash
    comparator (the driver's included) can sort — so the BINARY contract
    stays the registered rows-only query + pytest, and the BYTE MATH gets
    its oracle here."""
    return resize_media(spark, sf_dir).select(
        "media_id", F.hex("payload").alias("payload_hex"), "orig_bytes"
    )


def resize_media_hex_oracle(target_bytes: int = 64) -> str:
    """Replay of the resize double over hex text (DuckDB has no byte
    slicing on BLOB; 2 hex chars per byte, NUL pad = '00' pairs) —
    byte-exact against the engine's ``p[:N].ljust(N, b'\\0')``; both
    engines emit uppercase hex."""
    return f"""
SELECT doc_id AS media_id,
       rpad(substring(hex(encode(text)), 1, {2 * target_bytes}),
            {2 * target_bytes}, '00') AS payload_hex,
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes
FROM documents
"""


FRAME_STRIDE = 16


def sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: one payload row → N frame rows (every
    ``FRAME_STRIDE`` bytes stands in for a video frame boundary). The shape
    that matters at 100 TB: a row-EXPANDING mapInPandas stage (batch in, a
    differently-sized batch out) feeding per-frame feature extraction."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, chunks = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for j, off in enumerate(range(0, len(p), FRAME_STRIDE)):
                    ids.append(mid)
                    fidx.append(j)
                    chunks.append(bytes(p[off : off + FRAME_STRIDE]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": fidx, "frame": chunks}
            )

    media = media_table(spark, sf_dir)
    return spread(media.select("media_id", "payload")).mapInPandas(
        frames, "media_id long, frame_idx int, frame binary"
    )


def sample_frames_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable face of ``sample_frames`` (see ``resize_media_hex``
    for why the binary query itself stays rows-only)."""
    return sample_frames(spark, sf_dir).select(
        "media_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


def sample_frames_hex_oracle(stride: int = FRAME_STRIDE) -> str:
    """Row-expanding replay of the frame sampler over hex text: one row
    per ``stride``-byte chunk (last chunk short, never padded). Empty
    payloads produce zero frames in both engines (range(0, 0) is empty;
    ceil(0/stride) = 0)."""
    return f"""
SELECT doc_id AS media_id,
       CAST(f.j AS INT) AS frame_idx,
       substring(hex(encode(text)), f.j * {2 * stride} + 1,
                 {2 * stride}) AS frame_hex
FROM documents,
     LATERAL (
         SELECT unnest(range(0,
             CAST(ceil(octet_length(encode(text)) / {stride}.0) AS BIGINT)
         )) AS j
     ) f
"""
