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
import struct
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


def _parse_pnm_header(payload: bytes) -> tuple[str, int, int, int, int] | None:
    """Parse a binary PNM (P5 grayscale / P6 RGB) header: returns (magic,
    width, height, maxval, data_offset) or None if not PNM. Handles the
    full grammar — any whitespace runs between tokens, ``#`` comments to
    end-of-line, and EXACTLY one whitespace byte after maxval before the
    raster (per the netpbm spec)."""
    if payload[:2] not in (b"P5", b"P6"):
        return None
    magic = payload[:2].decode()
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while (
                pos < len(payload)
                and not payload[pos : pos + 1].isspace()
                and payload[pos : pos + 1] != b"#"
            ):
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3:
        return None
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if not (0 < maxval <= 255 and width > 0 and height > 0):
        return None
    # the raster follows EXACTLY one whitespace byte after maxval; a '#'
    # here (comment jammed against maxval) would put the offset inside
    # the comment text — undecodable, not off-by-N garbage
    if not payload[pos : pos + 1].isspace():
        return None
    pos += 1
    return magic, width, height, maxval, pos


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only; 3 = palette needs PLTE
# indirection and stays on the PIL tier)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png(payload: bytes) -> list[float] | None:
    """Pure-stdlib PNG decode for the formats stdlib can actually reach:
    zlib-inflated IDAT + the five scanline filters (None/Sub/Up/Average/
    Paeth, RFC 2083 §6) for 8-bit gray / gray+alpha / RGB / RGBA,
    non-interlaced. Returns the row-major BT.601 luminance sequence, or
    None for anything else (palette, 16-bit, interlaced, truncated) —
    which falls through to the PIL tier. Alpha is ignored (luminance of
    the stored channels), matching PIL's ``convert("L")`` on opaque
    images — the only kind the pipeline's deterministic doubles emit."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        return None
    pos, width = len(_PNG_SIG), -1
    height = bit_depth = color_type = interlace = -1
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None  # truncated chunk
        if ctype == b"IHDR":
            if length < 13:
                return None
            width, height = struct.unpack_from(">II", data, 0)
            bit_depth, color_type = data[8], data[9]
            # compression method and filter method must both be 0 (the
            # only values RFC 2083 defines) — anything else would inflate
            # fine but defilter to garbage under method-0 rules
            if data[10] != 0 or data[11] != 0:
                return None
            interlace = data[12]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if (
        width <= 0
        or height <= 0
        or bit_depth != 8
        or interlace != 0
        or color_type not in _PNG_CHANNELS
        or not idat
    ):
        return None
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * ch
    if len(raw) < height * (stride + 1):
        return None
    prev = bytearray(stride)
    lum: list[float] = []
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            return None  # not a legal filter type
        prev = line
        if ch >= 3:
            lum.extend(
                0.299 * line[i] + 0.587 * line[i + 1] + 0.114 * line[i + 2]
                for i in range(0, stride, ch)
            )
        else:  # gray / gray+alpha: first sample IS the luminance
            lum.extend(float(line[i]) for i in range(0, stride, ch))
    return lum


def _decode_uncompressed(payload: bytes) -> list[float] | None:
    """Real byte→pixel decode for the formats stdlib can reach — PPM/PGM
    (binary P6/P5), uncompressed 24/32-bit BMP, and 8-bit non-interlaced
    PNG (zlib inflate + scanline defilter, ``_decode_png``) — so
    ``decode_image`` does genuine pixel math in ANY environment. Pure
    stdlib: header parse → luminance (ITU-R BT.601) → FEATURE_DIM box
    buckets over the row-major pixel sequence, each averaged and
    normalized to [0, 1]. Returns None for anything else (JPEG/16-bit or
    palette PNG/…), which falls through to the PIL escape hatch."""
    lum: list[float] | None = None
    hdr = _parse_pnm_header(payload)
    if hdr is not None:
        magic, width, height, maxval, off = hdr
        n = width * height
        if magic == "P5":
            raster = payload[off : off + n]
            if len(raster) < n:
                return None
            lum = [b * 255.0 / maxval for b in raster]
        else:
            raster = payload[off : off + 3 * n]
            if len(raster) < 3 * n:
                return None
            lum = [
                (
                    0.299 * raster[i]
                    + 0.587 * raster[i + 1]
                    + 0.114 * raster[i + 2]
                )
                * 255.0
                / maxval
                for i in range(0, 3 * n, 3)
            ]
    elif payload.startswith(_PNG_SIG):
        lum = _decode_png(payload)
    elif payload[:2] == b"BM" and len(payload) >= 54:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:  # BITMAPCOREHEADER etc. — not worth supporting
            return None
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        # height == 0 is a degenerate header, not an empty image: fall
        # through to PIL/stub rather than fabricating an all-zero vector
        if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
            return None
        bottom_up = height > 0
        height = abs(height)
        bypp = bpp // 8
        stride = (width * bypp + 3) & ~3  # rows pad to 4 bytes
        if len(payload) < data_off + stride * height:
            return None
        lum = []
        rows = range(height - 1, -1, -1) if bottom_up else range(height)
        for r in rows:  # emit top-down regardless of storage order
            base = data_off + r * stride
            for x in range(width):
                b0 = base + x * bypp  # BGR(A) byte order
                lum.append(
                    0.299 * payload[b0 + 2]
                    + 0.587 * payload[b0 + 1]
                    + 0.114 * payload[b0]
                )
    if lum is None:
        return None
    n = len(lum)
    if n == 0:
        return [0.0] * FEATURE_DIM
    # FEATURE_DIM contiguous box buckets over the row-major sequence
    out = []
    for k in range(FEATURE_DIM):
        lo, hi = k * n // FEATURE_DIM, (k + 1) * n // FEATURE_DIM
        if hi <= lo:
            hi = lo + 1  # fewer pixels than buckets: repeat-sample
            lo = min(lo, n - 1)
            hi = min(hi, n)
        out.append(sum(lum[lo:hi]) / (hi - lo) / 255.0)
    return out


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode a media payload into pixel features.

    Three tiers, most portable first: (1) NATIVE — PPM/PGM, uncompressed
    BMP, and 8-bit non-interlaced PNG decode in pure stdlib
    (``_decode_uncompressed``; PNG via zlib inflate + the five scanline
    filters), real pixel math with zero codec dependencies; (2) PIL
    escape hatch — if PIL is importable at CALL time, the remaining
    compressed formats (JPEG, exotic PNGs, …) decode for real (open → grayscale → FEATURE_DIM×1
    thumbnail → normalized pixel vector); (3) otherwise an
    environment-blocked STUB: with ``fake=True`` it returns a
    deterministic FEATURE_DIM-vector derived from the payload digest —
    stable across runs/executors, so downstream plumbing is fully
    testable — and without it, it raises. ``fake=True`` ALWAYS takes the
    digest double: the registered queries' DuckDB oracle replays md5-hex
    arithmetic, which must hold bit-identically in every environment."""
    if fake:
        d = hashlib.md5(payload).digest()
        return [d[i] / 255.0 for i in range(FEATURE_DIM)]
    native = _decode_uncompressed(payload)
    if native is not None:
        return native
    pil = _try_pil()
    if pil is not None:
        import io

        img = pil.open(io.BytesIO(payload)).convert("L").resize((FEATURE_DIM, 1))
        return [b / 255.0 for b in img.tobytes()[:FEATURE_DIM]]
    raise NotImplementedError(
        "this format's decode requires image libraries not present "
        "here; PPM/PGM/BMP/8-bit PNG decode natively, or pass fake=True "
        "for the deterministic test double"
    )


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
