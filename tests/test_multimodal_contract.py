"""Decoder-tier independence contract for the registered media faces
(r6 verdict item 3).

The registered media queries (media_stats, media_features_long,
media_resize/_hex, media_frames/_hex) must be INDEPENDENT of the
``decode_image`` tier stack: the feature face rides the md5 digest
double (``fake=True``) and the resize/frame faces never decode at all.
``decode_image`` keeps growing native formats (r6 added 8-bit PNG);
these tests make it impossible for future decoder work to silently
shift a hash-checked face — sabotage every real-decode tier and assert
the registered outputs are bit-identical to md5 arithmetic computed
here from first principles.
"""

from __future__ import annotations

import hashlib

import pytest

from etl_master_spark.operators import multimodal


def _golden_digest_vector(payload: bytes) -> list[float]:
    d = hashlib.md5(payload).digest()
    return [d[i] / 255.0 for i in range(multimodal.FEATURE_DIM)]


@pytest.fixture
def sabotaged_decoders(monkeypatch):
    """Make every real-decode tier poisonous in the DRIVER process: a
    driver-side decode through the native or PIL tier returns garbage
    (native) or explodes (PIL probe). mapInPandas workers re-import the
    module unpatched, so for the Spark-executed faces the load-bearing
    pin is the golden md5 equality below — any decoder routing change
    that moved a face off pure digest arithmetic fails that compare."""
    monkeypatch.setattr(
        multimodal,
        "_decode_uncompressed",
        lambda payload: [0.123456] * multimodal.FEATURE_DIM,
    )

    def _boom():
        raise AssertionError("registered faces must never probe PIL")

    monkeypatch.setattr(multimodal, "_try_pil", _boom)


def test_digest_double_ignores_decoder_tiers(sabotaged_decoders):
    payload = b"any bytes at all \x00\xff PNG-looking \x89PNG prefix too"
    assert multimodal.decode_image(payload, fake=True) == _golden_digest_vector(
        payload
    )
    # the sabotage itself is live: the non-fake path returns the poison
    assert multimodal._decode_uncompressed(payload) == [
        0.123456
    ] * multimodal.FEATURE_DIM


def test_media_features_long_is_pure_md5(spark, sf_dir, sabotaged_decoders):
    """The registered feature face equals md5 arithmetic recomputed here,
    with every real decoder sabotaged — decoder drift cannot move it."""
    rows = multimodal.media_features_long(spark, sf_dir).collect()
    assert rows
    texts = {
        r["media_id"]: r["text"]
        for r in multimodal.media_table(spark, sf_dir)
        .selectExpr("media_id", "decode(payload, 'utf-8') AS text")
        .collect()
    }
    seen_ids = set()
    for r in rows:
        payload = texts[r["media_id"]].encode("utf-8")
        golden = _golden_digest_vector(payload)
        assert r["value"] == golden[r["dim_idx"]], (r["media_id"], r["dim_idx"])
        assert r["n_bytes"] == len(payload)
        seen_ids.add(r["media_id"])
    assert seen_ids == set(texts)


def test_resize_and_frame_faces_never_decode(spark, sf_dir, sabotaged_decoders):
    """The byte-math faces are decode-free by construction: with the
    decoder stack sabotaged they still equal slice/pad arithmetic."""
    media = {
        r["media_id"]: bytes(r["payload"])
        for r in multimodal.media_table(spark, sf_dir)
        .select("media_id", "payload")
        .collect()
    }

    for r in multimodal.resize_media_hex(spark, sf_dir).collect():
        p = media[r["media_id"]]
        assert r["payload_hex"] == p[:64].ljust(64, b"\0").hex().upper()
        assert r["orig_bytes"] == len(p)

    frames = multimodal.sample_frames_hex(spark, sf_dir).collect()
    by_media: dict[int, dict[int, str]] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_hex"]
    stride = multimodal.FRAME_STRIDE
    for mid, p in media.items():
        chunks = {
            j: p[off : off + stride].hex().upper()
            for j, off in enumerate(range(0, len(p), stride))
        }
        assert by_media.get(mid, {}) == chunks
