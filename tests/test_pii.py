"""Planted-PII fixtures: the synthetic corpus is clean (pii_scan returns
zeros there), so only a constructed corpus can prove the patterns bind,
the redaction removes them, and clean text passes through untouched."""

from __future__ import annotations

import hashlib

from etl_master_spark.operators.text import pii_redact, pii_scan


DOCS = [
    # (doc_id, text, lang, source)
    (0, "contact alice@example.com or bob@test.org today", "en", "srcA"),
    (1, "call 555-123-4567 or 555.987.6543 now", "en", "srcA"),
    (2, "mixed: carol@corp.io and 111-222-3333", "en", "srcB"),
    (3, "clean document with no sensitive content", "en", "srcB"),
    # boundary: digits glued to more digits must NOT match (\b guard)
    (4, "serial 1234-567-89012 is a part number", "en", "srcB"),
]


def _write_docs(spark, path):
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_pii_scan_counts(spark, tmp_path):
    _write_docs(spark, str(tmp_path))
    out = {r["source"]: r.asDict() for r in pii_scan(spark, str(tmp_path)).collect()}
    assert out["srcA"]["n_docs"] == 2
    assert out["srcA"]["docs_with_email"] == 1
    assert out["srcA"]["total_emails"] == 2
    assert out["srcA"]["docs_with_phone"] == 1
    assert out["srcA"]["total_phones"] == 2
    assert out["srcB"]["n_docs"] == 3
    assert out["srcB"]["docs_with_email"] == 1
    assert out["srcB"]["total_emails"] == 1
    # doc 4's serial has a 5-digit tail: \b\d{3}[-.]\d{3}[-.]\d{4}\b must
    # not fire inside it
    assert out["srcB"]["docs_with_phone"] == 1
    assert out["srcB"]["total_phones"] == 1


def test_pii_redact_content(spark, tmp_path):
    _write_docs(spark, str(tmp_path))
    rows = {r["doc_id"]: r for r in pii_redact(spark, str(tmp_path)).collect()}
    expected = {
        0: "contact <EMAIL> or <EMAIL> today",
        1: "call <PHONE> or <PHONE> now",
        2: "mixed: <EMAIL> and <PHONE>",
        3: "clean document with no sensitive content",
        4: "serial 1234-567-89012 is a part number",
    }
    for doc_id, red in expected.items():
        assert rows[doc_id]["redacted_md5"] == hashlib.md5(red.encode()).hexdigest(), doc_id
    assert rows[3]["chars_removed"] == 0
    assert rows[4]["chars_removed"] == 0
