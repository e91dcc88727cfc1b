"""The recommended-face map (r8 verdict item 6): machine-readable
pointers from every scale-twin family to its one scale-safe spelling."""

from __future__ import annotations

from etl_master_spark.plans.registry import (
    FAMILIES,
    QUERIES,
    SCALE_TWIN_SUFFIXES,
    recommended,
)


def test_every_family_face_is_registered_and_has_one_recommendation():
    for fam, spec in FAMILIES.items():
        assert len(spec["faces"]) >= 2, fam  # a family IS a set of twins
        for face in spec["faces"]:
            assert face in QUERIES, (fam, face)
        assert spec["recommended"] in spec["faces"], fam
        assert spec["why"], fam


def test_faces_belong_to_exactly_one_family():
    seen: dict[str, str] = {}
    for fam, spec in FAMILIES.items():
        for face in spec["faces"]:
            assert face not in seen, (face, seen.get(face), fam)
            seen[face] = fam


def test_every_scale_suffixed_query_belongs_to_a_family():
    """Guard for future twins: registering a *_routed / *_bucketed /
    *_reject / *_jvm / *_threshold / *_p99 face without adding it to
    FAMILIES leaves users with no pointer — fail here."""
    in_family = {f for spec in FAMILIES.values() for f in spec["faces"]}
    missing = [
        q
        for q in QUERIES
        if q.endswith(SCALE_TWIN_SUFFIXES) and q not in in_family
    ]
    assert not missing, missing


def test_recommended_resolution():
    assert recommended("user_sessions") == "user_sessions_routed"
    assert recommended("user_sessions_routed") == "user_sessions_routed"
    assert recommended("dedup_ngram_jaccard") == "dedup_ngram_jaccard_topk"
    assert recommended("ann_cosine_topk") == "ann_ivfpq_topk"
    # identity for standalone queries
    assert recommended("pricing_summary") == "pricing_summary"
    assert recommended("not_a_query") == "not_a_query"
