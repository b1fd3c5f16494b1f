"""Hybrid search tests (mirrors hybrid_search_index_test.go coverage)."""

import io

import numpy as np
import pytest

from comet_tpu.fusion import FusionConfig
from comet_tpu.hybrid import HybridSearchIndex, new_hybrid_search_index
from comet_tpu.indexes.bm25 import BM25SearchIndex
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.metadata import (
    FilterGroup,
    RoaringMetadataIndex,
    eq,
    gte,
    lt,
)
from comet_tpu.types import DistanceKind, FusionKind, InvalidConfigError


DOCS = [
    # (vector, text, metadata)
    ([1.0, 0.0], "red apple fruit sweet", {"category": "fruit", "price": 3.5}),
    ([0.9, 0.1], "green apple tart fruit", {"category": "fruit", "price": 2.0}),
    ([0.0, 1.0], "laptop computer electronics fast", {"category": "tech", "price": 999.0}),
    ([0.1, 0.9], "phone mobile electronics camera", {"category": "tech", "price": 599.0}),
    ([0.5, 0.5], "apple laptop macbook computer", {"category": "tech", "price": 1999.0}),
]


def build_index():
    idx = new_hybrid_search_index(
        FlatIndex(2, DistanceKind.COSINE),
        BM25SearchIndex(),
        RoaringMetadataIndex(),
    )
    ids = []
    for vec, text, meta in DOCS:
        ids.append(idx.add(np.array(vec, dtype=np.float32), text, meta))
    return idx, ids


def test_add_auto_ids_sequential():
    idx, ids = build_index()
    assert ids == [1, 2, 3, 4, 5]
    assert idx.count() == 5
    assert idx.has_document(3)


def test_vector_only_search():
    idx, ids = build_index()
    res = idx.new_search().with_vector([1.0, 0.05]).with_k(2).execute()
    assert [r.id for r in res][0] in (1, 2)
    # vector-only: scores are raw distances passed through fusion unchanged
    assert len(res) == 2


def test_text_only_search():
    idx, ids = build_index()
    res = idx.new_search().with_text("electronics computer").with_k(3).execute()
    got = [r.id for r in res]
    assert 3 in got


def test_metadata_only_search_scores_one():
    idx, ids = build_index()
    res = idx.new_search().with_metadata(eq("category", "fruit")).with_k(10).execute()
    assert sorted(r.id for r in res) == [1, 2]
    assert all(r.score == 1.0 for r in res)


def test_metadata_prefilter_restricts_vector_search():
    idx, ids = build_index()
    res = (
        idx.new_search()
        .with_vector([1.0, 0.0])
        .with_metadata(eq("category", "tech"))
        .with_k(10)
        .execute()
    )
    assert set(r.id for r in res) <= {3, 4, 5}
    # doc 5 is the tech doc closest to [1, 0]
    assert res[0].id == 5


def test_empty_metadata_candidates_early_exit():
    idx, ids = build_index()
    res = (
        idx.new_search()
        .with_vector([1.0, 0.0])
        .with_metadata(eq("category", "nonexistent"))
        .execute()
    )
    assert res == []


def test_hybrid_fusion_weighted_sum_default():
    idx, ids = build_index()
    res = (
        idx.new_search()
        .with_vector([1.0, 0.0])
        .with_text("apple")
        .with_k(5)
        .execute()
    )
    # weighted-sum fuses raw scores; docs in both result sets rank by sum
    assert len(res) == 5
    vec = {
        r.get_id(): float(r.get_score())
        for r in idx.vector_index().new_search().with_query([1.0, 0.0]).with_k(5).execute()
    }
    txt = {
        r.get_id(): float(r.get_score())
        for r in idx.text_index().new_search().with_query("apple").with_k(5).execute()
    }
    for r in res:
        want = vec.get(r.id, 0.0) + txt.get(r.id, 0.0)
        assert r.score == pytest.approx(want, rel=1e-5)


def test_rrf_fusion():
    idx, ids = build_index()
    res = (
        idx.new_search()
        .with_vector([1.0, 0.0])
        .with_text("apple")
        .with_fusion_kind(FusionKind.RECIPROCAL_RANK)
        .with_k(5)
        .execute()
    )
    assert len(res) == 5
    # RRF scores bounded by 2/60
    assert all(0 < r.score <= 2 / 60 + 1e-9 for r in res)
    # doc appearing top in BOTH lists should rank first: doc 1 (closest
    # vector AND has "apple"); doc 2 also has apple. Verify doc1 before doc3.
    pos = {r.id: i for i, r in enumerate(res)}
    assert pos[1] < pos[3]


def test_rrf_custom_k_config():
    idx, ids = build_index()
    res = (
        idx.new_search()
        .with_vector([1.0, 0.0])
        .with_text("apple")
        .with_fusion_kind(FusionKind.RECIPROCAL_RANK, FusionConfig(k=10))
        .with_k(3)
        .execute()
    )
    assert all(r.score <= 2 / 10 + 1e-9 for r in res)


def test_metadata_groups():
    idx, ids = build_index()
    res = (
        idx.new_search()
        .with_metadata_groups(
            FilterGroup([eq("category", "fruit"), lt("price", 3.0)], "AND"),
            FilterGroup([eq("category", "tech"), gte("price", 1500)], "AND"),
        )
        .with_k(10)
        .execute()
    )
    assert sorted(r.id for r in res) == [2, 5]


def test_remove_document():
    idx, ids = build_index()
    idx.remove(1)
    assert idx.count() == 4
    res = idx.new_search().with_text("apple").with_k(10).execute()
    assert 1 not in [r.id for r in res]
    res = idx.new_search().with_metadata(eq("category", "fruit")).execute()
    assert sorted(r.id for r in res) == [2]
    with pytest.raises(InvalidConfigError):
        idx.remove(999)


def test_partial_modalities():
    idx = new_hybrid_search_index(
        FlatIndex(2, DistanceKind.L2), BM25SearchIndex(), RoaringMetadataIndex()
    )
    a = idx.add(np.array([1.0, 0.0], dtype=np.float32), "", None)  # vector only
    b = idx.add(None, "text only document", None)
    c = idx.add(None, "", {"k": "v"})
    res = idx.new_search().with_vector([1.0, 0.0]).with_k(5).execute()
    assert [r.id for r in res] == [a]
    res = idx.new_search().with_text("document").with_k(5).execute()
    assert [r.id for r in res] == [b]
    res = idx.new_search().with_metadata(eq("k", "v")).execute()
    assert [r.id for r in res] == [c]


def test_missing_index_errors():
    idx = new_hybrid_search_index(None, None, None)
    with pytest.raises(InvalidConfigError):
        idx.new_search().with_vector([1.0]).execute()
    with pytest.raises(InvalidConfigError):
        idx.new_search().with_text("x").execute()
    with pytest.raises(InvalidConfigError):
        idx.new_search().with_metadata(eq("a", "b")).execute()


def test_knobs_passthrough_threshold():
    idx, ids = build_index()
    res = (
        idx.new_search()
        .with_vector([1.0, 0.0])
        .with_threshold(0.05)
        .with_k(10)
        .execute()
    )
    # cosine distance <= 0.05 keeps only very close docs
    assert set(r.id for r in res) <= {1, 2}


def test_serialization_roundtrip():
    idx, ids = build_index()
    bufs = [io.BytesIO() for _ in range(4)]
    idx.write_to(*bufs)
    for b in bufs:
        b.seek(0)
    idx2 = new_hybrid_search_index(
        FlatIndex(2, DistanceKind.COSINE), BM25SearchIndex(), RoaringMetadataIndex()
    )
    idx2.read_from(*bufs)
    assert idx2.count() == 5
    r1 = idx.new_search().with_vector([1.0, 0.0]).with_text("apple").with_k(5).execute()
    r2 = idx2.new_search().with_vector([1.0, 0.0]).with_text("apple").with_k(5).execute()
    assert [(r.id, pytest.approx(r.score, rel=1e-6)) for r in r1] == [
        (r.id, r.score) for r in r2
    ]


def test_stats():
    idx, ids = build_index()
    s = idx.stats()
    assert s["docs"] == 5
    assert s["vector"]["live"] == 5
    assert s["text"]["docs"] == 5
    assert s["metadata"]["docs"] == 5


def test_search_batch_equals_sequential_execute(rng):
    """The batched hybrid API must reproduce new_search().execute() per
    query (same candidates, fusion math, ordering, metadata-only rule)."""
    from comet_tpu.types import FusionKind

    import numpy as np
    from comet_tpu.hybrid import new_hybrid_search_index
    from comet_tpu.indexes.flat import FlatIndex
    from comet_tpu.indexes.bm25 import BM25SearchIndex
    from comet_tpu.indexes.metadata import RoaringMetadataIndex, eq, gte
    from comet_tpu.types import DistanceKind

    idx = new_hybrid_search_index(
        FlatIndex(8, DistanceKind.L2), BM25SearchIndex(), RoaringMetadataIndex()
    )
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for i in range(60):
        vec = rng.normal(size=8).astype(np.float32)
        text = " ".join(rng.choice(words, size=4))
        idx.add_with_id(i + 1, vec, text, {"cat": ["x", "y"][i % 2], "num": i})

    queries = rng.normal(size=(5, 8)).astype(np.float32)
    texts = ["alpha beta", "gamma", "delta epsilon", "alpha", "beta gamma"]
    filters = [eq("cat", "x"), gte("num", 10)]

    batch = idx.search_batch(
        queries, texts, k=7,
        metadata_filters=filters,
        fusion_kind=FusionKind.RECIPROCAL_RANK,
    )
    assert len(batch) == 5
    for qi in range(5):
        seq = (
            idx.new_search()
            .with_vector(queries[qi])
            .with_text(texts[qi])
            .with_metadata(*filters)
            .with_fusion_kind(FusionKind.RECIPROCAL_RANK)
            .with_k(7)
            .execute()
        )
        assert [(r.id, round(r.score, 9)) for r in batch[qi]] == [
            (r.id, round(r.score, 9)) for r in seq
        ], qi

    # vector-only batch keeps ascending distance order
    vb = idx.search_batch(queries, None, k=5)
    for qi in range(5):
        seq = idx.new_search().with_vector(queries[qi]).with_k(5).execute()
        assert [r.id for r in vb[qi]] == [r.id for r in seq]

    # text-only and metadata-only
    tb = idx.search_batch(None, texts, k=5, metadata_filters=[eq("cat", "y")])
    for qi in range(5):
        seq = (
            idx.new_search().with_text(texts[qi])
            .with_metadata(eq("cat", "y")).with_k(5).execute()
        )
        assert [r.id for r in tb[qi]] == [r.id for r in seq]

    mb = idx.search_batch(None, None, k=100)
    assert mb == []
