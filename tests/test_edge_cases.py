"""Long-tail edge cases across indexes (mirrors the breadth of the
reference's per-knob test files: empty indexes, single elements, k edge
values, serialization corruption, flush-twice, re-add after flush, etc.)."""

import io

import numpy as np
import pytest

from comet_tpu.indexes.bm25 import BM25SearchIndex
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex
from comet_tpu.indexes.ivf import IVFIndex
from comet_tpu.indexes.ivfpq import IVFPQIndex
from comet_tpu.indexes.metadata import RoaringMetadataIndex, eq
from comet_tpu.indexes.pq import PQIndex
from comet_tpu.io.serial import SerializationError
from comet_tpu.types import DistanceKind, InvalidConfigError


def all_vector_indexes(dim=8, rng=None):
    """One trained instance of each vector index type with 50 docs."""
    rng = rng or np.random.default_rng(0)
    data = rng.normal(size=(50, dim)).astype(np.float32)
    out = []
    flat = FlatIndex(dim)
    flat.add_batch(data, ids=range(1, 51))
    out.append((flat, data))
    ivf = IVFIndex(dim, 4)
    ivf.train(data)
    ivf.add_batch(data, ids=range(1, 51))
    out.append((ivf, data))
    pq = PQIndex(dim, m=2, nbits=4)
    pq.train(data)
    pq.add_batch(data, ids=range(1, 51))
    out.append((pq, data))
    ivfpq = IVFPQIndex(dim, nlist=4, m=2, nbits=4)
    ivfpq.train(data)
    ivfpq.add_batch(data, ids=range(1, 51))
    out.append((ivfpq, data))
    hnsw = HNSWIndex(dim, config=HNSWConfig(m=4, ef_construction=16, ef_search=16))
    hnsw.add_batch(data, ids=range(1, 51))
    out.append((hnsw, data))
    return out


def test_search_empty_index_every_type():
    for idx in (
        FlatIndex(4),
        HNSWIndex(4, config=HNSWConfig(m=4, ef_construction=8, ef_search=8)),
    ):
        res = idx.new_search().with_query([0.0] * 4).with_k(5).execute()
        assert res == []
    bm = BM25SearchIndex()
    assert bm.new_search().with_query("x").execute() == []
    mi = RoaringMetadataIndex()
    assert mi.new_search().with_filters(eq("a", "b")).execute() == []


def test_k_one_and_k_huge_every_type(rng):
    for idx, data in all_vector_indexes(rng=rng):
        kwargs = {}
        s = idx.new_search().with_query(data[0]).with_k(1)
        if idx.kind().value in ("ivf", "ivfpq"):
            s = s.with_nprobes(4)
        res = s.execute()
        assert len(res) == 1, idx.kind()
        s = idx.new_search().with_query(data[0]).with_k(10_000)
        if idx.kind().value in ("ivf", "ivfpq"):
            s = s.with_nprobes(4)
        res = s.execute()
        assert len(res) == 50, idx.kind()


def test_remove_all_then_search_every_type(rng):
    for idx, data in all_vector_indexes(rng=rng):
        for i in range(1, 51):
            idx.remove(i)
        assert idx.count() == 0
        s = idx.new_search().with_query(data[0]).with_k(5)
        if idx.kind().value in ("ivf", "ivfpq"):
            s = s.with_nprobes(4)
        assert s.execute() == [], idx.kind()


def test_flush_twice_is_idempotent(rng):
    for idx, data in all_vector_indexes(rng=rng):
        idx.remove(3)
        idx.flush()
        count1 = idx.count()
        idx.flush()
        assert idx.count() == count1 == 49, idx.kind()


def test_re_add_id_after_flush(rng):
    idx = FlatIndex(4)
    idx.add_batch(rng.normal(size=(5, 4)).astype(np.float32), ids=range(1, 6))
    idx.remove(2)
    idx.flush()
    # id 2 is gone for good; re-adding it must work
    idx.add_batch(np.ones((1, 4), dtype=np.float32), ids=[2])
    res = idx.new_search().with_query([1.0] * 4).with_k(1).execute()
    assert res[0].node.id == 2


def test_serialization_truncated_stream(rng):
    for idx, _ in all_vector_indexes(rng=rng):
        buf = io.BytesIO()
        idx.write_to(buf)
        raw = buf.getvalue()
        fresh = type(idx).__new__(type(idx))
        fresh.__dict__.update(idx.__dict__)  # same params
        with pytest.raises(SerializationError):
            fresh.read_from(io.BytesIO(raw[: len(raw) // 2]))


def test_serialization_garbage_stream():
    idx = FlatIndex(4)
    with pytest.raises(SerializationError):
        idx.read_from(io.BytesIO(b"\x00" * 64))


def test_reranker_on_every_vector_type(rng):
    class TopFlip:
        def rerank(self, results):
            return list(reversed(results))

    for idx, data in all_vector_indexes(rng=rng):
        s = idx.new_search().with_query(data[0]).with_k(3).with_reranker(TopFlip())
        if idx.kind().value in ("ivf", "ivfpq"):
            s = s.with_nprobes(4)
        res = s.execute()
        assert len(res) == 3
        # reversed => last element is the best hit
        assert res[-1].score <= res[0].score, idx.kind()


def test_autocut_on_every_vector_type(rng):
    for idx, data in all_vector_indexes(rng=rng):
        s = idx.new_search().with_query(data[0]).with_k(20).with_cutoff(1)
        if idx.kind().value in ("ivf", "ivfpq"):
            s = s.with_nprobes(4)
        res = s.execute()
        assert 0 < len(res) <= 20, idx.kind()


def test_doc_filter_with_nonexistent_ids(rng):
    for idx, data in all_vector_indexes(rng=rng):
        s = (
            idx.new_search().with_query(data[0]).with_k(5)
            .with_document_ids([9999, 10000])
        )
        if idx.kind().value in ("ivf", "ivfpq"):
            s = s.with_nprobes(4)
        assert s.execute() == [], idx.kind()


def test_bm25_single_doc_corpus():
    bm = BM25SearchIndex()
    bm.add(1, "lonely document")
    res = bm.new_search().with_query("lonely").with_k(10).execute()
    assert [r.id for r in res] == [1]
    assert res[0].score > 0


def test_bm25_add_empty_text():
    bm = BM25SearchIndex()
    bm.add(1, "")
    assert bm.count() == 1
    assert bm.new_search().with_query("anything").execute() == []


def test_metadata_empty_metadata_doc():
    from comet_tpu.core.node import new_metadata_node_with_id

    mi = RoaringMetadataIndex()
    mi.add(new_metadata_node_with_id(1, {}))
    assert mi.count() == 1
    # matches no field filters, but appears in no-filter results
    assert [r.id for r in mi.new_search().execute()] == [1]


def test_hnsw_search_batch_smaller_than_chunk(rng):
    idx = HNSWIndex(8, config=HNSWConfig(m=4, ef_construction=16, ef_search=16))
    data = rng.normal(size=(30, 8)).astype(np.float32)
    idx.add_batch(data, ids=range(1, 31))
    ids, scores = idx.search_batch(data[:3], k=5)
    assert ids.shape == (3, 5)
    assert (ids[:, 0] == np.array([1, 2, 3])).all()


def test_ivf_more_lists_than_docs(rng):
    idx = IVFIndex(4, 8)
    data = rng.normal(size=(8, 4)).astype(np.float32)
    idx.train(data)
    idx.add_batch(data[:3], ids=[1, 2, 3])
    res = idx.new_search().with_query(data[0]).with_k(5).with_nprobes(8).execute()
    assert res[0].node.id == 1


def test_threshold_excludes_everything(rng):
    for idx, data in all_vector_indexes(rng=rng):
        s = idx.new_search().with_query(data[0]).with_k(5).with_threshold(1e-9)
        if idx.kind().value in ("ivf", "ivfpq"):
            s = s.with_nprobes(4)
        res = s.execute()
        # only (near-)exact matches can pass a ~zero threshold
        assert all(r.score <= 1e-9 for r in res), idx.kind()
