"""Bulk (staged exact-kNN) HNSW construction — ops/graph_build.py.

Covers the graph-quality contract (beam recall vs the exact oracle on
clustered data — the regime where naive kNN graphs fail), determinism,
API behavior parity with the incremental path (filters, deletes, flush,
serialization), and the selection-heuristic unit semantics."""

import io

import numpy as np
import pytest

import comet_tpu.indexes.hnsw as hnsw_mod
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex
from comet_tpu.ops import graph_build as gb
from comet_tpu.types import DistanceKind


def _clustered(n, d, c, seed=0, queries=64):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(c, d)).astype(np.float32) * 2.0
    vecs = (
        centers[rng.integers(0, c, n)]
        + rng.normal(size=(n, d)).astype(np.float32) * 0.5
    ).astype(np.float32)
    qs = (
        centers[rng.integers(0, c, queries)]
        + rng.normal(size=(queries, d)).astype(np.float32) * 0.5
    ).astype(np.float32)
    return vecs, qs


@pytest.fixture(scope="module")
def bulk_fixture():
    """One shared bulk-built index (threshold lowered so the CPU suite
    stays fast) + oracle ground truth."""
    n, d = 1536, 24
    vecs, qs = _clustered(n, d, 24)
    ids = np.arange(1, n + 1, dtype=np.uint32)
    oracle = FlatIndex(d, DistanceKind.L2)
    oracle.add_batch(vecs, ids=ids)
    gt, _ = oracle.search_batch(qs, k=10)

    old = hnsw_mod.BULK_BUILD_MIN
    hnsw_mod.BULK_BUILD_MIN = 512
    try:
        idx = HNSWIndex(d, DistanceKind.L2, HNSWConfig(m=8, ef_construction=64))
        idx.add_batch(vecs, ids=ids)
    finally:
        hnsw_mod.BULK_BUILD_MIN = old
    assert idx._entry_slot >= 0  # bulk path actually ran
    return idx, vecs, qs, ids, gt


def test_bulk_build_triggers_and_populates(bulk_fixture):
    idx, vecs, qs, ids, gt = bulk_fixture
    n = len(vecs)
    adj = idx._adj0[:n]
    fill = (adj >= 0).sum(axis=1)
    assert fill.min() >= 1
    assert (adj < n).all()
    # forward rows obey the (dist asc, slot asc) + heuristic structure:
    # no duplicate neighbors within a row
    for row in adj[:64]:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live)


def test_bulk_recall_on_clustered_corpus(bulk_fixture):
    """The quality gate: naive kNN-graph construction measured 0.41
    recall@10 on clustered corpora; the staged+heuristic builder must
    stay near the incremental path's ~0.95."""
    idx, vecs, qs, ids, gt = bulk_fixture
    out, _ = idx.new_search().with_query(qs[0]).with_k(10).execute(), None
    ids_out, _ = idx.search_batch(qs, k=10, ef_search=96)
    rec = np.mean(
        [len(set(ids_out[i]) & set(gt[i])) / 10 for i in range(len(qs))]
    )
    assert rec >= 0.9, rec


def test_bulk_deterministic():
    n, d = 640, 16
    vecs, _ = _clustered(n, d, 8, seed=3)
    ids = np.arange(1, n + 1, dtype=np.uint32)
    old = hnsw_mod.BULK_BUILD_MIN
    hnsw_mod.BULK_BUILD_MIN = 256
    try:
        a = HNSWIndex(d, DistanceKind.L2, HNSWConfig(m=8, ef_construction=64), seed=7)
        a.add_batch(vecs, ids=ids)
        b = HNSWIndex(d, DistanceKind.L2, HNSWConfig(m=8, ef_construction=64), seed=7)
        b.add_batch(vecs, ids=ids)
    finally:
        hnsw_mod.BULK_BUILD_MIN = old
    np.testing.assert_array_equal(a._adj0, b._adj0)
    assert sorted(a._upper) == sorted(b._upper)
    for lvl in a._upper:
        np.testing.assert_array_equal(a._upper[lvl], b._upper[lvl])
    assert a._entry_slot == b._entry_slot


def test_incremental_adds_on_top_of_bulk(bulk_fixture):
    idx, vecs, qs, ids, gt = bulk_fixture
    rng = np.random.default_rng(9)
    extra = vecs[:16] + rng.normal(size=(16, vecs.shape[1])).astype(np.float32) * 1e-3
    new_ids = np.arange(50_000, 50_016, dtype=np.uint32)
    idx.add_batch(extra, ids=new_ids)
    # the new near-duplicates must be findable
    out, _ = idx.search_batch(extra, k=3, ef_search=96)
    hit = np.mean([new_ids[i] in out[i] for i in range(16)])
    assert hit >= 0.9
    # cleanup for other tests sharing the fixture
    for i in new_ids.tolist():
        idx.remove(i)
    idx.flush()


def test_bulk_respects_document_filter_and_threshold(bulk_fixture):
    idx, vecs, qs, ids, gt = bulk_fixture
    allowed = ids[: len(ids) // 3].tolist()
    res = (
        idx.new_search()
        .with_query(qs[0])
        .with_k(10)
        .with_document_ids(allowed)
        .execute()
    )
    assert len(res) > 0
    assert all(r.get_id() in set(allowed) for r in res)
    thr = 1.0
    res_t = (
        idx.new_search().with_query(qs[0]).with_k(10).with_threshold(thr).execute()
    )
    assert all(r.get_score() <= thr for r in res_t)


def test_bulk_serialization_roundtrip(bulk_fixture):
    idx, vecs, qs, ids, gt = bulk_fixture
    buf = io.BytesIO()
    idx.write_to(buf)
    buf.seek(0)
    idx2 = HNSWIndex(
        idx._dim, DistanceKind.L2,
        HNSWConfig(m=idx.config.m, ef_construction=idx.config.ef_construction),
    )
    idx2.read_from(buf)
    a, _ = idx.search_batch(qs[:16], k=10)
    b, _ = idx2.search_batch(qs[:16], k=10)
    np.testing.assert_array_equal(a, b)


def test_bulk_remove_then_flush(bulk_fixture):
    idx, vecs, qs, ids, gt = bulk_fixture
    victim = int(gt[0][0])
    idx.remove(victim)
    out, _ = idx.search_batch(qs[:1], k=10)
    assert victim not in out[0]
    idx.flush()
    out2, _ = idx.search_batch(qs[:1], k=10)
    assert victim not in out2[0]
    # put it back so other fixture users see a stable corpus
    idx.add_batch(vecs[victim - 1][None, :], ids=[victim])


def test_bulk_cosine():
    n, d = 700, 16
    vecs, qs = _clustered(n, d, 8, seed=5, queries=16)
    ids = np.arange(1, n + 1, dtype=np.uint32)
    oracle = FlatIndex(d, DistanceKind.COSINE)
    oracle.add_batch(vecs, ids=ids)
    gt, _ = oracle.search_batch(qs, k=5)
    old = hnsw_mod.BULK_BUILD_MIN
    hnsw_mod.BULK_BUILD_MIN = 256
    try:
        idx = HNSWIndex(d, DistanceKind.COSINE, HNSWConfig(m=8, ef_construction=64))
        idx.add_batch(vecs, ids=ids)
    finally:
        hnsw_mod.BULK_BUILD_MIN = old
    out, _ = idx.search_batch(qs, k=5, ef_search=96)
    rec = np.mean([len(set(out[i]) & set(gt[i])) / 5 for i in range(len(qs))])
    assert rec >= 0.85, rec


def test_intra_batch_duplicate_ids_rejected():
    """Duplicate IDs INSIDE one add_batch corrupt id_to_slot (two live
    slots, one id) — found by a verify probe; now rejected in SlotStore
    for every index type."""
    from comet_tpu.indexes.flat import FlatIndex
    from comet_tpu.types import InvalidConfigError

    for make in (
        lambda: FlatIndex(8, DistanceKind.L2),
        lambda: HNSWIndex(8, DistanceKind.L2, HNSWConfig(m=4, ef_construction=16)),
    ):
        idx = make()
        with pytest.raises(InvalidConfigError):
            idx.add_batch(np.ones((2, 8), np.float32), ids=[7, 7])
        assert idx.count() == 0


# -- selection heuristic unit semantics -------------------------------------


def test_finalize_rows_diversity_and_backfill():
    """The fused finalize pass: a candidate shadowed by a nearer admitted
    one is NOT admitted (relative-neighborhood rule) but backfills after
    the admitted ones, in distance order."""
    # node at origin; corpus rows: 0 unused, 1=(1,0) near, 2=(1.05,0)
    # shadowed by 1, 3=(0,5) far but diverse
    corpus = np.array(
        [[9.0, 9.0], [1.0, 0.0], [1.05, 0.0], [0.0, 5.0]], np.float32
    )
    b = gb.BulkGraphBuilder(corpus, 4, DistanceKind.L2)
    slots = np.array([[1, 2, 3]], np.int32)
    dists = np.array([[1.0, 1.1025, 25.0]], np.float32)  # squared
    ss, dd = b.finalize_rows(slots, dists, 3)
    # admitted: 1 (first), 3 (diverse); backfill: 2
    assert ss.tolist() == [[1, 3, 2]]

    ss2, dd2 = b.finalize_rows(slots, dists, 2)
    assert ss2.tolist() == [[1, 3]]


def test_finalize_rows_dedup_keeps_min_distance():
    """Duplicate slots (forward edge + its reverse append, distances a
    float apart) collapse to one entry with the smaller distance."""
    corpus = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]], np.float32)
    b = gb.BulkGraphBuilder(corpus, 3, DistanceKind.L2)
    slots = np.array([[1, 1, 2]], np.int32)
    dists = np.array([[1.0000001, 1.0, 4.0]], np.float32)
    ss, dd = b.finalize_rows(slots, dists, 3)
    assert ss.tolist() == [[1, 2, -1]]
    assert abs(dd[0, 0] - 1.0) < 1e-6
    assert not np.isfinite(dd[0, 2])
