"""Shard-count invariance: every sharded searcher must return EXACTLY the
same (scores, slots) — including tie order — on 1, 2, 4, and 8 shards, and
match the single-device index, with and without filters and deletes
(VERDICT r2 #10: make the 1-vs-8 determinism matrix exhaustive)."""

import jax
import numpy as np
import pytest

from comet_tpu.parallel.sharded import (
    ShardedFlatSearcher,
    ShardedHNSWSearcher,
    ShardedIVFPQSearcher,
    ShardedIVFSearcher,
    ShardedPQSearcher,
    make_corpus_mesh,
    make_sharded_kmeans_step,
    shard_rows,
)
from comet_tpu.types import DistanceKind

SHARD_COUNTS = (1, 2, 4, 8)
SENTINEL = 2**31 - 1


def mesh_of(n):
    return make_corpus_mesh(jax.devices()[:n])


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    return rng.normal(size=(1536, 24)).astype(np.float32)


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(12)
    return rng.normal(size=(16, 24)).astype(np.float32)


def runs_equal(runs):
    ref_scores, ref_slots = runs[0]
    for scores, slots in runs[1:]:
        assert np.array_equal(np.asarray(slots), np.asarray(ref_slots))
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(ref_scores), rtol=1e-5, atol=1e-5
        )


def test_flat_all_shard_counts(corpus, queries):
    runs = []
    for s in SHARD_COUNTS:
        searcher = ShardedFlatSearcher(
            mesh_of(s), corpus, DistanceKind.L2, tile=128
        )
        runs.append(searcher.search(queries, k=10))
    runs_equal(runs)


def test_flat_with_allowed_mask(corpus, queries):
    rng = np.random.default_rng(13)
    allowed = rng.random(len(corpus)) < 0.5
    runs = []
    for s in SHARD_COUNTS:
        searcher = ShardedFlatSearcher(
            mesh_of(s), corpus, DistanceKind.L2, tile=128
        )
        runs.append(searcher.search(queries, k=10, allowed=allowed))
    runs_equal(runs)
    slots = np.asarray(runs[0][1])
    hit = slots[(slots >= 0) & (slots != SENTINEL)].astype(np.int64)
    assert allowed[hit].all()


def test_flat_cosine_shard_counts(corpus, queries):
    runs = []
    for s in SHARD_COUNTS:
        searcher = ShardedFlatSearcher(
            mesh_of(s), corpus, DistanceKind.COSINE, tile=128
        )
        runs.append(searcher.search(queries, k=10))
    runs_equal(runs)


@pytest.fixture(scope="module")
def ivf_index(corpus):
    from comet_tpu.indexes.ivf import IVFIndex

    idx = IVFIndex(24, 16, DistanceKind.L2)
    idx.train(corpus)
    idx.add_batch(corpus, ids=range(1, len(corpus) + 1))
    return idx


def test_ivf_all_shard_counts(ivf_index, queries):
    runs = []
    for s in SHARD_COUNTS:
        searcher = ShardedIVFSearcher(mesh_of(s), ivf_index, tile=128)
        runs.append(searcher.search(queries, k=10, nprobe=4))
    runs_equal(runs)


def test_ivf_matches_single_device_index(ivf_index, queries):
    want_rows = [
        [(r.node.id, float(r.score)) for r in ivf_index.new_search()
         .with_query(q).with_k(10).with_nprobes(4).execute()]
        for q in queries
    ]
    scores, slots = ShardedIVFSearcher(mesh_of(8), ivf_index, tile=128).search(
        queries, k=10, nprobe=4
    )
    store_ids = ivf_index._store.ids
    for row_want, row_slots, row_s in zip(
        want_rows, np.asarray(slots), np.asarray(scores)
    ):
        live = row_slots != SENTINEL
        got_ids = [int(store_ids[sl]) for sl in row_slots[live]]
        assert got_ids == [w[0] for w in row_want]
        np.testing.assert_allclose(
            row_s[live], [w[1] for w in row_want], rtol=1e-4, atol=1e-4
        )


@pytest.fixture(scope="module")
def pq_index(corpus):
    from comet_tpu.indexes.pq import PQIndex

    idx = PQIndex(24, m=4, distance_kind=DistanceKind.L2)
    idx.train(corpus)
    idx.add_batch(corpus, ids=range(1, len(corpus) + 1))
    return idx


def test_pq_all_shard_counts(pq_index, queries):
    runs = []
    for s in SHARD_COUNTS:
        searcher = ShardedPQSearcher(mesh_of(s), pq_index, tile=128)
        runs.append(searcher.search(queries, k=10))
    runs_equal(runs)


@pytest.fixture(scope="module")
def ivfpq_index(corpus):
    from comet_tpu.indexes.ivfpq import IVFPQIndex

    idx = IVFPQIndex(24, nlist=16, m=4, distance_kind=DistanceKind.L2)
    idx.train(corpus)
    idx.add_batch(corpus, ids=range(1, len(corpus) + 1))
    return idx


def test_ivfpq_all_shard_counts(ivfpq_index, queries):
    runs = []
    for s in SHARD_COUNTS:
        searcher = ShardedIVFPQSearcher(mesh_of(s), ivfpq_index, tile=128)
        runs.append(searcher.search(queries, k=10, nprobe=4))
    runs_equal(runs)


def test_ivfpq_deletes_consistent_across_shards(corpus, queries):
    from comet_tpu.indexes.ivfpq import IVFPQIndex

    idx = IVFPQIndex(24, nlist=16, m=4, distance_kind=DistanceKind.L2)
    idx.train(corpus)
    idx.add_batch(corpus, ids=range(1, len(corpus) + 1))
    for did in range(1, 100):
        idx.remove(did)
    runs = []
    for s in SHARD_COUNTS:
        searcher = ShardedIVFPQSearcher(mesh_of(s), idx, tile=128)
        runs.append(searcher.search(queries, k=10, nprobe=16))
    runs_equal(runs)
    slots = np.asarray(runs[0][1])
    live = slots[slots != SENTINEL].astype(np.int64)
    got_ids = idx._store.ids[live]
    assert not np.isin(got_ids, np.arange(1, 100)).any()


@pytest.fixture(scope="module")
def hnsw_index(corpus):
    from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex

    idx = HNSWIndex(
        24, DistanceKind.L2, HNSWConfig(m=8, ef_construction=48, ef_search=48)
    )
    idx.add_batch(corpus, ids=list(range(1, len(corpus) + 1)))
    return idx


def test_hnsw_all_shard_counts(hnsw_index, queries):
    """HNSW shards QUERIES over a replicated graph: any shard count must
    reproduce the single-device index's results exactly."""
    want_ids, want_sc = hnsw_index.search_batch(queries, k=10)
    n = hnsw_index._store.n
    for s in SHARD_COUNTS:
        sc, slots = ShardedHNSWSearcher(mesh_of(s), hnsw_index).search(
            queries, k=10
        )
        got_ids = np.where(
            slots == SENTINEL,
            0xFFFFFFFF,
            hnsw_index._store.ids[np.clip(slots, 0, n - 1)],
        ).astype(np.uint32)
        np.testing.assert_array_equal(got_ids, np.asarray(want_ids))
        np.testing.assert_allclose(sc, want_sc, rtol=1e-5, atol=1e-5)


def test_kmeans_step_shard_counts(corpus):
    """The psum k-means step yields identical assignments and centroids on
    every shard count."""
    k = 8
    centroids = corpus[:k].copy()
    prev = np.full(len(corpus), -1, dtype=np.int32)
    valid = np.ones(len(corpus), dtype=bool)
    outs = []
    for s in SHARD_COUNTS:
        mesh = mesh_of(s)
        step = make_sharded_kmeans_step(mesh, DistanceKind.L2_SQUARED)
        xs, vs, ps = shard_rows(mesh, corpus, valid, prev)
        assign, new_c, changed = step(xs, vs, ps, centroids)
        outs.append((np.asarray(assign), np.asarray(new_c), bool(changed)))
    for a, c, ch in outs[1:]:
        assert np.array_equal(a, outs[0][0])
        np.testing.assert_allclose(c, outs[0][1], rtol=1e-4, atol=1e-4)
        assert ch == outs[0][2]


def test_kmeans_multi_iteration_convergence_identical(corpus):
    """Five chained sharded k-means steps stay identical across shard
    counts (error would compound if any psum reduction diverged)."""
    k = 8
    traces = []
    for s in SHARD_COUNTS:
        mesh = mesh_of(s)
        step = make_sharded_kmeans_step(mesh, DistanceKind.L2_SQUARED)
        centroids = corpus[:k].copy()
        prev = np.full(len(corpus), -1, dtype=np.int32)
        valid = np.ones(len(corpus), dtype=bool)
        for _ in range(5):
            xs, vs, ps = shard_rows(mesh, corpus, valid, prev)
            assign, centroids, _ = step(xs, vs, ps, np.asarray(centroids))
            prev = np.asarray(
                jax.device_get(assign)
            ).astype(np.int32)
            centroids = np.asarray(centroids)
        traces.append((prev.copy(), centroids.copy()))
    for a, c in traces[1:]:
        assert np.array_equal(a, traces[0][0])
        np.testing.assert_allclose(c, traces[0][1], rtol=1e-3, atol=1e-3)
