"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from comet_tpu.parallel.sharded import (
    ShardedFlatSearcher,
    make_corpus_mesh,
    make_sharded_kmeans_step,
    shard_rows,
)
from comet_tpu.types import DistanceKind

from oracle import distances_np, topk_np


def test_mesh_has_8_devices():
    mesh = make_corpus_mesh()
    assert mesh.devices.size == 8


def test_sharded_search_matches_oracle(rng):
    mesh = make_corpus_mesh()
    n, d, k = 4096, 16, 10
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(5, d)).astype(np.float32)

    searcher = ShardedFlatSearcher(mesh, corpus, DistanceKind.L2, tile=256)
    scores, slots = searcher.search(queries, k)

    ws, wi = topk_np(distances_np(queries, corpus, "l2"), k)
    np.testing.assert_array_equal(slots, wi)
    np.testing.assert_allclose(scores, ws, rtol=1e-4, atol=1e-4)


def test_sharded_search_uneven_rows(rng):
    mesh = make_corpus_mesh()
    n, d, k = 1000, 8, 5  # not divisible by 8
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(3, d)).astype(np.float32)
    searcher = ShardedFlatSearcher(mesh, corpus, DistanceKind.L2, tile=64)
    scores, slots = searcher.search(queries, k)
    ws, wi = topk_np(distances_np(queries, corpus, "l2"), k)
    np.testing.assert_array_equal(slots, wi)


def test_sharded_kmeans_step_matches_single_device(rng):
    mesh = make_corpus_mesh()
    n, d, k = 512, 8, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    centroids = x[:k].copy()
    prev = np.full(n, -1, dtype=np.int32)

    step = make_sharded_kmeans_step(mesh, DistanceKind.L2_SQUARED)
    xs, vs, ps = shard_rows(mesh, x, valid, prev)
    assign, new_c, changed = step(xs, vs, ps, centroids)

    # oracle: plain numpy assignment + update
    dist = distances_np(x, centroids, "l2_squared")
    want_assign = dist.argmin(axis=1)
    np.testing.assert_array_equal(np.asarray(assign), want_assign)
    for c in range(k):
        members = x[want_assign == c]
        if len(members):
            np.testing.assert_allclose(
                np.asarray(new_c)[c], members.mean(axis=0), rtol=1e-4, atol=1e-4
            )
    assert bool(changed)
