"""K-means tests (mirrors clustering_test.go coverage)."""

import numpy as np

from comet_tpu.ops.kmeans import (
    find_nearest_centroid,
    init_centroids,
    kmeans,
    kmeans_subspace,
)
from comet_tpu.types import DistanceKind


def three_clusters(rng, n_per=50, d=4, spread=0.05):
    centers = np.array(
        [[0.0] * d, [10.0] * d, [-10.0] * d], dtype=np.float32
    )
    pts = np.concatenate(
        [c + rng.normal(scale=spread, size=(n_per, d)).astype(np.float32) for c in centers]
    )
    labels = np.repeat(np.arange(3), n_per)
    return pts, labels


def test_recovers_well_separated_clusters(rng):
    pts, labels = three_clusters(rng)
    centroids, assign = kmeans(pts, 3, max_iter=50)
    assert centroids.shape == (3, 4)
    # all points of a true cluster map to the same learned centroid
    for c in range(3):
        got = assign[labels == c]
        assert len(set(got.tolist())) == 1
    # learned centroids near true centers (order may differ)
    true = np.array([[0.0] * 4, [10.0] * 4, [-10.0] * 4])
    for t in true:
        assert np.min(np.linalg.norm(centroids - t, axis=1)) < 0.5


def test_deterministic_stride_init():
    v = np.arange(20, dtype=np.float32).reshape(10, 2)
    c = init_centroids(v, 3)
    # stride = 10 // 3 = 3 -> rows 0, 3, 6
    np.testing.assert_array_equal(c, v[[0, 3, 6]])


def test_k_greater_than_n_clamps():
    v = np.array([[0.0, 0.0], [5.0, 5.0]], dtype=np.float32)
    centroids, assign = kmeans(v, 10)
    assert centroids.shape == (2, 2)
    assert set(assign.tolist()) == {0, 1}


def test_empty_input():
    centroids, assign = kmeans(np.zeros((0, 3), dtype=np.float32), 4)
    assert len(centroids) == 0 and len(assign) == 0


def test_identical_points_converge():
    v = np.ones((8, 3), dtype=np.float32)
    centroids, assign = kmeans(v, 2, max_iter=10)
    # all points identical: all assigned to centroid 0 (lowest index wins ties)
    assert set(assign.tolist()) == {0}
    np.testing.assert_allclose(centroids[0], 1.0)
    # empty cluster 1 keeps its init position
    np.testing.assert_allclose(centroids[1], 1.0)


def test_find_nearest_centroid():
    centroids = np.array([[0.0, 0.0], [10.0, 10.0]], dtype=np.float32)
    v = np.array([[1.0, 1.0], [9.0, 9.0]], dtype=np.float32)
    idx = find_nearest_centroid(v, centroids)
    np.testing.assert_array_equal(idx, [0, 1])


def test_subspace_kmeans_shapes(rng):
    v = rng.normal(size=(60, 4, 3)).astype(np.float32)
    codebooks, assign = kmeans_subspace(v, 8, max_iter=5)
    assert codebooks.shape == (4, 8, 3)
    assert assign.shape == (60, 4)
    assert assign.max() < 8


def test_large_n_tiled_path(rng):
    """N big enough to exercise the scan-tiled assignment."""
    pts, labels = three_clusters(rng, n_per=30000, d=8)
    centroids, assign = kmeans(pts, 3, max_iter=10)
    for c in range(3):
        got = assign[labels == c]
        assert len(set(got.tolist())) == 1
