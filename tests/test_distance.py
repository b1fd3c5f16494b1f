"""Distance kernel tests (mirrors reference distance_test.go coverage)."""

import numpy as np
import pytest

from comet_tpu.ops.distance import (
    distance_one,
    pairwise_scores,
    preprocess,
    norm,
    normalize,
    scale,
)
from comet_tpu.types import DistanceKind, ZeroVectorError

from oracle import distances_np


def test_l2_known_values():
    a = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    b = np.array([4.0, 5.0, 6.0], dtype=np.float32)
    d = float(distance_one(a, b, DistanceKind.L2))
    assert d == pytest.approx(np.sqrt(27.0), rel=1e-6)


def test_l2_squared_known_values():
    a = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    b = np.array([4.0, 5.0, 6.0], dtype=np.float32)
    d = float(distance_one(a, b, DistanceKind.L2_SQUARED))
    assert d == pytest.approx(27.0, rel=1e-6)


def test_l2_identical_vectors_zero():
    a = np.array([1.5, -2.5, 0.0, 7.0], dtype=np.float32)
    assert float(distance_one(a, a, DistanceKind.L2)) == pytest.approx(0.0, abs=1e-5)


def test_cosine_orthogonal_is_one():
    a = np.array([1.0, 0.0], dtype=np.float32)
    b = np.array([0.0, 1.0], dtype=np.float32)
    assert float(distance_one(a, b, DistanceKind.COSINE)) == pytest.approx(1.0, abs=1e-6)


def test_cosine_identical_is_zero_and_opposite_is_two():
    a = normalize(np.array([3.0, 4.0], dtype=np.float32))
    assert float(distance_one(a, a, DistanceKind.COSINE)) == pytest.approx(0.0, abs=1e-6)
    assert float(distance_one(a, -a, DistanceKind.COSINE)) == pytest.approx(2.0, abs=1e-6)


def test_cosine_clamps_dot_product():
    # Repeated unit vector: dot may exceed 1 by float error; result stays >= 0.
    a = normalize(np.ones(128, dtype=np.float32))
    d = float(distance_one(a, a, DistanceKind.COSINE))
    assert d >= 0.0
    assert d == pytest.approx(0.0, abs=1e-5)


@pytest.mark.parametrize("kind", ["l2", "l2_squared", "cosine"])
def test_pairwise_matches_oracle(kind, rng):
    q = rng.normal(size=(7, 16)).astype(np.float32)
    x = rng.normal(size=(33, 16)).astype(np.float32)
    dk = DistanceKind(kind)
    qp = preprocess(q, dk)
    xp = preprocess(x, dk)
    got = np.asarray(pairwise_scores(qp, xp, dk))
    want = distances_np(qp, xp, kind)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_preprocess_cosine_normalizes():
    v = np.array([3.0, 4.0], dtype=np.float32)
    out = preprocess(v, DistanceKind.COSINE)
    np.testing.assert_allclose(out, [0.6, 0.8], rtol=1e-6)
    # L2 is a no-op
    np.testing.assert_array_equal(preprocess(v, DistanceKind.L2), v)


def test_preprocess_zero_vector_errors_for_cosine():
    z = np.zeros(4, dtype=np.float32)
    with pytest.raises(ZeroVectorError):
        preprocess(z, DistanceKind.COSINE)
    # but fine for euclidean
    np.testing.assert_array_equal(preprocess(z, DistanceKind.L2), z)


def test_norm_scale_normalize_utils():
    v = np.array([3.0, 4.0], dtype=np.float32)
    assert norm(v) == pytest.approx(5.0)
    np.testing.assert_allclose(scale(v, 2.0), [6.0, 8.0])
    np.testing.assert_allclose(normalize(v), [0.6, 0.8], rtol=1e-6)
    with pytest.raises(ZeroVectorError):
        normalize(np.zeros(3))
