"""Fusion tests (mirrors fusion_test.go coverage)."""

import pytest

from comet_tpu.fusion import Fusion, FusionConfig, default_fusion, new_fusion
from comet_tpu.types import FusionKind


def test_weighted_sum_default_weights():
    f = default_fusion()
    out = f.combine({1: 0.5, 2: 0.3}, {2: 1.0, 3: 2.0})
    assert out == {1: 0.5, 2: 1.3, 3: 2.0}


def test_weighted_sum_custom_weights():
    f = new_fusion(FusionKind.WEIGHTED_SUM, FusionConfig(vector_weight=2.0, text_weight=0.5))
    out = f.combine({1: 1.0}, {1: 4.0})
    assert out == {1: 2.0 + 2.0}


def test_rrf_ranks_vector_ascending_text_descending():
    f = new_fusion(FusionKind.RECIPROCAL_RANK)
    # vector: lower distance = better -> id 1 rank 0, id 2 rank 1
    # text: higher score = better -> id 2 rank 0, id 3 rank 1
    out = f.combine({1: 0.1, 2: 0.9}, {2: 10.0, 3: 1.0})
    assert out[1] == pytest.approx(1 / 60)
    assert out[2] == pytest.approx(1 / 61 + 1 / 60)
    assert out[3] == pytest.approx(1 / 61)


def test_rrf_custom_k():
    f = new_fusion(FusionKind.RECIPROCAL_RANK, FusionConfig(k=10.0))
    out = f.combine({1: 0.5}, {})
    assert out[1] == pytest.approx(1 / 10)


def test_max_fusion():
    f = new_fusion(FusionKind.MAX)
    out = f.combine({1: 0.5, 2: 3.0}, {1: 2.0, 3: 1.0})
    assert out == {1: 2.0, 2: 3.0, 3: 1.0}


def test_min_fusion_intersection_only():
    f = new_fusion(FusionKind.MIN)
    out = f.combine({1: 0.5, 2: 3.0}, {1: 2.0, 3: 1.0})
    assert out == {1: 0.5}


def test_empty_inputs():
    f = default_fusion()
    assert f.combine({}, {}) == {}
    assert new_fusion(FusionKind.MIN).combine({1: 1.0}, {}) == {}
