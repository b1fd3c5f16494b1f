"""Multi-query aggregation tests (mirrors aggregation_test.go coverage)."""

import numpy as np

from comet_tpu.core.aggregation import (
    aggregate_scores,
    aggregate_text_results,
    aggregate_vector_results,
)
from comet_tpu.core.node import VectorNode
from comet_tpu.core.results import TextResult, VectorResult
from comet_tpu.types import ScoreAggregationKind


def _vres(pairs):
    return [
        VectorResult(node=VectorNode(i, np.zeros(2, dtype=np.float32)), score=s)
        for i, s in pairs
    ]


def test_sum_aggregation_dedups_and_sums():
    res = aggregate_vector_results(
        _vres([(42, 0.1), (7, 0.5), (42, 0.2), (42, 0.15)]),
        ScoreAggregationKind.SUM,
    )
    by_id = {r.node.id: r.score for r in res}
    assert by_id[42] == np.float32(0.1) + np.float32(0.2) + np.float32(0.15)
    assert by_id[7] == np.float32(0.5)
    # ascending sort: 42 (0.45) < 7 (0.5)
    assert [r.node.id for r in res] == [42, 7]


def test_max_aggregation():
    res = aggregate_vector_results(
        _vres([(1, 0.1), (1, 0.3), (2, 0.2)]), ScoreAggregationKind.MAX
    )
    by_id = {r.node.id: r.score for r in res}
    assert by_id[1] == np.float32(0.3)
    assert [r.node.id for r in res] == [2, 1]


def test_mean_aggregation():
    res = aggregate_vector_results(
        _vres([(1, 0.1), (1, 0.3), (1, 0.2)]), ScoreAggregationKind.MEAN
    )
    assert abs(res[0].score - 0.2) < 1e-6


def test_tie_break_by_ascending_id():
    res = aggregate_vector_results(
        _vres([(9, 0.5), (3, 0.5), (5, 0.5)]), ScoreAggregationKind.SUM
    )
    assert [r.node.id for r in res] == [3, 5, 9]


def test_text_aggregation_sorts_descending():
    res = aggregate_text_results(
        [TextResult(1, 2.0), TextResult(2, 5.0), TextResult(1, 1.0)],
        ScoreAggregationKind.SUM,
    )
    assert [r.id for r in res] == [2, 1]
    assert res[1].score == 3.0


def test_empty_input():
    assert aggregate_vector_results([], ScoreAggregationKind.SUM) == []
    ids, scores = aggregate_scores(
        np.array([], dtype=np.uint32),
        np.array([], dtype=np.float32),
        ScoreAggregationKind.SUM,
        ascending=True,
    )
    assert ids.size == 0 and scores.size == 0
