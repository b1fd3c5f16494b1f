"""Reranker hook (counterpart of reranker_test.go:71-241).

The reranker is applied AFTER limit/autocut in every vector search
(index_search.go:50-60 == indexes/base.py post-pipeline), receives the
already-limited results, and its output is returned verbatim — it may
reorder, rescore, or shrink the list.
"""

import numpy as np
import pytest

from comet_tpu.core.results import VectorResult
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.hnsw import HNSWIndex
from comet_tpu.indexes.ivf import IVFIndex
from comet_tpu.types import DistanceKind

N, DIM = 64, 8


def _build(kind):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    if kind == "flat":
        idx = FlatIndex(DIM, DistanceKind.L2)
    elif kind == "hnsw":
        idx = HNSWIndex(DIM, DistanceKind.L2)
    else:
        idx = IVFIndex(DIM, nlist=2)
        idx.train(x)
    idx.add_batch(x, list(range(1, N + 1)))
    return idx, x


class ReverseReranker:
    """Reorders — proves the hook's output is returned verbatim
    (reranker_test.go:71-139 uses a custom impl the same way)."""

    def __init__(self):
        self.seen = None

    def rerank(self, results):
        self.seen = list(results)
        return list(reversed(results))


class ScoreBoostReranker:
    """reranker_test.go:141-194 analogue: multiplies every score."""

    def __init__(self, factor):
        self.factor = factor

    def rerank(self, results):
        return [VectorResult(r.node, r.score * self.factor) for r in results]


class TopKReranker:
    """reranker_test.go:196-239 analogue: truncates to its own k."""

    def __init__(self, k):
        self.k = k

    def rerank(self, results):
        return list(results)[: self.k]


@pytest.mark.parametrize("kind", ["flat", "hnsw", "ivf"])
def test_reranker_receives_post_limit_results(kind):
    idx, x = _build(kind)
    rr = ReverseReranker()
    base = idx.new_search().with_query(x[0]).with_k(5).execute()
    out = idx.new_search().with_query(x[0]).with_k(5).with_reranker(rr).execute()
    # hook saw exactly the limited results, output returned verbatim
    assert [r.get_id() for r in rr.seen] == [r.get_id() for r in base]
    assert [r.get_id() for r in out] == [r.get_id() for r in reversed(base)]


def test_score_boost_reranker_rescores():
    idx, x = _build("flat")
    base = idx.new_search().with_query(x[3]).with_k(4).execute()
    out = (
        idx.new_search()
        .with_query(x[3])
        .with_k(4)
        .with_reranker(ScoreBoostReranker(10.0))
        .execute()
    )
    assert len(out) == len(base)
    for b, o in zip(base, out):
        assert o.get_id() == b.get_id()
        assert o.get_score() == pytest.approx(b.get_score() * 10.0)


def test_topk_reranker_shrinks_results():
    idx, x = _build("flat")
    out = (
        idx.new_search()
        .with_query(x[0])
        .with_k(10)
        .with_reranker(TopKReranker(3))
        .execute()
    )
    assert len(out) == 3


def test_no_reranker_is_identity():
    """reranker_test.go:241 analogue: absent hook == unmodified pipeline."""
    idx, x = _build("flat")
    a = idx.new_search().with_query(x[1]).with_k(5).execute()
    b = idx.new_search().with_query(x[1]).with_k(5).execute()
    assert [(r.get_id(), r.get_score()) for r in a] == [
        (r.get_id(), r.get_score()) for r in b
    ]


def test_reranker_composes_with_threshold_and_filter():
    idx, x = _build("flat")
    allowed = list(range(1, 21))
    rr = ReverseReranker()
    out = (
        idx.new_search()
        .with_query(x[0])
        .with_k(5)
        .with_document_ids(allowed)
        .with_reranker(rr)
        .execute()
    )
    assert out, "filtered search returned nothing"
    assert all(r.get_id() in set(allowed) for r in out)
    # the hook still ran after filtering+limit
    assert rr.seen is not None and len(rr.seen) == len(out)
