"""DocumentFilter unit surface (counterpart of document_filter_test.go:9-233).

The reference wraps a pooled roaring bitmap with ShouldSkip per row; here
the filter compiles once to slot masks / packed word masks fused into the
kernels — these tests pin the scalar parity API and the vectorized
compilation paths to each other.
"""

import numpy as np
import pytest

from comet_tpu.core.filter import DocumentFilter
from comet_tpu.ops.bitset import Bitset


def test_basic_membership():
    """document_filter_test.go:9-49: listed IDs pass, others skip."""
    f = DocumentFilter([1, 5, 9])
    assert not f.should_skip(1)
    assert not f.should_skip(5)
    assert not f.should_skip(9)
    assert f.should_skip(2)
    assert f.should_skip(0)
    assert f.should_skip(10_000)


def test_disabled_filter_skips_nothing():
    """document_filter_test.go:217-233: empty/None filter = all eligible."""
    for f in (DocumentFilter(), DocumentFilter(None), DocumentFilter([])):
        assert not f.enabled
        assert not f.should_skip(123)
        assert f.slot_mask(np.arange(10, dtype=np.uint32)) is None
        assert f.word_mask(4) is None


def test_duplicates_and_unsorted_input_are_canonicalized():
    f = DocumentFilter([9, 1, 5, 5, 1])
    assert not f.should_skip(5)
    mask = f.slot_mask(np.array([1, 2, 5, 9, 10], dtype=np.uint32))
    np.testing.assert_array_equal(mask, [True, False, True, True, False])


def test_bitset_input_is_used_directly():
    bs = Bitset()
    bs.add_many(np.array([2, 64, 130], dtype=np.uint64))
    f = DocumentFilter(bs)
    assert f.enabled
    assert not f.should_skip(64)
    assert f.should_skip(63)
    mask = f.slot_mask(np.array([2, 3, 64, 130, 131], dtype=np.uint64))
    np.testing.assert_array_equal(mask, [True, False, True, True, False])


def test_word_mask_matches_membership():
    ids = [0, 1, 63, 64, 127, 200]
    f = DocumentFilter(ids)
    words = f.word_mask(4)  # covers doc ids [0, 256)
    assert words is not None and words.dtype == np.uint64
    member = {i for i in ids if i < 256}
    for doc in range(256):
        bit = bool((int(words[doc // 64]) >> (doc % 64)) & 1)
        assert bit == (doc in member), f"doc {doc}"


def test_word_mask_from_bitset_truncates_to_n_words():
    bs = Bitset()
    bs.add_many(np.array([1, 500], dtype=np.uint64))  # 500 lives in word 7
    f = DocumentFilter(bs)
    words = f.word_mask(2)
    assert len(words) == 2
    assert (int(words[0]) >> 1) & 1
    # doc 500 is simply outside the mask's range
    assert int(words[1]) == 0


def test_slot_mask_vectorized_equals_scalar():
    rng = np.random.default_rng(7)
    ids = rng.choice(10_000, size=500, replace=False)
    f = DocumentFilter(ids.tolist())
    slots = rng.integers(0, 10_000, size=2_000).astype(np.uint32)
    mask = f.slot_mask(slots)
    for s, keep in zip(slots[:200], mask[:200]):
        assert keep == (not f.should_skip(int(s)))


@pytest.mark.parametrize("as_bitset", [False, True])
def test_search_with_document_ids_end_to_end(as_bitset):
    """document_filter_test.go:51-180: filtered search returns only the
    allowed IDs, exactly the nearest among them."""
    from comet_tpu.indexes.flat import FlatIndex
    from comet_tpu.types import DistanceKind

    rng = np.random.default_rng(3)
    x = rng.normal(size=(100, 8)).astype(np.float32)
    idx = FlatIndex(8, DistanceKind.L2)
    idx.add_batch(x, list(range(1, 101)))

    allowed = list(range(1, 51))
    if as_bitset:
        bs = Bitset()
        bs.add_many(np.asarray(allowed, dtype=np.uint64))
        document_ids = bs
    else:
        document_ids = allowed

    got = (
        idx.new_search()
        .with_query(x[0])
        .with_k(10)
        .with_document_ids(document_ids)
        .execute()
    )
    assert len(got) == 10
    assert all(r.get_id() in set(allowed) for r in got)

    # oracle: nearest 10 among rows 0..49 by L2
    d = np.linalg.norm(x[:50] - x[0], axis=1)
    want = (np.argsort(d, kind="stable")[:10] + 1).tolist()
    assert [r.get_id() for r in got] == want
