"""Metadata index tests (mirrors metadata_index_test.go +
metadata_index_search_test.go coverage)."""

import io

import numpy as np
import pytest

from comet_tpu.core.node import MetadataNode, new_metadata_node_with_id
from comet_tpu.indexes.metadata import (
    FilterGroup,
    RoaringMetadataIndex,
    between,
    eq,
    exists,
    gt,
    gte,
    in_filter,
    is_null,
    lt,
    lte,
    ne,
    not_,
    not_exists,
    not_in,
    range_filter,
)
from comet_tpu.types import InvalidConfigError


def sample_index():
    idx = RoaringMetadataIndex()
    docs = [
        (1, {"category": "electronics", "price": 999.99, "brand": "Apple", "in_stock": True}),
        (2, {"category": "electronics", "price": 499.50, "brand": "Samsung", "in_stock": False}),
        (3, {"category": "books", "price": 15.0, "author": "Knuth"}),
        (4, {"category": "books", "price": 45.25, "author": "Kernighan"}),
        (5, {"category": "electronics", "price": 150, "brand": "Xiaomi", "in_stock": True}),
    ]
    for doc_id, meta in docs:
        idx.add(new_metadata_node_with_id(doc_id, meta))
    return idx


def ids(results):
    return sorted(r.id for r in results)


def test_count_and_add():
    idx = sample_index()
    assert idx.count() == 5


def test_unsupported_type_errors():
    idx = RoaringMetadataIndex()
    with pytest.raises(InvalidConfigError):
        idx.add(new_metadata_node_with_id(1, {"bad": [1, 2, 3]}))


def test_eq_categorical():
    idx = sample_index()
    res = idx.new_search().with_filters(eq("category", "electronics")).execute()
    assert ids(res) == [1, 2, 5]


def test_eq_bool():
    idx = sample_index()
    res = idx.new_search().with_filters(eq("in_stock", True)).execute()
    assert ids(res) == [1, 5]


def test_ne_categorical_includes_docs_without_field():
    idx = sample_index()
    res = idx.new_search().with_filters(ne("category", "electronics")).execute()
    assert ids(res) == [3, 4]
    # ne on brand: docs without the field also match (allDocs AndNot)
    res = idx.new_search().with_filters(ne("brand", "Apple")).execute()
    assert ids(res) == [2, 3, 4, 5]


def test_numeric_comparisons():
    idx = sample_index()
    assert ids(idx.new_search().with_filters(gt("price", 100)).execute()) == [1, 2, 5]
    assert ids(idx.new_search().with_filters(gte("price", 150)).execute()) == [1, 2, 5]
    assert ids(idx.new_search().with_filters(lt("price", 100)).execute()) == [3, 4]
    assert ids(idx.new_search().with_filters(lte("price", 45.25)).execute()) == [3, 4]
    assert ids(idx.new_search().with_filters(eq("price", 150)).execute()) == [5]
    assert ids(idx.new_search().with_filters(ne("price", 150)).execute()) == [1, 2, 3, 4]


def test_float_fixed_point_precision():
    """Floats are stored as int64(v*100): 2-decimal precision."""
    idx = sample_index()
    assert ids(idx.new_search().with_filters(eq("price", 999.99)).execute()) == [1]
    assert ids(idx.new_search().with_filters(eq("price", 999.98)).execute()) == []


def test_range_and_between():
    idx = sample_index()
    assert ids(idx.new_search().with_filters(range_filter("price", 100, 500)).execute()) == [2, 5]
    assert ids(idx.new_search().with_filters(between("price", 100, 500)).execute()) == [2, 5]


def test_in_not_in():
    idx = sample_index()
    assert ids(idx.new_search().with_filters(in_filter("brand", "Apple", "Samsung")).execute()) == [1, 2]
    assert ids(idx.new_search().with_filters(not_in("brand", "Apple", "Samsung")).execute()) == [3, 4, 5]


def test_exists_not_exists():
    idx = sample_index()
    assert ids(idx.new_search().with_filters(exists("brand")).execute()) == [1, 2, 5]
    assert ids(idx.new_search().with_filters(not_exists("brand")).execute()) == [3, 4]
    assert ids(idx.new_search().with_filters(exists("price")).execute()) == [1, 2, 3, 4, 5]
    assert ids(idx.new_search().with_filters(is_null("author")).execute()) == [1, 2, 5]


def test_not_inversion():
    idx = sample_index()
    f = not_(eq("category", "books"))
    assert f.operator == "ne"
    assert ids(idx.new_search().with_filters(f).execute()) == [1, 2, 5]
    assert not_(gt("price", 5)).operator == "lte"
    assert not_(not_(gt("price", 5))).operator == "gt"


def test_multiple_filters_are_anded():
    idx = sample_index()
    res = (
        idx.new_search()
        .with_filters(eq("category", "electronics"), gt("price", 400))
        .execute()
    )
    assert ids(res) == [1, 2]


def test_filter_groups_or_between_and_within():
    idx = sample_index()
    res = (
        idx.new_search()
        .with_filter_groups(
            FilterGroup([eq("category", "electronics"), gte("price", 900)], "AND"),
            FilterGroup([eq("category", "books"), lt("price", 20)], "AND"),
        )
        .execute()
    )
    assert ids(res) == [1, 3]


def test_filter_group_or_within():
    idx = sample_index()
    res = (
        idx.new_search()
        .with_filter_groups(
            FilterGroup([eq("brand", "Apple"), eq("brand", "Samsung")], "OR"),
        )
        .execute()
    )
    assert ids(res) == [1, 2]


def test_fluent_builder_where_or_and():
    idx = sample_index()
    res = (
        idx.new_search()
        .where(eq("category", "electronics"))
        .and_(gte("price", 400))
        .or_(eq("author", "Knuth"))
        .execute()
    )
    assert ids(res) == [1, 2, 3]


def test_no_filters_returns_all():
    idx = sample_index()
    res = idx.new_search().execute()
    assert ids(res) == [1, 2, 3, 4, 5]


def test_remove_is_hard_delete():
    idx = sample_index()
    idx.remove(MetadataNode(1, {}))
    assert idx.count() == 4
    assert ids(idx.new_search().with_filters(eq("brand", "Apple")).execute()) == []
    assert ids(idx.new_search().with_filters(eq("category", "electronics")).execute()) == [2, 5]


def test_negative_numbers():
    idx = RoaringMetadataIndex()
    idx.add(new_metadata_node_with_id(1, {"temp": -40.5}))
    idx.add(new_metadata_node_with_id(2, {"temp": 0}))
    idx.add(new_metadata_node_with_id(3, {"temp": 25.5}))
    assert ids(idx.new_search().with_filters(lt("temp", 0)).execute()) == [1]
    assert ids(idx.new_search().with_filters(gte("temp", 0)).execute()) == [2, 3]
    assert ids(idx.new_search().with_filters(range_filter("temp", -50, 10)).execute()) == [1, 2]


def test_serialization_roundtrip():
    idx = sample_index()
    buf = io.BytesIO()
    idx.write_to(buf)
    buf.seek(0)
    idx2 = RoaringMetadataIndex()
    idx2.read_from(buf)
    assert idx2.count() == 5
    assert ids(idx2.new_search().with_filters(eq("category", "books")).execute()) == [3, 4]
    assert ids(idx2.new_search().with_filters(gt("price", 400)).execute()) == [1, 2]
    assert ids(idx2.new_search().with_filters(exists("brand")).execute()) == [1, 2, 5]


def test_large_scale_filters(rng):
    """10k docs, vectorized planes stay correct."""
    idx = RoaringMetadataIndex()
    cats = ["a", "b", "c", "d"]
    prices = rng.integers(0, 1000, size=10000)
    for i in range(10000):
        idx.add(
            new_metadata_node_with_id(
                i + 1, {"cat": cats[i % 4], "price": int(prices[i])}
            )
        )
    res = idx.new_search().with_filters(eq("cat", "b"), lt("price", 100)).execute()
    want = [
        i + 1
        for i in range(10000)
        if i % 4 == 1 and prices[i] < 100
    ]
    assert ids(res) == want


def test_add_batch_matches_add(rng):
    from comet_tpu.indexes.metadata import gt as _gt

    a, b = RoaringMetadataIndex(), RoaringMetadataIndex()
    nodes = [
        new_metadata_node_with_id(
            i + 1,
            {"cat": ["x", "y", "z"][i % 3], "price": float(i) / 3, "flag": i % 2 == 0},
        )
        for i in range(500)
    ]
    for n in nodes:
        a.add(n)
    b.add_batch(nodes)
    for f in (eq("cat", "y"), _gt("price", 50), eq("flag", True), exists("price")):
        ra = sorted(r.id for r in a.new_search().with_filters(f).execute())
        rb = sorted(r.id for r in b.new_search().with_filters(f).execute())
        assert ra == rb, f
    assert a.count() == b.count() == 500


def test_add_columns_matches_add_batch(rng):
    from comet_tpu.indexes.metadata import gt as _gt, lte as _lte

    a, b = RoaringMetadataIndex(), RoaringMetadataIndex()
    n = 1000
    ids_arr = np.arange(1, n + 1, dtype=np.uint64)
    cats = np.array([["x", "y", "z"][i % 3] for i in range(n)])
    prices = (np.arange(n, dtype=np.float64) / 3.0)
    counts = rng.integers(-50, 50, size=n)
    flags = np.array([i % 2 == 0 for i in range(n)])
    nodes = [
        new_metadata_node_with_id(
            int(ids_arr[i]),
            {
                "cat": str(cats[i]),
                "price": float(prices[i]),
                "count": int(counts[i]),
                "flag": bool(flags[i]),
            },
        )
        for i in range(n)
    ]
    a.add_batch(nodes)
    b.add_columns(
        ids_arr, {"cat": cats, "price": prices, "count": counts, "flag": flags}
    )
    filters = (
        eq("cat", "y"),
        _gt("price", 50),
        _lte("count", 0),
        eq("count", int(counts[7])),
        eq("flag", True),
        exists("price"),
        not_exists("missing"),
    )
    for f in filters:
        ra = sorted(r.id for r in a.new_search().with_filters(f).execute())
        rb = sorted(r.id for r in b.new_search().with_filters(f).execute())
        assert ra == rb, f
    assert a.count() == b.count() == n


def test_add_columns_nan_is_missing():
    mi = RoaringMetadataIndex()
    mi.add_columns(
        [1, 2, 3],
        {"score": np.array([1.5, np.nan, 3.0])},
    )
    got = sorted(r.id for r in mi.new_search().with_filters(exists("score")).execute())
    assert got == [1, 3]
    missing = sorted(
        r.id for r in mi.new_search().with_filters(not_exists("score")).execute()
    )
    assert missing == [2]


def test_add_columns_length_mismatch():
    mi = RoaringMetadataIndex()
    with pytest.raises(InvalidConfigError):
        mi.add_columns([1, 2], {"x": [1, 2, 3]})


def test_filter_bitset_memo_distinguishes_bool_from_int():
    """True == 1 == 1.0 under Python hash/equality, but bools index as the
    categorical "True"/"False" plane while ints hit the numeric BSI — the
    filter_bitset memo must not serve one predicate's cached bitmap for the
    other (ADVICE r3 high)."""
    idx = RoaringMetadataIndex()
    idx.add(new_metadata_node_with_id(1, {"flag": True}))
    idx.add(new_metadata_node_with_id(2, {"flag": 1}))
    idx.add(new_metadata_node_with_id(3, {"flag": 1.0}))
    # prime the memo with the bool predicate, then query int/float
    assert sorted(idx.filter_bitset([eq("flag", True)]).to_array().tolist()) == [1]
    got_int = sorted(idx.filter_bitset([eq("flag", 1)]).to_array().tolist())
    assert got_int == [2, 3]  # numeric BSI: 1 and 1.0 store as 100
    # and the reverse priming order
    idx2 = RoaringMetadataIndex()
    idx2.add(new_metadata_node_with_id(1, {"flag": True}))
    idx2.add(new_metadata_node_with_id(2, {"flag": 1}))
    assert sorted(idx2.filter_bitset([eq("flag", 1)]).to_array().tolist()) == [2]
    assert sorted(idx2.filter_bitset([eq("flag", True)]).to_array().tolist()) == [1]
    # same-type predicates still memoize (cache hit returns a copy)
    a = idx2.filter_bitset([eq("flag", True)])
    b = idx2.filter_bitset([eq("flag", True)])
    assert a.to_array().tolist() == b.to_array().tolist()
    assert a is not b


def test_filter_bitset_memo_groups_distinguish_types():
    idx = RoaringMetadataIndex()
    idx.add(new_metadata_node_with_id(1, {"flag": True, "x": 5}))
    idx.add(new_metadata_node_with_id(2, {"flag": 1, "x": 5}))
    g_bool = FilterGroup(filters=[eq("flag", True), eq("x", 5)], logic="AND")
    g_int = FilterGroup(filters=[eq("flag", 1), eq("x", 5)], logic="AND")
    assert idx.filter_bitset(groups=[g_bool]).to_array().tolist() == [1]
    assert idx.filter_bitset(groups=[g_int]).to_array().tolist() == [2]


def test_filter_result_isolated_from_later_writes():
    """filter_bitset returns COW handles over live planes / memo entries;
    results captured before a write must not change when the index mutates
    afterwards (the reference gets this from eager clones,
    metadata_index.go:263 — COW gives the same isolation without the
    per-query full-plane copy)."""
    from comet_tpu.core.node import new_metadata_node_with_id

    mi = RoaringMetadataIndex()
    mi.add_batch(
        [new_metadata_node_with_id(i, {"cat": "a" if i % 2 else "b",
                                       "price": i}) for i in range(1, 101)]
    )
    before = mi.filter_bitset([eq("cat", "a")])
    before_ids = before.to_array()
    memo_hit = mi.filter_bitset([eq("cat", "a")])  # memoized share
    # now mutate the index: add more cat=a docs and remove one
    mi.add_batch(
        [new_metadata_node_with_id(i, {"cat": "a", "price": i})
         for i in range(200, 220)]
    )
    mi.remove(new_metadata_node_with_id(1, {"cat": "a", "price": 1}))
    assert np.array_equal(before.to_array(), before_ids)
    assert np.array_equal(memo_hit.to_array(), before_ids)
    after = mi.filter_bitset([eq("cat", "a")])
    assert 1 not in set(after.to_array().tolist())
    assert 200 in set(after.to_array().tolist())
    # and mutating a RESULT must not corrupt the live plane
    after.discard(3)
    assert 3 in set(mi.filter_bitset([eq("cat", "a")]).to_array().tolist())
