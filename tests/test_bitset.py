"""Packed bitset + BSI tests (vs python-set / numpy oracles)."""

import numpy as np

from comet_tpu.ops.bitset import BSI, Bitset


def test_basic_ops():
    bs = Bitset()
    bs.add(3)
    bs.add(64)
    bs.add(1000)
    assert bs.contains(3) and bs.contains(64) and bs.contains(1000)
    assert not bs.contains(4)
    assert bs.count() == 3
    bs.discard(64)
    assert not bs.contains(64)
    assert list(bs.to_array()) == [3, 1000]


def test_set_algebra(rng):
    a_ids = rng.choice(5000, size=800, replace=False)
    b_ids = rng.choice(5000, size=700, replace=False)
    a, b = Bitset.from_array(a_ids), Bitset.from_array(b_ids)
    sa, sb = set(a_ids.tolist()), set(b_ids.tolist())
    assert set(a.and_(b).to_array().tolist()) == sa & sb
    assert set(a.or_(b).to_array().tolist()) == sa | sb
    assert set(a.andnot(b).to_array().tolist()) == sa - sb


def test_contains_many(rng):
    ids = rng.choice(10000, size=1000, replace=False)
    bs = Bitset.from_array(ids)
    probe = np.arange(0, 12000, 7, dtype=np.uint64)
    got = bs.contains_many(probe)
    want = np.isin(probe, ids)
    np.testing.assert_array_equal(got, want)


def test_bsi_compare_ops(rng):
    docs = np.arange(1, 501, dtype=np.uint64)
    vals = rng.integers(-10000, 10000, size=500).astype(np.int64)
    bsi = BSI()
    bsi.set_values(docs, vals)

    for pivot in (-5000, -1, 0, 1, 4321):
        got_gt = set(bsi.compare_gt(pivot).to_array().tolist())
        want_gt = set(docs[vals > pivot].tolist())
        assert got_gt == want_gt, f"gt {pivot}"
        assert set(bsi.compare_ge(pivot).to_array().tolist()) == set(
            docs[vals >= pivot].tolist()
        )
        assert set(bsi.compare_lt(pivot).to_array().tolist()) == set(
            docs[vals < pivot].tolist()
        )
        assert set(bsi.compare_le(pivot).to_array().tolist()) == set(
            docs[vals <= pivot].tolist()
        )

    v = int(vals[17])
    assert set(bsi.compare_eq(v).to_array().tolist()) == set(docs[vals == v].tolist())
    lo, hi = -2000, 3000
    assert set(bsi.compare_range(lo, hi).to_array().tolist()) == set(
        docs[(vals >= lo) & (vals <= hi)].tolist()
    )


def test_bsi_update_and_clear():
    bsi = BSI()
    bsi.set_value(7, 100)
    bsi.set_value(7, -50)  # update must clear old planes
    assert set(bsi.compare_eq(-50).to_array().tolist()) == {7}
    assert bsi.compare_eq(100).is_empty()
    bsi.clear_value(7)
    assert bsi.ebm.is_empty()
    assert bsi.compare_le(1000).is_empty()


def test_bsi_extremes():
    bsi = BSI()
    bsi.set_value(1, 2**62)
    bsi.set_value(2, -(2**62))
    bsi.set_value(3, 0)
    assert set(bsi.compare_gt(0).to_array().tolist()) == {1}
    assert set(bsi.compare_lt(0).to_array().tolist()) == {2}
    assert set(bsi.compare_eq(0).to_array().tolist()) == {3}


def test_bsi_batch_duplicate_doc_ids_keep_last():
    """Regression: duplicated doc_ids in one set_values batch must behave
    like sequential set_value calls (last value wins, no stale plane bits)."""
    bsi = BSI()
    bsi.set_values(np.array([7, 7]), np.array([3, 4]))
    assert list(bsi.compare_eq(4).to_array()) == [7]
    assert bsi.compare_eq(3).is_empty()
    assert bsi.compare_eq(7).is_empty()  # stale-bit union 3|4 = 7 must not match
    assert bsi.compare_gt(4).is_empty()
    # a later update must fully discard the old value's bits
    bsi.set_values(np.array([7]), np.array([1]))
    assert list(bsi.compare_eq(1).to_array()) == [7]
    assert bsi.compare_eq(4).is_empty()


def test_bsi_batch_update_matches_scalar_path(rng):
    """Batched updates over existing docs == scalar set_value sequence."""
    a, b = BSI(), BSI()
    ids = rng.integers(0, 200, size=500)
    vals = rng.integers(-(10**6), 10**6, size=500)
    half = 250
    a.set_values(ids[:half], vals[:half])
    a.set_values(ids[half:], vals[half:])
    for i, v in zip(ids.tolist(), vals.tolist()):
        b.set_value(i, v)
    for probe in [-(10**6), -5, 0, 17, 10**6]:
        assert np.array_equal(
            a.compare_gt(probe).to_array(), b.compare_gt(probe).to_array()
        )
        assert np.array_equal(
            a.compare_eq(probe).to_array(), b.compare_eq(probe).to_array()
        )
    assert np.array_equal(a.ebm.to_array(), b.ebm.to_array())


def test_discard_many(rng):
    bs = Bitset()
    ids = rng.integers(0, 5000, size=1000)
    bs.add_many(ids)
    drop = ids[::3]
    bs.discard_many(drop)
    expect = sorted(set(ids.tolist()) - set(drop.tolist()))
    assert list(bs.to_array()) == expect
    bs.discard_many(np.array([999999]))  # out of range: no-op, no grow


def test_native_matches_numpy_fallback(rng, monkeypatch):
    """The C compare+pack kernel and the numpy path must agree bit-for-bit."""
    from comet_tpu import native

    ids = rng.choice(5000, size=2000, replace=False).astype(np.uint64)
    vals = rng.integers(-(10**9), 10**9, size=2000)

    a = BSI()
    a.set_values(ids, vals)
    b = BSI()
    b.set_values(ids, vals)

    probes = [int(v) for v in vals[:5]] + [-(10**9) - 1, 10**9 + 1, 0]
    for probe in probes:
        for op in ("compare_gt", "compare_ge", "compare_eq", "compare_lt", "compare_le"):
            a._cache.clear()
            b._cache.clear()
            native_out = getattr(a, op)(probe).to_array()
            monkeypatch.setattr(native, "bsi_compare_pack", lambda *a_, **k_: None)
            numpy_out = getattr(b, op)(probe).to_array()
            monkeypatch.undo()
            assert np.array_equal(native_out, numpy_out), (op, probe)
        a._cache.clear()
        b._cache.clear()
        native_out = a.compare_range(probe, probe + 10**6).to_array()
        monkeypatch.setattr(native, "bsi_compare_pack", lambda *a_, **k_: None)
        numpy_out = b.compare_range(probe, probe + 10**6).to_array()
        monkeypatch.undo()
        assert np.array_equal(native_out, numpy_out), ("range", probe)


def test_cow_share_isolates_mutation():
    """share() hands out an O(1) view; the FIRST mutation of either handle
    copies, so neither side ever observes the other's writes."""
    a = Bitset.from_array([1, 5, 900])
    v = a.share()
    assert v.contains(5) and v.count() == 3
    a.add(7)  # owner mutates after sharing
    assert a.contains(7) and not v.contains(7)
    assert v.count() == 3 and a.count() == 4
    v.discard(1)  # view mutates independently
    assert a.contains(1) and not v.contains(1)
    # chained shares: a -> v2 while a is already unshared again
    v2 = a.share()
    a.add_many(np.array([64 * 100]))  # forces _ensure growth too
    assert not v2.contains(6400) and a.contains(6400)


def test_cow_count_cache_tracks_mutation():
    a = Bitset.from_array([3, 4])
    assert a.count() == 2
    a.add(9)
    assert a.count() == 3
    a.iand(Bitset.from_array([3, 9, 11]))
    assert a.count() == 2


def test_native_and_fold_matches_numpy(rng):
    from comet_tpu import native

    arrs = [
        rng.integers(0, 2**63, size=200, dtype=np.int64).astype(np.uint64)
        for _ in range(5)
    ]
    arrs[0][5:] = 0  # sparse first operand exercises the block skip
    n = 160
    got = native.bitset_and_fold(arrs, n)
    if got is None:
        return  # no C compiler in this environment
    want = arrs[0][:n]
    for a in arrs[1:]:
        want = want & a[:n]
    assert np.array_equal(got, want)
