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
