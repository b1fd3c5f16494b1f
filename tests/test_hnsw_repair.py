"""HNSW entry-point deletion + repair, including under concurrent search
(reference: hnsw_index.go:384-413 repairs the entry point when the entry
node is deleted; its test deletes the entry mid-traffic). Soft delete here
keeps the node routing but excludes it from results; flush() hard-deletes
and re-elects the highest remaining level as entry."""

import threading

import numpy as np

from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex
from comet_tpu.types import DistanceKind

from oracle import topk_np


def build(rng, n=300, dim=16):
    idx = HNSWIndex(dim, DistanceKind.L2, HNSWConfig(m=8, ef_construction=64, ef_search=64))
    data = rng.normal(size=(n, dim)).astype(np.float32)
    idx.add_batch(data, ids=list(range(1, n + 1)))
    return idx, data


def entry_id(idx):
    """Doc id of the current entry-point slot."""
    return int(idx._store.ids[idx._entry_slot])


def test_remove_entry_point_excluded_but_routing(rng):
    idx, data = build(rng)
    eid = entry_id(idx)
    idx.remove(eid)
    res = idx.new_search().with_query(data[eid - 1]).with_k(10).execute()
    got = [r.node.id for r in res]
    assert eid not in got          # excluded from results
    assert len(got) == 10          # traversal still works through it


def test_flush_after_entry_removal_re_elects_entry(rng):
    idx, data = build(rng)
    eid = entry_id(idx)
    old_level = idx._max_level
    idx.remove(eid)
    idx.flush()
    assert idx._entry_slot >= 0
    assert entry_id(idx) != eid
    # new entry is the highest REMAINING level
    assert idx._max_level == int(idx._levels[: idx._store.n].max())
    assert idx._max_level <= old_level
    res = idx.new_search().with_query(data[0]).with_k(5).execute()
    assert len(res) == 5 and eid not in [r.node.id for r in res]


def test_flush_all_upper_level_nodes(rng):
    idx, data = build(rng)
    uppers = [int(idx._store.ids[s]) for s in np.flatnonzero(idx._levels[: idx._store.n] > 0)]
    assert uppers, "fixture must have at least one level>0 node"
    for did in uppers:
        idx.remove(did)
    idx.flush()
    assert idx._max_level == 0
    assert idx._entry_slot >= 0
    res = idx.new_search().with_query(data[0]).with_k(10).execute()
    assert len(res) == 10
    assert not (set(r.node.id for r in res) & set(uppers))


def test_repeated_remove_flush_cycles_keep_graph_sound(rng):
    idx, data = build(rng, n=200)
    alive = set(range(1, 201))
    for round_no in range(4):
        eid = entry_id(idx)
        victims = {eid} | set(
            int(x) for x in rng.choice(sorted(alive), size=10, replace=False)
        )
        for did in victims:
            if did in alive:
                idx.remove(did)
        idx.flush()
        alive -= victims
        n = idx._store.n
        assert n == len(alive)
        # adjacency rows must only reference live slots (or -1)
        adj = idx._adj0[:n]
        assert adj.max() < n
        live_ids = set(int(i) for i in idx._store.ids[:n])
        assert live_ids == alive
        res = idx.new_search().with_query(data[0]).with_k(min(10, len(alive))).execute()
        assert all(r.node.id in alive for r in res)


def test_search_during_entry_deletion_storm(rng):
    """Concurrent searches while the entry point is repeatedly deleted,
    flushed, and re-added: every result batch must contain only live ids
    and no search may crash."""
    idx, data = build(rng, n=250)
    errors = []
    stop = threading.Event()

    def searcher():
        q = data[rng.integers(0, len(data))]
        while not stop.is_set():
            try:
                res = idx.new_search().with_query(q).with_k(5).execute()
                assert len(res) <= 5
                for r in res:
                    assert r.node.id >= 1
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
                return

    threads = [threading.Thread(target=searcher) for _ in range(4)]
    for t in threads:
        t.start()
    next_id = 1000
    try:
        for _ in range(6):
            eid = entry_id(idx)
            idx.remove(eid)
            idx.flush()
            vec = rng.normal(size=(1, data.shape[1])).astype(np.float32)
            idx.add_batch(vec, ids=[next_id])
            next_id += 1
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors[:1]


def test_flush_then_incremental_add_searchable(rng):
    idx, data = build(rng)
    eid = entry_id(idx)
    idx.remove(eid)
    idx.flush()
    fresh = rng.normal(size=(20, data.shape[1])).astype(np.float32)
    idx.add_batch(fresh, ids=list(range(500, 520)))
    res = idx.new_search().with_query(fresh[3]).with_k(3).execute()
    assert res[0].node.id == 503


def test_recall_preserved_after_entry_repair(rng):
    """Post-repair graph must still search well: recall vs exact oracle on
    the surviving corpus stays above the build-quality floor."""
    idx, data = build(rng, n=400)
    eid = entry_id(idx)
    idx.remove(eid)
    idx.flush()
    keep = np.array([i for i in range(1, 401) if i != eid])
    kept_vecs = data[keep - 1]
    queries = kept_vecs[:32] + 0.01 * rng.normal(size=(32, data.shape[1])).astype(np.float32)
    dists = ((queries[:, None, :] - kept_vecs[None, :, :]) ** 2).sum(-1)
    _, oracle_rows = topk_np(dists, 10)
    hits = total = 0
    for q, row in zip(queries.astype(np.float32), oracle_rows):
        res = idx.new_search().with_query(q).with_k(10).execute()
        got = [r.node.id for r in res]
        true = keep[row]
        hits += len(set(got) & set(int(t) for t in true))
        total += 10
    assert hits / total > 0.8
