"""LSM storage tests (mirrors storage_test.go + storage_compaction_test.go +
storage_segment_test.go coverage, with tiny thresholds to force rotation/
flush/compaction — and a real-merge compaction check the reference's tests
cannot pass)."""

import os
import time

import numpy as np
import pytest

from comet_tpu.hybrid import HybridSearchBuilder
from comet_tpu.indexes.bm25 import BM25SearchIndex
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.ivfpq import IVFPQIndex
from comet_tpu.indexes.metadata import RoaringMetadataIndex, eq, gte
from comet_tpu.storage import (
    PersistentHybridIndex,
    StorageClosedError,
    StorageConfig,
    StorageLockedError,
    open_persistent_hybrid_index,
)
from comet_tpu.types import DistanceKind


def make_config(tmp_path, **kw):
    cfg = StorageConfig(
        base_dir=str(tmp_path / "store"),
        memtable_size_limit=kw.pop("memtable_size_limit", 1024),
        flush_threshold=kw.pop("flush_threshold", 1 << 30),
        compaction_interval=kw.pop("compaction_interval", 3600.0),
        compaction_threshold=kw.pop("compaction_threshold", 5),
        vector_index_factory=lambda: FlatIndex(4, DistanceKind.L2),
        text_index_factory=BM25SearchIndex,
        metadata_index_factory=RoaringMetadataIndex,
        **kw,
    )
    return cfg


def add_docs(store, n, start=0):
    ids = []
    for i in range(start, start + n):
        vec = np.array([i, 0, 0, 0], dtype=np.float32)
        ids.append(
            store.add(vec, f"document number {i} content", {"num": i, "cat": "even" if i % 2 == 0 else "odd"})
        )
    return ids


def test_basic_add_and_search(tmp_path):
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        ids = add_docs(store, 10)
        res = store.new_search().with_vector([3.0, 0, 0, 0]).with_k(3).execute()
        assert res[0].id == ids[3]
        res = store.new_search().with_text("document content").with_k(5).execute()
        assert len(res) == 5
        res = store.new_search().with_metadata(eq("cat", "odd")).with_k(20).execute()
        assert sorted(r.id for r in res) == ids[1::2]


def test_rotation_and_explicit_flush_creates_segments(tmp_path):
    cfg = make_config(tmp_path, memtable_size_limit=512)
    with open_persistent_hybrid_index(cfg) as store:
        add_docs(store, 20)  # each doc ~ 64+16+2*~25+2*96 bytes -> rotations
        assert store.memtables.count() > 1
        store.flush()
        assert store.segments.count() >= 1
        assert store.memtables.total_size() == 0 or store.memtables.count() == 1
        # data still searchable after flush
        res = store.new_search().with_vector([5.0, 0, 0, 0]).with_k(1).execute()
        assert res[0].score == pytest.approx(0.0, abs=1e-5)
        files = os.listdir(cfg.base_dir)
        assert any(f.startswith("hybrid_") for f in files)
        assert any(f.startswith("vector_") for f in files)


def test_persistence_across_reopen(tmp_path):
    cfg = make_config(tmp_path)
    store = open_persistent_hybrid_index(cfg)
    ids = add_docs(store, 8)
    store.close()  # close flushes

    cfg2 = make_config(tmp_path)
    with open_persistent_hybrid_index(cfg2) as store2:
        assert store2.segments.count() >= 1
        res = store2.new_search().with_vector([2.0, 0, 0, 0]).with_k(1).execute()
        assert res[0].id == ids[2]
        res = store2.new_search().with_text("number").with_k(20).execute()
        assert len(res) == 8
        res = store2.new_search().with_metadata(gte("num", 6)).with_k(20).execute()
        assert sorted(r.id for r in res) == ids[6:]


def test_lock_file_exclusivity(tmp_path):
    cfg = make_config(tmp_path)
    store = open_persistent_hybrid_index(cfg)
    with pytest.raises(StorageLockedError):
        open_persistent_hybrid_index(make_config(tmp_path))
    store.close()
    # after close the lock is released
    store2 = open_persistent_hybrid_index(make_config(tmp_path))
    store2.close()


def test_auto_flush_on_threshold(tmp_path):
    cfg = make_config(tmp_path, memtable_size_limit=512, flush_threshold=1024)
    with open_persistent_hybrid_index(cfg) as store:
        add_docs(store, 30)
        deadline = time.time() + 5
        while time.time() < deadline and store.segments.count() == 0:
            time.sleep(0.05)
        assert store.segments.count() >= 1


def test_remove_from_memtable(tmp_path):
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        ids = add_docs(store, 5)
        assert store.remove(ids[0])
        res = store.new_search().with_text("number").with_k(20).execute()
        assert ids[0] not in [r.id for r in res]
        assert not store.remove(99999)


def test_compaction_merges_for_real(tmp_path):
    """The key divergence from the reference: compaction must NOT lose data."""
    cfg = make_config(tmp_path, compaction_threshold=3, memtable_size_limit=4096)
    with open_persistent_hybrid_index(cfg) as store:
        all_ids = []
        for batch in range(3):
            all_ids.extend(add_docs(store, 5, start=batch * 5))
            store.flush()
        assert store.segments.count() == 3

        store.maybe_compact()
        assert store.segments.count() == 1

        # every doc must still be findable in all three modalities
        for i, doc_id in enumerate(all_ids):
            res = store.new_search().with_vector([float(i), 0, 0, 0]).with_k(1).execute()
            assert res[0].id == doc_id, f"vector lost doc {i}"
        res = store.new_search().with_text("number").with_k(50).execute()
        assert len(res) == 15
        res = store.new_search().with_metadata(eq("cat", "even")).with_k(50).execute()
        assert len(res) == 8  # 0,2,4,...,14


def test_compaction_below_threshold_is_noop(tmp_path):
    cfg = make_config(tmp_path, compaction_threshold=5)
    with open_persistent_hybrid_index(cfg) as store:
        add_docs(store, 3)
        store.flush()
        assert store.segments.count() == 1
        store.maybe_compact()
        assert store.segments.count() == 1


def test_segment_lazy_load_and_evict(tmp_path):
    cfg = make_config(tmp_path)
    store = open_persistent_hybrid_index(cfg)
    add_docs(store, 5)
    store.close()

    with open_persistent_hybrid_index(make_config(tmp_path)) as store2:
        seg = store2.segments.list()[0]
        assert not seg.is_cached
        store2.new_search().with_text("number").with_k(5).execute()
        assert seg.is_cached
        seg.evict_cache()
        assert not seg.is_cached
        # still searchable after eviction (reloads)
        res = store2.new_search().with_text("number").with_k(5).execute()
        assert len(res) == 5


def test_search_spans_memtables_and_segments(tmp_path):
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        ids_a = add_docs(store, 5)
        store.flush()  # -> segment
        ids_b = add_docs(store, 5, start=100)  # -> memtable
        res = store.new_search().with_text("number").with_k(20).execute()
        got = {r.id for r in res}
        assert set(ids_a) <= got and set(ids_b) <= got


def test_closed_storage_errors(tmp_path):
    store = open_persistent_hybrid_index(make_config(tmp_path))
    store.close()
    with pytest.raises(StorageClosedError):
        store.add(np.zeros(4, dtype=np.float32), "x", None)
    with pytest.raises(StorageClosedError):
        store.new_search()
    store.close()  # idempotent


def test_trained_template_propagates(tmp_path, rng):
    cfg = StorageConfig(
        base_dir=str(tmp_path / "store"),
        memtable_size_limit=2048,
        vector_index_factory=lambda: IVFPQIndex(
            8, DistanceKind.L2, nlist=2, m=2, nbits=2
        ),
        text_index_factory=BM25SearchIndex,
        metadata_index_factory=RoaringMetadataIndex,
    )
    with open_persistent_hybrid_index(cfg) as store:
        train = rng.normal(size=(40, 8)).astype(np.float32)
        store.train(train)
        # adds across multiple rotated memtables must all work (each fresh
        # memtable clones the trained quantizers)
        for i in range(30):
            store.add(train[i % 40], f"doc {i}", {"i": i})
        res = store.new_search().with_vector(train[0]).with_k(3).with_nprobes(2).execute()
        assert len(res) == 3


def test_stats(tmp_path):
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        add_docs(store, 5)
        s = store.stats()
        assert s["memtables"] >= 1
        assert s["memtable_bytes"] > 0
        store.flush()
        s = store.stats()
        assert s["segments"] >= 1
        assert s["segment_bytes"] > 0


# ---------------------------------------------------------------------------
# WAL crash recovery (the reference has no WAL and loses unflushed writes)
# ---------------------------------------------------------------------------


def _simulate_crash(store):
    """Tear down a store WITHOUT flushing: stop workers, leave WAL + a
    stale LOCK behind (as a killed process would)."""
    store._stop.set()
    store._flush_event.set()
    store._compact_event.set()
    store._flush_thread.join(timeout=5)
    store._compact_thread.join(timeout=5)
    # overwrite the LOCK with a dead pid to mimic a crashed process
    import os

    with open(os.path.join(store.provider.base_dir, "LOCK"), "w") as f:
        f.write("999999999")


def test_wal_recovers_unflushed_writes(tmp_path):
    cfg = make_config(tmp_path)
    store = open_persistent_hybrid_index(cfg)
    ids = add_docs(store, 6)
    removed = ids[2]
    store.remove(removed)
    _simulate_crash(store)  # NO flush: without a WAL these writes are gone

    store2 = open_persistent_hybrid_index(make_config(tmp_path))
    try:
        res = store2.new_search().with_text("number").with_k(20).execute()
        got = sorted(r.id for r in res)
        assert got == sorted(set(ids) - {removed})
        res = store2.new_search().with_vector([4.0, 0, 0, 0]).with_k(1).execute()
        assert res[0].id == ids[4]
        res = store2.new_search().with_metadata(eq("cat", "even")).with_k(20).execute()
        assert all(r.id in ids for r in res)
    finally:
        store2.close()


def test_wal_cleaned_after_flush_and_close(tmp_path):
    import os

    cfg = make_config(tmp_path)
    with open_persistent_hybrid_index(cfg) as store:
        add_docs(store, 5)
        assert any(f.startswith("wal_") for f in os.listdir(cfg.base_dir))
        store.flush()
    # after clean close no WAL files remain
    assert not any(f.startswith("wal_") for f in os.listdir(cfg.base_dir))


def test_wal_disabled(tmp_path):
    import os

    cfg = make_config(tmp_path, wal_enabled=False)
    with open_persistent_hybrid_index(cfg) as store:
        add_docs(store, 3)
        assert not any(f.startswith("wal_") for f in os.listdir(cfg.base_dir))


def test_stale_lock_takeover(tmp_path):
    import os

    cfg = make_config(tmp_path)
    store = open_persistent_hybrid_index(cfg)
    store.close()
    # plant a stale lock from a dead pid
    with open(os.path.join(cfg.base_dir, "LOCK"), "w") as f:
        f.write("999999999")
    store2 = open_persistent_hybrid_index(make_config(tmp_path))
    store2.close()


def test_auto_ids_do_not_collide_after_reopen(tmp_path):
    cfg = make_config(tmp_path)
    store = open_persistent_hybrid_index(cfg)
    ids = add_docs(store, 4)
    store.close()

    # fresh process would reset the global counter; simulate that
    from comet_tpu.core import node as node_mod

    node_mod._reset_node_id_counter()

    store2 = open_persistent_hybrid_index(make_config(tmp_path))
    try:
        new_id = store2.add(np.array([9, 9, 9, 9], dtype=np.float32), "fresh doc", {"num": 99})
        assert new_id not in ids
        res = store2.new_search().with_text("fresh").with_k(5).execute()
        assert [r.id for r in res] == [new_id]
    finally:
        store2.close()


def test_concurrent_flush_no_duplicate_segments(tmp_path):
    """Regression: a user-thread flush racing the background flush worker
    must not serialize the same frozen memtable into two segments."""
    import threading

    cfg = make_config(tmp_path, memtable_size_limit=256, flush_threshold=10**9)
    with open_persistent_hybrid_index(cfg) as store:
        add_docs(store, 40)  # forces several frozen memtables
        n_docs = 40
        threads = [threading.Thread(target=store.flush) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # every doc present exactly once across all segments
        total = sum(
            seg.get_index().count() for seg in store.segments.list()
        ) + sum(mt.index.count() for mt in store.memtables.list_all())
        assert total == n_docs
