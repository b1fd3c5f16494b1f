"""Concurrency tests: thread storms of concurrent add/search/remove
(mirrors the reference's -race tests, e.g. TestFlatIndexConcurrentAddAndSearch
flat_index_search_test.go:425-460, TestPersistentHybridIndex_ConcurrentWrites
storage_test.go:176). Python locking replaces Go's mutexes; these verify no
exceptions, no lost writes, and consistent counts under contention."""

import threading

import numpy as np
import pytest

from comet_tpu.indexes.bm25 import BM25SearchIndex
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.metadata import RoaringMetadataIndex, eq
from comet_tpu.storage import StorageConfig, open_persistent_hybrid_index
from comet_tpu.types import DistanceKind


def run_threads(fns):
    errors = []

    def wrap(fn):
        def inner():
            try:
                fn()
            except Exception as e:  # pragma: no cover - failure reporting
                errors.append(e)

        return inner

    threads = [threading.Thread(target=wrap(fn)) for fn in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_flat_concurrent_add_and_search(rng):
    idx = FlatIndex(8, DistanceKind.L2)
    idx.add_batch(rng.normal(size=(50, 8)).astype(np.float32), ids=range(1, 51))

    def adder(base):
        def run():
            for i in range(30):
                idx.add_batch(
                    rng.normal(size=(1, 8)).astype(np.float32), ids=[base + i]
                )

        return run

    def searcher():
        for _ in range(20):
            idx.new_search().with_query(np.zeros(8, dtype=np.float32)).with_k(5).execute()

    run_threads([adder(1000), adder(2000), searcher, searcher])
    assert idx.count() == 50 + 60


def test_flat_concurrent_remove_and_search(rng):
    idx = FlatIndex(4, DistanceKind.L2)
    idx.add_batch(rng.normal(size=(200, 4)).astype(np.float32), ids=range(1, 201))

    def remover(lo, hi):
        def run():
            for i in range(lo, hi):
                idx.remove(i)

        return run

    def searcher():
        for _ in range(20):
            idx.new_search().with_query(np.zeros(4, dtype=np.float32)).with_k(10).execute()

    run_threads([remover(1, 51), remover(51, 101), searcher, searcher])
    assert idx.count() == 100


def test_bm25_concurrent_add_and_search():
    bm = BM25SearchIndex()

    def adder(base):
        def run():
            for i in range(50):
                bm.add(base + i, f"document {base + i} shared words content")

        return run

    def searcher():
        for _ in range(30):
            bm.new_search().with_query("shared words").with_k(10).execute()

    run_threads([adder(1000), adder(2000), searcher, searcher])
    assert bm.count() == 100


def test_metadata_concurrent_add_and_filter():
    from comet_tpu.core.node import new_metadata_node_with_id

    mi = RoaringMetadataIndex()

    def adder(base):
        def run():
            for i in range(50):
                mi.add(new_metadata_node_with_id(base + i, {"g": "x", "n": i}))

        return run

    def searcher():
        for _ in range(30):
            mi.new_search().with_filters(eq("g", "x")).execute()

    run_threads([adder(1000), adder(2000), searcher])
    assert mi.count() == 100


def test_storage_concurrent_writes(tmp_path):
    cfg = StorageConfig(
        base_dir=str(tmp_path / "store"),
        memtable_size_limit=4096,
        vector_index_factory=lambda: FlatIndex(4, DistanceKind.L2),
        text_index_factory=BM25SearchIndex,
        metadata_index_factory=RoaringMetadataIndex,
    )
    with open_persistent_hybrid_index(cfg) as store:
        ids: list[list[int]] = [[], []]

        def writer(slot):
            def run():
                for i in range(40):
                    doc_id = store.add(
                        np.array([slot, i, 0, 0], dtype=np.float32),
                        f"writer {slot} doc {i}",
                        {"w": slot},
                    )
                    ids[slot].append(doc_id)

            return run

        def searcher():
            for _ in range(15):
                store.new_search().with_text("writer doc").with_k(50).execute()

        run_threads([writer(0), writer(1), searcher])
        all_ids = ids[0] + ids[1]
        assert len(set(all_ids)) == 80  # no duplicate IDs under contention
        res = store.new_search().with_text("writer").with_k(100).execute()
        assert len(res) == 80
