"""Deletion tombstones: remove() reaches docs already flushed to immutable
segments — beating the reference's acknowledged limitation (storage.go:278-296
can only remove from the active memtable; its flushed docs are undeletable).

Covers: masking in every search path, has_document, durability across
reopen, resurrection on re-add, and consumption by compaction."""

import os

import numpy as np

from comet_tpu.hybrid import HybridSearchBuilder
from comet_tpu.indexes.bm25 import BM25SearchIndex
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.metadata import RoaringMetadataIndex, eq
from comet_tpu.storage import StorageConfig, open_persistent_hybrid_index
from comet_tpu.types import DistanceKind


def make_config(tmp_path, **kw):
    return StorageConfig(
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


def add_docs(store, n, start=0):
    return [
        store.add(
            np.array([i, 0, 0, 0], dtype=np.float32),
            f"document number {i} content",
            {"num": i},
        )
        for i in range(start, start + n)
    ]


def all_ids(results):
    return sorted(r.id for r in results)


def test_remove_reaches_flushed_segments(tmp_path):
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        ids = add_docs(store, 6)
        store.flush()  # everything now lives in an immutable segment
        assert store.stats()["segments"] >= 1
        victim = ids[2]
        assert store.remove(victim) is True
        # masked from every modality
        res = store.new_search().with_vector([2.0, 0, 0, 0]).with_k(6).execute()
        assert victim not in all_ids(res)
        res = store.new_search().with_text("document content").with_k(10).execute()
        assert victim not in all_ids(res)
        res = store.new_search().with_metadata(eq("num", 2)).with_k(10).execute()
        assert victim not in all_ids(res)
        assert not store.has_document(victim)
        # the others are untouched
        assert all(store.has_document(d) for d in ids if d != victim)


def test_remove_missing_doc_returns_false(tmp_path):
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        add_docs(store, 3)
        store.flush()
        assert store.remove(99999) is False


def test_tombstone_survives_reopen(tmp_path):
    cfg = make_config(tmp_path)
    with open_persistent_hybrid_index(cfg) as store:
        ids = add_docs(store, 4)
        store.flush()
        store.remove(ids[0])
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        assert not store.has_document(ids[0])
        res = store.new_search().with_text("document content").with_k(10).execute()
        assert ids[0] not in all_ids(res)
        assert store.has_document(ids[1])


def test_readd_resurrects_tombstoned_id(tmp_path):
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        ids = add_docs(store, 3)
        store.flush()
        store.remove(ids[1])
        assert not store.has_document(ids[1])
        store.add_with_id(
            ids[1], np.array([9, 0, 0, 0], dtype=np.float32), "resurrected doc", {"num": 9}
        )
        assert store.has_document(ids[1])
        res = store.new_search().with_text("resurrected").with_k(5).execute()
        assert ids[1] in all_ids(res)
        # ...and the resurrected version survives its own flush: the
        # tombstone must not mask the NEW segment copy
        store.flush()
        assert store.has_document(ids[1])
        res = store.new_search().with_text("resurrected").with_k(5).execute()
        assert ids[1] in all_ids(res)
        # the OLD segment copy stays hidden (newest-wins merge dedups anyway)
        res = store.new_search().with_vector([1.0, 0, 0, 0]).with_k(10).execute()
        scores = {r.id for r in res}
        assert ids[1] in scores  # present exactly once via merge_results


def test_compaction_consumes_tombstones(tmp_path):
    with open_persistent_hybrid_index(
        make_config(tmp_path, compaction_threshold=3)
    ) as store:
        ids = []
        for batch in range(3):
            ids += add_docs(store, 2, start=batch * 2)
            store.flush()
        assert store.stats()["segments"] == 3
        victim = ids[0]
        store.remove(victim)
        assert victim in store._tombstones
        store.maybe_compact()
        assert store.stats()["segments"] == 1
        # the merged segment was built without the victim...
        seg = store.segments.list()[0]
        assert not seg.get_index().has_document(victim)
        # ...so the tombstone has been garbage-collected, durably: replay
        # the op log the way recovery does
        assert victim not in store._tombstones
        live = set()
        if os.path.exists(store._tombstones_path()):
            for line in open(store._tombstones_path()):
                line = line.strip()
                if line.startswith("+"):
                    live.add(int(line[1:]))
                elif line.startswith("-"):
                    live.discard(int(line[1:]))
        assert victim not in live
        # the rest are intact
        assert all(store.has_document(d) for d in ids if d != victim)


def test_remove_covers_memtable_and_segment_copies(tmp_path):
    """A doc updated after a flush has copies in both a segment and a
    memtable; remove() must kill both."""
    with open_persistent_hybrid_index(make_config(tmp_path)) as store:
        ids = add_docs(store, 2)
        store.flush()
        store.add_with_id(
            ids[0], np.array([5, 0, 0, 0], dtype=np.float32), "updated copy", {"num": 5}
        )
        assert store.remove(ids[0]) is True
        assert not store.has_document(ids[0])
        res = store.new_search().with_text("updated copy document").with_k(10).execute()
        assert ids[0] not in all_ids(res)
