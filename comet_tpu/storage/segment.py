"""Immutable on-disk segments with lazy load + cache.

Parity with storage_segment.go: gzip'd 4-file snapshots, double-checked
lazy loading into a cached in-memory hybrid index (:58-166), cache
eviction (:174-178), and the segment manager (:189-303).
"""

from __future__ import annotations

import gzip
import os
import threading
from typing import Callable

from comet_tpu.hybrid import HybridSearchIndex


class SegmentMetadata:
    def __init__(
        self,
        segment_id: int,
        paths: dict[str, str],
        index_factory: Callable[[], HybridSearchIndex],
        bloom_path: str | None = None,
    ):
        self.segment_id = segment_id
        self.paths = paths
        self._factory = index_factory
        self._mu = threading.Lock()
        self._cached: HybridSearchIndex | None = None
        self._bloom_path = bloom_path
        self._bloom = None
        self._bloom_loaded = False

    # -- doc-ID bloom sidecar (storage/bloom.py) ------------------------------

    def _get_bloom(self):
        if not self._bloom_loaded:
            with self._mu:
                if not self._bloom_loaded:
                    if self._bloom_path is not None:
                        from comet_tpu.storage.bloom import BloomFilter

                        try:
                            self._bloom = BloomFilter.load(self._bloom_path)
                        except (OSError, ValueError):
                            self._bloom = None  # missing/corrupt: can't skip
                    self._bloom_loaded = True
        return self._bloom

    def may_contain(self, doc_id: int) -> bool:
        bloom = self._get_bloom()
        return True if bloom is None else bloom.may_contain(doc_id)

    def may_contain_any(self, doc_ids) -> bool:
        bloom = self._get_bloom()
        return True if bloom is None else bloom.may_contain_any(doc_ids)

    def get_index(self) -> HybridSearchIndex:
        """Lazy double-checked load (storage_segment.go:58-166)."""
        cached = self._cached
        if cached is not None:
            return cached
        with self._mu:
            if self._cached is None:
                index = self._factory()
                streams = {}
                try:
                    for kind, path in self.paths.items():
                        if os.path.exists(path):
                            streams[kind] = gzip.open(path, "rb")
                        else:
                            streams[kind] = None
                    index.read_from(
                        streams["hybrid"],
                        streams["vector"],
                        streams["text"],
                        streams["metadata"],
                    )
                finally:
                    for s in streams.values():
                        if s is not None:
                            s.close()
                self._cached = index
            return self._cached

    def evict_cache(self) -> None:
        with self._mu:
            self._cached = None

    @property
    def is_cached(self) -> bool:
        return self._cached is not None

    def total_size(self) -> int:
        size = 0
        for path in self.paths.values():
            try:
                size += os.path.getsize(path)
            except OSError:
                pass
        return size


class SegmentManager:
    def __init__(self):
        self._mu = threading.RLock()
        self._segments: dict[int, SegmentMetadata] = {}

    def add(self, segment: SegmentMetadata) -> None:
        with self._mu:
            self._segments[segment.segment_id] = segment

    def remove(self, segment_id: int) -> SegmentMetadata | None:
        with self._mu:
            return self._segments.pop(segment_id, None)

    def get(self, segment_id: int) -> SegmentMetadata | None:
        with self._mu:
            return self._segments.get(segment_id)

    def list(self) -> list[SegmentMetadata]:
        """Segments sorted oldest first."""
        with self._mu:
            return [self._segments[i] for i in sorted(self._segments)]

    def count(self) -> int:
        with self._mu:
            return len(self._segments)

    def total_size(self) -> int:
        with self._mu:
            return sum(s.total_size() for s in self._segments.values())

    def evict_all_caches(self) -> None:
        with self._mu:
            for s in self._segments.values():
                s.evict_cache()
