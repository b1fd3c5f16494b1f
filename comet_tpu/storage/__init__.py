"""LSM-style persistent storage for the hybrid index.

Memtables (fresh in-memory hybrid indexes) rotate when full, flush to
immutable gzip'd 4-file segments, lazily load with caching on the read
path, and compact with REAL exact merging (unlike the reference's
data-losing stub, storage_compaction.go:66-72). See engine.py.
"""

from comet_tpu.storage.engine import (
    DEFAULT_COMPACTION_INTERVAL,
    DEFAULT_COMPACTION_THRESHOLD,
    DEFAULT_FLUSH_THRESHOLD,
    DEFAULT_MEMTABLE_SIZE_LIMIT,
    PersistentHybridIndex,
    StorageClosedError,
    StorageConfig,
    default_storage_config,
    open_persistent_hybrid_index,
)
from comet_tpu.storage.provider import StorageLockedError, StorageProvider
from comet_tpu.storage.merge import MergeError, merge_hybrid, merge_results

__all__ = [
    "StorageConfig",
    "default_storage_config",
    "PersistentHybridIndex",
    "open_persistent_hybrid_index",
    "StorageClosedError",
    "StorageLockedError",
    "StorageProvider",
    "MergeError",
    "merge_hybrid",
    "merge_results",
    "DEFAULT_MEMTABLE_SIZE_LIMIT",
    "DEFAULT_FLUSH_THRESHOLD",
    "DEFAULT_COMPACTION_INTERVAL",
    "DEFAULT_COMPACTION_THRESHOLD",
]
