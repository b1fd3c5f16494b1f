"""Document-ID pre-filtering.

The reference wraps a pooled roaring bitmap and calls ShouldSkip per vector
inside every scan loop (document_filter.go:27-65). Here a filter compiles to
a boolean mask over index *slots* once per search, and the mask is fused into
the device scoring kernel — no per-row branching.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np


class DocumentFilter:
    """Membership filter over document IDs; None/empty = all eligible."""

    def __init__(self, document_ids: Iterable[int] | None = None):
        if document_ids is None:
            self._ids: np.ndarray | None = None
        else:
            arr = np.asarray(sorted(set(int(i) for i in document_ids)), dtype=np.uint32)
            self._ids = arr if arr.size else None

    @property
    def enabled(self) -> bool:
        return self._ids is not None

    def should_skip(self, doc_id: int) -> bool:
        """Scalar parity API (document_filter.go:63-65)."""
        if self._ids is None:
            return False
        pos = np.searchsorted(self._ids, doc_id)
        return not (pos < len(self._ids) and self._ids[pos] == doc_id)

    def slot_mask(self, slot_ids: np.ndarray) -> np.ndarray | None:
        """Boolean mask over an index's slot->id array; None if disabled.

        Vectorized: sorted membership test over the whole slot table at once.
        """
        if self._ids is None:
            return None
        return np.isin(slot_ids, self._ids, assume_unique=False)
