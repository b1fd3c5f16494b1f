"""Packed bitsets and bit-sliced indexes (BSI).

The reference leans on RoaringBitmap + its BitSliceIndexing sub-package
(metadata_index.go:64). Here the equivalent is dense packed uint64 words in
numpy — every set operation (AND/OR/ANDNOT) is one vectorized word-wise op,
and BSI comparisons are the classic bit-sliced O(64 word-ops) algorithms
over biased-unsigned bitplanes. Dense words beat roaring for the doc-ID
ranges this engine produces (small, dense auto-increment IDs), keep the
layout directly uploadable to the TPU as a predicate mask, and need no
third-party dependency.
"""

from __future__ import annotations

import numpy as np

_WORD = 64
_BIAS = np.uint64(1 << 63)


class Bitset:
    """Growable packed bitset over uint64 words."""

    __slots__ = ("words",)

    def __init__(self, words: np.ndarray | None = None):
        self.words = (
            words if words is not None else np.zeros(1, dtype=np.uint64)
        )

    # -- sizing ------------------------------------------------------------

    def _ensure(self, word_idx: int) -> None:
        if word_idx >= len(self.words):
            new_len = max(word_idx + 1, len(self.words) * 2)
            grown = np.zeros(new_len, dtype=np.uint64)
            grown[: len(self.words)] = self.words
            self.words = grown

    @staticmethod
    def _align(a: "Bitset", b: "Bitset") -> tuple[np.ndarray, np.ndarray]:
        la, lb = len(a.words), len(b.words)
        if la == lb:
            return a.words, b.words
        n = max(la, lb)
        wa = np.zeros(n, dtype=np.uint64)
        wa[:la] = a.words
        wb = np.zeros(n, dtype=np.uint64)
        wb[:lb] = b.words
        return wa, wb

    # -- single-bit ops ----------------------------------------------------

    def add(self, i: int) -> None:
        w = i >> 6
        self._ensure(w)
        self.words[w] |= np.uint64(1 << (i & 63))

    def discard(self, i: int) -> None:
        w = i >> 6
        if w < len(self.words):
            self.words[w] &= ~np.uint64(1 << (i & 63))

    def contains(self, i: int) -> bool:
        w = i >> 6
        if w >= len(self.words):
            return False
        return bool((self.words[w] >> np.uint64(i & 63)) & np.uint64(1))

    # -- bulk ops ----------------------------------------------------------

    def add_many(self, ids: np.ndarray) -> None:
        ids = np.asarray(ids, dtype=np.uint64)
        if ids.size == 0:
            return
        self._ensure(int(ids.max()) >> 6)
        np.bitwise_or.at(
            self.words, (ids >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (ids & np.uint64(63)),
        )

    def discard_many(self, ids: np.ndarray) -> None:
        ids = np.asarray(ids, dtype=np.uint64)
        if ids.size == 0:
            return
        w = (ids >> np.uint64(6)).astype(np.int64)
        in_range = w < len(self.words)
        if not in_range.all():
            ids = ids[in_range]
            w = w[in_range]
        np.bitwise_and.at(
            self.words, w, ~(np.uint64(1) << (ids & np.uint64(63)))
        )

    def contains_many(self, ids: np.ndarray) -> np.ndarray:
        """Vectorized membership over an id array -> bool array."""
        ids = np.asarray(ids, dtype=np.uint64)
        w = (ids >> np.uint64(6)).astype(np.int64)
        in_range = w < len(self.words)
        w_safe = np.where(in_range, w, 0)
        bits = (self.words[w_safe] >> (ids & np.uint64(63))) & np.uint64(1)
        return (bits == 1) & in_range

    # -- set algebra (functional) -----------------------------------------

    def clone(self) -> "Bitset":
        return Bitset(self.words.copy())

    def and_(self, other: "Bitset") -> "Bitset":
        wa, wb = self._align(self, other)
        return Bitset(wa & wb)

    def or_(self, other: "Bitset") -> "Bitset":
        wa, wb = self._align(self, other)
        return Bitset(wa | wb)

    def andnot(self, other: "Bitset") -> "Bitset":
        wa, wb = self._align(self, other)
        return Bitset(wa & ~wb)

    def iand(self, other: "Bitset") -> None:
        self.words = self.and_(other).words

    def ior(self, other: "Bitset") -> None:
        self.words = self.or_(other).words

    def iandnot(self, other: "Bitset") -> None:
        self.words = self.andnot(other).words

    # -- inspection --------------------------------------------------------

    def count(self) -> int:
        return int(np.bitwise_count(self.words).sum())

    def is_empty(self) -> bool:
        return not self.words.any()

    def to_array(self) -> np.ndarray:
        """Sorted array of set bit positions (uint32); fully vectorized."""
        bits = np.unpackbits(self.words.view(np.uint8), bitorder="little")
        return np.flatnonzero(bits).astype(np.uint32)

    @staticmethod
    def from_array(ids) -> "Bitset":
        bs = Bitset()
        bs.add_many(np.asarray(list(ids) if not isinstance(ids, np.ndarray) else ids))
        return bs


class BSI:
    """Bit-sliced index over int64 values (the reference's BitSliceIndexing
    equivalent, metadata_index.go:332-393).

    Values are stored BIASED (v + 2^63) so a single unsigned bitplane
    comparison handles negatives. 64 planes of packed words + an existence
    bitmap; every comparison is O(64) vectorized word operations.
    """

    __slots__ = ("planes", "ebm", "values", "_version", "_stack_version", "_stacked")

    def __init__(self):
        self.planes = [Bitset() for _ in range(_WORD)]
        self.ebm = Bitset()
        # doc -> biased value, kept for remove/update bookkeeping
        self.values: dict[int, int] = {}
        self._version = 0
        self._stack_version = -1
        self._stacked: np.ndarray | None = None  # [64, W] plane matrix cache

    def set_value(self, doc_id: int, value: int) -> None:
        biased = (int(value) + (1 << 63)) & ((1 << 64) - 1)
        old = self.values.get(doc_id)
        if old is not None and old != biased:
            for b in range(_WORD):
                if (old >> b) & 1:
                    self.planes[b].discard(doc_id)
        self.values[doc_id] = biased
        self.ebm.add(doc_id)
        for b in range(_WORD):
            if (biased >> b) & 1:
                self.planes[b].add(doc_id)
        self._version += 1

    def set_values(self, doc_ids: np.ndarray, values: np.ndarray) -> None:
        """Bulk insert/update: vectorized per-plane passes.

        Duplicate doc_ids within one batch keep the LAST occurrence (matching
        the scalar set_value applied in order); in-batch duplicates and
        updates of existing docs discard the old value's plane bits first so
        no stale bits survive.
        """
        doc_ids = np.asarray(doc_ids, dtype=np.uint64)
        biased = np.asarray(values, dtype=np.int64).astype(np.uint64) + _BIAS
        if doc_ids.size == 0:
            return
        # dedup keeping the last occurrence of each doc_id
        _, first_in_rev = np.unique(doc_ids[::-1], return_index=True)
        if len(first_in_rev) != len(doc_ids):
            keep = np.sort(len(doc_ids) - 1 - first_in_rev)
            doc_ids = doc_ids[keep]
            biased = biased[keep]
        # old values (docs not present default to the new value -> no-op diff)
        get = self.values.get
        olds = np.fromiter(
            (get(int(d), v) for d, v in zip(doc_ids.tolist(), biased.tolist())),
            dtype=np.uint64,
            count=len(doc_ids),
        )
        diff = olds != biased
        self.values.update(zip(doc_ids.tolist(), biased.tolist()))
        self.ebm.add_many(doc_ids)
        one = np.uint64(1)
        for b in range(_WORD):
            bit = np.uint64(b)
            if diff.any():
                clr = diff & (((olds >> bit) & one) == one)
                if clr.any():
                    self.planes[b].discard_many(doc_ids[clr])
            sel = ((biased >> bit) & one) == one
            if sel.any():
                self.planes[b].add_many(doc_ids[sel])
        self._version += 1

    def clear_value(self, doc_id: int) -> None:
        biased = self.values.pop(doc_id, None)
        if biased is None:
            return
        self.ebm.discard(doc_id)
        for b in range(_WORD):
            if (biased >> b) & 1:
                self.planes[b].discard(doc_id)
        self._version += 1

    # -- comparisons (bit-sliced) ------------------------------------------

    def _stack(self) -> np.ndarray:
        """Width-aligned [64, W] plane matrix, cached until the next write —
        comparisons then run 64 word-ops over matrix rows without per-plane
        reallocation."""
        if self._stack_version != self._version or self._stacked is None:
            n = max(len(p.words) for p in self.planes)
            n = max(n, len(self.ebm.words))
            stacked = np.zeros((_WORD, n), dtype=np.uint64)
            for b in range(_WORD):
                pw = self.planes[b].words
                stacked[b, : len(pw)] = pw
            self._stacked = stacked
            self._stack_version = self._version
        return self._stacked

    def _split(self, value: int) -> tuple[Bitset, Bitset]:
        """Returns (gt, eq) bitsets vs the biased comparison value."""
        biased = (int(value) + (1 << 63)) & ((1 << 64) - 1)
        stacked = self._stack()
        n = stacked.shape[1]
        eq = np.zeros(n, dtype=np.uint64)
        eq[: len(self.ebm.words)] = self.ebm.words
        gt = np.zeros(n, dtype=np.uint64)
        for b in range(_WORD - 1, -1, -1):
            plane = stacked[b]
            if (biased >> b) & 1:
                eq &= plane
            else:
                gt |= eq & plane
                eq &= ~plane
        return Bitset(gt), Bitset(eq)

    def compare_gt(self, value: int) -> Bitset:
        gt, _ = self._split(value)
        return gt

    def compare_ge(self, value: int) -> Bitset:
        gt, eq = self._split(value)
        return gt.or_(eq)

    def compare_eq(self, value: int) -> Bitset:
        _, eq = self._split(value)
        return eq

    def compare_lt(self, value: int) -> Bitset:
        return self.ebm.andnot(self.compare_ge(value))

    def compare_le(self, value: int) -> Bitset:
        return self.ebm.andnot(self.compare_gt(value))

    def compare_range(self, lo: int, hi: int) -> Bitset:
        """Inclusive [lo, hi]."""
        return self.compare_ge(lo).and_(self.compare_le(hi))
