"""Cross-index merging for compaction + cross-source result merging.

The reference's compaction "merge" writes an EMPTY index and deletes the
sources (storage_compaction.go:66-109 — a data-losing stub, SURVEY.md §7).
Here merging is real and EXACT: each index type copies its internal
representation (preprocessed vectors, PQ codes, postings tokens, bitset
planes) — no lossy reconstruction. Result merging mirrors storage_merge.go
(best score per doc ID) with a direction flag because vector-only scores
are distances (lower = better).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

from comet_tpu.ops.bitset import Bitset
from comet_tpu.types import CometError

if TYPE_CHECKING:
    from comet_tpu.hybrid import HybridSearchIndex, HybridSearchResult


class MergeError(CometError):
    pass


def merge_hybrid(dst: "HybridSearchIndex", src: "HybridSearchIndex", skip: set[int]) -> set[int]:
    """Merge every doc of `src` not in `skip` into `dst`. Returns merged IDs.

    Call newest-source-first so `skip` implements LSM newest-wins semantics.
    """
    from comet_tpu.hybrid import _DocInfo

    new_ids = [i for i in src._doc_info if i not in skip]
    if not new_ids:
        return set()

    vec_ids = [i for i in new_ids if src._doc_info[i].has_vector]
    txt_ids = [i for i in new_ids if src._doc_info[i].has_text]
    meta_ids = [i for i in new_ids if src._doc_info[i].has_metadata]

    if vec_ids:
        _merge_vector_rows(dst._vector, src._vector, vec_ids)
    if txt_ids:
        _merge_text_rows(dst._text, src._text, txt_ids)
    if meta_ids:
        _merge_metadata_rows(dst._metadata, src._metadata, meta_ids)

    for i in new_ids:
        info = src._doc_info[i]
        dst._doc_info[i] = _DocInfo(info.has_vector, info.has_text, info.has_metadata)
    return set(new_ids)


def _merge_vector_rows(dst, src, ids: list[int]) -> None:
    from comet_tpu.indexes.flat import FlatIndex
    from comet_tpu.indexes.hnsw import HNSWIndex
    from comet_tpu.indexes.ivf import IVFIndex
    from comet_tpu.indexes.ivfpq import IVFPQIndex
    from comet_tpu.indexes.pq import PQIndex
    from comet_tpu.ops.kmeans import find_nearest_centroid

    if dst is None or src is None:
        raise MergeError("vector index missing on one side of merge")
    if type(dst) is not type(src):
        raise MergeError(f"cannot merge {type(src).__name__} into {type(dst).__name__}")

    id_arr = np.asarray(ids, dtype=np.uint32)
    slots = np.asarray([src._store.id_to_slot[int(i)] for i in ids])

    if isinstance(dst, FlatIndex):
        # vectors are already preprocessed: copy rows directly
        dst._store.add_batch(id_arr, src._store.vectors[slots])
        return

    if isinstance(dst, IVFIndex):
        if not dst._trained:
            if not src._trained:
                raise MergeError("cannot merge untrained IVF indexes")
            dst._centroids = src._centroids.copy()
            dst._trained = True
        vecs = src._store.vectors[slots]
        assign = np.asarray(
            find_nearest_centroid(vecs, dst._centroids, dst._distance_kind)
        ).astype(np.int32)
        new_slots = dst._store.add_batch(id_arr, vecs)
        if dst._store.capacity > len(dst._assign):
            grown = np.full(dst._store.capacity, -1, dtype=np.int32)
            grown[: len(dst._assign)] = dst._assign
            dst._assign = grown
        dst._assign[new_slots] = assign
        dst._bucket_version = -1
        return

    if isinstance(dst, PQIndex):
        if not dst._trained:
            if not src._trained:
                raise MergeError("cannot merge untrained PQ indexes")
            dst._codebooks = src._codebooks.copy()
            dst._trained = True
        elif not np.array_equal(dst._codebooks, src._codebooks):
            raise MergeError("PQ codebooks differ; cannot merge codes exactly")
        new_slots = dst._store.add_batch(
            id_arr, np.zeros((len(id_arr), 0), dtype=np.float32)
        )
        if dst._store.capacity > len(dst._codes):
            grown = np.zeros((dst._store.capacity, dst._m), dtype=np.int32)
            grown[: len(dst._codes)] = dst._codes
            dst._codes = grown
        dst._codes[new_slots] = src._codes[slots]
        return

    if isinstance(dst, IVFPQIndex):
        if not dst._trained:
            if not src._trained:
                raise MergeError("cannot merge untrained IVFPQ indexes")
            dst._centroids = src._centroids.copy()
            dst._codebooks = src._codebooks.copy()
            dst._trained = True
        elif not (
            np.array_equal(dst._centroids, src._centroids)
            and np.array_equal(dst._codebooks, src._codebooks)
        ):
            raise MergeError("IVFPQ quantizers differ; cannot merge codes exactly")
        stored = (
            src._store.vectors[slots]
            if dst._store_originals and src._store_originals
            else np.zeros((len(id_arr), 0), dtype=np.float32)
        )
        new_slots = dst._store.add_batch(id_arr, stored)
        if dst._store.capacity > len(dst._codes):
            grown_c = np.zeros((dst._store.capacity, dst._m), dtype=np.int32)
            grown_c[: len(dst._codes)] = dst._codes
            dst._codes = grown_c
            grown_a = np.full(dst._store.capacity, -1, dtype=np.int32)
            grown_a[: len(dst._assign)] = dst._assign
            dst._assign = grown_a
        dst._codes[new_slots] = src._codes[slots]
        dst._assign[new_slots] = src._assign[slots]
        dst._dev_version = -1
        return

    if isinstance(dst, HNSWIndex):
        # graph edges are index-local: re-insert the (preprocessed) vectors
        dst._insert_preprocessed(id_arr, src._vectors_of_slots(slots))
        return

    raise MergeError(f"unsupported vector index type {type(dst).__name__}")


def _merge_text_rows(dst, src, ids: list[int]) -> None:
    if dst is None or src is None:
        raise MergeError("text index missing on one side of merge")
    for i in ids:
        tokens = src._doc_tokens.get(int(i))
        if tokens is not None:
            dst.add(int(i), " ".join(tokens))


def _merge_metadata_rows(dst, src, ids: list[int]) -> None:
    if dst is None or src is None:
        raise MergeError("metadata index missing on one side of merge")
    sel = Bitset.from_array(np.asarray(ids, dtype=np.uint64))
    dst._all_docs.ior(src._all_docs.and_(sel))
    for key, plane in src._categorical.items():
        picked = plane.and_(sel)
        if picked.is_empty():
            continue
        mine = dst._categorical.get(key)
        if mine is None:
            dst._categorical[key] = picked
        else:
            mine.ior(picked)
    id_set = set(int(i) for i in ids)
    for field_name, bsi in src._numeric.items():
        mine = dst._numeric.get(field_name)
        if mine is None:
            from comet_tpu.ops.bitset import BSI

            mine = dst._numeric[field_name] = BSI()
        docs, vals = bsi.doc_values()
        keep = np.array([int(d) in id_set for d in docs], dtype=bool)
        if keep.any():
            mine.set_values(docs[keep], vals[keep])


def merge_results(
    result_lists: "list[list[HybridSearchResult]]",
    k: int,
    descending: bool = True,
) -> "list[HybridSearchResult]":
    """Cross-source dedup keeping the BEST score per doc
    (storage_merge.go:13-46; 'best' is max for fused/text scores, min for
    vector-only distance scores)."""
    best: dict[int, float] = {}
    for results in result_lists:
        for r in results:
            cur = best.get(r.id)
            if cur is None or (r.score > cur if descending else r.score < cur):
                best[r.id] = r.score

    from comet_tpu.hybrid import HybridSearchResult

    merged = [HybridSearchResult(i, s) for i, s in best.items()]
    merged.sort(key=lambda r: ((-r.score if descending else r.score), r.id))
    return merged[:k] if 0 < k < len(merged) else merged
