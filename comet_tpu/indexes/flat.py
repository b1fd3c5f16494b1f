"""Flat (brute-force exact) vector index.

Capability parity with the reference's FlatIndex (flat_index.go,
flat_index_search.go): exact kNN with soft delete + Flush compaction,
threshold / doc-ID pre-filter / multi-query aggregation / autocut / reranker,
and binary serialization.

TPU-native design: the corpus is a padded [capacity, d] float32 array in HBM;
search is `ops.topk.scan_topk` — a tiled query x corpus MXU matmul with the
validity mask, doc-ID filter, and threshold fused into the tile kernel,
streaming a running [Q, k] top-k so the [Q, N] distance matrix never
materializes. The reference's per-vector scalar loop
(flat_index_search.go:254-274) is replaced wholesale, not translated.
"""

from __future__ import annotations

from functools import partial
from typing import BinaryIO, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from comet_tpu.core.filter import DocumentFilter
from comet_tpu.core.limiter import sanitize_k
from comet_tpu.core.node import VectorNode, reserve_node_ids
from comet_tpu.indexes.base import (
    BaseVectorIndex,
    INVALID_ID,
    VectorSearchBuilder,
    next_pow2,
    pad_queries,
    upload_f32_exact,
    threshold_scalar,
)
from comet_tpu.io import serial
from comet_tpu.ops.distance import preprocess
from comet_tpu.ops.topk import IDX_SENTINEL, block_topk
from comet_tpu.types import DistanceKind, InvalidConfigError, VectorIndexKind

MAGIC = b"CFLT"
VERSION = 2  # v2: CRC32 payload trailer (v1 readable, no trailer check)

# Default corpus tile for the streaming scan: 128k rows x 128 dims x 4 B
# = 64 MB of HBM traffic per tile step at d=128; queries stay VMEM-resident.
DEFAULT_TILE = 1 << 17

# Query rows per device dispatch (bounds the [Qc, super_tile] dist buffer).
QUERY_CHUNK = 256


def _mask_from_words(words32, ids, valid, sqnorms, cosine):
    """Additive +inf kernel mask with the doc-ID filter expanded in-kernel
    from PACKED 32-bit words (bit i of word w = doc 32w+i) — a dense
    per-slot bool mask costs cap bytes of tunnel upload per query (1 MB at
    1M slots, ~22 ms); the packed words cost at most cap/8 and usually far
    less. Out-of-range ids (beyond the filter's word span) are excluded."""
    widx = (ids >> jnp.uint32(5)).astype(jnp.int32)
    in_range = widx < words32.shape[0]
    w = words32[jnp.minimum(widx, words32.shape[0] - 1)]
    fbit = (w >> (ids & jnp.uint32(31))) & jnp.uint32(1)
    ok = valid & in_range & (fbit == 1)
    return jnp.where(ok, 0.0 if cosine else sqnorms, jnp.inf)


@partial(
    jax.jit,
    static_argnames=("rows", "q_out", "k_pad", "cosine", "sqrt_out", "filtered"),
)
def _flat_fused_dispatch(
    q, corpus_t, mask_or_base, thr, words32, ids, valid,
    rows, q_out, k_pad, cosine, sqrt_out, filtered,
):
    """The whole flat search as ONE device dispatch: pad the uploaded
    query rows to the kernel tile, expand the packed doc-ID filter into
    the additive mask (when `filtered`), run the Pallas pipeline, and
    slice the output to [q_out, k_pad] — every eager step here used to be
    its own ~1 ms tunnel enqueue, which dominates single-query latency
    (tunnel floor ~25 ms, eager path measured ~32 ms). q_out is the
    next-pow2 of the real query count, so compile variants stay bounded.
    """
    from comet_tpu.ops.pallas_scan import flat_topk_pipeline

    if q.dtype != jnp.float32:
        q = q.astype(jnp.float32)  # narrow-wire cast fused into this jit
    if filtered:
        mask_vec = _mask_from_words(words32, ids, valid, mask_or_base, cosine)
    else:
        mask_vec = mask_or_base
    if rows != q.shape[0]:
        q = lax.dynamic_update_slice(
            jnp.zeros((rows, q.shape[1]), q.dtype), q, (0, 0)
        )
    s, i = flat_topk_pipeline(
        q, corpus_t, mask_vec, thr, k_pad, cosine=cosine, sqrt_out=sqrt_out
    )
    return s[:q_out], i[:q_out]


class FlatIndex(BaseVectorIndex):
    """Exact brute-force kNN index (reference: flat_index.go:65-94).

    `storage` selects the device-resident precision: "float32" (default,
    bit-exact parity with the scalar-f32 reference incl. tie order),
    "bfloat16"/"float16" (half the HBM traffic and native single-pass MXU
    matmuls — ~0.3% relative distance error, recall impact negligible on
    real datasets), or "int8" (symmetric abs-max quantization, a QUARTER of
    the f32 HBM traffic; quantizer.go:180-247's Int8Quantizer — which the
    reference ships but never wires into any index — as actual index
    storage). The host-canonical copy stays float32 either way, so
    serialization and flush are lossless.

    int8 details: the scale is abs-max/127 — either trained once via
    `train(sample)` (fixed thereafter, like Int8Quantizer.Train) or, when
    untrained, fitted to the live corpus per mutation epoch. `rerank=True`
    adds an exact-f32 refinement: the int8 scan over-fetches
    `rerank_factor * k` candidates and the true top-k is recomputed from
    the float32 originals (host-side — the f32 corpus never occupies HBM),
    recovering exact distances at the cost of a slightly wider download.
    """

    def __init__(
        self,
        dim: int,
        distance_kind: DistanceKind = DistanceKind.L2,
        storage: str = "float32",
        rerank: bool = False,
        rerank_factor: int = 4,
    ):
        super().__init__(dim, distance_kind)
        if storage not in ("float32", "bfloat16", "float16", "int8"):
            raise InvalidConfigError(
                f"unsupported flat storage dtype: {storage!r} "
                "(use float32, bfloat16, float16, or int8)"
            )
        if rerank and storage == "float32":
            raise InvalidConfigError(
                "rerank=True needs lossy storage (the float32 scan is exact)"
            )
        self._storage = storage
        self._rerank = bool(rerank)
        self._rerank_factor = max(int(rerank_factor), 2)
        self._int8_scale = None        # trained scale (None = fit per epoch)
        self._dev_scale = None         # device copy of the epoch's scale
        self._dev_cast = None
        self._dev_cast_version = -1
        self._dev_t = None
        self._dev_t_version = -1
        self._mask_cache = None
        # device copies of repeated doc-ID filter words, keyed by the
        # shared COW words buffer (see _search_launch)
        self._filter_dev_cache: dict = {}
        self._mask_key = None

    # -- contracts -----------------------------------------------------------

    def kind(self) -> VectorIndexKind:
        return VectorIndexKind.FLAT

    def train(self, vectors=None) -> None:
        """Flat index requires no training (parity: flat Train is a no-op) —
        except int8 storage, where a training sample fixes the abs-max scale
        (quantizer.go Int8Quantizer.Train); untrained int8 fits the scale to
        the live corpus per mutation epoch instead."""
        if self._storage == "int8" and vectors is not None:
            sample = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
            self._check_dim(sample)
            prepped = preprocess(sample, self._distance_kind)
            amax = float(np.abs(prepped).max()) if prepped.size else 0.0
            with self._lock:
                self._int8_scale = np.float32(max(amax, 1e-30) / 127.0)
                self._dev_cast_version = -1  # requantize on next search
        return None

    # -- mutation --------------------------------------------------------------

    def add(self, node: VectorNode) -> None:
        """Insert one node; the vector is preprocessed for the metric at
        insert time (flat_index.go:169-189)."""
        self.add_batch(np.asarray(node.vector, dtype=np.float32)[None, :], [node.id])

    def add_batch(self, vectors: np.ndarray, ids: Iterable[int] | None = None) -> list[int]:
        """Batch insert (TPU-native fast path; the reference is one-at-a-time).

        Returns the node IDs (auto-assigned when `ids` is None).
        """
        vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        self._check_dim(vectors)
        if ids is None:
            first = reserve_node_ids(len(vectors))
            id_arr = np.arange(first, first + len(vectors), dtype=np.uint32)
        else:
            id_arr = np.asarray(list(ids), dtype=np.uint32)
            if len(id_arr) != len(vectors):
                raise InvalidConfigError("ids and vectors length mismatch")
        prepped = preprocess(vectors, self._distance_kind)
        with self._lock:
            for i in id_arr.tolist():
                if self._store.contains(i):
                    raise InvalidConfigError(f"duplicate node ID {i}")
            self._store.add_batch(id_arr, prepped)
        return id_arr.tolist()

    def remove(self, node_id: int) -> None:
        """Soft delete; excluded from search until Flush hard-deletes."""
        with self._lock:
            self._store.remove(node_id)

    def flush(self) -> None:
        """Hard-delete soft-deleted rows and compact (flat_index.go:266-299)."""
        with self._lock:
            self._store.flush()

    # -- search ---------------------------------------------------------------

    def _device_arrays(self):
        if self._storage == "float32":
            return self._store.device_state()
        if self._dev_cast_version != self._store.version:
            if self._storage == "int8":
                # quantize host-side from the f32 canonical copy; only the
                # int8 rows (+ dequant-domain sqnorms) ever reach HBM
                store = self._store
                n = store.n
                scale = self._int8_scale
                if scale is None:
                    amax = (
                        float(np.abs(store.vectors[:n][store.valid[:n]]).max())
                        if store.valid[:n].any() else 0.0
                    )
                    scale = np.float32(max(amax, 1e-30) / 127.0)
                q = np.clip(
                    np.rint(store.vectors / scale), -127, 127
                ).astype(np.int8)
                deq = q.astype(np.float32) * scale
                sqn = np.einsum("nd,nd->n", deq, deq).astype(np.float32)
                self._dev_scale = jnp.asarray(scale)
                self._dev_cast = (
                    jnp.asarray(q), jnp.asarray(sqn), jnp.asarray(store.valid)
                )
            else:
                vecs32, sqnorms, valid = self._store.device_state()
                dtype = (
                    jnp.bfloat16 if self._storage == "bfloat16" else jnp.float16
                )
                self._dev_cast = (vecs32.astype(dtype), sqnorms, valid)
            self._dev_cast_version = self._store.version
        return self._dev_cast

    def _device_corpus_t(self, vecs):
        """Transposed [d, capacity] corpus for the MXU-friendly Pallas
        pipeline, materialized once per store version."""
        if self._dev_t_version != self._store.version:
            import jax

            self._dev_t = jax.jit(lambda v: v.T)(vecs)
            self._dev_t_version = self._store.version
        return self._dev_t

    def _search_batch(self, queries: np.ndarray, builder: VectorSearchBuilder):
        return self._search_collect(self._search_launch(queries, builder))

    def _device_ids(self):
        """Device mirror of the slot->doc-id array (filter-bit expansion)."""
        if getattr(self, "_dev_ids_version", -1) != self._store.version:
            self._dev_ids = jnp.asarray(self._store.ids)
            self._dev_ids_version = self._store.version
        return self._dev_ids

    def _filter_word_span(self, doc_filter: DocumentFilter) -> int:
        """64-bit word count covering the filter's id span, pow2-bucketed
        (bounds jit recompiles across filter sizes)."""
        if doc_filter._bitset is not None:
            need = len(doc_filter._bitset.words)
        else:
            need = (int(doc_filter._ids.max()) >> 6) + 1
        return max(next_pow2(need), 8)

    def _mask_vec(self, valid, sqnorms, cosine: bool, fmask):
        """Additive +inf mask for the Pallas kernel; cached per store
        version when there is no per-call document filter."""
        if fmask is not None:
            # per-call filter already folded into `valid`; not cacheable
            return jnp.where(valid, 0.0 if cosine else sqnorms, jnp.inf)
        key = (self._store.version, cosine, self._storage)
        if self._mask_key != key:
            self._mask_cache = jnp.where(
                valid, 0.0 if cosine else sqnorms, jnp.inf
            )
            self._mask_key = key
        return self._mask_cache

    def _search_launch(self, queries: np.ndarray, builder: VectorSearchBuilder):
        store = self._store
        n_slots = store.n  # includes soft-deleted rows, like len(index.vectors)
        if n_slots == 0:
            return ("empty", queries.shape[0])

        k_eff = sanitize_k(builder._k, n_slots)
        rerank = self._rerank and self._storage != "float32"
        k_want = min(k_eff * self._rerank_factor, n_slots) if rerank else k_eff
        k_pad = min(next_pow2(k_want), store.capacity)
        super_tile = min(store.capacity, DEFAULT_TILE * 8)

        qprep = preprocess(queries, self._distance_kind)
        qpad, q_real = pad_queries(qprep)

        vecs, sqnorms, valid = self._device_arrays()
        doc_filter = DocumentFilter(builder._document_ids)
        thr = threshold_scalar(builder._threshold)

        # Pallas fast path (TPU, corpus fits one pass): fused distance +
        # sort-network selection pipeline, ONE device dispatch per batch —
        # identical results to the XLA fallback path (same block-select
        # proof, same tie order).
        from comet_tpu.ops.pallas_scan import (
            GROUP as P_GROUP,
            TN as P_TN,
            TQ as P_TQ,
            flat_topk_pipeline,
            pallas_available,
        )

        use_pallas = (
            pallas_available()
            and self._storage in ("float32", "bfloat16")
            and store.capacity % P_TN == 0
            and store.capacity <= (1 << 21)
            and max(k_pad, 8) <= store.capacity // P_GROUP
        )

        if use_pallas:
            cosine = self._distance_kind == DistanceKind.COSINE
            if cosine:
                thr_k = thr
            else:
                # kernel computes squared distances; sqrt/threshold adapt
                thr_k = thr * thr if self._distance_kind == DistanceKind.L2 else thr
            if doc_filter.enabled:
                # packed-words filter expansion on device (single-query
                # latency: uploads words/8 bytes instead of a dense mask).
                # Repeated-filter serving (the hybrid pattern: the metadata
                # memo hands back the SAME shared words buffer per
                # predicate set) reuses the device copy — saves one eager
                # upload enqueue (~1 ms of tunnel) per query.
                nw64 = self._filter_word_span(doc_filter)
                words32 = None
                cache_key = None
                bs = doc_filter._bitset
                # only COW-SHARED buffers are safe to key by identity: a
                # shared bitset copies before any mutation, so the cached
                # array can never change in place under us (user-owned
                # unshared bitsets could)
                if bs is not None and bs._shared:
                    cache_key = (id(bs.words), len(bs.words), nw64)
                    hit = self._filter_dev_cache.get(cache_key)
                    if hit is not None and hit[0] is bs.words:
                        words32 = hit[1]
                if words32 is None:
                    words32 = jnp.asarray(
                        doc_filter.word_mask(nw64).view(np.uint32)
                    )
                    if cache_key is not None:
                        if len(self._filter_dev_cache) >= 16:
                            self._filter_dev_cache.clear()
                        # hold the numpy buffer so id() stays valid
                        self._filter_dev_cache[cache_key] = (
                            bs.words, words32,
                        )
                mask_or_base, ids_dev, valid_dev = (
                    sqnorms, self._device_ids(), valid,
                )
            else:
                words32 = ids_dev = valid_dev = None
                mask_or_base = self._mask_vec(valid, sqnorms, cosine, None)
            rows = -(-qpad.shape[0] // P_TQ) * P_TQ
            corpus_t = self._device_corpus_t(vecs)
            from comet_tpu.indexes.base import narrow_wire

            s, i = _flat_fused_dispatch(
                jnp.asarray(narrow_wire(qpad)), corpus_t, mask_or_base, thr_k,
                words32, ids_dev, valid_dev,
                rows=rows, q_out=qpad.shape[0], k_pad=k_pad,
                cosine=cosine,
                sqrt_out=self._distance_kind == DistanceKind.L2,
                filtered=doc_filter.enabled,
            )
            # slice to the REQUESTED width on device: the tunnel download
            # is the serving bottleneck (~20-45 MB/s), so the k_pad-k_eff
            # padding columns are pure wire waste (k=100 pads to 128: -22%).
            # Only worth it when the saved bytes outweigh the 2 extra eager
            # dispatches (~1 ms host enqueue): single-query latency paths
            # download the padded row and crop on host (collect does both).
            k_keep = k_want if rerank else k_eff
            pad_bytes = 8 * (s.shape[0] * s.shape[1] - q_real * k_keep)
            if pad_bytes > (1 << 17) and (
                k_keep < s.shape[1] or q_real < s.shape[0]
            ):
                s, i = s[:q_real, :k_keep], i[:q_real, :k_keep]
            # start the host copies now so a pipelined caller's next batch
            # computes while these results stream back over the tunnel
            wire_scores = builder._wire_scores or rerank
            try:
                if wire_scores:
                    s.copy_to_host_async()
                i.copy_to_host_async()
            except AttributeError:  # pragma: no cover - non-jax.Array impls
                pass
            handle = ("dev", s if wire_scores else None, i, q_real, k_keep,
                      store.ids)
            if rerank:
                return ("rerank", handle, qprep, k_eff, builder._threshold)
            return handle

        fmask = doc_filter.slot_mask(store.ids)
        if fmask is not None:
            valid = jnp.logical_and(valid, jnp.asarray(fmask))
        scale = self._dev_scale if self._storage == "int8" else None
        chunks = []
        for q0 in range(0, qpad.shape[0], QUERY_CHUNK):
            qc = upload_f32_exact(qpad[q0 : q0 + QUERY_CHUNK])
            chunks.append(
                block_topk(
                    qc, vecs, sqnorms, valid, thr,
                    k_pad, self._distance_kind, super_tile=super_tile,
                    scale=scale,
                )
            )
        handle = ("dev_chunks", chunks, q_real, k_want if rerank else k_eff,
                  store.ids)
        if rerank:
            return ("rerank", handle, qprep, k_eff, builder._threshold)
        return handle

    def _search_collect(self, handle):
        from comet_tpu.indexes.base import collect_device_handle

        if handle[0] != "rerank":
            return collect_device_handle(handle)
        return self._collect_rerank(*handle[1:])

    def _collect_rerank(self, inner, qprep, k_eff, threshold):
        """Exact-f32 refinement of a lossy-storage scan's candidates.

        The scan over-fetched rerank_factor*k candidates per query in the
        quantized/reduced distance domain; recompute their TRUE distances
        from the host-canonical float32 originals (tiny [Q, kc, d] einsum),
        re-apply the metric-space threshold, and keep the deterministic
        (score, slot)-ascending top k_eff. HBM never holds the f32 corpus.
        """
        import jax

        from comet_tpu.indexes.base import collect_device_handle

        if inner[0] == "empty":
            return collect_device_handle(inner)
        if inner[0] == "dev":
            _, s, i, q_real, kc, ids_snap = inner
            scores, slots = jax.device_get((s, i))
            scores, slots = scores[:q_real], slots[:q_real]
        else:
            _, chunks, q_real, kc, ids_snap = inner
            chunks = jax.device_get(chunks)
            scores = np.concatenate([a for a, _ in chunks])[:q_real]
            slots = np.concatenate([b for _, b in chunks])[:q_real]
        slots = slots[:, :kc].astype(np.int64)
        hit = slots != int(IDX_SENTINEL)
        safe = np.where(hit, slots, 0)
        vecs = self._store.vectors[safe]                 # [Q, kc, d]
        q = qprep[:q_real]
        ip = np.einsum("qd,qcd->qc", q, vecs, optimize=True)
        if self._distance_kind == DistanceKind.COSINE:
            exact = 1.0 - np.clip(ip, -1.0, 1.0)
        else:
            xn = np.einsum("qcd,qcd->qc", vecs, vecs, optimize=True)
            qn = np.einsum("qd,qd->q", q, q)[:, None]
            exact = np.maximum(qn + xn - 2.0 * ip, 0.0)
            if self._distance_kind == DistanceKind.L2:
                exact = np.sqrt(exact)
        thr = threshold_scalar(threshold)
        exact = np.where(hit & (exact <= thr), exact, np.inf).astype(np.float32)
        slots = np.where(np.isfinite(exact), slots, int(IDX_SENTINEL))
        slot_key = np.where(
            slots == int(IDX_SENTINEL), np.iinfo(np.int64).max, slots
        )
        order = np.lexsort((slot_key, exact), axis=1)[:, :k_eff]
        exact = np.take_along_axis(exact, order, axis=1)
        slots = np.take_along_axis(slots, order, axis=1)
        hit = slots != int(IDX_SENTINEL)
        ids = np.where(hit, ids_snap[np.where(hit, slots, 0)], INVALID_ID)
        return ids.astype(np.uint32), exact

    # -- serialization ----------------------------------------------------------

    def write_to(self, f: BinaryIO) -> None:
        """Serialize; flushes soft deletes first like the reference
        (flat_index.go:366-369). Format: CFLT v1 header + params + arrays."""
        with self._lock:
            self._store.flush()
            w = serial.CrcWriter(f)
            serial.write_magic(w, MAGIC, VERSION)
            serial.write_str(w, self._distance_kind.value)
            serial.write_u32(w, self._dim)
            n = self._store.n
            serial.write_u64(w, n)
            serial.write_array(w, self._store.ids[:n])
            serial.write_array(w, self._store.vectors[:n])
            w.seal()

    def read_from(self, f: BinaryIO) -> None:
        """Deserialize into this index; stored params must match the
        receiving index's params (parity: flat_index.go ReadFrom validation)."""
        r = serial.CrcReader(f)
        version = serial.read_magic(r, MAGIC, VERSION)
        kind = DistanceKind(serial.read_str(r))
        dim = serial.read_u32(r)
        if kind != self._distance_kind:
            raise serial.SerializationError(
                f"distance kind mismatch: index={self._distance_kind.value}, stored={kind.value}"
            )
        if dim != self._dim:
            raise serial.SerializationError(
                f"dimension mismatch: index={self._dim}, stored={dim}"
            )
        n = serial.read_u64(r)
        ids = serial.read_array(r)
        vectors = serial.read_array(r)
        if version >= 2:
            r.verify()
        if len(ids) != n or vectors.shape != (n, dim):
            raise serial.SerializationError("corrupt flat index payload")
        with self._lock:
            self._store = type(self._store)(dim, capacity=max(n, 1))
            if n:
                self._store.add_batch(ids.astype(np.uint32), vectors.astype(np.float32))
