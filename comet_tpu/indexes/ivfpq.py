"""IVFPQ vector index: IVF coarse quantizer + PQ on residuals.

Capability parity with the reference's IVFPQIndex (ivfpq_index.go,
ivfpq_index_search.go): coarse k-means partition, a single shared PQ
codebook set trained on residuals (vector - assigned centroid,
ivfpq_index.go:164-259), train needs >= nlist*10 vectors
(ivfpq_index.go:185), search recomputes a query residual + fresh LUT per
probed cluster (ivfpq_index_search.go:285-323) and sums LUT entries + sqrt
(ivfpq_index_search.go:384-390). Soft delete/flush/filters/threshold/
aggregation/autocut/reranker/serialization as elsewhere.

TPU-native design: one lax.scan over probe ranks; each step builds every
query's residual LUT in one einsum, gathers the probed list's codes from a
padded [nlist, maxlen, M] table, and computes ADC distances as a batched
LUT gather-sum, merging into the running [Q, k] with (score, slot) keys.

Extension over the reference: `with_nrefine(n)` — the README documents a
refinement stage the Go code never implements (README.md:1779 vs
ivfpq_index_search.go; SURVEY.md §7 known gaps). Here it works: when
`store_originals=True` (constructor flag), the top n ADC candidates are
re-ranked with exact distances on the stored originals.
"""

from __future__ import annotations

import logging
import math
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
from comet_tpu.ops.distance import DEFAULT_PRECISION, pairwise_scores, preprocess
from comet_tpu.ops.kmeans import kmeans, kmeans_ivfpq_train, kmeans_subspace
from comet_tpu.ops.topk import IDX_SENTINEL, INF, merge_topk

logger = logging.getLogger(__name__)
from comet_tpu.types import (
    DistanceKind,
    InvalidConfigError,
    NodeNotFoundError,
    NotTrainedError,
    VectorIndexKind,
)

MAGIC = b"CIPQ"
VERSION = 3  # v3: optional OPQ rotation; v2: CRC32 trailer (older readable)

IVFPQ_QUERY_CHUNK = 256


@partial(jax.jit, static_argnames=("k", "kind", "nprobe", "max_steps"))
def _ivfpq_search_kernel(
    queries: jax.Array,      # [Q, d]
    centroids: jax.Array,    # [nlist, d]
    codebooks: jax.Array,    # [M, Ksub, dsub]
    chunk_slots: jax.Array,  # [NC, C] int32, -1 padded (chunked lists)
    chunk_start: jax.Array,  # [nlist + 1] int32
    codes: jax.Array,        # [cap, M] int32
    valid: jax.Array,        # [cap] bool
    threshold: jax.Array,    # scalar f32
    k: int,
    kind: DistanceKind,
    nprobe: int,
    max_steps: int,
):
    """Batched IVFPQ probe-and-ADC over fixed-size list chunks.

    Same cursor-walk structure as the IVF kernel (see ivf.py): each step
    every query scans one 256-row chunk of its current probed list. The
    per-cluster residual LUT (ivfpq_index_search.go:285-323) is recomputed
    per step for each query's CURRENT probe — a [Q, M, Ksub] einsum, trivial
    next to the member-code gathers. Returns (scores [Q,k], slots [Q,k]).
    """
    Q, d = queries.shape
    M, Ksub, dsub = codebooks.shape
    cd = pairwise_scores(queries, centroids, kind)  # [Q, nlist]
    _, probes = lax.top_k(-cd, nprobe)              # [Q, nprobe]

    cn = jnp.sum(codebooks * codebooks, axis=2)     # [M, Ksub]
    rows = jnp.arange(Q)
    offs_m = jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2) * Ksub

    def cond(state):
        step, probe_i, off, best_s, best_i = state
        return (step < max_steps) & jnp.any(probe_i < nprobe)

    def body(state):
        step, probe_i, off, best_s, best_i = state
        alive = probe_i < nprobe
        p = probes[rows, jnp.minimum(probe_i, nprobe - 1)]
        base = chunk_start[p]
        nch = chunk_start[p + 1] - base
        have = alive & (off < nch)
        chunk = jnp.minimum(base + off, chunk_slots.shape[0] - 1)

        # current probe's residual LUT
        resid = queries - centroids[p]
        rs = resid.reshape(Q, M, dsub)
        ip = jnp.einsum(
            "qmd,mkd->qmk", rs, codebooks,
            preferred_element_type=jnp.float32, precision=DEFAULT_PRECISION,
        )
        rn = jnp.sum(rs * rs, axis=2, keepdims=True)
        lut_flat = jnp.maximum(rn + cn[None, :, :] - 2.0 * ip, 0.0).reshape(
            Q, M * Ksub
        )

        slots = jnp.where(have[:, None], chunk_slots[chunk], -1)   # [Q, C]
        slots_c = jnp.maximum(slots, 0)
        member_codes = codes[slots_c].astype(jnp.int32)            # [Q, C, M]
        picked = jnp.take_along_axis(
            lut_flat[:, None, :], member_codes + offs_m, axis=2
        )                                                          # [Q, C, M]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(picked, axis=2), 0.0))

        ok = (slots >= 0) & valid[slots_c] & (dist <= threshold)
        dist = jnp.where(ok, dist, INF)
        kk = min(k, dist.shape[1])
        s, pos = lax.top_k(-dist, kk)
        s = -s
        slot_sel = jnp.take_along_axis(slots, pos, axis=1)
        slot_sel = jnp.where(s == INF, IDX_SENTINEL, slot_sel)
        best_s, best_i = merge_topk(best_s, best_i, s, slot_sel, k)

        last_chunk = off + 1 >= nch
        probe_i = jnp.where(alive & last_chunk, probe_i + 1, probe_i)
        off = jnp.where(alive & last_chunk, 0, jnp.where(alive, off + 1, off))
        return step + 1, probe_i, off, best_s, best_i

    init = (
        jnp.int32(0),
        jnp.zeros(Q, jnp.int32),
        jnp.zeros(Q, jnp.int32),
        jnp.full((Q, k), INF, dtype=jnp.float32),
        jnp.full((Q, k), IDX_SENTINEL, dtype=jnp.int32),
    )
    state = lax.while_loop(cond, body, init)
    return state[3], state[4]


@partial(jax.jit, static_argnames=("k", "kind"))
def _refine_device(
    qpad: jax.Array,     # [Q, d] preprocessed queries (zero pad rows)
    slots: jax.Array,    # [Q, C] i32 ADC candidates (IDX_SENTINEL pads)
    vectors: jax.Array,  # [cap, d] stored originals
    sqnorms: jax.Array,  # [cap]
    k: int,
    kind: DistanceKind,
):
    """Exact re-rank of the ADC top candidates on the stored originals,
    fused on device (the nrefine extension; README.md:1779 documents it,
    the Go code never ships it). The host rerank this replaces downloaded
    the candidate block and ran a numpy einsum per batch — 4x the QPS cost
    at 1M (BENCHMARKS.md r4 nrefine row). Tie order matches the host path:
    (exact score asc, slot asc). Returns (scores [Q, k], slots [Q, k])."""
    from comet_tpu.ops.sortnet import topk_cl

    sent = jnp.int32(IDX_SENTINEL)
    safe = jnp.where(slots == sent, 0, slots)
    v = vectors[safe]                                    # [Q, C, d]
    ip = jnp.einsum(
        "qd,qcd->qc", qpad, v,
        preferred_element_type=jnp.float32, precision=DEFAULT_PRECISION,
    )
    if kind == DistanceKind.COSINE:
        exact = 1.0 - jnp.clip(ip, -1.0, 1.0)
    else:
        qn = jnp.sum(qpad * qpad, axis=1)
        # norms recomputed from the gathered rows: a second sqnorms[safe]
        # gather costs as much as the vector gather (row-count-bound,
        # ~29 ns/row) and sqnorms IS jnp.sum(v*v, 1) of the same rows
        # (indexes/base.py device mirror)
        tn = jnp.sum(v * v, axis=-1)
        l2sq = jnp.maximum(qn[:, None] + tn - 2.0 * ip, 0.0)
        exact = l2sq if kind == DistanceKind.L2_SQUARED else jnp.sqrt(l2sq)
    exact = jnp.where(slots == sent, INF, exact)
    # exact (value, slot) select via the VMEM bitonic instead of an XLA
    # variadic sort on [Q, C] (the beam-finalize lesson, ops/beam_kernel);
    # interpret off-TPU — this jit also serves the CPU/test backend
    kp = min(max(k, 8), exact.shape[1])
    sd, ss = topk_cl(
        exact.T, jnp.where(slots == sent, sent, slots).T, kp,
        interpret=jax.default_backend() != "tpu",
    )
    return sd[:k].T, ss[:k].T


class IVFPQIndex(BaseVectorIndex):
    """IVF + PQ-on-residuals index (reference: ivfpq_index.go:54-100)."""

    def __init__(
        self,
        dim: int,
        distance_kind: DistanceKind = DistanceKind.L2,
        nlist: int = 100,
        m: int | None = None,
        nbits: int = 8,
        store_originals: bool = False,
        opq: bool = False,
        opq_iters: int = 6,
    ):
        super().__init__(dim, distance_kind)
        if nlist <= 0:
            raise InvalidConfigError("nlist must be positive")
        if m is None:
            from comet_tpu.indexes.pq import calculate_pq_params

            m, nbits = calculate_pq_params(dim)
        if m <= 0:
            raise InvalidConfigError("parameter M must be positive")
        if dim % m != 0:
            raise InvalidConfigError(f"dimension {dim} must be divisible by M {m}")
        if nbits <= 0 or nbits > 16:
            raise InvalidConfigError("parameter Nbits must be in [1,16]")
        self._nlist = nlist
        self._m = m
        self._nbits = nbits
        self._ksub = 1 << nbits
        self._dsub = dim // m
        self._store_originals = store_originals
        # OPQ extension (Ge et al., CVPR 2013 — beyond the reference, like
        # nrefine): learn an orthogonal rotation R that aligns the PQ
        # subspace split with the data before quantization. The MODEL
        # (centroids, codebooks, codes) lives in rotated coordinates; the
        # dense-scan path rotates reconstructions BACK once at build time,
        # so serving in original coordinates pays zero per-query cost and
        # stored originals / nrefine stay in user space.
        self._opq = bool(opq)
        self._opq_iters = int(opq_iters)
        self._rot: np.ndarray | None = None
        if not store_originals:
            # vector-less store: only codes + residual assignment kept
            from comet_tpu.indexes.base import SlotStore

            self._store = SlotStore(0)
        self._codes = np.zeros((self._store.capacity, m), dtype=np.int32)
        self._assign = np.full(self._store.capacity, -1, dtype=np.int32)
        self._centroids: np.ndarray | None = None
        self._codebooks: np.ndarray | None = None
        self._trained = False
        self._dev_version = -1
        self._dense_version = -1
        self._dev = None
        # dense reconstructed-corpus cache (TPU fast path)
        self._dense_version = -1
        self._dev_rec_t = None
        self._dev_rec_sqn = None
        self._dev_assign = None
        self._dev_cents_user = None  # coarse centroids in user coordinates
        # block-sparse reconstructed layout (TPU path at scale: compute
        # tracks nprobe instead of scanning the whole reconstruction)
        self._sparse = None
        self._sparse_version = -1
        self._sparse_S_hint: dict[tuple[int, int], int] = {}
        self._order_key = None
        self._order_key_src = None
        self._last_overflow = None

    # -- contracts -----------------------------------------------------------

    def kind(self) -> VectorIndexKind:
        return VectorIndexKind.IVFPQ

    def trained(self) -> bool:
        return self._trained

    @property
    def nlist(self) -> int:
        return self._nlist

    @property
    def m(self) -> int:
        return self._m

    @property
    def nbits(self) -> int:
        return self._nbits

    def default_nprobes(self) -> int:
        return max(int(math.sqrt(self._nlist)), 1)

    # -- training --------------------------------------------------------------

    def train(self, vectors: np.ndarray, max_iter: int = 20) -> None:
        """Coarse k-means + shared PQ codebooks on residuals
        (ivfpq_index.go:164-259); needs >= nlist*10 vectors."""
        vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        self._check_dim(vectors)
        if len(vectors) < self._nlist * 10:
            raise InvalidConfigError(
                f"need at least {self._nlist * 10} training vectors "
                f"(nlist*10), got {len(vectors)}"
            )
        prepped = preprocess(vectors, self._distance_kind)
        rot = self._train_opq(prepped, max_iter) if self._opq else None
        if rot is not None:
            prepped = prepped @ rot
        # Fused device path: one upload, coarse loop, device residuals,
        # subspace loop (the split host-residual path re-uploaded the
        # residual matrix — 2x the tunnel bytes; ivfpq_index.go:164-259)
        centroids, codebooks = kmeans_ivfpq_train(
            prepped, self._nlist, self._distance_kind,
            self._m, self._ksub, max_iter,
        )
        with self._lock:
            self._rot = rot
            self._centroids = centroids
            self._codebooks = codebooks
            self._trained = True
            self._dev_version = -1
            self._dense_version = -1

    def _train_opq(self, prepped: np.ndarray, max_iter: int) -> np.ndarray:
        """Learn the OPQ rotation by the non-parametric alternation
        (OPQ-NP): train a cheap (coarse + PQ) model in the current rotated
        space, reconstruct, then solve the orthogonal Procrustes problem
        R = UV^T of Y^T·Ŷ for the rotation that best maps the data onto
        its reconstructions. Model fits and reconstructions run on device;
        only the d x d SVD runs on host."""
        import jax

        from comet_tpu.ops.adc import ivfpq_assign_encode, pq_decode

        d = self._dim
        y_dev = jnp.asarray(prepped)
        rot = np.eye(d, dtype=np.float32)

        @jax.jit
        def rotate(y, r):
            return jnp.dot(y, r, preferred_element_type=jnp.float32,
                           precision=DEFAULT_PRECISION)

        @jax.jit
        def chunk_m(y_chunk, z_chunk, cent, books):
            # encode + reconstruct + partial Procrustes accumulator for ONE
            # chunk: the whole-set encode materializes a [n, M, Ksub] f32
            # intermediate (16 GB at 1M x m=16) — an HBM OOM the add path
            # already avoids by streaming (code review r5)
            assign, codes = ivfpq_assign_encode(
                z_chunk, cent, books, self._distance_kind
            )
            rec = cent[assign] + pq_decode(codes, books)
            return jnp.dot(y_chunk.T, rec, preferred_element_type=jnp.float32,
                           precision=DEFAULT_PRECISION)

        inner_iter = max(2, min(4, max_iter))
        chunk = 1 << 17
        n = len(prepped)
        for _ in range(max(self._opq_iters, 1)):
            rot_d = jnp.asarray(rot)
            z = np.asarray(rotate(y_dev, rot_d))
            cent, books = kmeans_ivfpq_train(
                z, self._nlist, self._distance_kind,
                self._m, self._ksub, inner_iter,
            )
            cent_d, books_d = jnp.asarray(cent), jnp.asarray(books)
            mm = np.zeros((d, d), np.float64)
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                mm += np.asarray(chunk_m(
                    y_dev[lo:hi], jnp.asarray(z[lo:hi]), cent_d, books_d
                ), dtype=np.float64)
            u, _, vt = np.linalg.svd(mm)
            rot = (u @ vt).astype(np.float32)
        return rot

    # -- mutation --------------------------------------------------------------

    def add(self, node: VectorNode) -> None:
        self.add_batch(np.asarray(node.vector, dtype=np.float32)[None, :], [node.id])

    def add_batch(self, vectors: np.ndarray, ids: Iterable[int] | None = None) -> list[int]:
        """Assign to nearest centroid, encode the residual
        (ivfpq_index.go:279-319), batched."""
        if not self._trained:
            raise NotTrainedError("index must be trained before adding vectors")
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
        # Fused device-side assign+residual+encode, streamed in chunks so
        # each vector crosses the tunnel exactly once (the split path
        # re-uploaded the residual matrix: 2x the bytes, 104s -> ~20s at 1M).
        from functools import partial as _partial

        from comet_tpu.ops.adc import ivfpq_assign_encode, stream_device_map

        cent_dev = jnp.asarray(self._centroids)
        cb_dev = jnp.asarray(self._codebooks)
        rot_dev = jnp.asarray(self._rot) if self._rot is not None else None
        from comet_tpu.indexes.base import narrow_wire

        assign, codes = stream_device_map(
            _partial(
                ivfpq_assign_encode,
                centroids=cent_dev,
                codebooks=cb_dev,
                kind=self._distance_kind,
                rot=rot_dev,
            ),
            narrow_wire(prepped),  # int-valued corpora: 1/4 the tunnel bytes
            chunk_rows=1 << 17,
        )
        assign = assign.astype(np.int32)
        with self._lock:
            for i in id_arr.tolist():
                if self._store.contains(i):
                    raise InvalidConfigError(f"duplicate node ID {i}")
            stored = prepped if self._store_originals else np.zeros(
                (len(id_arr), 0), dtype=np.float32
            )
            slots = self._store.add_batch(id_arr, stored)
            if self._store.capacity > len(self._codes):
                grown_c = np.zeros((self._store.capacity, self._m), dtype=np.int32)
                grown_c[: len(self._codes)] = self._codes
                self._codes = grown_c
                grown_a = np.full(self._store.capacity, -1, dtype=np.int32)
                grown_a[: len(self._assign)] = self._assign
                self._assign = grown_a
            self._codes[slots] = codes
            self._assign[slots] = assign
        return id_arr.tolist()

    def remove(self, node_id: int) -> None:
        with self._lock:
            self._store.remove(node_id)

    def flush(self) -> None:
        with self._lock:
            keep = self._store.flush()
            self._codes[: len(keep)] = self._codes[keep]
            self._codes[len(keep):] = 0
            kept_assign = self._assign[keep]
            self._assign[: len(kept_assign)] = kept_assign
            self._assign[len(kept_assign):] = -1

    # -- search ---------------------------------------------------------------

    def _decode(self, slot: int) -> np.ndarray:
        """Reconstruct: centroid + decoded residual."""
        from comet_tpu.ops.adc import pq_decode

        resid = np.asarray(
            pq_decode(jnp.asarray(self._codes[slot][None, :]), jnp.asarray(self._codebooks))
        )[0]
        rec = self._centroids[self._assign[slot]] + resid
        if self._rot is not None:
            rec = rec @ self._rot.T  # model space -> user space
        return rec

    def _lookup_node_vectors(self, node_ids):
        out = []
        for node_id in node_ids:
            slot = self._store.id_to_slot.get(int(node_id))
            if slot is None:
                raise NodeNotFoundError(f"node ID {node_id} not found in index")
            if self._store_originals:
                out.append(np.array(self._store.vectors[slot]))
            else:
                out.append(self._decode(slot))
        return out

    def _result_node(self, node_id: int) -> VectorNode:
        slot = self._store.id_to_slot[int(node_id)]
        if self._store_originals:
            return VectorNode(node_id, np.array(self._store.vectors[slot]))
        return VectorNode(node_id, self._decode(slot))

    def _device_state_ivfpq(self):
        if self._dev_version != self._store.version:
            n = self._store.n
            from comet_tpu.indexes.ivf import build_chunked_lists

            chunk_slots, chunk_start, max_chunks = build_chunked_lists(
                self._assign[:n], self._nlist
            )
            code_np = (
                self._codes.astype(np.uint8) if self._nbits <= 8
                else self._codes
            )  # codes ride HBM/wire narrow; kernels cast to i32 on read
            self._dev = (
                jnp.asarray(self._centroids),
                jnp.asarray(self._codebooks),
                jnp.asarray(chunk_slots),
                jnp.asarray(chunk_start),
                max_chunks,
                jnp.asarray(code_np),
                jnp.asarray(self._store.valid),
            )
            self._dev_version = self._store.version
        return self._dev

    def _sanitize_nprobes(self, nprobes: int | None) -> int:
        if nprobes is None:
            nprobes = self.default_nprobes()
        if nprobes <= 0 or nprobes > self._nlist:
            nprobes = self._nlist
        return nprobes

    def _device_dense(self):
        """Reconstructed corpus, TRANSPOSED [d, cap], for the dense scan.

        ADC distance is EXACTLY the L2 distance to the reconstruction:
          sum_m ||r_q[m] - codebook[m, code_m]||^2
            = ||r_q - decoded_residual||^2
            = ||q - (centroid + decoded_residual)||^2,
        so searching the reconstructed vectors on the MXU returns the same
        scores as per-cluster LUT ADC (ivfpq_index_search.go:285-390) —
        without the gather-bound LUT walk. The PQ codes remain the
        authoritative (serialized) representation; this is a search-time
        device cache (cap x d x 4 B — memory traded for ~30x QPS).
        """
        if self._dense_version != self._store.version:
            import jax

            from comet_tpu.ops.adc import pq_decode

            n = self._store.n
            cap = self._store.capacity

            @jax.jit
            def build(codes, assign, centroids, codebooks, rot_t):
                resid = pq_decode(codes.astype(jnp.int32), codebooks)
                cent = centroids[jnp.maximum(assign, 0)]       # [cap, d]
                rec = resid + cent
                if rot_t is not None:
                    # OPQ: reconstructions rotate BACK once at build time,
                    # so the scan serves original-coordinate queries with
                    # zero per-query rotation cost (R orthogonal => the
                    # scanned distances equal rotated-space ADC exactly)
                    rec = jnp.dot(rec, rot_t,
                                  preferred_element_type=jnp.float32,
                                  precision=DEFAULT_PRECISION)
                if rot_t is not None:
                    # coarse centroids rotate back with the data: probing
                    # user-space queries against model-space centroids
                    # ranks clusters in mismatched coordinates (the
                    # sharded scan already did this — parallel/sharded.py
                    # ShardedIVFPQSearcher; measured ~4% probe-set drift
                    # at nprobe=8 on siftgen, larger on anisotropic data)
                    cents = jnp.dot(centroids, rot_t,
                                    preferred_element_type=jnp.float32,
                                    precision=DEFAULT_PRECISION)
                else:
                    cents = centroids
                return rec.T, jnp.sum(rec * rec, axis=1), cents

            code_np = (
                self._codes[:cap].astype(np.uint8) if self._nbits <= 8
                else self._codes[:cap]
            )
            codes = jnp.asarray(code_np)
            assign = jnp.asarray(self._assign[:cap])
            rec_t, sqnorms, cents = build(
                codes, assign,
                jnp.asarray(self._centroids), jnp.asarray(self._codebooks),
                jnp.asarray(self._rot.T) if self._rot is not None else None,
            )
            self._dev_rec_t = rec_t
            self._dev_rec_sqn = sqnorms
            self._dev_assign = assign
            self._dev_cents_user = cents
            self._dense_version = self._store.version
        return self._dev_rec_t, self._dev_rec_sqn, self._dev_assign

    def _device_sparse(self):
        """Cluster-major reconstructed corpus for the block-sparse scan
        (ops/ivf_sparse), in USER coordinates — the IVF layout move
        applied to the ADC reconstruction (see indexes/ivf.py
        _device_sparse and _device_dense's reconstruction identity)."""
        import jax

        from comet_tpu.ops import ivf_sparse as sp
        from comet_tpu.ops.adc import pq_decode

        cents_user = (
            self._centroids @ self._rot.T
            if self._rot is not None else self._centroids
        )
        if self._order_key is None or self._order_key_src is not self._centroids:
            self._order_key = jnp.asarray(
                sp.cluster_order_key(cents_user.astype(np.float32))
            )
            self._order_key_src = self._centroids
        if self._sparse_version != self._store.version:
            n = self._store.n
            assign = np.where(
                self._store.valid[:n], self._assign[:n], -1
            ).astype(np.int32)
            lay = sp.build_cluster_major(assign, self._nlist)
            perm = jnp.asarray(lay["perm"])

            @jax.jit
            def build(perm, codes, assign_dev, centroids, codebooks, rot_t):
                resid = pq_decode(codes.astype(jnp.int32), codebooks)
                cent = centroids[jnp.maximum(assign_dev, 0)]
                rec = resid + cent
                if rot_t is not None:
                    rec = jnp.dot(rec, rot_t,
                                  preferred_element_type=jnp.float32,
                                  precision=DEFAULT_PRECISION)
                pc = jnp.maximum(perm, 0)
                rows = rec[pc]                            # [NR, d]
                mask = jnp.where(
                    perm >= 0, jnp.sum(rows * rows, axis=1), jnp.inf
                )
                return rows.T, mask

            n_rows = int(self._store.n)
            code_np = (
                self._codes[:n_rows].astype(np.uint8) if self._nbits <= 8
                else self._codes[:n_rows]
            )
            corpus_t, mask_vec = build(
                perm, jnp.asarray(code_np),
                jnp.asarray(self._assign[:n_rows]),
                jnp.asarray(self._centroids), jnp.asarray(self._codebooks),
                jnp.asarray(self._rot.T) if self._rot is not None else None,
            )
            self._sparse_S_hint.clear()
            self._sparse = {
                "corpus_t": corpus_t,
                "mask_vec": mask_vec,
                "row_slot": perm,
                "cents_user": jnp.asarray(cents_user.astype(np.float32)),
                "chunk_start": jnp.asarray(lay["chunk_start"]),
                "nchunks": jnp.asarray(lay["nchunks"]),
                "nch_total": int(lay["chunk_start"][-1]),
                "max_chunks": lay["max_chunks"],
            }
            self._sparse_version = self._store.version
        return self._sparse

    def _launch_sparse(self, qpad, q_real, k_pad, k_eff, take, nrefine,
                       nprobe, builder, qprep, S_override=None):
        """Block-sparse ADC scan + optional fused refine; same escalation
        contract as indexes/ivf.py _launch_sparse (overflow counts ride
        the handle, _search_collect rescans with escalated budgets)."""
        from comet_tpu.ops import ivf_sparse as sp

        st = self._device_sparse()
        store = self._store
        cosine = self._distance_kind == DistanceKind.COSINE
        thr = threshold_scalar(builder._threshold)
        if qpad.shape[0] % sp.QG != 0:
            grown = np.zeros(
                (-(-qpad.shape[0] // sp.QG) * sp.QG, qpad.shape[1]),
                np.float32,
            )
            grown[: qpad.shape[0]] = qpad
            qpad = grown
        # invalid slots are already +inf in the layout mask (the cache is
        # store.version-fresh); only the per-call doc filter folds in here
        mask_vec = st["mask_vec"]
        doc_filter = DocumentFilter(builder._document_ids)
        fmask = doc_filter.slot_mask(store.ids)
        if fmask is not None:
            fdev = jnp.asarray(fmask)[jnp.maximum(st["row_slot"], 0)]
            mask_vec = jnp.where(fdev, mask_vec, jnp.inf)
        S, UC, MC = sp.default_budgets(
            nprobe, self._nlist, st["nch_total"], st["max_chunks"]
        )
        S = max(S, self._sparse_S_hint.get((nprobe, k_pad), 0))
        S_max = 1 << max(int(st["nch_total"] - 1).bit_length(), 5)
        if S_override is not None:
            S = max(S_override, S)
        S = min(S, S_max)
        UC = min(S, self._nlist)
        qdev = upload_f32_exact(qpad)
        # same approximate-shortlist cap as the dense branch
        kb_cap = max(next_pow2(k_eff), 64) if nrefine else 0
        s, i, overflow = sp.ivf_sparse_pipeline(
            qdev, st["corpus_t"], mask_vec, st["row_slot"],
            thr * thr, st["cents_user"], self._order_key,
            st["chunk_start"], st["nchunks"],
            k=k_pad, nprobe=nprobe, S=S, UC=UC, MC=MC, nlist=self._nlist,
            coarse_cosine=cosine, cosine=False, sqrt_out=True,
            kb_cap=kb_cap,
        )
        self._last_overflow = overflow
        take_out, nrefine_out = take, nrefine
        if nrefine:
            vecs_dev, sqn_dev, _valid_dev = store.device_state()
            s, i = _refine_device(
                qdev, i[:, :take], vecs_dev, sqn_dev,
                k_eff, self._distance_kind,
            )
            take_out, nrefine_out = k_eff, 0
        try:
            if builder._wire_scores:
                s.copy_to_host_async()
            i.copy_to_host_async()
            overflow.copy_to_host_async()
        except AttributeError:  # pragma: no cover
            pass
        kb = max(1 << max(k_pad - 1, 1).bit_length(), 8)
        if kb_cap:
            kb = min(kb, max(1 << max(kb_cap - 1, 1).bit_length(), 8))
        S_eff = max(S, -(-kb * sp.SEL_GROUP // sp.CHUNK))
        retry = None
        if S_eff < S_max:
            retry = (qpad, q_real, k_pad, k_eff, take, nrefine, nprobe,
                     builder, qprep, S_eff, S_max)
        return ("ivfpq_sparse", s if builder._wire_scores else None, i,
                q_real, k_eff, take_out, nrefine_out, qprep, store.ids,
                overflow, retry)

    def _search_batch(self, queries: np.ndarray, builder: VectorSearchBuilder):
        return self._search_collect(self._search_launch(queries, builder))

    def _search_launch(self, queries: np.ndarray, builder: VectorSearchBuilder):
        if not self._trained:
            raise NotTrainedError("index must be trained before searching")
        store = self._store
        n_slots = store.n
        if n_slots == 0:
            return ("empty", queries.shape[0])

        k_eff = sanitize_k(builder._k, n_slots)
        nrefine = 0
        if builder._nrefine and self._store_originals:
            nrefine = max(int(builder._nrefine), k_eff)
        k_pad = min(next_pow2(max(k_eff, nrefine)), store.capacity)
        nprobe = self._sanitize_nprobes(builder._nprobes)
        take = max(k_eff, nrefine)

        qprep = preprocess(queries, self._distance_kind)
        qpad, q_real = pad_queries(qprep)

        doc_filter = DocumentFilter(builder._document_ids)
        fmask = doc_filter.slot_mask(store.ids)
        valid = jnp.asarray(store.valid)
        if fmask is not None:
            valid = jnp.logical_and(valid, jnp.asarray(fmask))
        thr = threshold_scalar(builder._threshold)

        from comet_tpu.ops.pallas_scan import (
            GROUP as P_GROUP,
            TN as P_TN,
            TQ as P_TQ,
            ivf_topk_pipeline,
            pallas_available,
        )

        # Block-sparse ADC: scans only probed chunks of the reconstruction
        # (the indexes/ivf.py move; at 1M/nlist=1024/nprobe=32 that is
        # ~13% of the rows the dense masked scan pays for). k_pad <= 256
        # guards the known kb>=1024 sort-network compile cliff with
        # headroom. COMET_IVFPQ_SPARSE=0 disables; =1 forces (tests).
        import os as _os

        sparse_env = _os.environ.get("COMET_IVFPQ_SPARSE", "")
        use_sparse = (
            pallas_available()
            and sparse_env != "0"
            and (store.capacity >= (1 << 19) or sparse_env == "1")
            and self._nlist >= 8
            and nprobe < self._nlist
            and k_pad <= 256
        )
        if use_sparse and self._sparse is not None:
            # degenerate-shape fallback (see indexes/ivf.py): a learned
            # budget near the table size means the sparse walk covers
            # most chunks anyway — the dense pipeline wins there
            hint = self._sparse_S_hint.get((nprobe, k_pad), 0)
            if 2 * hint >= self._sparse["nch_total"]:
                use_sparse = False
        use_dense = (
            pallas_available()
            and store.capacity % P_TN == 0
            and store.capacity <= (1 << 21)
            and max(k_pad, 8) <= store.capacity // P_GROUP
        )
        if use_sparse:
            return self._launch_sparse(
                qpad, q_real, k_pad, k_eff, take, nrefine, nprobe,
                builder, qprep,
            )
        if use_dense:
            rec_t, rec_sqn, assign_dev = self._device_dense()
            # ADC is sqrt-L2 on reconstructions for every metric; the
            # kernel works in the squared domain, so square the threshold
            mask_vec = jnp.where(valid, rec_sqn, jnp.inf)
            if qpad.shape[0] % P_TQ != 0:
                grown = np.zeros(
                    (-(-qpad.shape[0] // P_TQ) * P_TQ, qpad.shape[1]), np.float32
                )
                grown[: qpad.shape[0]] = qpad
                qpad = grown
            qdev = upload_f32_exact(qpad)
            # an nrefine shortlist is rerank input, not served results:
            # cap the block select below the exactness bound (top-kb_cap
            # ADC ranks stay exact; the exact rerank orders the rest) —
            # the kb=256 candidate stage was the dense scan's dominant
            # fixed cost at nrefine=256
            kb_cap = max(next_pow2(k_eff), 64) if nrefine else 0
            s, i = ivf_topk_pipeline(
                qdev, rec_t, mask_vec, thr * thr,
                self._dev_cents_user, assign_dev,
                k_pad, nprobe,
                coarse_cosine=self._distance_kind == DistanceKind.COSINE,
                cosine=False,
                sqrt_out=True,
                kb_cap=kb_cap,
            )
            if nrefine:
                # fused device-side exact re-rank — no host round-trip of
                # the wide candidate block (VERDICT r4 #2)
                vecs_dev, sqn_dev, _valid_dev = store.device_state()
                s, i = _refine_device(
                    qdev, i[:, :take], vecs_dev, sqn_dev,
                    k_eff, self._distance_kind,
                )
                take, nrefine = k_eff, 0
            try:
                if builder._wire_scores:
                    s.copy_to_host_async()
                i.copy_to_host_async()
            except AttributeError:  # pragma: no cover
                pass
            return ("ivfpq_dev", s if builder._wire_scores else None, i,
                    q_real, k_eff, take, nrefine, qprep, store.ids)

        (
            centroids, codebooks, chunk_slots, chunk_start, max_chunks, codes, _v,
        ) = self._device_state_ivfpq()
        if self._rot is not None:
            # LUT-walk path: centroids/codebooks live in OPQ model space,
            # so queries rotate in (distances are rotation-invariant)
            qpad = qpad @ self._rot
        max_steps = next_pow2(nprobe * max_chunks, 4)
        chunks = []
        for q0 in range(0, qpad.shape[0], IVFPQ_QUERY_CHUNK):
            qc = upload_f32_exact(qpad[q0 : q0 + IVFPQ_QUERY_CHUNK])
            chunks.append(
                _ivfpq_search_kernel(
                    qc, centroids, codebooks, chunk_slots, chunk_start, codes,
                    valid, thr, k_pad, self._distance_kind, nprobe, max_steps,
                )
            )
        return ("ivfpq_chunks", chunks, q_real, k_eff, take, nrefine,
                qprep, store.ids)

    def _search_collect(self, handle):
        import jax

        kind = handle[0]
        if kind == "empty":
            q = handle[1]
            return (
                np.full((q, 0), INVALID_ID, dtype=np.uint32),
                np.zeros((q, 0), dtype=np.float32),
            )
        if kind == "ivfpq_sparse":
            # same escalation contract as indexes/ivf.py _search_collect:
            # rescan with a bumped step budget until every requested
            # probe's chunks were walked (or the budget caps at the table)
            (_, s, i, q_real, k_eff, take, nrefine, qprep, ids_snap,
             overflow, retry) = handle
            ov = np.asarray(jax.device_get(overflow))
            dropped = int(ov.sum())
            while dropped > 0 and retry is not None:
                (qpad, q_real, k_pad, k_eff, take_r, nrefine_r, nprobe,
                 builder, qprep, S_old, S_max) = retry
                S_new = min(
                    1 << int(S_old + int(ov.max()) - 1).bit_length(), S_max
                )
                if S_new <= S_old:  # pragma: no cover - cap reached
                    logger.warning(
                        "ivfpq sparse scan overflow at max budget: "
                        "%d chunk(s)", dropped,
                    )
                    break
                logger.warning(
                    "ivfpq sparse scan overflow: %d chunk(s) dropped across"
                    " %d group(s); rescanning with S=%d (was %d)",
                    dropped, int((ov > 0).sum()), S_new, S_old,
                )
                self._sparse_S_hint[(nprobe, k_pad)] = S_new
                handle = self._launch_sparse(
                    qpad, q_real, k_pad, k_eff, take_r, nrefine_r, nprobe,
                    builder, qprep, S_override=S_new,
                )
                (_, s, i, q_real, k_eff, take, nrefine, qprep, ids_snap,
                 overflow, retry) = handle
                ov = np.asarray(jax.device_get(overflow))
                dropped = int(ov.sum())
            handle = ("ivfpq_dev", s, i, q_real, k_eff, take, nrefine,
                      qprep, ids_snap)
            kind = "ivfpq_dev"
        if kind == "ivfpq_dev":
            _, s, i, q_real, k_eff, take, nrefine, qprep, ids_snap = handle
            if s is None:  # wire_scores=False: ids-only download
                slots_np = np.asarray(jax.device_get(i))
                scores = np.zeros(slots_np.shape, dtype=np.float32)
            else:
                scores, slots_np = jax.device_get((s, i))
        else:
            _, chunks, q_real, k_eff, take, nrefine, qprep, ids_snap = handle
            chunks = jax.device_get(chunks)
            scores = np.concatenate([s for s, _ in chunks])
            slots_np = np.concatenate([i for _, i in chunks])
        scores = scores[:q_real, :take]
        slots_np = slots_np[:q_real, :take]

        if nrefine:
            scores, slots_np = self._refine(qprep, scores, slots_np, k_eff)
        else:
            scores, slots_np = scores[:, :k_eff], slots_np[:, :k_eff]

        hit = slots_np != int(IDX_SENTINEL)
        ids = np.where(hit, ids_snap[np.where(hit, slots_np, 0)], INVALID_ID)
        return ids.astype(np.uint32), scores

    def _refine(self, queries, scores, slots, k_eff):
        """Exact re-ranking over stored originals (nrefine extension)."""
        q_n, cand = slots.shape
        safe = np.where(slots != int(IDX_SENTINEL), slots, 0)
        vecs = self._store.vectors[safe]                 # [Q, C, d]
        diff = vecs - queries[:, None, :]
        if self._distance_kind == DistanceKind.COSINE:
            exact = 1.0 - np.clip(
                np.einsum("qd,qcd->qc", queries, vecs), -1.0, 1.0
            )
        else:
            exact = np.einsum("qcd,qcd->qc", diff, diff)
            if self._distance_kind == DistanceKind.L2:
                exact = np.sqrt(exact)
        exact = np.where(slots != int(IDX_SENTINEL), exact, np.inf).astype(np.float32)
        order = np.lexsort((slots, exact), axis=1)[:, :k_eff]
        return (
            np.take_along_axis(exact, order, axis=1),
            np.take_along_axis(slots, order, axis=1),
        )

    # -- serialization ----------------------------------------------------------

    def write_to(self, f: BinaryIO) -> None:
        """CIPQ v1: params + centroids + codebooks + ids/codes/assignments."""
        with self._lock:
            self.flush()
            w = serial.CrcWriter(f)
            serial.write_magic(w, MAGIC, VERSION)
            serial.write_str(w, self._distance_kind.value)
            serial.write_u32(w, self._dim)
            serial.write_u32(w, self._nlist)
            serial.write_u32(w, self._m)
            serial.write_u32(w, self._nbits)
            serial.write_u32(w, 1 if self._store_originals else 0)
            serial.write_u32(w, 1 if self._trained else 0)
            serial.write_u32(w, 1 if self._rot is not None else 0)
            if self._rot is not None:
                serial.write_array(w, self._rot)
            if self._trained:
                serial.write_array(w, self._centroids)
                serial.write_array(w, self._codebooks)
            n = self._store.n
            serial.write_u64(w, n)
            serial.write_array(w, self._store.ids[:n])
            code_dtype = np.uint8 if self._nbits <= 8 else np.uint32
            serial.write_array(w, self._codes[:n].astype(code_dtype))
            serial.write_array(w, self._assign[:n])
            if self._store_originals:
                serial.write_array(w, self._store.vectors[:n])
            w.seal()

    def read_from(self, f: BinaryIO) -> None:
        r = serial.CrcReader(f)
        version = serial.read_magic(r, MAGIC, VERSION)
        kind = DistanceKind(serial.read_str(r))
        dim = serial.read_u32(r)
        nlist = serial.read_u32(r)
        m = serial.read_u32(r)
        nbits = serial.read_u32(r)
        store_originals = bool(serial.read_u32(r))
        if kind != self._distance_kind or dim != self._dim:
            raise serial.SerializationError(
                f"param mismatch: index=({self._distance_kind.value}, dim={self._dim}), "
                f"stored=({kind.value}, dim={dim})"
            )
        if nlist != self._nlist or m != self._m or nbits != self._nbits:
            raise serial.SerializationError(
                f"IVFPQ param mismatch: index=(nlist={self._nlist}, M={self._m}, "
                f"Nbits={self._nbits}), stored=(nlist={nlist}, M={m}, Nbits={nbits})"
            )
        trained = bool(serial.read_u32(r))
        rot = None
        if version >= 3 and serial.read_u32(r):
            rot = serial.read_array(r).astype(np.float32)
        centroids = serial.read_array(r) if trained else None
        codebooks = serial.read_array(r) if trained else None
        n = serial.read_u64(r)
        ids = serial.read_array(r)
        codes = serial.read_array(r)
        assign = serial.read_array(r)
        vectors = serial.read_array(r) if store_originals else None
        if version >= 2:
            r.verify()
        if len(ids) != n or codes.shape != (n, m) or len(assign) != n:
            raise serial.SerializationError("corrupt IVFPQ index payload")
        with self._lock:
            from comet_tpu.indexes.base import SlotStore

            self._store_originals = store_originals
            self._rot = rot
            self._opq = rot is not None
            self._centroids = centroids
            self._codebooks = codebooks
            self._trained = trained
            self._store = SlotStore(dim if store_originals else 0, capacity=max(n, 1))
            self._codes = np.zeros((self._store.capacity, self._m), dtype=np.int32)
            self._assign = np.full(self._store.capacity, -1, dtype=np.int32)
            if n:
                stored = (
                    vectors.astype(np.float32)
                    if store_originals
                    else np.zeros((n, 0), dtype=np.float32)
                )
                slots = self._store.add_batch(ids.astype(np.uint32), stored)
                self._codes[slots] = codes.astype(np.int32)
                self._assign[slots] = assign.astype(np.int32)
            self._dev_version = -1
            self._dense_version = -1
