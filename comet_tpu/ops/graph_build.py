"""Bulk HNSW graph construction — staged exact-kNN rounds on the MXU.

The incremental insert path (indexes/hnsw.py:_insert_round) is the
reference's per-node algorithm batched (hnsw_index.go:486-560), and
profiling shows it is the wrong shape for a TPU: ~40% of build wall time
is an ~850-iteration device beam per 512-vector round and ~40% is host
numpy reverse-edge pruning — 200k builds run at ~350-730 vec/s.

A first bulk design (every row = its exact nearest neighbors) built
non-navigable graphs: recall@100 collapsed to ~0.2 because pure-kNN
adjacency has only short edges, so greedy descent/beam search cannot
cross regions. HNSW's navigability comes from INSERTION ORDER: nodes
inserted while the graph was small keep long-range edges. This builder
reproduces exactly that, at MXU speed:

  - a layer's nodes are processed in DOUBLING-SIZE STAGES (4096, 4096,
    8192, ...); stage nodes take their forward edges from an EXACT kNN
    against the already-processed prefix — equivalent to the reference's
    insert loop with efConstruction = infinity, so early nodes keep the
    long-range edges that make the graph navigable;
  - each stage's kNN is one masked flat-scan sweep with the same fused
    Pallas kernel the flat index serves queries with (ops/pallas_scan).
    ALL layers share one capacity-shaped device corpus; the "first hi
    members of this layer" predicate is a runtime member-rank mask, so
    every stage of every layer reuses the same compiled shapes, and the
    upper-layer results come back as global slots (no remapping). Total
    FLOPs across a layer's stages ~= one full-corpus kNN of its members;
  - reverse edges append-and-prune vectorized on the host: adjacency
    DISTANCES ride along during the build, so pruning a touched row to
    its nearest `width` is a sort, not a distance recomputation
    (hnsw_index.go:535-546,667-694 do this per edge with fresh distance
    calls).

Distances are kernel-domain (squared L2 / cosine distance) and
comparison-only. Tie order follows the library contract (distance asc,
slot asc). Quality is measured, not assumed: tests/bench score beam-search
recall@100 on bulk-built graphs against the exact-oracle ground truth.
"""

from __future__ import annotations

import numpy as np

from comet_tpu.ops.topk import IDX_SENTINEL
from comet_tpu.types import DistanceKind

# Below this many prefix rows a host matmul beats device round-trips (and
# the CPU/test backend has no Pallas at all).
HOST_KNN_MAX = 2048
# The stage ladder starts SMALL and doubles: long-range edges come from
# the early stages (a 4096-node first stage left upper layers single-stage
# pure-kNN and descent recall collapsed — see module docstring); total
# device FLOPs are independent of the stage count, and sub-HOST_KNN_MAX
# stages are host matmuls.
FIRST_STAGE = 64
QUERY_CHUNK = 32768
RANK_NONE = np.int32(2**31 - 1)


class BulkGraphBuilder:
    """Shared state for building every layer of one HNSW graph: the
    capacity-padded corpus (uploaded once when the device path is used)
    plus the per-layer staged construction."""

    def __init__(self, vectors: np.ndarray, n: int, kind: DistanceKind):
        self.vectors = vectors  # [cap >= n, d]; rows >= n are padding
        self.n = n
        self.kind = kind
        self.cosine = kind == DistanceKind.COSINE
        self.dev = None  # (vectors, sqnorms, corpus_t) on device

    # -- device management -------------------------------------------------

    def _ensure_device(self):
        if self.dev is not None:
            return
        import jax
        import jax.numpy as jnp

        from comet_tpu.ops.pallas_scan import TN

        vectors = self.vectors
        cap = len(vectors)
        if cap % TN:
            pad = -(-cap // TN) * TN
            grown = np.zeros((pad, vectors.shape[1]), np.float32)
            grown[: self.n] = vectors[: self.n]
            vectors = grown
        dev_vecs = jnp.asarray(vectors)
        sqn = jnp.sum(dev_vecs * dev_vecs, axis=1)
        corpus_t = jax.jit(jnp.transpose)(dev_vecs)
        self.dev = (dev_vecs, sqn, corpus_t)
        self._mask = jax.jit(
            lambda rank, sqn, hi: jnp.where(
                rank < hi, 0.0 if self.cosine else sqn, jnp.inf
            ).astype(jnp.float32)
        )

    def device_mirror(self):
        """(vectors, sqnorms) device pair when it matches the caller's
        capacity — reusable as the index's device mirror."""
        if self.dev is not None and self.dev[0].shape[0] == len(self.vectors):
            return self.dev[0], self.dev[1]
        return None

    # -- kNN against a member prefix ---------------------------------------

    def _query_host(self, order: np.ndarray, lo: int, hi: int, k: int):
        v = self.vectors[order[:hi]]
        q = v[lo:hi]
        ip = q @ v.T
        if self.cosine:
            d = 1.0 - np.clip(ip, -1.0, 1.0)
        else:
            sq = (v * v).sum(axis=1)
            d = np.maximum(sq[lo:hi, None] + sq[None, :] - 2.0 * ip, 0.0)
        k = min(k, hi)
        sel = np.argsort(d, axis=1, kind="stable")[:, :k]
        dists = np.take_along_axis(d, sel, axis=1).astype(np.float32)
        slots = order[sel].astype(np.int32)  # local prefix index -> global
        return dists, slots

    def _query_device(self, order, rank_dev, lo: int, hi: int, k: int):
        import jax
        import jax.numpy as jnp

        from comet_tpu.ops.pallas_scan import TQ, flat_topk_pipeline

        _, sqn, corpus_t = self.dev
        mask_vec = self._mask(rank_dev, sqn, hi)
        inf = jnp.asarray(np.float32(np.inf))
        k = min(k, hi)
        d = self.vectors.shape[1]
        handles = []
        for q0 in range(lo, hi, QUERY_CHUNK):
            qn = min(QUERY_CHUNK, hi - q0)
            qp = -(-qn // TQ) * TQ
            qc = np.zeros((qp, d), np.float32)
            qc[:qn] = self.vectors[order[q0 : q0 + qn]]
            handles.append(
                flat_topk_pipeline(
                    jnp.asarray(qc), corpus_t, mask_vec, inf, k,
                    cosine=self.cosine, sqrt_out=False,
                )
            )
        outs = jax.device_get(handles)
        dists = np.concatenate([o[0] for o in outs])[: hi - lo]
        slots = np.concatenate([o[1] for o in outs])[: hi - lo]
        return dists, slots

    # -- one layer ----------------------------------------------------------

    def build_layer(
        self,
        members: np.ndarray | None,
        m_forward: int,
        width: int,
        first_stage: int = FIRST_STAGE,
    ) -> np.ndarray:
        """Staged construction of one layer over `members` (global slots,
        ascending; None = all rows [0, n)). Returns adj [n, width] int32,
        -1 padded, GLOBAL slots — only member rows are populated."""
        from comet_tpu.ops.pallas_scan import pallas_available

        n = self.n
        order = (
            np.arange(n, dtype=np.int32)
            if members is None
            else np.asarray(members, dtype=np.int32)
        )
        nloc = len(order)
        adj = np.full((n, width), -1, np.int32)
        if nloc <= 1:
            return adj
        adj_d = np.full((n, width), np.inf, np.float32)

        use_dev = pallas_available() and nloc > HOST_KNN_MAX
        rank_dev = None
        admit_dev = None
        if use_dev:
            self._ensure_device()
            import jax.numpy as jnp

            rank = np.full(self.dev[0].shape[0], RANK_NONE, np.int32)
            rank[order] = np.arange(nloc, dtype=np.int32)
            rank_dev = jnp.asarray(rank)
            admit_dev = _make_admit_dev(self.cosine)

        pool = 2 * m_forward
        lo, hi = 0, min(first_stage, nloc)
        while lo < nloc:
            k = min(pool + 1, hi)
            if use_dev and hi > HOST_KNN_MAX:
                dists, slots = self._query_device(order, rank_dev, lo, hi, k)
            else:
                dists, slots = self._query_host(order, lo, hi, k)
            dists, slots = _strip_self(dists, slots, order[lo:hi])

            # diversity (relative-neighborhood) selection of the forward
            # edges from the pool — exact-kNN pools alone build
            # non-navigable graphs (module docstring)
            if slots.shape[1] > m_forward:
                admitted = self._admit(slots, dists, admit_dev)
                dists, slots = _select_forward(
                    dists, slots, admitted, m_forward
                )

            ok = (slots != int(IDX_SENTINEL)) & np.isfinite(dists)
            fw = slots.shape[1]
            rows = order[lo:hi]
            adj[rows, :fw] = np.where(ok, slots, -1)
            adj_d[rows, :fw] = np.where(ok, dists, np.inf)

            src = np.repeat(rows, fw)[ok.ravel()]
            dst = slots.ravel()[ok.ravel()].astype(np.int32)
            dd = dists.ravel()[ok.ravel()]
            if len(src):
                self._append_reverse(
                    adj, adj_d, dst, src, dd, width, admit_dev
                )
            lo, hi = hi, min(2 * hi, nloc)
        return adj

    def _admit(self, slots, dists, admit_dev):
        """Heuristic admission mask for d-sorted candidate rows, device
        when available and worthwhile. Row/column counts are padded to
        power-of-two buckets so the jitted kernel compiles a handful of
        shapes, not one per stage."""
        if admit_dev is not None and len(slots) > 512:
            import jax.numpy as jnp

            b, c = slots.shape
            bp = 1 << max(b - 1, 1).bit_length()
            cp = 1 << max(c - 1, 1).bit_length()
            if (bp, cp) != (b, c):
                sg = np.full((bp, cp), int(IDX_SENTINEL), slots.dtype)
                dg = np.full((bp, cp), np.inf, dists.dtype)
                sg[:b, :c] = slots
                dg[:b, :c] = dists
                slots_p, dists_p = sg, dg
            else:
                slots_p, dists_p = slots, dists
            out = np.asarray(
                admit_dev(
                    self.dev[0], jnp.asarray(slots_p), jnp.asarray(dists_p)
                )
            )
            return out[:b, :c]
        cv = self.vectors[np.clip(slots, 0, len(self.vectors) - 1)]
        return _heuristic_admit_host(cv, dists, slots, self.cosine)

    def _append_reverse(self, adj, adj_d, nbr, new, d, width, admit_dev):
        """Append reverse edges (new[i] into nbr[i]'s row); rows that
        overflow `width` re-select with the SAME diversity heuristic as
        forward edges (hnswlib shrink-by-heuristic) — a distance-only
        prune measurably strips hub rows of their long-range edges and
        costs ~10pt of beam escape recall. One vectorized pass, in place;
        row distances ride in adj_d so nothing is recomputed (the
        reference prunes per-edge with fresh distance calls,
        hnsw_index.go:667-694)."""
        order = np.lexsort((new, d, nbr))
        nbr, new, d = nbr[order], new[order], d[order]
        uniq, starts = np.unique(nbr, return_index=True)
        rows = np.searchsorted(uniq, nbr)
        rank = np.arange(len(nbr), dtype=np.int64) - starts[rows]
        keep = rank < width  # cap appends per row at its nearest `width`
        new, d, rows, rank = new[keep], d[keep], rows[keep], rank[keep]
        maxc = int(rank.max()) + 1 if len(rank) else 1

        app = np.full((len(uniq), maxc), -1, np.int32)
        app_d = np.full((len(uniq), maxc), np.inf, np.float32)
        app[rows, rank] = new
        app_d[rows, rank] = d

        cand = np.concatenate([adj[uniq], app], axis=1)
        cd = np.concatenate([adj_d[uniq], app_d], axis=1)

        # dedup by slot, keeping the smaller distance (mutual edges appear
        # as both a forward entry and an append; their two distance
        # computations may differ in the last float bits, so min them
        # rather than assume bit-equality). Slot-ascending pre-sort makes
        # duplicates adjacent; each (row, slot) appears at most twice (row
        # entries are unique by invariant, appends are unique pairs).
        ord1 = np.argsort(cand, axis=1, kind="stable")
        c1 = np.take_along_axis(cand, ord1, axis=1)
        d1 = np.take_along_axis(cd, ord1, axis=1)
        prev_eq = np.zeros_like(c1, dtype=bool)
        prev_eq[:, 1:] = (c1[:, 1:] == c1[:, :-1]) & (c1[:, 1:] >= 0)
        nxt_eq = np.zeros_like(prev_eq)
        nxt_eq[:, :-1] = prev_eq[:, 1:]
        d_next = np.roll(d1, -1, axis=1)
        d1 = np.where(nxt_eq, np.minimum(d1, d_next), d1)
        d1 = np.where(prev_eq, np.inf, d1)
        c1 = np.where(prev_eq, -1, c1)

        # (dist asc, slot asc): stable sort by distance preserves the
        # slot-ascending pre-order within equal distances; empty entries
        # (-1, inf) sink to the end
        ord2 = np.argsort(d1, axis=1, kind="stable")
        c1 = np.take_along_axis(c1, ord2, axis=1)
        d1 = np.take_along_axis(d1, ord2, axis=1)

        fill = (c1 >= 0).sum(axis=1)
        over = fill > width
        if over.any() and c1.shape[1] > width:
            ro = np.flatnonzero(over)
            cs = np.where(c1[ro] >= 0, c1[ro], int(IDX_SENTINEL))
            admitted = self._admit(cs, d1[ro], admit_dev)
            sd, ss = _select_forward(d1[ro], cs, admitted, width)
            ss = np.where(ss == int(IDX_SENTINEL), -1, ss)
            c1[ro, :width] = ss
            d1[ro, :width] = sd
        adj[uniq] = c1[:, :width]
        adj_d[uniq] = d1[:, :width]


def _admit_greedy(pair_d, d_node, valid):
    """Greedy relative-neighborhood admission over d-sorted candidates:
    candidate j is admitted iff it is closer to the node than to every
    already-admitted candidate (the HNSW paper's SELECT-NEIGHBORS-HEURISTIC;
    hnswlib getNeighborsByHeuristic2). Vectorized over rows; the loop is
    over the (small, static) pool width. Works traced (jnp) or numpy."""
    B, P = d_node.shape
    if not isinstance(pair_d, np.ndarray):  # jnp path
        import jax.numpy as jnp

        mind = jnp.full((B, P), jnp.inf, pair_d.dtype)
        cols = []
        for j in range(P):
            admit = (d_node[:, j] < mind[:, j]) & valid[:, j]
            mind = jnp.where(
                admit[:, None], jnp.minimum(mind, pair_d[:, :, j]), mind
            )
            cols.append(admit)
        return jnp.stack(cols, axis=1)
    mind = np.full((B, P), np.inf, np.float32)
    admitted = np.zeros((B, P), bool)
    for j in range(P):
        admit = (d_node[:, j] < mind[:, j]) & valid[:, j]
        admitted[:, j] = admit
        mind = np.where(admit[:, None], np.minimum(mind, pair_d[:, :, j]), mind)
    return admitted


def _heuristic_admit_host(vecs, d_node, slots, cosine):
    """Host path: pairwise candidate distances + greedy admission.
    vecs [B, P, d] candidate vectors; d_node/slots [B, P] d-sorted."""
    ip = np.einsum("bpd,bqd->bpq", vecs, vecs)
    if cosine:
        pair_d = 1.0 - np.clip(ip, -1.0, 1.0)
    else:
        sq = np.einsum("bpd,bpd->bp", vecs, vecs)
        pair_d = np.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * ip, 0.0)
    valid = (slots != int(IDX_SENTINEL)) & np.isfinite(d_node)
    return _admit_greedy(pair_d, d_node, valid)


_ADMIT_DEV_CACHE: dict = {}


def _make_admit_dev(cosine: bool):
    if cosine in _ADMIT_DEV_CACHE:
        return _ADMIT_DEV_CACHE[cosine]
    import jax
    import jax.numpy as jnp

    @jax.jit
    def admit(corpus, slots, d_node):
        cv = corpus[jnp.maximum(slots, 0)]  # [B, P, d]
        ip = jnp.einsum(
            "bpd,bqd->bpq", cv, cv, preferred_element_type=jnp.float32
        )
        if cosine:
            pair_d = 1.0 - jnp.clip(ip, -1.0, 1.0)
        else:
            sq = jnp.einsum(
                "bpd,bpd->bp", cv, cv, preferred_element_type=jnp.float32
            )
            pair_d = jnp.maximum(
                sq[:, :, None] + sq[:, None, :] - 2.0 * ip, 0.0
            )
        valid = (slots != int(IDX_SENTINEL)) & jnp.isfinite(d_node)
        return _admit_greedy(pair_d, d_node, valid)

    _ADMIT_DEV_CACHE[cosine] = admit
    return admit


def _select_forward(dists, slots, admitted, m_forward):
    """Admitted candidates first (their d-order is the column order), then
    nearest non-admitted as backfill (hnswlib keepPrunedConnections), cut
    to m_forward."""
    order = np.argsort(~admitted, axis=1, kind="stable")[:, :m_forward]
    return (
        np.take_along_axis(dists, order, axis=1),
        np.take_along_axis(slots, order, axis=1),
    )


def _strip_self(dists: np.ndarray, slots: np.ndarray, own: np.ndarray):
    """Drop each row's own global slot from its k-NN list; rows whose self
    entry was crowded out by duplicates just truncate."""
    q, k = slots.shape
    keep = slots != own.astype(slots.dtype)[:, None]
    order = np.argsort(~keep, axis=1, kind="stable")[:, : k - 1]
    return (
        np.take_along_axis(dists, order, axis=1),
        np.take_along_axis(slots, order, axis=1),
    )


