"""Block-sparse IVF scan: compute that tracks nprobe (Pallas TPU kernel).

The dense IVF fast path (ops/pallas_scan.ivf_topk_pipeline) scans the WHOLE
corpus with unprobed rows masked — exact, but it does full-corpus matmul
work per query regardless of nprobe, so its QPS tracks the flat scan
(reference scans only probed lists: ivf_index_search.go:244-301). This
module makes the TPU path actually prune:

  1. The corpus is laid out CLUSTER-MAJOR: each inverted list occupies a
     contiguous run of 256-row chunks (padded rows carry +inf in the
     additive mask), stored transposed [d, NR] like the flat corpus.
  2. Queries are sorted by their nearest centroid (with centroids ordered
     by a coarse super-clustering so adjacent cluster ids are spatially
     nearby cells), then processed in GROUPS of 128 lanes. Queries
     in a group probe overlapping cluster sets, so the group's deduplicated
     chunk list stays near the per-query probe size instead of the union of
     128 unrelated probe lists.
  3. A PrefetchScalarGridSpec grid (group, step) walks each group's chunk
     list: the prefetched chunk id drives the corpus BlockSpec index_map —
     the kernel only ever DMAs probed chunks (this is the block-sparse
     matmul pattern). Per step: one [128, d] x [d, 256] MXU pass, probe-
     membership masking per lane, distance tile write, and the flat
     kernel's running group-minima top-kb selection in VMEM scratch.
  4. Post-pass: the winning groups' member distances are gathered from the
     per-group distance rows (identical shape to the flat pipeline's
     candidate stage) and reduced to the exact top-k by a bitonic network.

Exactness: distances are f32 (Precision.HIGHEST matmul, same as the dense
path); block selection keeps kb >= k groups, so the returned top-k SET is
exact within the scanned chunks (docs/DESIGN.md §2). Two documented
divergences from the dense path: (a) score ties at the k-th boundary break
by scan order, not slot order; (b) each group's chunk walk is budgeted at S
steps and its distinct-cluster list at UC — chunk lists are ordered by best
probe rank, so truncation drops the worst-ranked probes' chunks only. The
per-group overflow count returned by the pipeline counts EVERY dropped
chunk (both S- and UC-truncation); indexes/ivf.py rescans with escalated
budgets until it is zero (or the budget reaches the table size), so served
results always cover the requested nprobe, and remembers the escalated
budget per (nprobe, k) so repeat traffic starts right-sized. When the
learned budget approaches the table size (probe-diverse batches — each
128-lane group wants most chunks), the index routes back to the dense
masked pipeline instead, where available. S defaults to ~4x the expected
need under probe overlap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comet_tpu.ops.distance import DEFAULT_PRECISION
from comet_tpu.ops.sortnet import (
    _merge_halve,
    cand_hier,
    cand_topk_hier,
    topk_body,
    topk_cl,
)

CHUNK = 256     # corpus rows per chunk (two 128-row selection groups)
SEL_GROUP = 128  # rows per selection group (lane width)
QG = 128        # queries per kernel group (lane width of the query block)

INF = jnp.inf
IDX_SENTINEL = np.int32(2**31 - 1)
BIG = np.int32(2**30)


# -- layout ------------------------------------------------------------------


def build_cluster_major(
    assign: np.ndarray, nlist: int, chunk: int = CHUNK
) -> dict:
    """Cluster-major row layout from per-slot assignments (host, numpy).

    Each cluster's slots occupy a contiguous run of `chunk`-row blocks,
    padded with -1. Returns dict with:
      perm        [NR] int32  — slot per physical row (-1 = padding)
      chunk_start [nlist + 1] int32 — cluster c owns chunks [s_c, s_{c+1})
      nchunks     [nlist] int32
      max_chunks  int — max chunks of any single cluster
    """
    assign = np.asarray(assign)
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    pos0 = np.searchsorted(sorted_assign, 0)  # skip unassigned (-1)
    slots = order[pos0:].astype(np.int32)
    lists = sorted_assign[pos0:]
    counts = (
        np.bincount(lists, minlength=nlist)
        if len(lists)
        else np.zeros(nlist, dtype=np.int64)
    )
    nchunks = -(-counts // chunk)  # ceil
    chunk_start = np.zeros(nlist + 1, dtype=np.int32)
    chunk_start[1:] = np.cumsum(nchunks)
    nr = max(int(chunk_start[-1]), 1) * chunk
    perm = np.full(nr, -1, dtype=np.int32)
    if len(slots):
        starts = np.zeros(nlist, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        within = np.arange(len(slots)) - starts[lists]
        rows = chunk_start[lists].astype(np.int64) * chunk + within
        perm[rows] = slots
    return {
        "perm": perm,
        "chunk_start": chunk_start,
        "nchunks": nchunks.astype(np.int32),
        "max_chunks": max(int(nchunks.max()) if nlist else 1, 1),
    }


def cluster_order_key(centroids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Spatial ordering key per cluster: nearby centroids -> nearby keys.

    A cheap one-dimensional locality proxy: k-means the centroids into
    ~nlist/64 super-clusters and key by (super, id). Query batches sorted
    by this key group spatially-close queries into the same 128-lane kernel
    group, keeping each group's probed-chunk union small.
    """
    nlist = len(centroids)
    nsuper = max(min(nlist // 64, 64), 1)
    if nsuper <= 1:
        return np.arange(nlist, dtype=np.int32)
    from comet_tpu.ops.kmeans import kmeans
    from comet_tpu.types import DistanceKind

    sup_centroids, sup_assign = kmeans(
        centroids.astype(np.float32), nsuper, DistanceKind.L2_SQUARED, 10,
        return_assign=True,
    )
    return np.asarray(sup_assign, dtype=np.int32)


# -- per-batch chunk-list construction (device) --------------------------------


@partial(jax.jit, static_argnames=("S", "UC", "MC", "nlist"))
def _group_chunk_lists(
    probes: jax.Array,       # [Q, P] i32 probed cluster ids (query-sorted)
    chunk_start: jax.Array,  # [nlist + 1] i32
    nchunks: jax.Array,      # [nlist] i32
    S: int, UC: int, MC: int, nlist: int,
):
    """Per-group deduplicated chunk walk lists, ordered by best probe rank.

    Returns (chunk_ids [G, S] i32, cluster_ids [G, S] i32 (-1 dead),
    n_real [G] i32, overflow [G] i32)."""
    Q, P = probes.shape
    assert P * nlist < int(BIG), (P, nlist)
    G = Q // QG
    pg = probes.reshape(G, QG * P)
    ranks = jnp.tile(
        lax.broadcasted_iota(jnp.int32, (QG, P), 1).reshape(QG * P), (G, 1)
    )
    # min probe rank per distinct cluster: sort by (cluster, rank)
    key = pg * P + ranks
    ks = lax.sort(key, dimension=1)
    c_s = ks // P
    r_s = ks % P
    first = jnp.concatenate(
        [jnp.ones((G, 1), bool), c_s[:, 1:] != c_s[:, :-1]], axis=1
    )
    sel_key = jnp.where(first, r_s * nlist + c_s, BIG)
    sel_key = lax.sort(sel_key, dimension=1)[:, :UC]   # order by (rank, cluster)
    valid_c = sel_key < BIG
    c_u = jnp.where(valid_c, sel_key % nlist, 0)
    # expand clusters to chunks by exclusive cumsum + scatter (rank order is
    # the cluster order, so positions are contiguous by rank — no big sort)
    base = chunk_start[c_u]                             # [G, UC]
    nch = jnp.where(valid_c, nchunks[c_u], 0)           # [G, UC]
    off = jnp.cumsum(nch, axis=1) - nch                 # exclusive
    i = lax.broadcasted_iota(jnp.int32, (G, UC, MC), 2)
    pos = off[:, :, None] + i                           # [G, UC, MC]
    ok = valid_c[:, :, None] & (i < nch[:, :, None]) & (pos < S)
    pos_safe = jnp.where(ok, pos, S)                    # dropped out of range
    g_idx = lax.broadcasted_iota(jnp.int32, (G, UC, MC), 0)
    chunk_val = base[:, :, None] + i
    chunk_ids = jnp.full((G, S), -1, jnp.int32).at[
        g_idx.reshape(-1), pos_safe.reshape(-1)
    ].set(chunk_val.reshape(-1), mode="drop")
    cluster_ids = jnp.full((G, S), -1, jnp.int32).at[
        g_idx.reshape(-1), pos_safe.reshape(-1)
    ].set(
        jnp.broadcast_to(c_u[:, :, None], (G, UC, MC)).reshape(-1),
        mode="drop",
    )
    # chunks wanted across ALL distinct probed clusters (pre-UC-truncation,
    # pre-S-truncation) so overflow counts every dropped chunk — both those
    # past the S step budget AND whole clusters cut by the UC cap
    total_wanted = jnp.sum(
        jnp.where(first, nchunks[jnp.clip(c_s, 0, nlist - 1)], 0), axis=1
    ).astype(jnp.int32)
    n_kept = (off + nch)[:, -1].astype(jnp.int32)       # survived the UC cap
    dead = cluster_ids < 0
    # dead steps repeat a real chunk (no new DMA) under an all-inf mask;
    # if the group probed only empty clusters every step is dead — clamp
    first_chunk = jnp.maximum(chunk_ids[:, 0:1], 0)
    chunk_ids = jnp.where(dead, first_chunk, chunk_ids)
    n_real = jnp.minimum(n_kept, S)
    overflow = total_wanted - n_real
    return chunk_ids, cluster_ids, n_real, overflow


# -- the sparse scan kernel ----------------------------------------------------


def _sparse_kernel(
    chunk_ids_ref, cluster_ids_ref,   # scalar-prefetch [G, S] i32
    q_ref,        # [QG, d] f32 (this group's queries; bf16 in bf16_domain)
    qn_ref,       # [QG, 1] f32
    x_ref,        # [d, chunk] corpus chunk (transposed, cluster-major)
    xm_ref,       # [1, chunk] f32 additive mask (sqnorms / 0, +inf invalid)
    probes_ref,   # [QG, P] i32 this group's probed clusters
    thr_ref,      # [1, 1] f32 (SMEM)
    dist_ref,     # out [1, QG, chunk] f32
    gsel_ref,     # out [1, kb, QG] i32
    buf_v, buf_i,  # scratch [(kb + accum), QG]
    *, kb, accum_steps, cosine, chunk, sel_group, bf16_domain,
):
    g = pl.program_id(0)
    s = pl.program_id(1)
    ns = pl.num_programs(1)
    new_per_step = chunk // sel_group

    ip = lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # bf16_domain reproduces the HNSW routing kernel's bf16 MXU pass
        # (ops/beam_kernel._gather_score) so seed distances are bit-equal
        # to in-loop rediscovery distances — required by sort-kill dedup
        precision=None if bf16_domain else lax.Precision.HIGHEST,
    )                                                   # [QG, CHUNK]
    if cosine:
        dist = 1.0 - jnp.clip(ip, -1.0, 1.0) + xm_ref[:]
    else:
        dist = jnp.maximum(qn_ref[:] + xm_ref[:] - 2.0 * ip, 0.0)
    thr = thr_ref[0, 0]
    dist = jnp.where(dist <= thr, dist, jnp.inf)
    cid = cluster_ids_ref[g, s]
    member = jnp.any(probes_ref[:] == cid, axis=1, keepdims=True)  # [QG, 1]
    dist = jnp.where(member, dist, jnp.inf)
    dist_ref[0] = dist

    gmin = jnp.min(dist.reshape(QG, new_per_step, sel_group), axis=2).T
    gids = (
        s * new_per_step
        + lax.broadcasted_iota(jnp.int32, (new_per_step, QG), 0)
    )

    @pl.when(s == 0)
    def _():
        buf_v[:] = jnp.full(buf_v.shape, INF, dtype=jnp.float32)
        buf_i[:] = jnp.full(buf_i.shape, IDX_SENTINEL, dtype=jnp.int32)

    slot = kb + (s % accum_steps) * new_per_step
    buf_v[pl.ds(slot, new_per_step), :] = gmin
    buf_i[pl.ds(slot, new_per_step), :] = gids

    accum_rows = buf_v.shape[0] - kb

    @pl.when((s % accum_steps == accum_steps - 1) | (s == ns - 1))
    def _():
        nv, ni = topk_body(
            buf_v[pl.ds(kb, accum_rows), :],
            buf_i[pl.ds(kb, accum_rows), :],
            kb,
            first_desc=True,
        )
        rv = jnp.concatenate([buf_v[pl.ds(0, kb), :], nv], axis=0)
        ri = jnp.concatenate([buf_i[pl.ds(0, kb), :], ni], axis=0)
        rv, ri = _merge_halve(rv, ri, kb)
        buf_v[pl.ds(0, kb), :] = rv
        buf_i[pl.ds(0, kb), :] = ri
        buf_v[pl.ds(kb, accum_rows), :] = jnp.full(
            (accum_rows, QG), INF, dtype=jnp.float32
        )

    @pl.when(s == ns - 1)
    def _():
        gsel_ref[0, :, :] = buf_i[pl.ds(0, kb), :]


@partial(
    jax.jit,
    static_argnames=(
        "kb", "S", "cosine", "chunk", "sel_group", "bf16_domain", "interpret"
    ),
)
def _sparse_scan(
    qsorted: jax.Array,      # [Q, d] f32 (query-sorted), Q % QG == 0
    corpus_t: jax.Array,     # [d, NR] cluster-major transposed (f32, or
                             #   bf16 when bf16_domain)
    mask_vec: jax.Array,     # [NR] f32 additive mask (+inf invalid/padding)
    probes: jax.Array,       # [Q, P] i32
    chunk_ids: jax.Array,    # [G, S] i32
    cluster_ids: jax.Array,  # [G, S] i32
    threshold: jax.Array,    # scalar f32
    kb: int, S: int,
    cosine: bool = False,
    chunk: int = CHUNK,
    sel_group: int = SEL_GROUP,
    bf16_domain: bool = False,
    interpret: bool = False,
):
    """Returns (dist [G, QG, S*chunk] f32, gsel [G, kb, QG] i32)."""
    Q, d = qsorted.shape
    G = Q // QG
    P = probes.shape[1]
    # qn stays f32 (matches beam_kernel._gather_score's f32 query norms)
    qn = jnp.sum(qsorted * qsorted, axis=1, keepdims=True)
    if bf16_domain:
        qsorted = qsorted.astype(jnp.bfloat16)
    xm2d = mask_vec[None, :]
    thr2d = threshold.reshape(1, 1)
    new_per_step = chunk // sel_group
    accum_steps = max(kb // new_per_step, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, S),
        in_specs=[
            pl.BlockSpec((QG, d), lambda g, s, ch, cl: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QG, 1), lambda g, s, ch, cl: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, chunk), lambda g, s, ch, cl: (0, ch[g, s]), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda g, s, ch, cl: (0, ch[g, s]), memory_space=pltpu.VMEM),
            pl.BlockSpec((QG, P), lambda g, s, ch, cl: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g, s, ch, cl: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, QG, chunk), lambda g, s, ch, cl: (g, 0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, QG), lambda g, s, ch, cl: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kb + max(kb, new_per_step), QG), jnp.float32),
            pltpu.VMEM((kb + max(kb, new_per_step), QG), jnp.int32),
        ],
    )
    return pl.pallas_call(
        partial(
            _sparse_kernel, kb=kb, accum_steps=accum_steps, cosine=cosine,
            chunk=chunk, sel_group=sel_group, bf16_domain=bf16_domain,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, QG, S * chunk), jnp.float32),
            jax.ShapeDtypeStruct((G, kb, QG), jnp.int32),
        ],
        interpret=interpret,
    )(chunk_ids, cluster_ids, qsorted, qn, corpus_t, xm2d, probes, thr2d)


# -- full pipeline -------------------------------------------------------------


def _coarse_probes(qpad, centroids, nprobe, coarse_cosine, interpret):
    """[Q, nprobe_pad] probed cluster ids, exact top-nprobe per query
    (ties to the lower centroid id), padded to pow2 by repeating probe 0."""
    nlist = centroids.shape[0]
    cq = lax.dot_general(
        centroids, qpad,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if coarse_cosine:
        cd_t = -cq
    else:
        cn = jnp.sum(centroids * centroids, axis=1, keepdims=True)
        cd_t = cn - 2.0 * cq
    cids = lax.broadcasted_iota(jnp.int32, (nlist, qpad.shape[0]), 0)
    _, probes_t = topk_cl(cd_t, cids, nprobe, interpret=interpret)
    probes_t = probes_t[:nprobe]
    npad = max(1 << max(nprobe - 1, 1).bit_length(), 8)
    if npad > nprobe:
        probes_t = jnp.concatenate(
            [probes_t] + [probes_t[0:1]] * (npad - nprobe), axis=0
        )
    return probes_t.T  # [Q, npad]


@partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "S", "UC", "MC", "nlist",
        "coarse_cosine", "cosine", "sqrt_out", "chunk", "sel_group",
        "bf16_domain", "kb_cap", "hier", "interpret",
    ),
)
def _pipeline_jit(
    qpad: jax.Array,         # [Qp, d] f32 preprocessed, Qp % QG == 0
    corpus_t: jax.Array,     # [d, NR] cluster-major transposed (f32; bf16
                             #   when bf16_domain — HNSW seed scans)
    mask_vec: jax.Array,     # [NR] f32 additive mask (+inf invalid/padding)
    row_slot: jax.Array,     # [NR] i32 original slot per row (-1 padding)
    threshold: jax.Array,    # scalar f32 (squared domain for L2)
    centroids: jax.Array,    # [nlist, d] f32
    order_key: jax.Array,    # [nlist] i32 spatial ordering key per cluster
    chunk_start: jax.Array,  # [nlist + 1] i32
    nchunks: jax.Array,      # [nlist] i32
    k: int,
    nprobe: int,
    S: int, UC: int, MC: int, nlist: int,
    coarse_cosine: bool = False,
    cosine: bool = False,
    sqrt_out: bool = False,
    chunk: int = CHUNK,
    sel_group: int = SEL_GROUP,
    bf16_domain: bool = False,
    kb_cap: int = 0,
    hier: bool | None = None,
    interpret: bool = False,
):
    """Block-sparse IVF search, one dispatch for the whole padded batch.

    Returns (scores [Qp, k] f32, slots [Qp, k] i32, overflow [G] i32);
    empty result slots carry (+inf, IDX_SENTINEL). `chunk` must match the
    layout's build_cluster_major chunk size. bf16_domain scores in the
    HNSW routing kernel's bf16 distance domain (corpus_t/mask_vec must be
    bf16-cast values) so results can seed beam searches.

    kb_cap (0 = off) caps the number of selection groups kept below the
    exactness bound: the candidate-stage bitonic over kb*sel_group rows is
    the pipeline's dominant fixed cost (22.9 of 34.4 ms at the 1M seed
    shapes, /tmp probe r5), and callers that only need APPROXIMATE top-k
    (HNSW seed scans — recall comes from beam expansion, not seed
    exactness) can shrink it 4x. With kb_cap = c, the top-c rows are still
    exact (the block-select bound holds per prefix); ranks c+1..k come
    only from the kept c groups.
    """
    if hier is None:
        hier = cand_hier()
    Qp, d = qpad.shape
    G = Qp // QG
    # kb must stay a power of two >= k for both the bitonic select and the
    # block-select exactness bound; guarantee at least kb groups exist by
    # bumping S (extra steps are dead all-inf tiles).
    kb = max(1 << max(k - 1, 1).bit_length(), 8)
    if kb_cap:
        kb = min(kb, max(1 << max(kb_cap - 1, 1).bit_length(), 8))
    S = max(S, -(-kb * sel_group // chunk))
    probes = _coarse_probes(qpad, centroids, nprobe, coarse_cosine, interpret)

    # sort queries by the spatial key of their nearest centroid so each
    # 128-lane group probes overlapping cluster sets
    skey = order_key[probes[:, 0]] * nlist + probes[:, 0]
    qperm = jnp.argsort(skey)                       # stable
    qsorted = qpad[qperm]
    probes_s = probes[qperm]

    chunk_ids, cluster_ids, n_real, overflow = _group_chunk_lists(
        probes_s, chunk_start, nchunks, S=S, UC=UC, MC=MC, nlist=nlist
    )

    dist, gsel = _sparse_scan(
        qsorted, corpus_t, mask_vec, probes_s, chunk_ids, cluster_ids,
        threshold, kb=kb, S=S, cosine=cosine, chunk=chunk,
        sel_group=sel_group, bf16_domain=bf16_domain, interpret=interpret,
    )

    # candidate stage per group (same structure as the flat pipeline)
    def one_group(args):
        d_g, gsel_g, chunks_g = args                # [QG, S*chunk], [kb, QG]
        ng = S * chunk // sel_group
        d3 = d_g.reshape(QG, ng, sel_group)
        if hier:
            fv, fi = cand_topk_hier(d3, gsel_g, k, interpret=interpret)
        else:
            sel_q = gsel_g.T                        # [QG, kb]
            cand = jnp.take_along_axis(d3, sel_q[:, :, None], axis=1)
            cand_cl = cand.reshape(QG, kb * sel_group).T
            cidx = (
                gsel_g[:, None, :] * sel_group
                + lax.broadcasted_iota(jnp.int32, (kb, sel_group, QG), 1)
            ).reshape(kb * sel_group, QG)
            fv, fi = topk_cl(cand_cl, cidx, k, interpret=interpret)
        k2 = fv.shape[0]                            # k padded to pow2 >= 8
        fv, fi = fv.T, fi.T                         # [QG, k2]
        # local index -> cluster-major global row -> original slot
        step = jnp.minimum(fi // chunk, S - 1)
        within = fi % chunk
        grow = chunks_g[step] * chunk + within
        slot = row_slot[jnp.where(fi == IDX_SENTINEL, 0, grow)]
        slot = jnp.where(
            (fi == IDX_SENTINEL) | (fv == INF), IDX_SENTINEL, slot
        )
        fv = jnp.where(slot == IDX_SENTINEL, INF, fv)
        # deterministic (score, slot) tie order within the returned k2
        fv, slot = lax.sort((fv, slot), dimension=1, num_keys=2)
        return fv[:, :k], slot[:, :k]
    fv, slots = lax.map(one_group, (dist, gsel, chunk_ids))
    fv = fv.reshape(Qp, -1)
    slots = slots.reshape(Qp, -1)
    if sqrt_out:
        fv = jnp.sqrt(fv)
    # restore original query order
    inv = jnp.zeros_like(qperm).at[qperm].set(jnp.arange(Qp))
    return fv[inv], slots[inv], overflow


def _mem_envelope_bytes() -> int:
    """Per-dispatch HBM budget for the scan's [G, QG, S*chunk] f32 distance
    tensor (COMET_SPARSE_MEM_GB overrides; default 2 GiB). The tensor
    scales linearly with S and query count — at 4M rows / nprobe=64 /
    Q=2048 it reaches ~4.3 GB, enough to OOM a 16 GB v5e alongside the
    corpus tables — so oversized batches are processed in query-group
    slices (separate dispatches bound true liveness)."""
    import os

    try:
        gb = float(os.environ.get("COMET_SPARSE_MEM_GB", "2"))
    except ValueError:  # pragma: no cover
        gb = 2.0
    return int(gb * (1 << 30))


def ivf_sparse_pipeline(
    qpad,
    corpus_t,
    mask_vec,
    row_slot,
    threshold,
    centroids,
    order_key,
    chunk_start,
    nchunks,
    k: int,
    nprobe: int,
    S: int, UC: int, MC: int, nlist: int,
    coarse_cosine: bool = False,
    cosine: bool = False,
    sqrt_out: bool = False,
    chunk: int = CHUNK,
    sel_group: int = SEL_GROUP,
    bf16_domain: bool = False,
    kb_cap: int = 0,
    hier: bool | None = None,
    interpret: bool = False,
):
    """Memory-bounded front for `_pipeline_jit` (see its docstring).

    Splits the padded query batch into QG-multiple slices whenever the
    scan's distance tensor would exceed the envelope; each slice is its own
    dispatch (queries are spatially sorted WITHIN a slice — grouping
    quality degrades only marginally for envelope-sized slices). Returns
    (scores [Qp, k'], slots [Qp, k'], overflow [G] i32) exactly like the
    single-dispatch path."""
    if qpad.dtype != jnp.float32:
        qpad = qpad.astype(jnp.float32)  # narrow-wire cast in-jit
    kwargs = dict(
        k=k, nprobe=nprobe, S=S, UC=UC, MC=MC, nlist=nlist,
        coarse_cosine=coarse_cosine, cosine=cosine, sqrt_out=sqrt_out,
        chunk=chunk, sel_group=sel_group, bf16_domain=bf16_domain,
        kb_cap=kb_cap, hier=hier, interpret=interpret,
    )
    args = (corpus_t, mask_vec, row_slot, threshold, centroids,
            order_key, chunk_start, nchunks)
    Qp = qpad.shape[0]
    G = Qp // QG
    per_group = QG * S * chunk * 4
    max_g = max(int(_mem_envelope_bytes() // max(per_group, 1)), 1)
    if G <= max_g:
        return _pipeline_jit(qpad, *args, **kwargs)
    outs = []
    for g0 in range(0, G, max_g):
        rows = slice(g0 * QG, min(g0 + max_g, G) * QG)
        outs.append(_pipeline_jit(qpad[rows], *args, **kwargs))
    return (
        jnp.concatenate([o[0] for o in outs], axis=0),
        jnp.concatenate([o[1] for o in outs], axis=0),
        jnp.concatenate([o[2] for o in outs], axis=0),
    )


def default_budgets(
    nprobe: int, nlist: int, nchunks_total: int, max_chunks: int
) -> tuple[int, int, int]:
    """(S, UC, MC) static budgets for a batch: S covers ~4x a single
    query's probed chunks (group members share most probes when sorted by
    coarse cell), capped at the whole table."""
    avg_chunks = max(nchunks_total / max(nlist, 1), 1.0)
    npad = max(1 << max(nprobe - 1, 1).bit_length(), 8)
    want = int(npad * avg_chunks * 4)
    S = 1 << max(int(want - 1).bit_length(), 5)
    S = min(S, 1 << max(int(nchunks_total - 1).bit_length(), 5))
    UC = min(S, nlist)
    return S, UC, max_chunks


__all__ = [
    "CHUNK",
    "QG",
    "build_cluster_major",
    "cluster_order_key",
    "default_budgets",
    "ivf_sparse_pipeline",
]
