"""Fused Pallas beam-search kernel for HNSW layer-0 (TPU).

Round-1 profiling showed the lockstep beam's while_loop iteration is
dominated by (a) XLA's variadic `lax.sort` over the beam+candidates rows
(two [Q, 512] 3-operand sorts = 5.8 ms/iter at Q=2048 — every bitonic
stage round-trips HBM) and (b) per-row vector gathers (row-count-bound:
~13 ns/row regardless of row size). This module fixes both:

- The merge/dedup/select step runs as ONE Pallas kernel with the beam
  resident in VMEM: slot-keyed bitonic dedup, (score, slot) bitonic
  top-ef, prefix-sum selection of the next `expand` nodes, and the
  optional filtered result-set merge — ~45-stage compare-exchange
  networks at VPU speed instead of HBM-round-trip sorts.
- Neighbor vectors are gathered from a NEIGHBORHOOD-BLOCKED table
  `nbr_vecs[cap, W, d]` (bf16): one wide row per expanded node instead of
  W narrow rows, cutting the gather's row count by W (=2M).

Layout: rows on sublanes, queries on lanes ([C, L] blocks, L=128), the
same orientation as ops/sortnet.py whose helpers this reuses.

Replaces the reference's per-query two-heap searchLayer
(hnsw_index.go:565-629); the admission mask keeps the fix for its
post-filtering weakness (hnsw_index_search.go:308-335).

Visited-set semantics: instead of per-query visited bitsets (a [Q, cap/32]
scatter that round-1 profiling showed costs 2/3 of each iteration), the
beam is kept DUPLICATE-FREE by the slot-sort dedup, and expanded flags ride
the beam. A node that falls off the beam can be re-scored if rediscovered
(bounded by the iteration cap); measured recall on real graphs is
identical to exact-visited traversal, see BENCHMARKS.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comet_tpu.ops.sortnet import LANE, _roll_sub, _rows_iota

INF = jnp.inf
SENT = np.int32(2**31 - 1)
FAKE_BASE = np.int32(1 << 28)  # unique fake slots for dead rows (> any cap)
MISC_ROWS = 24                  # next-node slots (<= 23) + active flag row


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


# -- generic multi-array bitonic machinery (rows on sublanes) ----------------


def _ce_multi(arrs, less, j, asc_rows):
    """One compare-exchange stage over a tuple of [C, L] arrays.

    `less(a, b)` must be a STRICT total order on the key tuple for rows
    with distinct keys; rows with fully equal keys may be duplicated into
    both partners, which is benign here (equal rows are interchangeable).
    """
    c = arrs[0].shape[0]
    lo = (_rows_iota(c) & j) == 0
    rolled = tuple(
        jnp.where(lo, _roll_sub(a, -j), _roll_sub(a, j)) for a in arrs
    )
    keep_small = asc_rows == lo
    p_less = less(rolled, arrs)
    take = keep_small == p_less
    return tuple(jnp.where(take, p, a) for p, a in zip(rolled, arrs))


def _sort_chunks_multi(arrs, less, k, first_desc=False):
    """Bitonic-sort each K-row chunk, alternating chunk directions."""
    c = arrs[0].shape[0]
    rows = _rows_iota(c)
    chunk_desc = ((rows & k) != 0) ^ first_desc
    q = rows & (k - 1)
    kk = 2
    while kk <= k:
        asc = ((q & kk) == 0) ^ chunk_desc
        j = kk // 2
        while j >= 1:
            arrs = _ce_multi(arrs, less, j, asc)
            j //= 2
        kk *= 2
    return arrs


def _merge_halve_multi(arrs, less, k):
    """[C, L] alternating-sorted K-chunks -> [C/2, L], still alternating."""
    c = arrs[0].shape[0]
    halves = tuple(_roll_sub(a, -k) for a in arrs)
    lower = less(arrs, halves)
    merged = tuple(
        jnp.where(lower, a, h) for a, h in zip(arrs, halves)
    )
    merged = tuple(
        a.reshape(c // (2 * k), 2 * k, -1)[:, :k, :].reshape(c // 2, -1)
        for a in merged
    )
    c2 = c // 2
    asc = (_rows_iota(c2) & k) == 0
    j = k // 2
    while j >= 1:
        merged = _ce_multi(merged, less, j, asc)
        j //= 2
    return merged


def _topk_multi(arrs, less, k):
    """[C, L] -> [k, L] smallest rows by `less`, sorted ascending."""
    arrs = _sort_chunks_multi(arrs, less, k)
    while arrs[0].shape[0] > k:
        arrs = _merge_halve_multi(arrs, less, k)
    return arrs


def _prefix_sum_rows(x):
    """Inclusive prefix sum along the sublane (row) axis: [C, L] int32."""
    c = x.shape[0]
    rows = _rows_iota(c)
    t = 1
    while t < c:
        sh = _roll_sub(x, t)
        x = x + jnp.where(rows >= t, sh, 0)
        t *= 2
    return x


def _less_score_e(a, b):
    """(dist asc, slot asc, expanded desc): copies of the same node carry
    IDENTICAL (dist, slot) keys, so this order makes duplicates ADJACENT
    with the expanded copy first — dedup needs no separate slot sort."""
    d1, s1, e1 = a
    d2, s2, e2 = b
    return (d1 < d2) | (
        (d1 == d2) & ((s1 < s2) | ((s1 == s2) & (e1 > e2)))
    )


def _less_score(a, b):
    """(dist asc, slot asc) — the determinism contract's tie order."""
    d1, s1 = a[0], a[1]
    d2, s2 = b[0], b[1]
    return (d1 < d2) | ((d1 == d2) & (s1 < s2))


def _less_score3(a, b):
    return _less_score((a[0], a[1]), (b[0], b[1]))


# -- the fused merge/select kernel --------------------------------------------


def _merge_body(
    bd, bs, be, nd, ns, rd, rs, adm, *, ef, ew, expand, fused, kr,
):
    """The merge/dedup/select math on [rows, L] arrays — runs inside the
    Pallas kernel on TPU and directly under XLA for CPU tests/fallback
    (identical numerics; Pallas interpret-mode compiles of big
    compare-exchange networks are pathologically slow on CPU)."""
    L = bd.shape[1]
    c_real = ef + ew
    c = _next_pow2(c_real)
    pad = c - c_real

    d = jnp.concatenate([bd, nd], axis=0)
    s = jnp.concatenate([bs, ns], axis=0)
    e = jnp.concatenate([be, jnp.zeros((ew, L), jnp.int32)], axis=0)
    if pad:
        d = jnp.concatenate([d, jnp.full((pad, L), INF, jnp.float32)], axis=0)
        s = jnp.concatenate([s, jnp.full((pad, L), SENT, jnp.int32)], axis=0)
        e = jnp.concatenate([e, jnp.zeros((pad, L), jnp.int32)], axis=0)

    # ONE (score, slot, expanded-desc) top-ef sort. Duplicate copies of a
    # node have IDENTICAL (score, slot) keys (bf16 distances are computed
    # by the same einsum shape every iteration), so they land ADJACENT
    # with the expanded copy first — adjacent-equal kill replaces the whole
    # visited-set/slot-sort machinery. Killed rows become (inf, SENT) holes
    # at their old positions; they are excluded from selection below and
    # sink to the bottom in the NEXT iteration's sort, costing at most
    # #dups beam slots for one round.
    d, s, e = _topk_multi((d, s, e), _less_score_e, ef)
    prev = _roll_sub(s, 1)
    dup = (s == prev) & (s != SENT) & (_rows_iota(ef) > 0)
    d = jnp.where(dup, INF, d)
    s = jnp.where(dup, SENT, s)
    e = jnp.where(dup, 0, e)

    od = d
    osl = s

    # selection: first `expand` unexpanded rows (valid rows are in
    # ascending score order; holes are excluded)
    valid = s != SENT
    unexp = (e == 0) & valid
    ud = jnp.where(unexp, d, INF)
    d_first = jnp.min(ud, axis=0, keepdims=True)          # [1, L]
    worst = d[ef - 1 : ef]                                # [1, L]
    active = (d_first < INF) & (d_first <= worst)         # [1, L]
    rank = _prefix_sum_rows(unexp.astype(jnp.int32))
    sel = unexp & (rank <= expand) & active
    oe = e | sel.astype(jnp.int32)

    rows_misc = []
    for j in range(expand):
        pick = sel & (rank == j + 1)
        rows_misc.append(
            jnp.sum(jnp.where(pick, s + 1, 0), axis=0, keepdims=True) - 1
        )
    rows_misc.append(active.astype(jnp.int32))
    while len(rows_misc) < MISC_ROWS:
        rows_misc.append(jnp.full((1, L), -1, jnp.int32))
    misc = jnp.concatenate(rows_misc, axis=0)

    ord_ = ors = None
    if fused:
        # PHASE 3: admitted candidates -> running result set (duplicate
        # admissions possible across iterations; deduped once post-loop)
        ad = jnp.where(adm != 0, nd, INF)
        asl = jnp.where(adm != 0, ns, SENT)
        cr = kr + ew
        crp = _next_pow2(cr)
        rdall = jnp.concatenate([rd, ad], axis=0)
        rsall = jnp.concatenate([rs, asl], axis=0)
        if crp != cr:
            rdall = jnp.concatenate(
                [rdall, jnp.full((crp - cr, L), INF, jnp.float32)], axis=0
            )
            rsall = jnp.concatenate(
                [rsall, jnp.full((crp - cr, L), SENT, jnp.int32)], axis=0
            )
        posr = _rows_iota(crp) + jnp.zeros((crp, L), jnp.int32)
        rsall = jnp.where(rdall == INF, FAKE_BASE + posr, rsall)
        rdall, rsall = _topk_multi((rdall, rsall), _less_score, kr)
        ord_ = rdall
        ors = jnp.where(rsall >= FAKE_BASE, SENT, rsall)
    return od, osl, oe, misc, ord_, ors


def _merge_kernel(*refs, ef, ew, expand, fused, kr):
    if fused:
        (bd, bs, be, nd, ns, rd, rs, adm,
         od, osl, oe, misc, ord_, ors) = refs
        outs = _merge_body(
            bd[:], bs[:], be[:], nd[:], ns[:], rd[:], rs[:], adm[:],
            ef=ef, ew=ew, expand=expand, fused=True, kr=kr,
        )
        ord_[:] = outs[4]
        ors[:] = outs[5]
    else:
        bd, bs, be, nd, ns, od, osl, oe, misc = refs
        outs = _merge_body(
            bd[:], bs[:], be[:], nd[:], ns[:], None, None, None,
            ef=ef, ew=ew, expand=expand, fused=False, kr=kr,
        )
    od[:] = outs[0]
    osl[:] = outs[1]
    oe[:] = outs[2]
    misc[:] = outs[3]


@partial(
    jax.jit,
    static_argnames=("ef", "ew", "expand", "fused", "kr", "use_pallas"),
)
def beam_merge_step(
    beam_d, beam_s, beam_e,   # [ef, Q]
    new_d, new_s,             # [ew, Q]
    res_d=None, res_s=None,   # [kr, Q] (fused only)
    adm=None,                 # [ew, Q] int32 0/1 (fused only)
    *, ef, ew, expand, fused, kr=0, use_pallas=True,
):
    """One fused merge/dedup/select step (see module docstring).

    Returns (beam_d', beam_s', beam_e', misc [MISC_ROWS, Q], res_d', res_s')
    where misc rows 0..expand-1 are the next nodes to expand (-1 = none)
    and row `expand` is the per-query active flag.

    use_pallas=False runs the identical math directly under XLA — the
    CPU/test path (Pallas interpret-mode compiles of the big networks are
    pathologically slow on the CPU backend).
    """
    q = beam_d.shape[1]
    assert q % LANE == 0, q
    if not use_pallas:
        return _merge_body(
            beam_d, beam_s, beam_e.astype(jnp.int32), new_d, new_s,
            res_d, res_s, adm,
            ef=ef, ew=ew, expand=expand, fused=fused, kr=kr,
        )
    grid = (q // LANE,)

    def spec(rows):
        return pl.BlockSpec((rows, LANE), lambda b: (0, b), memory_space=pltpu.VMEM)

    in_specs = [spec(ef), spec(ef), spec(ef), spec(ew), spec(ew)]
    args = [beam_d, beam_s, beam_e, new_d, new_s]
    out_specs = [spec(ef), spec(ef), spec(ef), spec(MISC_ROWS)]
    out_shape = [
        jax.ShapeDtypeStruct((ef, q), jnp.float32),
        jax.ShapeDtypeStruct((ef, q), jnp.int32),
        jax.ShapeDtypeStruct((ef, q), jnp.int32),
        jax.ShapeDtypeStruct((MISC_ROWS, q), jnp.int32),
    ]
    if fused:
        in_specs += [spec(kr), spec(kr), spec(ew)]
        args += [res_d, res_s, adm]
        out_specs += [spec(kr), spec(kr)]
        out_shape += [
            jax.ShapeDtypeStruct((kr, q), jnp.float32),
            jax.ShapeDtypeStruct((kr, q), jnp.int32),
        ]

    outs = pl.pallas_call(
        partial(
            _merge_kernel, ef=ef, ew=ew, expand=expand, fused=fused, kr=kr
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*args)
    if fused:
        return outs[0], outs[1], outs[2], outs[3], outs[4], outs[5]
    return outs[0], outs[1], outs[2], outs[3], None, None


# -- full search orchestration -------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("ef", "k", "expand", "max_iters", "fused", "use_pallas"),
)
def beam_search_blocked(
    queries,     # [Q, d] f32 preprocessed, Q % LANE == 0
    entry,       # [Q] i32 layer-0 entry slots
    adj,         # [cap, W] i32, -1 padded
    nbr_vecs,    # [cap, W, d] bf16 neighborhood-blocked vectors
    nbr_sqn,     # [cap, W] f32 neighbor squared norms
    vectors,     # [cap, d] f32 (entry distances + exact rerank)
    sqnorms,     # [cap] f32
    allowed,     # [cap] bool result-admission mask
    sq_thresh,   # scalar f32 threshold on the kernel's squared distances
    ef: int,
    k: int,
    expand: int,
    max_iters: int,
    fused: bool,
    use_pallas: bool = True,
):
    """Blocked-gather lockstep beam search, one dispatch.

    Distances inside the loop are SQUARED L2 in bf16 (cosine rides the same
    kernel via preprocessed inputs, see hnsw.py); the final top candidates
    are re-scored exactly in f32 before the (score, slot) ordering, so
    returned scores match the metric contract. Returns (res_d [Q, k],
    res_s [Q, k]) ascending with slot tie-break; empty = (inf, SENT).
    """
    Q, d = queries.shape
    cap, W = adj.shape
    ew = expand * W
    kr = _next_pow2(max(2 * k, 64)) if fused else 0

    qn = jnp.sum(queries * queries, axis=1)                # [Q]
    qb = queries.astype(jnp.bfloat16)

    ev = vectors[entry]
    e_d = jnp.maximum(
        qn + sqnorms[entry]
        - 2.0 * jnp.einsum(
            "qd,qd->q", queries, ev, preferred_element_type=jnp.float32
        ),
        0.0,
    )

    beam_d = jnp.full((ef, Q), INF, jnp.float32).at[0].set(e_d)
    beam_s = jnp.full((ef, Q), SENT, jnp.int32).at[0].set(entry)
    beam_e = jnp.zeros((ef, Q), jnp.int32).at[0].set(1)
    nodes = jnp.full((expand, Q), -1, jnp.int32).at[0].set(entry)

    if fused:
        ok0 = allowed[entry] & (e_d <= sq_thresh)
        res_d = jnp.full((kr, Q), INF, jnp.float32).at[0].set(
            jnp.where(ok0, e_d, INF)
        )
        res_s = jnp.full((kr, Q), SENT, jnp.int32).at[0].set(
            jnp.where(ok0, entry, SENT)
        )
    else:
        res_d = jnp.zeros((1, Q), jnp.float32)
        res_s = jnp.zeros((1, Q), jnp.int32)

    def cond(state):
        i, *_, alive = state
        return (i < max_iters) & alive

    def body(state):
        i, beam_d, beam_s, beam_e, nodes, res_d, res_s, _ = state
        nc = jnp.maximum(nodes, 0)                          # [E, Q]
        node_ok = nodes >= 0
        neigh = jnp.where(node_ok[:, :, None], adj[nc], -1)  # [E, Q, W]
        nv = nbr_vecs[nc]                                    # [E, Q, W, d]
        nsq = nbr_sqn[nc]                                    # [E, Q, W]
        ip = jnp.einsum(
            "qd,eqwd->ewq", qb, nv, preferred_element_type=jnp.float32
        )
        nd = jnp.maximum(
            qn[None, None, :] + nsq.transpose(0, 2, 1) - 2.0 * ip, 0.0
        ).reshape(ew, Q)
        neigh_t = neigh.transpose(0, 2, 1).reshape(ew, Q)
        ok = neigh_t >= 0
        nd = jnp.where(ok, nd, INF)
        ns = jnp.where(ok, neigh_t, SENT)

        adm = None
        if fused:
            adm = (
                ok & allowed[jnp.maximum(neigh_t, 0)] & (nd <= sq_thresh)
            ).astype(jnp.int32)

        beam_d, beam_s, beam_e, misc, res_d2, res_s2 = beam_merge_step(
            beam_d, beam_s, beam_e, nd, ns, res_d, res_s, adm,
            ef=ef, ew=ew, expand=expand, fused=fused, kr=kr,
            use_pallas=use_pallas,
        )
        if fused:
            res_d, res_s = res_d2, res_s2
        nodes = misc[:expand]
        alive = jnp.any(misc[expand] > 0)
        return (i + 1, beam_d, beam_s, beam_e, nodes, res_d, res_s, alive)

    state = (
        jnp.int32(0), beam_d, beam_s, beam_e, nodes, res_d, res_s,
        jnp.bool_(True),
    )
    state = lax.while_loop(cond, body, state)
    beam_d, beam_s, res_d, res_s = state[1], state[2], state[5], state[6]

    if fused:
        # result set: dedup (slots may repeat across iterations), exact
        # f32 rerank, threshold re-check, (score, slot) order
        cd, cs = res_d.T, res_s.T                         # [Q, kr]
    else:
        cd, cs = beam_d.T, beam_s.T                       # [Q, ef]

    kk = min(max(2 * k, 64), cd.shape[1])
    sd, ss = lax.sort((cd, cs), dimension=1, num_keys=2)
    top_s = ss[:, :kk]
    tv = vectors[jnp.maximum(top_s, 0)]
    ip = jnp.einsum(
        "qd,qkd->qk", queries, tv,
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    td = jnp.maximum(qn[:, None] + sqnorms[jnp.maximum(top_s, 0)] - ip * 2.0, 0.0)
    dead = top_s == SENT
    if fused:
        # dedup repeated slots (keep first occurrence after slot sort)
        s2, d2 = lax.sort((top_s, td), dimension=1, num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((Q, 1), bool), s2[:, 1:] == s2[:, :-1]], axis=1
        )
        td = jnp.where(dup | (s2 == SENT), INF, d2)
        top_s = jnp.where(dup, SENT, s2)
        td = jnp.where(td <= sq_thresh, td, INF)
    else:
        td = jnp.where(dead, INF, td)
    top_s = jnp.where(td == INF, SENT, top_s)
    sd2, ss2 = lax.sort((td, top_s), dimension=1, num_keys=2)
    return sd2[:, :k], ss2[:, :k]


@jax.jit
def build_blocked_tables(adj, vectors, sqnorms):
    """One-time build of the neighborhood-blocked routing tables:
    nbr_vecs[p, j] = vectors[adj[p, j]] (bf16), nbr_sqn likewise (f32)."""
    nc = jnp.maximum(adj, 0)
    nv = vectors[nc].astype(jnp.bfloat16)
    nsq = jnp.where(adj >= 0, sqnorms[nc], 0.0)
    return nv, nsq


@partial(jax.jit, donate_argnums=(0, 1))
def update_blocked_rows(nbr_vecs, nbr_sqn, rows, adj_rows, vectors, sqnorms):
    """Resync neighborhood-blocked rows after adjacency updates (donated)."""
    nc = jnp.maximum(adj_rows, 0)
    v = vectors[nc]                                # [R, W, d]
    nbr_vecs = nbr_vecs.at[rows].set(v.astype(nbr_vecs.dtype))
    nbr_sqn = nbr_sqn.at[rows].set(
        jnp.where(adj_rows >= 0, sqnorms[nc], 0.0)
    )
    return nbr_vecs, nbr_sqn
