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
scatter that round-1 profiling showed costs 2/3 of each iteration, and
per-lane dynamic indexing does not exist on the VPU), duplicate copies of
a node are killed by ADJACENT-EQUAL detection after a full (dist, slot,
expanded) sort — rediscovered nodes reproduce bit-identical bf16 distances,
so copies always sort adjacent — and the killed slots are reclaimed by a
collision-free binary-shift compaction (_compact_up) that back-fills real
candidates from below the window. The beam therefore holds the true
distinct top-ef every iteration (no effective-ef shrink; an earlier
kill-in-place design plateaued recall@100 at 0.935 from exactly that
shrink). Expanded flags ride the beam; a node that falls off the beam can
be re-scored if rediscovered (bounded by the iteration cap).
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


def _full_sort_multi(arrs, less):
    """Fully sort [C, L] ascending by `less` (C a power of two)."""
    return _sort_chunks_multi(arrs, less, arrs[0].shape[0])


def _compact_up(arrs, dead):
    """Stable-compact live rows upward over dead rows: each live row moves
    up by (#dead rows before it); dead rows end up past the live count and
    are overwritten with (inf, SENT, 0)-style fills by the caller's mask.

    Implementation: binary shifts LSB->MSB. At stage b, rows whose
    remaining shift has bit b move up by b. COLLISION-FREE PROOF: suppose
    mover i1 (bit b set) lands on live non-mover i2 = pos(i1) - b. Writing
    c_i = dead-before-i, c_i1 = H1*2b + b + r1, c_i2 = H2*2b + r2 with
    r = c & (b-1), current positions are i - r, so
    i1 - i2 = b + r1 - r2 while #dead in [i2, i1) = c_i1 - c_i2
    >= b + r1 - r2 (c_i1 >= c_i2 forces H1 >= H2). Every position in
    [i2, i1) is therefore dead — including i2, contradicting i2 live.
    Vacated-but-unfilled positions are marked dead immediately so stale
    ghosts never move again.

    Returns (arrs', live_count [1, L]).
    """
    c = arrs[0].shape[0]
    rows = _rows_iota(c)
    dd = dead.astype(jnp.int32)
    live_count = jnp.sum(1 - dd, axis=0, keepdims=True)
    shift = _prefix_sum_rows(dd) - dd          # dead rows strictly before
    shift = jnp.where(dead, 0, shift)
    # flags ride as int32 0/1: Mosaic cannot roll or bitcast i1 vectors
    alive = 1 - dd
    b = 1
    while b < c:
        mv = alive * ((shift & b) != 0)
        recv = jnp.where(rows < (c - b), _roll_sub(mv, -b), 0)  # no wrap
        rb = recv != 0
        arrs = tuple(
            jnp.where(rb, _roll_sub(a, -b), a) for a in arrs
        )
        shift = jnp.where(rb, _roll_sub(shift, -b) - b, shift)
        alive = jnp.where(rb, 1, alive * (1 - mv))
        b *= 2
    return arrs, live_count


def _merge_bitonic_multi(arrs, less):
    """Bitonic MERGE of [asc-sorted upper | desc-sorted lower] -> full
    ascending sort. The concatenation of an ascending and a descending
    sorted run is bitonic, so log2(C) compare-exchange stages finish the
    sort — ~1.7x fewer row-stages than re-sorting from scratch."""
    c = arrs[0].shape[0]
    asc = jnp.ones((c, 1), dtype=bool)
    j = c // 2
    while j >= 1:
        arrs = _ce_multi(arrs, less, j, asc)
        j //= 2
    return arrs


def _sorted_concat_merge(sorted_arrs, new_arrs, less, pads):
    """Merge an ALREADY-ASC-SORTED [r, L] block with an unsorted [e, L]
    block into one fully sorted [C, L] result (C = next pow2 of r+e).

    Sorts only the new block (descending, pads first) then bitonic-merges.
    Requires C - r to be a power of two (holds for every shipped (ef, ew)
    combination); falls back to a full sort otherwise.
    """
    L = sorted_arrs[0].shape[1]
    r = sorted_arrs[0].shape[0]
    e = new_arrs[0].shape[0]
    c = _next_pow2(r + e)
    pad = c - r - e
    lower = tuple(
        jnp.concatenate(
            [n] + ([jnp.full((pad, L), p, n.dtype)] if pad else []), axis=0
        )
        for n, p in zip(new_arrs, pads)
    )
    low_rows = c - r
    if low_rows & (low_rows - 1):  # not a power of two: full re-sort
        allc = tuple(
            jnp.concatenate([s, lo], axis=0)
            for s, lo in zip(sorted_arrs, lower)
        )
        return _full_sort_multi(allc, less)
    lower = _sort_chunks_multi(lower, less, low_rows, first_desc=True)
    allc = tuple(
        jnp.concatenate([s, lo], axis=0) for s, lo in zip(sorted_arrs, lower)
    )
    return _merge_bitonic_multi(allc, less)


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


# -- the fused merge/select kernel --------------------------------------------


def _phase_sortkill(bd, bs, be, nd, ns):
    """Sort beam+candidates by (score, slot, expanded-desc) and kill
    duplicate copies in place.

    The sort makes duplicate copies of a node ADJACENT (they carry
    IDENTICAL (score, slot) keys — bf16 distances are reproduced
    bit-exactly on rediscovery), with the expanded copy first — so dedup
    is a single roll-and-compare, replacing the whole visited-set
    machinery. The beam arrives ALREADY sorted ascending (loop invariant:
    _phase_compact emits a stably-compacted slice of a sorted array, and
    _search_init's beam is [entry, +inf...]), so only the new candidates
    are sorted (descending) and one bitonic merge finishes the job.
    Returns [c, L] arrays with killed rows as (inf, SENT)."""
    L = bd.shape[1]
    ew = nd.shape[0]
    d, s, e = _sorted_concat_merge(
        (bd, bs, be),
        (nd, ns, jnp.zeros((ew, L), jnp.int32)),
        _less_score_e,
        pads=(INF, SENT, 0),
    )
    c = d.shape[0]
    prev = _roll_sub(s, 1)
    dup = (s == prev) & (s != SENT) & (_rows_iota(c) > 0)
    d = jnp.where(dup, INF, d)
    s = jnp.where(dup, SENT, s)
    e = jnp.where(dup, 0, e)
    return d, s, e


def _phase_compact(d, s, e, ef):
    """Compact killed rows away (binary shifts, _compact_up) so real
    candidates back-fill from below the window, then slice the true
    distinct top-ef. Without this, kill-in-place holes shrink the
    effective beam — measured recall@100 plateaued at 0.935."""
    c = d.shape[0]
    (d, s, e), live = _compact_up((d, s, e), s == SENT)
    tail = _rows_iota(c) >= live
    d = jnp.where(tail, INF, d)
    s = jnp.where(tail, SENT, s)
    e = jnp.where(tail, 0, e)
    return d[:ef], s[:ef], e[:ef]


def _phase_select(d, s, e, expand, stop=None):
    """Pick the first `expand` unexpanded rows + the termination flag.
    Returns (oe, misc): misc rows 0..expand-1 = next nodes (-1 none),
    row `expand` = active flag.

    `stop` is the termination bound row (default ef — classic HNSW: run
    until the best unexpanded is worse than the ef-th best). Seeded
    searches pass stop ~ next_pow2(k): the beam starts full of true
    near-neighbors, so the classic bound would force expanding ALL ef
    seeds; bounding at the k-window row stops once further expansion
    cannot change the returned top-k."""
    L = d.shape[1]
    ef = d.shape[0]
    if stop is None:
        stop = ef
    valid = s != SENT
    unexp = (e == 0) & valid
    ud = jnp.where(unexp, d, INF)
    d_first = jnp.min(ud, axis=0, keepdims=True)          # [1, L]
    worst = d[stop - 1 : stop]                            # [1, L]
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
    return oe, jnp.concatenate(rows_misc, axis=0)


def _phase_result_sortkill(rd, rs, nd, ns, adm):
    """Result-set update, sort+kill half: admitted candidates join the
    running (d, slot) set; duplicate re-admissions are killed adjacent
    (without this, copies of the best few nodes crowd every real result
    out of the window — measured recall@100 collapse to 0.07)."""
    ad = jnp.where(adm != 0, nd, INF)
    asl = jnp.where(adm != 0, ns, SENT)
    # running result set arrives sorted asc (same invariant as the beam)
    rdall, rsall = _sorted_concat_merge(
        (rd, rs), (ad, asl), _less_score, pads=(INF, SENT)
    )
    crp = rdall.shape[0]
    prevr = _roll_sub(rsall, 1)
    rdup = (rsall == prevr) & (rsall != SENT) & (_rows_iota(crp) > 0)
    rdall = jnp.where(rdup, INF, rdall)
    rsall = jnp.where(rdup, SENT, rsall)
    return rdall, rsall


def _phase_result_compact(rdall, rsall, kr):
    crp = rdall.shape[0]
    (rdall, rsall), rlive = _compact_up((rdall, rsall), rsall == SENT)
    rtail = _rows_iota(crp) >= rlive
    ord_ = jnp.where(rtail, INF, rdall)[:kr]
    ors = jnp.where(rtail, SENT, rsall)[:kr]
    return ord_, ors


def _merge_body(
    bd, bs, be, nd, ns, rd, rs, adm, *, ef, ew, expand, fused, kr,
    stop=None,
):
    """The full merge/dedup/compact/select math — runs as ONE fused body
    inside the Pallas kernel on TPU. (The CPU/test path runs the phases as
    SEPARATE jit modules instead — see beam_merge_step — because XLA:CPU's
    LLVM pipeline explodes superlinearly compiling sort-network ->
    compaction -> reduction chains in a single module.)"""
    d, s, e = _phase_sortkill(bd, bs, be, nd, ns)
    d, s, e = _phase_compact(d, s, e, ef)
    od, osl = d, s
    oe, misc = _phase_select(d, s, e, expand, stop)

    ord_ = ors = None
    if fused:
        rdall, rsall = _phase_result_sortkill(rd, rs, nd, ns, adm)
        ord_, ors = _phase_result_compact(rdall, rsall, kr)
    return od, osl, oe, misc, ord_, ors


# separately-jitted phase modules for the CPU/test path
_jit_sortkill = jax.jit(_phase_sortkill)
_jit_compact = jax.jit(_phase_compact, static_argnums=(3,))
_jit_select = jax.jit(_phase_select, static_argnums=(3, 4))
_jit_result_sortkill = jax.jit(_phase_result_sortkill)
_jit_result_compact = jax.jit(_phase_result_compact, static_argnums=(2,))


def _merge_kernel(*refs, ef, ew, expand, fused, kr, stop):
    if fused:
        (bd, bs, be, nd, ns, rd, rs, adm,
         od, osl, oe, misc, ord_, ors) = refs
        outs = _merge_body(
            bd[:], bs[:], be[:], nd[:], ns[:], rd[:], rs[:], adm[:],
            ef=ef, ew=ew, expand=expand, fused=True, kr=kr, stop=stop,
        )
        ord_[:] = outs[4]
        ors[:] = outs[5]
    else:
        bd, bs, be, nd, ns, od, osl, oe, misc = refs
        outs = _merge_body(
            bd[:], bs[:], be[:], nd[:], ns[:], None, None, None,
            ef=ef, ew=ew, expand=expand, fused=False, kr=kr, stop=stop,
        )
    od[:] = outs[0]
    osl[:] = outs[1]
    oe[:] = outs[2]
    misc[:] = outs[3]


def beam_merge_step(
    beam_d, beam_s, beam_e,   # [ef, Q]
    new_d, new_s,             # [ew, Q]
    res_d=None, res_s=None,   # [kr, Q] (fused only)
    adm=None,                 # [ew, Q] int32 0/1 (fused only)
    *, ef, ew, expand, fused, kr=0, stop=None, use_pallas=True,
):
    """One fused merge/dedup/compact/select step (see module docstring).

    Returns (beam_d', beam_s', beam_e', misc [MISC_ROWS, Q], res_d', res_s')
    where misc rows 0..expand-1 are the next nodes to expand (-1 = none)
    and row `expand` is the per-query active flag.

    use_pallas=False runs the identical math as SEPARATE XLA modules per
    phase — the CPU/test path (XLA:CPU's LLVM pipeline explodes
    superlinearly on a single sort->compact->reduce module, and Pallas
    interpret mode is pathologically slow)."""
    q = beam_d.shape[1]
    assert q % LANE == 0, q
    if use_pallas:
        return _beam_merge_pallas(
            beam_d, beam_s, beam_e, new_d, new_s, res_d, res_s, adm,
            ef=ef, ew=ew, expand=expand, fused=fused, kr=kr, stop=stop,
        )
    d, s, e = _jit_sortkill(
        beam_d, beam_s, jnp.asarray(beam_e, jnp.int32), new_d, new_s
    )
    d, s, e = _jit_compact(d, s, e, ef)
    oe, misc = _jit_select(d, s, e, expand, stop)
    if fused:
        ra, rb = _jit_result_sortkill(res_d, res_s, new_d, new_s, adm)
        ord_, ors = _jit_result_compact(ra, rb, kr)
        return d, s, oe, misc, ord_, ors
    return d, s, oe, misc, None, None


@partial(
    jax.jit,
    static_argnames=("ef", "ew", "expand", "fused", "kr", "stop"),
)
def _beam_merge_pallas(
    beam_d, beam_s, beam_e, new_d, new_s, res_d=None, res_s=None, adm=None,
    *, ef, ew, expand, fused, kr=0, stop=None,
):
    q = beam_d.shape[1]
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
            _merge_kernel, ef=ef, ew=ew, expand=expand, fused=fused, kr=kr,
            stop=stop,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*args)
    if fused:
        return outs[0], outs[1], outs[2], outs[3], outs[4], outs[5]
    return outs[0], outs[1], outs[2], outs[3], None, None


# -- fully fused expand+score+merge kernel ------------------------------------
#
# One Pallas kernel per loop iteration consuming the XLA row gather
# DIRECTLY: grid (Q/LANE, E), each step scores one expanded node's packed
# row block for 128 queries (MXU, bit-equal to _gather_score's einsum),
# accumulates (dist, slot) into VMEM scratch, and on the last expand-step
# runs the whole _merge_body in place. Removes every intermediate HBM
# round-trip of the split path (the gathered rows are read once, the
# [ew, Q] candidate arrays never leave VMEM) — the split path's
# reshape/diagonal/transpose glue between the gather and the merge was
# ~40% of its iteration wall time.


def _kernel_eye(n: int, dtype):
    """In-kernel identity (no captured consts in Pallas kernels)."""
    return (
        lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(dtype)


def _t2d(x):
    """Exact MXU transpose of [A, B] -> [B, A] via an identity dot: every
    output element is 1.0 * x[b, a] accumulated once, so the result is
    bit-exact for f32 and bf16 inputs alike."""
    a = x.shape[0]
    return lax.dot_general(
        x, _kernel_eye(a, x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
    )


SCORE_GROUP = 8  # queries per MXU scoring dot (matches _score_rows GROUP)


def _score_packed_block(row, qb, qn_row, node_row, W, d, ndig):
    """Score one expand-step's packed rows for a 128-query block.

    row [L, W*d + (1+ndig)*W] bf16, qb [L, d] bf16, qn_row [1, L] f32,
    node_row [1, L] i32 (the expanded node per query, -1 = none).
    Returns (nd [W, L] f32, ns [W, L] i32) in the merge kernel's
    rows-on-sublanes orientation.

    Bit-parity with _score_rows: the inner product contracts d=128 in a
    single MXU tile on identical bf16 values (the group transpose is an
    exact identity dot), the same property ops/ivf_sparse.bf16_domain
    already relies on for seed/rediscovery dedup.
    """
    L = row.shape[0]
    g = SCORE_GROUP
    ip_groups = []
    for g0 in range(L // g):
        seg = row[g0 * g : (g0 + 1) * g, : W * d].reshape(g * W, d)
        seg_t = lax.dot_general(          # [d, g*W] exact bf16 transpose
            seg, _kernel_eye(g * W, seg.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=seg.dtype,
        )
        ipg = lax.dot_general(            # [g, g*W] f32 (one d-tile on MXU)
            qb[g0 * g : (g0 + 1) * g, :], seg_t,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # diagonal extract: row i's own candidates live at cols [i*W, i*W+W)
        ipg2 = ipg.reshape(g * g, W)
        ip_groups.append(
            jnp.concatenate(
                [ipg2[(g + 1) * i : (g + 1) * i + 1] for i in range(g)],
                axis=0,
            )
        )
    ip = jnp.concatenate(ip_groups, axis=0)            # [L, W] f32
    ar = row[:, W * d :].astype(jnp.float32)           # [L, (1+ndig)*W]
    ar_t = _t2d(ar)                                    # [(1+ndig)*W, L]
    ip_t = _t2d(ip)                                    # [W, L]
    nsq_t = ar_t[:W]
    a1_t = ar_t[W : 2 * W]
    for i in range(1, ndig):
        a1_t = a1_t + ar_t[(i + 1) * W : (i + 2) * W] * float(128 ** i)
    neigh_t = a1_t.astype(jnp.int32) - 1               # [W, L]
    ok = (node_row >= 0) & (neigh_t >= 0)
    nd = jnp.maximum(qn_row + nsq_t - 2.0 * ip_t, 0.0)
    nd = jnp.where(ok, nd, INF)
    ns = jnp.where(ok, neigh_t, SENT)
    return nd, ns


def _fused_expand_kernel(
    nodes_ref,                 # [1, 1, L] i32
    rows_ref,                  # [1, L, row_len] bf16
    qb_ref,                    # [L, d] bf16
    qn_ref,                    # [1, L] f32
    bd_ref, bs_ref, be_ref,    # [ef, L]
    od_ref, osl_ref, oe_ref, misc_ref,
    nd_acc, ns_acc,            # scratch [E*W, L]
    *, ef, W, d, ndig, expand, stop,
):
    e = pl.program_id(1)
    nd, ns = _score_packed_block(
        rows_ref[0], qb_ref[:], qn_ref[:], nodes_ref[0], W, d, ndig
    )
    nd_acc[pl.ds(e * W, W), :] = nd
    ns_acc[pl.ds(e * W, W), :] = ns

    @pl.when(e == expand - 1)
    def _():
        od, osl, oe, misc, _, _ = _merge_body(
            bd_ref[:], bs_ref[:], be_ref[:], nd_acc[:], ns_acc[:],
            None, None, None,
            ef=ef, ew=expand * W, expand=expand, fused=False, kr=0,
            stop=stop,
        )
        od_ref[:] = od
        osl_ref[:] = osl
        oe_ref[:] = oe
        misc_ref[:] = misc


@partial(
    jax.jit,
    static_argnames=("ef", "W", "d", "ndig", "expand", "stop", "interpret"),
)
def fused_expand_merge(
    nodes,    # [E, Q] i32 nodes to expand (-1 = none)
    rows,     # [E, Q, row_len] bf16 gathered packed rows
    qb,       # [Q, d] bf16
    qn,       # [Q] f32
    beam_d, beam_s, beam_e,   # [ef, Q]
    *, ef, W, d, ndig, expand, stop=None, interpret=False,
):
    """One loop iteration's score+merge as a single Pallas kernel over the
    pre-gathered packed rows. Unfiltered (fused=False) searches only — the
    result-admission path needs an `allowed[slot]` gather the kernel cannot
    issue. Returns (beam_d', beam_s', beam_e', misc).

    Layouts: nodes rides as [E, 1, Q] and rows as [E, Q, row_len] so every
    BlockSpec's trailing two dims are (8k, 128k)-aligned or whole — Mosaic
    rejects blocks like (1, 128) over an (8, 2048) array."""
    q = beam_d.shape[1]
    assert q % LANE == 0, q
    grid = (q // LANE, expand)

    def col(rows_, imap):
        return pl.BlockSpec((rows_, LANE), imap, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1, LANE), lambda qi, e: (e, 0, qi),
                     memory_space=pltpu.VMEM),                # nodes
        pl.BlockSpec(
            (1, LANE, rows.shape[2]), lambda qi, e: (e, qi, 0),
            memory_space=pltpu.VMEM,
        ),                                                    # rows
        pl.BlockSpec((LANE, d), lambda qi, e: (qi, 0),
                     memory_space=pltpu.VMEM),                # qb
        col(1, lambda qi, e: (0, qi)),                        # qn
        col(ef, lambda qi, e: (0, qi)),                       # beam_d
        col(ef, lambda qi, e: (0, qi)),                       # beam_s
        col(ef, lambda qi, e: (0, qi)),                       # beam_e
    ]
    out_specs = [
        col(ef, lambda qi, e: (0, qi)),
        col(ef, lambda qi, e: (0, qi)),
        col(ef, lambda qi, e: (0, qi)),
        col(MISC_ROWS, lambda qi, e: (0, qi)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ef, q), jnp.float32),
        jax.ShapeDtypeStruct((ef, q), jnp.int32),
        jax.ShapeDtypeStruct((ef, q), jnp.int32),
        jax.ShapeDtypeStruct((MISC_ROWS, q), jnp.int32),
    ]
    return pl.pallas_call(
        partial(
            _fused_expand_kernel, ef=ef, W=W, d=d, ndig=ndig,
            expand=expand, stop=stop,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((expand * W, LANE), jnp.float32),
            pltpu.VMEM((expand * W, LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        nodes.reshape(expand, 1, q), rows, qb, qn.reshape(1, q),
        beam_d, beam_s, beam_e,
    )


# -- full search orchestration -------------------------------------------------


def beam_search_blocked(
    queries, entry, nbr_vecs, aux, vectors, sqnorms,
    allowed, sq_thresh, ef, k, expand, max_iters, fused,
    use_pallas: bool = True, seeds=None, stop=None, fuse: bool = False,
):
    """Blocked-gather lockstep beam search (see _beam_search_jit).

    use_pallas=False runs a host-driven python loop over the per-phase CPU
    jit modules instead of one jitted while_loop — functionally identical;
    exists because XLA:CPU cannot compile the fused body (see
    beam_merge_step).

    seeds=(seed_d, seed_s) [Q, ef] initializes the beam from an IVF probe
    scan instead of the entry point (see _search_init); stop overrides the
    termination bound row (default ef)."""
    seed_d, seed_s = seeds if seeds is not None else (None, None)
    if use_pallas:
        return _beam_search_jit(
            queries, entry, nbr_vecs, aux, vectors, sqnorms,
            allowed, sq_thresh, ef, k, expand, max_iters, fused,
            stop, seed_d, seed_s,
            fuse and aux is None and not fused,
        )
    return _beam_search_cpu(
        queries, entry, nbr_vecs, aux, vectors, sqnorms,
        allowed, sq_thresh, ef, k, expand, int(max_iters), fused,
        stop, seed_d, seed_s,
    )


GROUP = 8  # queries sharing one MXU distance matmul (see _gather_score)


def _aux_digits(cap: int) -> int:
    """Base-128 digits needed to hold slot+1 for a cap-row table (each
    digit is exact in bfloat16: integers 0..127)."""
    ndig = 1
    while (128 ** ndig) <= cap:
        ndig += 1
    return ndig


def _aux_planes(adj_rows, nsq, cap: int):
    """One bf16 aux row per node: [sqn | base-128 digit planes of slot+1]
    ([R, (1+ndig)*W]). Folds the former separate adj (i32) and sqnorm
    (f32) gathers into a single row-count-bound gather; -1 padding encodes
    as 0. sqn rides bf16 — routing distances are bf16-domain anyway and
    results are re-scored exactly in f32 (_search_finalize)."""
    a1 = adj_rows + 1
    planes = [nsq.astype(jnp.bfloat16)]
    for i in range(_aux_digits(cap)):
        planes.append(((a1 >> (7 * i)) & 127).astype(jnp.bfloat16))
    return jnp.concatenate(planes, axis=1)


def _table_width(nbr_vecs, d: int) -> int:
    """Neighborhood width W of either routing-table layout: blocked
    [cap, W, d] (aux separate) or PACKED [cap, W*(d + 1 + ndig)] (vectors
    and aux planes concatenated per row, see build_packed_table)."""
    if nbr_vecs.ndim == 3:
        return nbr_vecs.shape[1]
    cap, row_len = nbr_vecs.shape
    return row_len // (d + 1 + _aux_digits(cap))


def _score_rows(qb, qn, nv, ar, node_ok, W, ndig, ew):
    """Common scoring tail over gathered rows: decode the aux digit planes,
    run the GROUPED distance matmul, and mask. nv [Q, E, W, d] bf16,
    ar [Q, E, (1+ndig)W] f32.

    A per-query [1, d] x [d, W] matvec wastes 127/128 of the MXU's
    systolic array, and profiling showed that einsum was the iteration's
    single largest cost (~1.6 of 2.8 ms at E=8/Q=2048/W=32). Instead,
    GROUP queries share one real [G, d] x [d, G*E*W] matmul and the
    cross-query distance blocks are discarded by a diagonal extract —
    G^2*E*W MXU flops for G*E*W useful distances, 44% faster end-to-end
    (scripts/profile_gatherext.py). Returns (nd, ns, ok) as [ew, Q]."""
    Q, E, _, d = nv.shape
    g = GROUP
    assert Q % g == 0, (Q, g)
    ng = Q // g
    nsq = ar[..., :W].reshape(Q, ew)
    a1 = ar[..., W:2 * W]
    for i in range(1, ndig):
        a1 = a1 + ar[..., (i + 1) * W:(i + 2) * W] * float(128 ** i)
    neigh3 = a1.astype(jnp.int32) - 1                    # [Q, E, W]
    ok3 = node_ok[:, :, None] & (neigh3 >= 0)
    lhs = qb.reshape(ng, g, d)
    rhs = nv.reshape(ng, g * ew, d)
    ipg = jnp.einsum(
        "gqd,gkd->gqk", lhs, rhs, preferred_element_type=jnp.float32
    )                                                    # [ng, g, g*ew]
    ipd = jnp.diagonal(
        ipg.reshape(ng, g, g, ew), axis1=1, axis2=2
    )                                                    # [ng, ew, g]
    ip = ipd.transpose(0, 2, 1).reshape(Q, ew)
    okf = ok3.reshape(Q, ew)
    nd = jnp.maximum(qn[:, None] + nsq - 2.0 * ip, 0.0)
    nd = jnp.where(okf, nd, INF).T                       # [ew, Q]
    ns = jnp.where(okf, neigh3.reshape(Q, ew), SENT).T
    return nd, ns, okf.T


def _gather_score(qb, qn, nbr_vecs, aux, nodes, ew):
    """Expand `nodes` [E, Q] into scored neighbor candidates.

    Two layouts (same math, bit-identical outputs — pinned by
    tests/test_beam_kernel.py):
    - blocked (aux is an array): TWO row-count-bound gathers — the bf16
      neighbor-vector block and the aux row.
    - PACKED (aux is None): ONE gather of the concatenated row. The v5e
      gather is row-count-bound (~29 ns/row regardless of 128 B-8 KB row
      size), so folding the aux planes into the vector row halves the
      per-iteration gather row count."""
    E, Q = nodes.shape
    d = qb.shape[1]
    nodes_t = nodes.T                                    # [Q, E]
    node_ok = nodes_t >= 0
    nc = jnp.maximum(nodes_t, 0)
    if aux is None:
        cap, row_len = nbr_vecs.shape
        ndig = _aux_digits(cap)
        W = row_len // (d + 1 + ndig)
        rows = nbr_vecs[nc]                              # [Q, E, row_len]
        nv = rows[..., : W * d].reshape(Q, E, W, d)
        ar = rows[..., W * d:].astype(jnp.float32)       # [Q, E, (1+ndig)W]
    else:
        cap, W, _ = nbr_vecs.shape
        ndig = aux.shape[1] // W - 1
        nv = nbr_vecs[nc]                                # [Q, E, W, d]
        ar = aux[nc].astype(jnp.float32)                 # [Q, E, (1+ndig)W]
    return _score_rows(qb, qn, nv, ar, node_ok, W, ndig, ew)


def _search_init(queries, entry, vectors, sqnorms, allowed, sq_thresh,
                 ef, expand, fused, kr, seed_d=None, seed_s=None):
    Q, _ = queries.shape
    qn = jnp.sum(queries * queries, axis=1)
    qb = queries.astype(jnp.bfloat16)
    if seed_d is not None:
        # IVF-seeded start: the beam begins as the top candidates of a
        # cluster-probe scan (ops/ivf_sparse bf16_domain — distances are
        # bit-equal to in-loop rediscovery so sort-kill dedup holds).
        # seed_d/seed_s arrive [Q, n_seed] (n_seed <= ef) sorted
        # (dist, slot) asc with (inf, SENT) padding — the beam's loop
        # invariant; rows past n_seed start empty. Seeding ~stop rows
        # instead of ef keeps the probe scan's top-k selection at the
        # proven flat-pipeline width (kb=128) — the k=256 variant's
        # 32k-row bitonic costs more than the whole beam loop.
        n_seed = seed_d.shape[1]
        beam_d = jnp.asarray(seed_d, jnp.float32).T        # [n_seed, Q]
        beam_s = jnp.asarray(seed_s, jnp.int32).T
        if n_seed < ef:
            beam_d = jnp.concatenate(
                [beam_d, jnp.full((ef - n_seed, Q), INF, jnp.float32)]
            )
            beam_s = jnp.concatenate(
                [beam_s, jnp.full((ef - n_seed, Q), SENT, jnp.int32)]
            )
        # Probe-starved queries (the seed scan's per-group chunk budget can
        # drop ALL of a query's probes in probe-diverse groups —
        # ops/ivf_sparse module docstring, divergence b) fall back to the
        # classic entry start; distance in the bf16 rediscovery domain
        # (same formula as _gather_score) so the in-loop duplicate dedups.
        empty = jnp.all(beam_s == SENT, axis=0)            # [Q]
        ev_b = vectors[entry].astype(jnp.bfloat16)
        e_ip = jnp.einsum(
            "qd,qd->q", qb, ev_b, preferred_element_type=jnp.float32
        )
        e_d = jnp.maximum(
            qn
            + sqnorms[entry].astype(jnp.bfloat16).astype(jnp.float32)
            - 2.0 * e_ip,
            0.0,
        )
        beam_d = beam_d.at[0].set(jnp.where(empty, e_d, beam_d[0]))
        beam_s = beam_s.at[0].set(jnp.where(empty, entry, beam_s[0]))
        valid0 = beam_s != SENT
        first_e = (
            lax.broadcasted_iota(jnp.int32, (ef, Q), 0) < expand
        ) & valid0
        beam_e = first_e.astype(jnp.int32)
        nodes = jnp.where(first_e[:expand], beam_s[:expand], -1)
        if fused:
            adm0 = (
                valid0
                & allowed[jnp.where(valid0, beam_s, 0)]
                & (beam_d <= sq_thresh)
            ).astype(jnp.int32)
            rd0 = jnp.full((kr, Q), INF, jnp.float32)
            rs0 = jnp.full((kr, Q), SENT, jnp.int32)
            ra, rb = _phase_result_sortkill(rd0, rs0, beam_d, beam_s, adm0)
            res_d, res_s = _phase_result_compact(ra, rb, kr)
        else:
            res_d = jnp.zeros((1, Q), jnp.float32)
            res_s = jnp.zeros((1, Q), jnp.int32)
        return qn, qb, beam_d, beam_s, beam_e, nodes, res_d, res_s
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
    return qn, qb, beam_d, beam_s, beam_e, nodes, res_d, res_s


def _search_finalize(queries, qn, vectors, sqnorms, allowed, sq_thresh,
                     beam_d, beam_s, res_d, res_s, k, fused,
                     use_pallas=True):
    Q = queries.shape[0]
    if fused:
        cd, cs = res_d, res_s                             # [kr, Q]
    else:
        cd, cs = beam_d, beam_s                           # [ef, Q]
    # Exact-rerank window: the gather below is row-count-bound (~29 ns/row
    # on the v5e), so its width is real wall time at large Q — cap it at
    # 1.28x k (e.g. 128 rows for k=100; measured no recall@100 change vs a
    # 2x window, and ~40% off the finalize gather).
    kk = min(max(2 * k, 64), max(_next_pow2(k), 64), cd.shape[0])
    # candidate arrays are already column-lanes [C, Q]: the VMEM bitonic
    # (ops/sortnet.topk_cl) replaces the [Q, 256] XLA variadic sort that
    # dominated the fixed finalize cost (r5 probe: 13 -> ~8 ms/batch)
    from comet_tpu.ops.sortnet import topk_cl

    _, ssv = topk_cl(cd, cs, kk, interpret=not use_pallas)
    top_s = ssv[:kk].T
    tv = vectors[jnp.maximum(top_s, 0)]
    ip = jnp.einsum(
        "qd,qkd->qk", queries, tv,
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    # norms recomputed from the gathered rows: a second sqnorms[top_s]
    # gather costs as much as the vector gather itself (row-count-bound,
    # ~29 ns/row — CLAUDE.md), while this VPU reduce rides the rows
    # already fetched. Same f32 minor-axis sum that produced the stored
    # sqnorms (indexes/hnsw.py _ensure_device), so values match.
    tn = jnp.sum(tv * tv, axis=-1)
    td = jnp.maximum(qn[:, None] + tn - ip * 2.0, 0.0)
    # slot-sort dedup — needed in BOTH modes: the entry node's init
    # distance is f32 while its in-loop rediscovery is bf16, so its two
    # copies carry different keys and survive the in-kernel dedup —
    # plus admission mask and threshold re-check on exact distances
    s2, d2 = lax.sort((top_s, td), dimension=1, num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros((Q, 1), bool), s2[:, 1:] == s2[:, :-1]], axis=1
    )
    ok_row = (
        ~dup
        & (s2 != SENT)
        & allowed[jnp.where(s2 == SENT, 0, s2)]
        & (d2 <= sq_thresh)
    )
    td = jnp.where(ok_row, d2, INF)
    top_s = jnp.where(ok_row, s2, SENT)
    sd2, ss2 = lax.sort((td, top_s), dimension=1, num_keys=2)
    return sd2[:, :k], ss2[:, :k]


def _beam_search_cpu(queries, entry, nbr_vecs, aux, vectors,
                     sqnorms, allowed, sq_thresh, ef, k, expand, max_iters,
                     fused, stop=None, seed_d=None, seed_s=None):
    """Host-driven loop for the CPU/test backend; same math as
    _beam_search_jit, phases compiled as separate XLA modules."""
    queries = jnp.asarray(queries, jnp.float32)
    entry = jnp.asarray(entry, jnp.int32)
    vectors = jnp.asarray(vectors, jnp.float32)
    sqnorms = jnp.asarray(sqnorms, jnp.float32)
    allowed = jnp.asarray(allowed)
    ew = expand * _table_width(nbr_vecs, queries.shape[1])
    kr = _next_pow2(max(2 * k, 64)) if fused else 0
    qn, qb, beam_d, beam_s, beam_e, nodes, res_d, res_s = _search_init(
        queries, entry, vectors, sqnorms, allowed, sq_thresh,
        ef, expand, fused, kr, seed_d, seed_s,
    )
    for _ in range(int(max_iters)):
        nd, ns, ok = _gather_score(qb, qn, nbr_vecs, aux, nodes, ew)
        adm = None
        if fused:
            adm = (
                ok & allowed[jnp.maximum(jnp.where(ns == SENT, 0, ns), 0)]
                & (nd <= sq_thresh)
            ).astype(jnp.int32)
        beam_d, beam_s, beam_e, misc, res_d2, res_s2 = beam_merge_step(
            beam_d, beam_s, beam_e, nd, ns, res_d, res_s, adm,
            ef=ef, ew=ew, expand=expand, fused=fused, kr=kr, stop=stop,
            use_pallas=False,
        )
        if fused:
            res_d, res_s = res_d2, res_s2
        misc_np = np.asarray(misc)
        nodes = jnp.asarray(misc_np[:expand])
        if not (misc_np[expand] > 0).any():
            break
    return _search_finalize(
        queries, qn, vectors, sqnorms, allowed, sq_thresh,
        beam_d, beam_s, res_d, res_s, k, fused, use_pallas=False,
    )


@partial(
    jax.jit,
    static_argnames=("ef", "k", "expand", "fused", "stop", "fuse"),
)
def _beam_search_jit(
    queries,     # [Q, d] f32 preprocessed, Q % LANE == 0
    entry,       # [Q] i32 layer-0 entry slots
    nbr_vecs,    # [cap, W, d] bf16 neighborhood-blocked vectors
    aux,         # [cap, (1+ndig)*W] bf16 aux rows (_aux_planes)
    vectors,     # [cap, d] f32 (entry distances + exact rerank)
    sqnorms,     # [cap] f32
    allowed,     # [cap] bool result-admission mask
    sq_thresh,   # scalar f32 threshold on the kernel's squared distances
    ef: int,
    k: int,
    expand: int,
    max_iters,            # DYNAMIC: appears only in the loop bound, so a
                          # traced scalar avoids a recompile per sweep value
    fused: bool,
    stop: int | None = None,
    seed_d=None,          # [Q, ef] f32 bf16-domain seed distances, or None
    seed_s=None,          # [Q, ef] i32 seed slots (SENT padding), or None
    fuse: bool = False,   # one fused expand+score+merge kernel per
                          # iteration (packed table, fused=False only)
):
    """Blocked-gather lockstep beam search, one dispatch (TPU).

    Distances inside the loop are SQUARED L2 in bf16 (cosine rides the same
    kernel via preprocessed inputs, see hnsw.py); the final top candidates
    are re-scored exactly in f32 before the (score, slot) ordering, so
    returned scores match the metric contract. Returns (res_d [Q, k],
    res_s [Q, k]) ascending with slot tie-break; empty = (inf, SENT).
    """
    Q, d = queries.shape
    if queries.dtype != jnp.float32:
        queries = queries.astype(jnp.float32)  # narrow-wire cast in-jit
    ew = expand * _table_width(nbr_vecs, d)
    kr = _next_pow2(max(2 * k, 64)) if fused else 0

    qn, qb, beam_d, beam_s, beam_e, nodes, res_d, res_s = _search_init(
        queries, entry, vectors, sqnorms, allowed, sq_thresh,
        ef, expand, fused, kr, seed_d, seed_s,
    )
    max_iters = jnp.asarray(max_iters, jnp.int32)

    def cond(state):
        i, *_, alive = state
        return (i < max_iters) & alive

    if fuse:
        assert aux is None and not fused
        cap, row_len = nbr_vecs.shape
        ndig = _aux_digits(cap)
        W = row_len // (d + 1 + ndig)

    def body(state):
        i, beam_d, beam_s, beam_e, nodes, res_d, res_s, _ = state
        if fuse:
            rows = nbr_vecs[jnp.maximum(nodes, 0)]        # [E, Q, row_len]
            beam_d, beam_s, beam_e, misc = fused_expand_merge(
                nodes, rows, qb, qn, beam_d, beam_s, beam_e,
                ef=ef, W=W, d=d, ndig=ndig, expand=expand, stop=stop,
            )
            nodes = misc[:expand]
            alive = jnp.any(misc[expand] > 0)
            return (i + 1, beam_d, beam_s, beam_e, nodes, res_d, res_s,
                    alive)
        nd, ns, ok = _gather_score(qb, qn, nbr_vecs, aux, nodes, ew)
        adm = None
        if fused:
            adm = (
                ok & allowed[jnp.maximum(jnp.where(ns == SENT, 0, ns), 0)]
                & (nd <= sq_thresh)
            ).astype(jnp.int32)
        beam_d, beam_s, beam_e, misc, res_d2, res_s2 = beam_merge_step(
            beam_d, beam_s, beam_e, nd, ns, res_d, res_s, adm,
            ef=ef, ew=ew, expand=expand, fused=fused, kr=kr, stop=stop,
            use_pallas=True,
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
    return _search_finalize(
        queries, qn, vectors, sqnorms, allowed, sq_thresh,
        beam_d, beam_s, res_d, res_s, k, fused,
    )


@jax.jit
def nearest_entry(queries, mem_vecs_t, mem_sqn, mem_slots):
    """Layer-0 entry selection: the EXACT nearest upper-layer member per
    query, as one MXU matmul over all level>=1 nodes (~n/m of the corpus).

    Replaces lockstep greedy descent for search: descent's per-hop
    neighbor gathers + batch matvecs cost tens of ms per 2048-query batch
    (the hop count is the worst query's), while this is a single dense
    [Q, d] x [d, n/m] bf16 matmul — and its entry is strictly closer than
    (or equal to) what greedy descent converges to, so recall can only
    improve. queries [Q, d] f32; mem_vecs_t [d, M] bf16; mem_sqn [M] f32
    (+inf on padding); mem_slots [M] i32. Returns [Q] i32 layer-0 slots."""
    ip = jnp.dot(
        queries.astype(jnp.float32).astype(jnp.bfloat16), mem_vecs_t,
        preferred_element_type=jnp.float32,
    )                                                   # [Q, M]
    d = mem_sqn[None, :] - 2.0 * ip                     # + qn is rank-free
    return mem_slots[jnp.argmin(d, axis=1)]


@jax.jit
def build_blocked_tables(adj, vectors, sqnorms):
    """One-time build of the neighborhood-blocked routing tables:
    nbr_vecs[p, j] = vectors[adj[p, j]] (bf16) plus the per-node aux row
    (sqnorms + adjacency digit planes, see _aux_planes)."""
    nc = jnp.maximum(adj, 0)
    nv = vectors[nc].astype(jnp.bfloat16)
    nsq = jnp.where(adj >= 0, sqnorms[nc], 0.0)
    return nv, _aux_planes(adj, nsq, adj.shape[0])


@partial(jax.jit, donate_argnums=(0, 1))
def update_blocked_rows(nbr_vecs, aux, rows, adj_rows, vectors, sqnorms):
    """Resync neighborhood-blocked rows after adjacency updates (donated)."""
    nc = jnp.maximum(adj_rows, 0)
    v = vectors[nc]                                # [R, W, d]
    nbr_vecs = nbr_vecs.at[rows].set(v.astype(nbr_vecs.dtype))
    nsq = jnp.where(adj_rows >= 0, sqnorms[nc], 0.0)
    aux = aux.at[rows].set(
        _aux_planes(adj_rows, nsq, nbr_vecs.shape[0])
    )
    return nbr_vecs, aux


@jax.jit
def build_packed_table(adj, vectors, sqnorms):
    """PACKED routing-table layout: one bf16 row per node holding the
    flattened neighbor-vector block AND the aux planes —
    [cap, W*d + (1+ndig)*W]. The search gather then fetches a node's
    entire expansion payload in ONE row (the v5e gather is row-count-bound
    at ~29 ns/row independent of row size, so two same-index gathers cost
    twice one). Row length stays a multiple of 128 lanes for d % 128 == 0.
    Same scored outputs as the blocked pair, bit-for-bit."""
    nc = jnp.maximum(adj, 0)
    nv = vectors[nc].astype(jnp.bfloat16)          # [cap, W, d]
    nsq = jnp.where(adj >= 0, sqnorms[nc], 0.0)
    aux = _aux_planes(adj, nsq, adj.shape[0])
    cap, W, d = nv.shape
    return jnp.concatenate([nv.reshape(cap, W * d), aux], axis=1)


def build_packed_table_chunked(adj, vectors, sqnorms, chunk=1 << 16):
    """build_packed_table in donated row chunks: the one-shot builder
    materializes the gathered [cap, W, d] block AND the concat output
    (~2x the table) — at 1M x W=32 x d=128 that is ~18 GB of transients,
    an HBM OOM on a 16 GB v5e. Peak here is table + one chunk."""
    cap, W = adj.shape
    if cap <= chunk:
        return build_packed_table(adj, vectors, sqnorms)
    d = vectors.shape[1]
    row_len = W * d + (1 + _aux_digits(cap)) * W
    packed = jnp.zeros((cap, row_len), jnp.bfloat16)
    for lo in range(0, cap, chunk):
        hi = min(lo + chunk, cap)
        packed = update_packed_rows(
            packed, jnp.arange(lo, hi, dtype=jnp.int32), adj[lo:hi],
            vectors, sqnorms,
        )
    return packed


@partial(jax.jit, donate_argnums=(0,))
def update_packed_rows(packed, rows, adj_rows, vectors, sqnorms):
    """Resync packed rows after adjacency updates (donated)."""
    nc = jnp.maximum(adj_rows, 0)
    v = vectors[nc]                                # [R, W, d]
    nsq = jnp.where(adj_rows >= 0, sqnorms[nc], 0.0)
    aux = _aux_planes(adj_rows, nsq, packed.shape[0])
    r, W, d = v.shape
    row = jnp.concatenate(
        [v.astype(packed.dtype).reshape(r, W * d), aux.astype(packed.dtype)],
        axis=1,
    )
    return packed.at[rows].set(row)
