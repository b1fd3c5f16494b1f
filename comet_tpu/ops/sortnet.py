"""Exact top-k via bitonic sorting networks (Pallas TPU kernel).

Replaces the XLA `lax.top_k` / variadic `lax.sort` selection stages of the
flat scan (reference hot loop: flat_index_search.go:254-291), which profile
at 4-6 ms per [256, 8k-16k] call on a v5e — selection, not the distance
matmul, dominates the exact scan. This kernel runs the classic
bitonic-merge-sort tournament entirely in VMEM/registers:

  layout:     [C, L] — candidates along SUBLANES, queries along LANES, so a
              compare-exchange with partner `p XOR j` is two cheap sublane
              rolls + selects, never a lane permutation.
  total order: ascending lexicographic (value, index) — the determinism
              contract (ties -> lower slot) is built into the comparator, so
              results are bit-identical to the numpy oracle's stable sort.
  algorithm:  sort each K-chunk with alternating directions (log^2 K
              compare-exchange stages), then log2(C/K) merge rounds, each
              keeping the lower half of a bitonic 2K sequence and cleaning
              it up in log2 K stages. Exactness: merging two sorted K-lists
              and keeping the smallest K is exact, and top-k is associative
              under that merge.

All stage masks are static numpy constants baked into the compiled kernel.
The same pure-jnp body runs under `interpret=True` for CPU-backend tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128          # queries per kernel block (lane dimension)
MAX_BLOCK_C = 1024  # candidate rows per kernel block (VMEM stack budget)

INF = jnp.inf
IDX_SENTINEL = np.int32(2**31 - 1)


def _lex_less(av, ai, bv, bi):
    """(av, ai) < (bv, bi) ascending lexicographic."""
    return (av < bv) | ((av == bv) & (ai < bi))


def _roll_sub(x, shift):
    """Circular roll along the sublane (candidate) axis.

    out[p] = x[(p - shift) mod C]; jnp.roll lowers to a sublane
    concat+slice, which Mosaic handles natively (pltpu.roll requires
    non-negative shifts and is kernel-only; jnp.roll also works in the
    pure-XLA/interpreter paths used by CPU tests).
    """
    return jnp.roll(x, shift, axis=0)


def _rows_iota(c):
    """[C, 1] int32 row indices (TPU needs >=2D iota; no captured consts
    are allowed in Pallas kernels, so masks derive from iota in-kernel)."""
    return jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)


def _compare_exchange(v, i, j, asc_rows):
    """One bitonic stage: partner = row XOR j, per-row direction.

    asc_rows: bool [C, 1] — True where the row keeps the smaller element
    (i.e. it's the 'low' end of an ascending compare).
    """
    c = v.shape[0]
    # rows with bit j unset partner with row+j, others with row-j
    lo = (_rows_iota(c) & j) == 0
    pv = jnp.where(lo, _roll_sub(v, -j), _roll_sub(v, j))
    pi = jnp.where(lo, _roll_sub(i, -j), _roll_sub(i, j))
    keep_small = asc_rows == lo
    partner_less = _lex_less(pv, pi, v, i)
    # All (value, index) pairs are distinct (indices are unique per column;
    # padding rows are identical but interchangeable), so self_less is
    # exactly ~partner_less and take_partner reduces to an XNOR. Boolean
    # algebra, not select_n: Mosaic can't select between i1 vectors.
    take_partner = keep_small == partner_less
    return jnp.where(take_partner, pv, v), jnp.where(take_partner, pi, i)


def _sort_chunks(v, i, k, first_desc=False):
    """Bitonic-sort each K-row chunk; chunk directions alternate, the first
    chunk ascending (or descending when first_desc)."""
    c = v.shape[0]
    rows = _rows_iota(c)
    chunk_desc = ((rows & k) != 0) ^ first_desc
    q = rows & (k - 1)  # within-chunk position drives the network pattern
    kk = 2
    while kk <= k:
        # ascending-within-network iff (q & kk) == 0, flipped on desc chunks
        asc = ((q & kk) == 0) ^ chunk_desc
        j = kk // 2
        while j >= 1:
            v, i = _compare_exchange(v, i, j, asc)
            j //= 2
        kk *= 2
    return v, i


def _merge_halve(v, i, k, first_desc=False):
    """[C, L] alternating-sorted K-chunks -> [C/2, L], still alternating."""
    c = v.shape[0]
    # adjacent (asc, desc) chunk pairs form bitonic 2K sequences; keep the
    # elementwise lexicographic min of (p, p+K) within each pair
    half = _roll_sub(v, -k)
    half_i = _roll_sub(i, -k)
    lower = _lex_less(v, i, half, half_i)
    lv = jnp.where(lower, v, half)
    li = jnp.where(lower, i, half_i)
    # compact the low halves (static reshape-slice, no rolls)
    lv = lv.reshape(c // (2 * k), 2 * k, -1)[:, :k, :].reshape(c // 2, -1)
    li = li.reshape(c // (2 * k), 2 * k, -1)[:, :k, :].reshape(c // 2, -1)
    # cleanup: each K-chunk is bitonic; log2(K) stages sort it; alternate
    # directions so the next round sees (asc, desc) pairs again
    c2 = c // 2
    asc = ((_rows_iota(c2) & k) == 0) ^ first_desc
    j = k // 2
    while j >= 1:
        lv, li = _compare_exchange(lv, li, j, asc)
        j //= 2
    return lv, li


def topk_body(v, i, k, first_desc=False):
    """Pure-jnp exact top-k reduce: [C, L] -> ([k, L], [k, L]) sorted
    ascending (descending when first_desc).

    C and k must be powers of two, k <= C. Runs inside the Pallas kernel
    (VMEM-resident) or standalone under XLA/interpreter for tests.
    """
    v, i = _sort_chunks(v, i, k, first_desc)
    while v.shape[0] > k:
        v, i = _merge_halve(v, i, k, first_desc)
    return v, i


def _kernel(v_ref, i_ref, vo_ref, io_ref, *, k):
    v, i = topk_body(v_ref[:], i_ref[:], k)
    vo_ref[:] = v
    io_ref[:] = i


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


@partial(jax.jit, static_argnames=("k", "interpret"))
def topk_cl(
    vals: jax.Array,   # [C, L] float32 — candidates x queries
    idx: jax.Array,    # [C, L] int32
    k: int,
    interpret: bool = False,
):
    """Exact top-k smallest per COLUMN, ties to the lower index.

    Returns ([k, L] values asc, [k, L] indices). Pads C to a power-of-two
    multiple of the block size with (+inf, IDX_SENTINEL) and L to the lane
    width; reduces in one or two kernel passes.
    """
    assert vals.shape == idx.shape and vals.ndim == 2
    c, l_real = vals.shape
    k = _next_pow2(max(k, 8))
    block_c = min(MAX_BLOCK_C, max(_next_pow2(c), k))

    def one_pass(v, i):
        cc, ll = v.shape
        c_pad = ((cc + block_c - 1) // block_c) * block_c
        l_pad = ((ll + LANE - 1) // LANE) * LANE
        if c_pad != cc or l_pad != ll:
            v = jnp.pad(v, ((0, c_pad - cc), (0, l_pad - ll)), constant_values=INF)
            i = jnp.pad(
                i, ((0, c_pad - cc), (0, l_pad - ll)),
                constant_values=IDX_SENTINEL,
            )
        grid = (c_pad // block_c, l_pad // LANE)
        vo, io = pl.pallas_call(
            partial(_kernel, k=k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_c, LANE), lambda a, b: (a, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_c, LANE), lambda a, b: (a, b), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k, LANE), lambda a, b: (a, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, LANE), lambda a, b: (a, b), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((grid[0] * k, l_pad), jnp.float32),
                jax.ShapeDtypeStruct((grid[0] * k, l_pad), jnp.int32),
            ],
            interpret=interpret,
        )(v, i)
        return vo, io

    v, i = vals, idx.astype(jnp.int32)
    v, i = one_pass(v, i)
    while v.shape[0] > k:
        v, i = one_pass(v, i)
    return v[:, :l_real], i[:, :l_real]


def cand_hier() -> bool:
    """COMET_CAND_HIER=0 restores the one-level candidate select (the
    hierarchical form is bit-identical — the flag exists for A/Bs).
    Read at first trace of each pipeline signature: set it before the
    first search, not mid-process."""
    import os

    return os.environ.get("COMET_CAND_HIER", "1") != "0"


def cand_topk_hier(dist3, gsel, k, *, sub=32, interpret=False):
    """Exact top-k over the member rows of the selected groups, done
    HIERARCHICALLY: equivalent to gathering all kb*group candidate rows
    and running one `topk_cl`, but with a second block-select level so the
    final bitonic sees kb2*sub rows instead of kb*group (4x fewer at the
    flat pipeline's shapes — the candidate bitonic is the select stage's
    dominant cost).

    dist3: [Q, G, group] distance tiles; gsel: [kb, Q] i32 kept group ids
    (any order — only the kept SET matters). Steps: sort the kept ids
    ascending (layout position order == global row order, so positional
    tie-breaks equal global-index tie-breaks), split each group into
    group/sub sub-blocks, keep the top-kb2 sub-blocks by (min, position)
    — exact for top-k by the docs/DESIGN.md §2 block bound since
    kb2 >= min(k, kb) — then run the exact (value, global index) bitonic
    over the kb2*sub survivors. Returns ([k2, Q] values asc, [k2, Q]
    global candidate indices), bit-identical to the flat formulation.

    Falls back to the flat formulation when the second level would not
    shrink the candidate set (small groups or kb below k, e.g. the capped
    seed scan).
    """
    from jax import lax

    Q, G, group = dist3.shape
    kb = gsel.shape[0]
    r = max(group // sub, 1)
    kpow = _next_pow2(max(k, 8))
    kb2 = min(_next_pow2(max(min(kpow, kb * r), 8)), kb * r)

    gsel_s = jnp.sort(gsel, axis=0)               # [kb, Q] ascending ids
    sel_q = gsel_s.T                              # [Q, kb]
    cand = jnp.take_along_axis(dist3, sel_q[:, :, None], axis=1)

    if kb * r <= 2 * kb2 or r <= 1:
        # no meaningful reduction: flat formulation on the gathered rows
        cand_cl = cand.reshape(Q, kb * group).T
        cidx = (
            gsel_s[:, None, :] * group
            + lax.broadcasted_iota(jnp.int32, (kb, group, Q), 1)
        ).reshape(kb * group, Q)
        return topk_cl(cand_cl, cidx, k, interpret=interpret)

    c2 = cand.reshape(Q, kb * r, sub)
    m2 = c2.min(axis=2)                           # [Q, kb*r] sub-block mins
    pos = lax.broadcasted_iota(jnp.int32, (kb * r, Q), 0)
    _, p2 = topk_cl(m2.T, pos, kb2, interpret=interpret)
    sel2 = p2[:kb2].T                             # [Q, kb2] positions
    cand2 = jnp.take_along_axis(c2, sel2[:, :, None], axis=1)
    cand_cl = cand2.reshape(Q, kb2 * sub).T       # [kb2*sub, Q]
    # global candidate index of (sub-block position p, offset t):
    #   gsel_s[p // r] * group + (p % r) * sub + t
    gidx = (
        jnp.take_along_axis(sel_q, sel2 // r, axis=1) * group
        + (sel2 % r) * sub
    )                                              # [Q, kb2]
    cidx = (
        gidx.T[:, None, :]
        + lax.broadcasted_iota(jnp.int32, (kb2, sub, Q), 1)
    ).reshape(kb2 * sub, Q)
    return topk_cl(cand_cl, cidx, k, interpret=interpret)
