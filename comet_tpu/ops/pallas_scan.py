"""Pallas TPU kernels for the exact flat scan: fused distance + masking +
in-kernel group selection, plus a fully fused single-dispatch top-k pipeline.

Profiling on the v5e (scripts/profile_*.py) shaped this design:
  1. every Python-level dispatch pays a ~2.6 ms submission floor through
     the axon tunnel, so the WHOLE batch search (distances, selection,
     gather, final ordering) compiles into ONE jitted call;
  2. XLA's top_k/variadic-sort selection costs 4-6 ms per 256-query call —
     selection, not the distance matmul, dominates; selection runs as
     bitonic networks (ops/sortnet.py) — the group stage INSIDE this
     kernel's VMEM scratch, the candidate stage in its own kernel;
  3. XLA's candidate gather runs at ~4 GB/s, so the group width trades
     gather volume against in-kernel merge work (GROUP=32 default);
  4. the [Q, d] x [N, d] einsum wastes the MXU on the transposed operand;
     the corpus is kept device-resident TRANSPOSED [d, N] so every tile is
     a native [TQ, d] x [d, TN] systolic pass.

The [Q, N] distance tile still lands in HBM (that write is ~1.3 ms/GB and
the candidate gather needs it), but it is produced and consumed inside one
dispatch. Masking trick: invalid rows carry +inf in the additive mask
vector (squared norms for L2, a 0/+inf vector for cosine) so validity rides
an existing operand. Replaces the reference's per-vector scalar loop
(flat_index_search.go:254-294) wholesale.

Exactness: block-select (see ops/topk.block_topk for the proof — the group
width does not matter, only that groups are contiguous and at least
min(k, n_groups) groups are kept). The in-kernel running selection is exact
because the k-th best group minimum only ever decreases as tiles stream,
so any finally-selected group was selected the moment it was scanned.
Determinism: the (score asc, index asc) order is built into the sort
network comparators.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comet_tpu.ops.sortnet import (
    _merge_halve,
    cand_hier,
    cand_topk_hier,
    topk_body,
    topk_cl,
)

GROUP = 128     # rows per selection group (= lane width: Mosaic cannot
                # split the minor dim below 128 for the in-kernel reduce)
TQ = 256        # query rows per grid step
TN = 2048       # corpus rows per grid step

INF = jnp.inf
IDX_SENTINEL = np.int32(2**31 - 1)  # plain numpy: jnp scalars become traced
                                    # constants that Pallas kernels reject


def _kernel(
    q_ref, qn_ref, x_ref, xn_ref, thr_ref, *rest,
    cosine, kb, group, accum_steps, nprobe,
):
    """One (query-block i, corpus-tile j) step: MXU distances -> HBM dist
    tile + per-group minima merged into a running top-kb in VMEM scratch.

    With nprobe set (IVF semantics), two extra operands follow: the rows'
    cluster assignments and each query's probed cluster ids; rows whose
    cluster is not probed by a query are masked to +inf for that query."""
    if nprobe:
        assign_ref, probes_ref = rest[0], rest[1]
        rest = rest[2:]
    dist_ref, gsel_ref, buf_v, buf_i = rest
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    new_per_step = TN // group

    # ---- distances on the MXU ------------------------------------------
    if x_ref.dtype == jnp.bfloat16:
        q = q_ref[:].astype(jnp.bfloat16)
        prec = lax.Precision.DEFAULT
    else:
        q = q_ref[:]
        prec = lax.Precision.HIGHEST
    ip = lax.dot_general(
        q, x_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    if cosine:
        dist = 1.0 - jnp.clip(ip, -1.0, 1.0) + xn_ref[:]
    else:
        dist = jnp.maximum(qn_ref[:] + xn_ref[:] - 2.0 * ip, 0.0)  # [TQ, TN]
    thr = thr_ref[0, 0]
    dist = jnp.where(dist <= thr, dist, jnp.inf)
    if nprobe:
        # probe-membership mask: OR over the query's nprobe cluster ids
        a = assign_ref[:]                      # [1, TN]
        member = probes_ref[:, 0:1] == a       # [TQ, TN]
        for p in range(1, nprobe):
            member = member | (probes_ref[:, p : p + 1] == a)
        dist = jnp.where(member, dist, jnp.inf)
    dist_ref[:] = dist

    # ---- group minima for this tile, [new_per_step, TQ] ------------------
    gmin = jnp.min(dist.reshape(TQ, new_per_step, group), axis=2).T
    gids = (
        j * new_per_step
        + jax.lax.broadcasted_iota(jnp.int32, (new_per_step, TQ), 0)
    )

    # ---- running selection ----------------------------------------------
    @pl.when(j == 0)
    def _():
        buf_v[:] = jnp.full(buf_v.shape, INF, dtype=jnp.float32)
        buf_i[:] = jnp.full(buf_i.shape, IDX_SENTINEL, dtype=jnp.int32)

    slot = kb + (j % accum_steps) * new_per_step
    buf_v[pl.ds(slot, new_per_step), :] = gmin
    buf_i[pl.ds(slot, new_per_step), :] = gids

    accum_rows = buf_v.shape[0] - kb

    @pl.when((j % accum_steps == accum_steps - 1) | (j == nj - 1))
    def _():
        # reduce the accumulated rows to their top-kb sorted DESC, merge
        # with the running ASC kb rows (concat is bitonic), keep the half
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
        # reset the accumulation area for the next window
        buf_v[pl.ds(kb, accum_rows), :] = jnp.full(
            (accum_rows, TQ), INF, dtype=jnp.float32
        )

    @pl.when(j == nj - 1)
    def _():
        gsel_ref[0, :, :] = buf_i[pl.ds(0, kb), :]


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


@partial(
    jax.jit, static_argnames=("kb", "cosine", "group", "nprobe", "interpret")
)
def fused_dist_select(
    queries: jax.Array,        # [Q, d] f32, Q % TQ == 0
    corpus_t: jax.Array,       # [d, N] f32/bf16 (TRANSPOSED), N % TN == 0
    mask_vec: jax.Array,       # [N] f32: L2 -> sqnorms (+inf invalid);
                               #          cosine -> 0 (+inf invalid)
    threshold: jax.Array,      # scalar f32 (+inf disables)
    kb: int,                   # groups to keep per query (pow2)
    cosine: bool = False,
    group: int = GROUP,
    assign: jax.Array | None = None,   # [N] i32 cluster per row (IVF mode)
    probes: jax.Array | None = None,   # [Q, nprobe] i32 probed clusters
    nprobe: int = 0,
    interpret: bool = False,
):
    """Returns (dist [Q, N] f32 (+inf on masked/over-threshold entries),
    gsel [Q//TQ, kb, TQ] i32 — the top-kb group ids per query, exact).

    IVF mode (nprobe > 0): rows whose `assign` cluster is not in the
    query's `probes` are +inf — dense masked scan with IVF semantics. On
    the MXU this beats gather-based list walking by an order of magnitude
    at 1M scale even though it touches every row."""
    Q, d = queries.shape
    N = corpus_t.shape[1]
    assert Q % TQ == 0 and N % TN == 0, (Q, N)
    new_per_step = TN // group
    # accumulate ~kb new rows between merges (>=1 tile, pow2 ratio)
    accum_steps = max(kb // new_per_step, 1)
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)  # [Q, 1]
    xn2d = mask_vec[None, :]                                # [1, N]
    thr2d = threshold.reshape(1, 1)

    in_specs = [
        pl.BlockSpec((TQ, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [queries, qn, corpus_t, xn2d, thr2d]
    if nprobe:
        in_specs.append(
            pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((TQ, nprobe), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(assign[None, :])
        operands.append(probes)

    grid = (Q // TQ, N // TN)
    return pl.pallas_call(
        partial(
            _kernel, cosine=cosine, kb=kb, group=group,
            accum_steps=accum_steps, nprobe=nprobe,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TQ, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, TQ), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, N), jnp.float32),
            jax.ShapeDtypeStruct((Q // TQ, kb, TQ), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kb + max(kb, new_per_step), TQ), jnp.float32),
            pltpu.VMEM((kb + max(kb, new_per_step), TQ), jnp.int32),
        ],
        # kb=256 shapes sit 104 KB past Mosaic's default 16 MB scoped-vmem
        # limit after the r5 libtpu update; the v5e has 128 MB of VMEM, so
        # grant headroom explicitly (r5 bench OOM at the nrefine row)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _chunk_topk(args, corpus_t, mask_vec, thr, k, kb, group, cosine,
                sqrt_out, interpret, assign=None, nprobe=0, hier=False):
    """One TQ-query chunk: distances + group select -> gather -> final
    exact top-k. All stages stay on device inside the enclosing jit."""
    if nprobe:
        qc, probes = args
    else:
        qc, probes = args, None
    G = corpus_t.shape[1] // group
    dist, gsel = fused_dist_select(
        qc, corpus_t, mask_vec, thr, kb,
        cosine=cosine, group=group,
        assign=assign, probes=probes, nprobe=nprobe,
        interpret=interpret,
    )
    gsel = gsel[0]  # [kb, TQ]
    # gather the winning groups' member distances. NOTE: a flat-row
    # reformulation (jnp.take on [TQ*G, group] with q*G+g indices) wins
    # 7x in a STANDALONE ablation but measured ~10% SLOWER end-to-end in
    # interleaved 5-sample bench A/Bs (XLA fuses this take_along_axis into
    # the surrounding pipeline; the flat take breaks that fusion) — keep
    # the take_along_axis form, re-measure in context before changing.
    if hier:
        # two-level exact select (ops/sortnet.cand_topk_hier): the final
        # bitonic sees kb2*32 rows instead of kb*group — bit-identical,
        # measured end-to-end before adoption (see commit message)
        fv, fi = cand_topk_hier(
            dist.reshape(TQ, G, group), gsel, k, interpret=interpret
        )
    else:
        sel_q = gsel.T  # [TQ, kb]
        cand = jnp.take_along_axis(
            dist.reshape(TQ, G, group), sel_q[:, :, None], axis=1
        )  # [TQ, kb, group]
        cand_cl = cand.reshape(TQ, kb * group).T  # [C, TQ]
        cidx = (
            gsel[:, None, :] * group
            + lax.broadcasted_iota(jnp.int32, (kb, group, TQ), 1)
        ).reshape(kb * group, TQ)
        fv, fi = topk_cl(cand_cl, cidx, k, interpret=interpret)  # [k_pow2, TQ]
    fv, fi = fv[:k].T, fi[:k].T  # [TQ, k]
    fi = jnp.where(fv == INF, IDX_SENTINEL, fi)
    if sqrt_out:
        fv = jnp.sqrt(fv)
    return fv, fi


@partial(
    jax.jit,
    static_argnames=("k", "cosine", "group", "sqrt_out", "hier", "kb_cap",
                     "interpret"),
)
def flat_topk_pipeline(
    qpad: jax.Array,       # [Qp, d] f32, Qp % TQ == 0
    corpus_t: jax.Array,   # [d, N] f32/bf16 transposed corpus
    mask_vec: jax.Array,   # [N] f32 additive mask (see fused_dist_select)
    threshold: jax.Array,  # scalar f32 on the SQUARED distance for L2
    k: int,
    cosine: bool = False,
    group: int = GROUP,
    sqrt_out: bool = False,
    hier: bool | None = None,
    kb_cap: int = 0,
    interpret: bool = False,
):
    """Exact masked k-NN, one dispatch for the whole padded query batch.

    Returns (scores [Qp, k], slots [Qp, k]); empty slots carry
    (+inf, IDX_SENTINEL). Requires k <= group * n_groups.

    kb_cap (0 = off) caps the kept selection groups below the exactness
    bound — for APPROXIMATE-shortlist callers only (e.g. the ADC
    shortlist feeding an exact nrefine rerank): the top-kb_cap rows stay
    exact, ranks kb_cap+1..k come from the kept groups (same contract as
    ops/ivf_sparse kb_cap).
    """
    if hier is None:
        hier = cand_hier()
    if qpad.dtype != jnp.float32:
        qpad = qpad.astype(jnp.float32)  # narrow-wire cast in-jit
    Qp, d = qpad.shape
    G = corpus_t.shape[1] // group
    kb = min(max(1 << max(k - 1, 1).bit_length(), 8), G)  # pow2, >= k
    if kb_cap:
        kb = min(kb, max(1 << max(kb_cap - 1, 1).bit_length(), 8))
    body = partial(
        _chunk_topk, corpus_t=corpus_t, mask_vec=mask_vec, thr=threshold,
        k=k, kb=kb, group=group, cosine=cosine, sqrt_out=sqrt_out,
        hier=hier, interpret=interpret,
    )
    if Qp == TQ:
        return body(qpad)
    chunks = qpad.reshape(Qp // TQ, TQ, d)
    fv, fi = lax.map(body, chunks)
    return fv.reshape(Qp, -1), fi.reshape(Qp, -1)


@partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "coarse_cosine", "cosine", "group", "sqrt_out",
        "hier", "kb_cap", "interpret",
    ),
)
def ivf_topk_pipeline(
    qpad: jax.Array,        # [Qp, d] f32, Qp % TQ == 0
    corpus_t: jax.Array,    # [d, N] transposed (raw or PQ-reconstructed)
    mask_vec: jax.Array,    # [N] f32 additive mask
    threshold: jax.Array,   # scalar f32 (squared-distance domain for L2)
    centroids: jax.Array,   # [nlist, d] f32
    assign: jax.Array,      # [N] i32 cluster id per row
    k: int,
    nprobe: int,
    coarse_cosine: bool = False,
    cosine: bool = False,
    sqrt_out: bool = False,
    group: int = GROUP,
    hier: bool | None = None,
    kb_cap: int = 0,
    interpret: bool = False,
):
    """IVF/IVFPQ search as a dense masked scan, one dispatch per batch.

    Coarse stage ranks centroids per query (exact top-nprobe, ties to the
    lower centroid id — parity with argmin-first-occurrence); the fused
    kernel then scans the corpus with rows of unprobed clusters masked.
    The reference walks inverted lists per query
    (ivf_index_search.go:244-301, ivfpq_index_search.go:285-323); on the
    MXU a masked dense scan is ~30x faster than the gather-bound
    cursor-walk at 1M scale, with identical results.
    """
    if hier is None:
        hier = cand_hier()
    if qpad.dtype != jnp.float32:
        qpad = qpad.astype(jnp.float32)  # narrow-wire cast in-jit
    Qp, d = qpad.shape
    nlist = centroids.shape[0]
    # centroid ranking only needs relative order per query (drop the +qn)
    prec = lax.Precision.HIGHEST
    cq = lax.dot_general(
        centroids, qpad,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [nlist, Qp]
    if coarse_cosine:
        cd_t = -cq
    else:
        cn = jnp.sum(centroids * centroids, axis=1, keepdims=True)
        cd_t = cn - 2.0 * cq
    cids = lax.broadcasted_iota(jnp.int32, (nlist, Qp), 0)
    _, probes_t = topk_cl(cd_t, cids, nprobe, interpret=interpret)
    probes_t = probes_t[:nprobe]  # exact top-nprobe (topk_cl pads to pow2)
    # pad the probe count to a pow2 kernel width by repeating a real probe
    nprobe_pad = max(1 << max(nprobe - 1, 1).bit_length(), 8)
    nprobe_pad = min(nprobe_pad, nlist) if nlist >= 8 else nprobe_pad
    if nprobe_pad > nprobe:
        probes_t = jnp.concatenate(
            [probes_t]
            + [probes_t[0:1]] * (nprobe_pad - nprobe),
            axis=0,
        )
    probes = probes_t.T  # [Qp, nprobe_pad]

    G = corpus_t.shape[1] // group
    kb = min(max(1 << max(k - 1, 1).bit_length(), 8), G)
    if kb_cap:  # approximate-shortlist callers only (see flat pipeline)
        kb = min(kb, max(1 << max(kb_cap - 1, 1).bit_length(), 8))
    body = partial(
        _chunk_topk, corpus_t=corpus_t, mask_vec=mask_vec, thr=threshold,
        k=k, kb=kb, group=group, cosine=cosine, sqrt_out=sqrt_out,
        assign=assign, nprobe=nprobe_pad, hier=hier, interpret=interpret,
    )
    if Qp == TQ:
        return body((qpad, probes))
    fv, fi = lax.map(
        body,
        (qpad.reshape(Qp // TQ, TQ, d),
         probes.reshape(Qp // TQ, TQ, nprobe_pad)),
    )
    return fv.reshape(Qp, -1), fi.reshape(Qp, -1)
