"""Pallas TPU kernel: fused distance + masking + per-group min for the
exact flat scan.

The XLA path materializes the [Q, ST] distance tile to HBM, then re-reads
it to reduce 128-wide group minima (ops/topk.block_topk) — an extra full
pass of HBM traffic plus a slow minor-axis reduce. This kernel computes the
distance block on the MXU and writes BOTH the distance tile and its group
minima in one pass while the block is still in VMEM.

Masking trick: instead of a separate validity operand, invalid rows carry
+inf squared norms (dist = ||q||^2 + inf - 2 q.x = +inf), so the mask rides
the sqnorm stream for free; the threshold is a (1, 1) SMEM scalar.

Falls back to the XLA path off-TPU (tests exercise the kernel in
interpreter mode for numerics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128     # rows per selection group (must match ops.topk block size)
TQ = 256        # query rows per grid step
TN = 2048       # corpus rows per grid step


def _kernel(q_ref, qn_ref, x_ref, xn_ref, thr_ref, dist_ref, gmin_ref):
    # [TQ, d] x [TN, d]^T on the MXU, f32 accumulation
    ip = lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    dist = jnp.maximum(qn_ref[:] + xn_ref[:] - 2.0 * ip, 0.0)  # [TQ, TN]
    thr = thr_ref[0, 0]
    dist = jnp.where(dist <= thr, dist, jnp.inf)
    dist_ref[:] = dist
    # transposed [G_block, TQ] so the block's minor dim is 128-aligned
    gmin_ref[:] = jnp.min(dist.reshape(TQ, TN // GROUP, GROUP), axis=2).T


@partial(jax.jit, static_argnames=("interpret",))
def fused_dist_groupmin(
    queries: jax.Array,        # [Q, d] f32, Q % TQ == 0
    corpus: jax.Array,         # [N, d] f32, N % TN == 0
    masked_sqnorms: jax.Array, # [N] f32, +inf on invalid rows
    threshold: jax.Array,      # scalar f32 (+inf disables)
    interpret: bool = False,
):
    """Returns (dist [Q, N] f32 with +inf on masked/over-threshold entries,
    gmin_t [N // GROUP, Q] f32 per-contiguous-group minima, TRANSPOSED —
    Mosaic requires the block minor dim to be 128-aligned)."""
    Q, d = queries.shape
    N = corpus.shape[0]
    assert Q % TQ == 0 and N % TN == 0, (Q, N)
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)  # [Q, 1]
    xn2d = masked_sqnorms[None, :]                          # [1, N]
    thr2d = threshold.reshape(1, 1)

    grid = (Q // TQ, N // TN)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TN // GROUP, TQ), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, N), jnp.float32),
            jax.ShapeDtypeStruct((N // GROUP, Q), jnp.float32),
        ],
        interpret=interpret,
    )(queries, qn, corpus, xn2d, thr2d)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("k",))
def finish_block_select(dist: jax.Array, gmin_t: jax.Array, k: int):
    """Select min(k, G) best groups per query and sort their members —
    phase 2 of the exact block-select top-k (see ops/topk.block_topk for
    the exactness argument)."""
    from comet_tpu.ops.topk import IDX_SENTINEL, INF

    Q, N = dist.shape
    gmin = gmin_t.T
    G = gmin.shape[1]
    kb = min(k, G)
    _, sel = lax.top_k(-gmin, kb)
    dist3 = dist.reshape(Q, G, GROUP)
    gathered = jnp.take_along_axis(dist3, sel[:, :, None], axis=1)
    gidx = sel[:, :, None] * GROUP + lax.broadcasted_iota(
        jnp.int32, (Q, kb, GROUP), 2
    )
    ss, ii = lax.sort(
        (gathered.reshape(Q, kb * GROUP), gidx.reshape(Q, kb * GROUP)),
        dimension=1,
        num_keys=2,
    )
    kk = min(k, kb * GROUP)
    s_out = ss[:, :kk]
    i_out = jnp.where(s_out == INF, IDX_SENTINEL, ii[:, :kk])
    if kk < k:
        s_out = jnp.pad(s_out, ((0, 0), (0, k - kk)), constant_values=INF)
        i_out = jnp.pad(i_out, ((0, 0), (0, k - kk)), constant_values=IDX_SENTINEL)
    return s_out, i_out
