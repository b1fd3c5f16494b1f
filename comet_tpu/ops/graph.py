"""Batched graph-traversal kernels for HNSW.

The reference's HNSW search is per-query pointer chasing with Go heaps
(hnsw_index.go:565-629). Here layer-0 search is a LOCKSTEP BEAM: a whole
batch of queries runs best-first search simultaneously inside one XLA
while_loop — each iteration expands every query's best unexpanded
candidate, gathers its padded neighbor row, scores all neighbors as one
batched matvec, and merges via two-key sorts. Per-query visited sets are
dense bool rows; filter/threshold masks gate RESULT admission only, so
filtered nodes still route traversal (the reference post-filters AFTER
traversal and can return < k results, hnsw_index_search.go:308-335 — fixed
here by design).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from comet_tpu.ops.distance import DEFAULT_PRECISION
from comet_tpu.ops.topk import IDX_SENTINEL, INF, merge_topk
from comet_tpu.types import DistanceKind


def _neighbor_dists(queries, qn, vectors, sqnorms, neigh, kind):
    """Distances from each query to its own neighbor row: [Q, W]."""
    nc = jnp.maximum(neigh, 0)
    vecs = vectors[nc]                      # [Q, W, d]
    ip = jnp.einsum(
        "qd,qwd->qw", queries, vecs,
        preferred_element_type=jnp.float32, precision=DEFAULT_PRECISION,
    )
    if kind == DistanceKind.COSINE:
        return 1.0 - jnp.clip(ip, -1.0, 1.0)
    dist = jnp.maximum(qn + sqnorms[nc] - 2.0 * ip, 0.0)
    if kind == DistanceKind.L2:
        dist = jnp.sqrt(dist)
    return dist


@partial(jax.jit, static_argnames=("ef", "k", "kind", "max_iters"))
def beam_search_layer0(
    queries: jax.Array,      # [Q, d] preprocessed
    entry_slots: jax.Array,  # [Q] int32 entry points (layer-0 slots)
    adj: jax.Array,          # [cap, W] int32 neighbor rows, -1 padded
    vectors: jax.Array,      # [cap, d]
    sqnorms: jax.Array,      # [cap]
    allowed: jax.Array,      # [cap] bool — result-admission mask
    threshold: jax.Array,    # scalar f32 (+inf to disable)
    ef: int,
    k: int,
    kind: DistanceKind,
    max_iters: int,
):
    """Lockstep ef-beam search. Returns (res_d [Q,k], res_s [Q,k]) sorted
    ascending with (score, slot) tie-break; empty slots are
    (inf, IDX_SENTINEL)."""
    Q, d = queries.shape
    cap, W = adj.shape
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)  # [Q,1]
    rows = jnp.arange(Q)

    # entry distances
    e_d = _neighbor_dists(queries, qn, vectors, sqnorms, entry_slots[:, None], kind)[:, 0]

    cand_d = jnp.full((Q, ef), INF, jnp.float32).at[:, 0].set(e_d)
    cand_s = jnp.full((Q, ef), IDX_SENTINEL, jnp.int32).at[:, 0].set(entry_slots)
    expanded = jnp.zeros((Q, ef), jnp.bool_)
    visited = jnp.zeros((Q, cap), jnp.bool_).at[rows, entry_slots].set(True)

    res_d = jnp.full((Q, k), INF, jnp.float32)
    res_s = jnp.full((Q, k), IDX_SENTINEL, jnp.int32)
    ok0 = allowed[entry_slots] & (e_d <= threshold)
    res_d = res_d.at[:, 0].set(jnp.where(ok0, e_d, INF))
    res_s = res_s.at[:, 0].set(jnp.where(ok0, entry_slots, IDX_SENTINEL))

    def cond(state):
        i, cand_d, cand_s, expanded, visited, res_d, res_s, alive = state
        return (i < max_iters) & alive

    def body(state):
        i, cand_d, cand_s, expanded, visited, res_d, res_s, _ = state

        unexp_d = jnp.where(expanded | (cand_s == IDX_SENTINEL), INF, cand_d)
        best_pos = jnp.argmin(unexp_d, axis=1)            # [Q]
        best_d = unexp_d[rows, best_pos]
        worst = cand_d[:, ef - 1]
        active = (best_d < INF) & (best_d <= worst)

        expanded = expanded.at[rows, best_pos].set(
            expanded[rows, best_pos] | active
        )

        node = jnp.where(active, cand_s[rows, best_pos], 0)
        neigh = jnp.where(active[:, None], adj[node], -1)  # [Q, W]
        seen = visited[rows[:, None], jnp.maximum(neigh, 0)]
        fresh = (neigh >= 0) & ~seen
        visited = visited.at[rows[:, None], jnp.maximum(neigh, 0)].max(fresh)

        nd = _neighbor_dists(queries, qn, vectors, sqnorms, neigh, kind)
        nd = jnp.where(fresh, nd, INF)
        ns = jnp.where(fresh, neigh, IDX_SENTINEL)

        # merge into the beam, carrying expanded flags through the sort
        md = jnp.concatenate([cand_d, nd], axis=1)
        ms = jnp.concatenate([cand_s, ns], axis=1)
        me = jnp.concatenate(
            [expanded, jnp.zeros_like(fresh)], axis=1
        ).astype(jnp.int32)
        sd, ss, se = lax.sort((md, ms, me), dimension=1, num_keys=2)
        cand_d, cand_s, expanded = sd[:, :ef], ss[:, :ef], se[:, :ef].astype(bool)

        # merge ALLOWED fresh neighbors into the result set
        rd = jnp.where(fresh & allowed[jnp.maximum(neigh, 0)] & (nd <= threshold), nd, INF)
        rs = jnp.where(rd < INF, neigh, IDX_SENTINEL)
        res_d, res_s = merge_topk(res_d, res_s, rd, rs, k)

        return (i + 1, cand_d, cand_s, expanded, visited, res_d, res_s, jnp.any(active))

    state = (jnp.int32(0), cand_d, cand_s, expanded, visited, res_d, res_s, jnp.bool_(True))
    state = lax.while_loop(cond, body, state)
    return state[5], state[6]


@partial(jax.jit, donate_argnums=(0,))
def scatter_rows(dst: jax.Array, rows: jax.Array, values: jax.Array) -> jax.Array:
    """In-place row update of a device-resident array (donated buffer) —
    the incremental graph-sync primitive used during batched construction."""
    return dst.at[rows].set(values)
