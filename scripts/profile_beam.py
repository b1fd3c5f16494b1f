"""Ablation profile of the HNSW lockstep beam: where does a while_loop
iteration spend its time? Synthetic 1M graph, FIXED iteration count (no
early exit) so ms/iter is directly comparable across variants.

Variants toggle: visited bookkeeping, vector gather, beam merge sort,
result merge, expand width, query batch, bf16 gather.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

INF = jnp.inf
SENT = jnp.int32(2**31 - 1)

CAP = 1 << 20
D = 128
W = 32


@partial(
    jax.jit,
    static_argnames=(
        "ef", "iters", "expand", "visited_mode", "do_gather", "do_sort",
        "do_results", "gather_dtype",
    ),
)
def beam_ablate(
    queries, entry, adj, vectors, sqnorms,
    ef, iters, expand,
    visited_mode="packed", do_gather=True, do_sort=True, do_results=False,
    gather_dtype="float32",
):
    Q, d = queries.shape
    cap, w = adj.shape
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    rows = jnp.arange(Q)

    cand_d = jnp.full((Q, ef), INF, jnp.float32).at[:, 0].set(0.0)
    cand_s = jnp.full((Q, ef), SENT, jnp.int32).at[:, 0].set(entry)
    expanded = jnp.zeros((Q, ef), jnp.bool_)
    if visited_mode == "packed":
        n_words = cap // 32
    elif visited_mode.startswith("bloom"):
        n_words = (1 << int(visited_mode[5:])) // 32
    else:
        n_words = 8  # unused
    visited = jnp.zeros((Q, n_words), jnp.uint32)
    res_d = jnp.full((Q, 128), INF, jnp.float32)
    res_s = jnp.full((Q, 128), SENT, jnp.int32)

    def body(i, state):
        cand_d, cand_s, expanded, visited, res_d, res_s = state
        unexp_d = jnp.where(expanded | (cand_s == SENT), INF, cand_d)
        if expand == 1:
            best_pos = jnp.argmin(unexp_d, axis=1)[:, None]
        else:
            _, best_pos = lax.top_k(-unexp_d, expand)
        best_d = jnp.take_along_axis(unexp_d, best_pos, axis=1)
        do_expand = best_d < INF
        expanded = expanded.at[rows[:, None], best_pos].max(do_expand)
        nodes = jnp.where(do_expand, jnp.take_along_axis(cand_s, best_pos, axis=1), 0)
        neigh = jnp.where(do_expand[:, :, None], adj[nodes], -1).reshape(Q, -1)
        nc = jnp.maximum(neigh, 0)
        if visited_mode == "packed":
            words = visited[rows[:, None], nc >> 5]
            bits = jnp.uint32(1) << (nc & 31).astype(jnp.uint32)
            seen = (words & bits) != 0
            fresh = (neigh >= 0) & ~seen
            visited = visited.at[rows[:, None], nc >> 5].add(
                jnp.where(fresh, bits, jnp.uint32(0))
            )
        elif visited_mode == "packed-flat":
            n_words = cap // 32
            vflat = visited.reshape(-1)
            idx = rows[:, None] * n_words + (nc >> 5)
            words = vflat[idx]
            bits = jnp.uint32(1) << (nc & 31).astype(jnp.uint32)
            seen = (words & bits) != 0
            fresh = (neigh >= 0) & ~seen
            vflat = vflat.at[idx].add(jnp.where(fresh, bits, jnp.uint32(0)))
            visited = vflat.reshape(Q, -1)
        elif visited_mode.startswith("bloom"):
            bbits = int(visited_mode[5:])
            h1 = (nc.astype(jnp.uint32) * jnp.uint32(2654435761)) >> (32 - bbits)
            w1 = visited[rows[:, None], h1 >> 5]
            b1 = jnp.uint32(1) << (h1 & 31)
            seen = (w1 & b1) != 0
            fresh = (neigh >= 0) & ~seen
            visited = visited.at[rows[:, None], h1 >> 5].add(
                jnp.where(fresh, b1, jnp.uint32(0))
            )
        else:  # none / dedup handled in merge
            fresh = neigh >= 0
        if do_gather:
            vecs = vectors[nc]
            if gather_dtype != "float32":
                vecs = vecs.astype(jnp.float32)
            ip = jnp.einsum(
                "qd,qwd->qw", queries, vecs,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            nd = jnp.maximum(qn + sqnorms[nc] - 2.0 * ip, 0.0)
        else:
            nd = (nc % 1024).astype(jnp.float32) + jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0), i), (Q, neigh.shape[1])
            )
        nd = jnp.where(fresh, nd, INF)
        ns = jnp.where(fresh, neigh, SENT)
        if visited_mode == "dedup":
            # slot-keyed dedup of beam+new, then score-order truncate
            md = jnp.concatenate([cand_d, nd], axis=1)
            ms = jnp.concatenate([cand_s, ns], axis=1)
            me = jnp.concatenate(
                [expanded, jnp.zeros_like(fresh)], axis=1
            ).astype(jnp.int32)
            ss, sd, se = lax.sort((ms, md, -me), dimension=1, num_keys=3)
            dup = jnp.concatenate(
                [jnp.zeros((Q, 1), bool), ss[:, 1:] == ss[:, :-1]], axis=1
            )
            sd = jnp.where(dup, INF, sd)
            ss = jnp.where(dup, SENT, ss)
            sd, ss, se = lax.sort((sd, ss, -se), dimension=1, num_keys=2)
            cand_d, cand_s, expanded = (
                sd[:, :ef], ss[:, :ef], (-se[:, :ef]).astype(bool)
            )
        elif do_sort:
            md = jnp.concatenate([cand_d, nd], axis=1)
            ms = jnp.concatenate([cand_s, ns], axis=1)
            me = jnp.concatenate([expanded, jnp.zeros_like(fresh)], axis=1).astype(jnp.int32)
            sd, ss, se = lax.sort((md, ms, me), dimension=1, num_keys=1)
            cand_d, cand_s, expanded = sd[:, :ef], ss[:, :ef], se[:, :ef].astype(bool)
        else:
            w2 = min(ef, nd.shape[1])
            cand_d = cand_d.at[:, :w2].min(nd[:, :w2])
            cand_s = cand_s.at[:, :w2].max(ns[:, :w2])
        if do_results:
            rd = jnp.where(fresh, nd, INF)
            rs = jnp.where(rd < INF, neigh, SENT)
            s = jnp.concatenate([res_d, rd], axis=1)
            ii = jnp.concatenate([res_s, rs], axis=1)
            sd, si = lax.sort((s, ii), dimension=1, num_keys=2)
            res_d, res_s = sd[:, :128], si[:, :128]
        return cand_d, cand_s, expanded, visited, res_d, res_s

    state = (cand_d, cand_s, expanded, visited, res_d, res_s)
    state = lax.fori_loop(0, iters, body, state)
    return state[0], state[1]


def run(tag, **kw):
    Q = kw.pop("Q")
    iters = kw.get("iters")
    dtype = kw.get("gather_dtype", "float32")
    vecs = vectors.astype(jnp.bfloat16) if dtype == "bfloat16" else vectors
    args = (queries[:Q], entry[:Q], adj, vecs, sqnorms)
    out = beam_ablate(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = beam_ablate(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    per_iter = dt / iters * 1e3
    qps = Q / dt
    print(f"{tag:58s} {dt*1e3:8.1f} ms  {per_iter:7.3f} ms/iter  {qps:9.0f} q/s",
          flush=True)


rng = np.random.default_rng(0)
print("building synthetic graph...", flush=True)
vectors = jnp.asarray(rng.normal(size=(CAP, D)).astype(np.float32))
sqnorms = jnp.sum(vectors * vectors, axis=1)
adj_np = rng.integers(0, CAP, size=(CAP, W), dtype=np.int32)
adj = jnp.asarray(adj_np)
queries = jnp.asarray(rng.normal(size=(2048, D)).astype(np.float32))
entry = jnp.zeros(2048, jnp.int32)

BASE = dict(ef=128, iters=64, expand=1)
run("packed    Q=1024 E=1", Q=1024, visited_mode="packed", **BASE)
run("packed-flat Q=1024 E=1", Q=1024, visited_mode="packed-flat", **BASE)
for b in (16, 18, 20):
    run(f"bloom{b}  Q=1024 E=1", Q=1024, visited_mode=f"bloom{b}", **BASE)
run("dedup     Q=1024 E=1", Q=1024, visited_mode="dedup", **BASE)
for E in (4, 8):
    it = 64 // E
    run(f"bloom18 Q=1024 E={E} iters={it}",
        Q=1024, ef=128, iters=it, expand=E, visited_mode="bloom18")
    run(f"bloom18 Q=2048 E={E} iters={it}",
        Q=2048, ef=128, iters=it, expand=E, visited_mode="bloom18")
    run(f"dedup   Q=2048 E={E} iters={it}",
        Q=2048, ef=128, iters=it, expand=E, visited_mode="dedup")
run("bloom18+results Q=2048 E=8 iters=8",
    Q=2048, ef=128, iters=8, expand=8, visited_mode="bloom18", do_results=True)
