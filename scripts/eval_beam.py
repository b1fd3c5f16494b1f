"""Evaluate beam-search variants on the REAL 200k HNSW graph fixture:
QPS (sustained, with host download) + recall@100 vs exact ground truth.

Variants: visited mode (packed-flat exact / dedup-no-visited / bloom),
expand width E, beam ef, query chunk Q.
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

from comet_tpu.indexes.hnsw import HNSWIndex
from comet_tpu.types import DistanceKind

INF = jnp.inf
SENT = jnp.int32(2**31 - 1)


@partial(jax.jit, static_argnames=("ef", "k", "expand", "max_iters", "mode"))
def beam_v2(
    queries, entry, adj, vectors, sqnorms,
    ef, k, expand, max_iters, mode="flat",
):
    """Lockstep beam, v2. mode: flat (exact packed visited, 1-D scatter),
    dedup (no visited set; slot-keyed dedup inside the merge), bloomNN.
    Returns (res_d [Q,k], res_s [Q,k], iters)."""
    Q, d = queries.shape
    cap, W = adj.shape
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    rows = jnp.arange(Q)

    ev = vectors[entry]
    e_d = jnp.maximum(
        qn[:, 0] + sqnorms[entry]
        - 2.0 * jnp.einsum("qd,qd->q", queries, ev,
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST),
        0.0,
    )
    cand_d = jnp.full((Q, ef), INF, jnp.float32).at[:, 0].set(e_d)
    cand_s = jnp.full((Q, ef), SENT, jnp.int32).at[:, 0].set(entry)
    expanded = jnp.zeros((Q, ef), jnp.bool_)

    if mode == "flat":
        n_words = cap // 32
        visited = jnp.zeros(Q * n_words, jnp.uint32)
        visited = visited.at[rows * n_words + (entry >> 5)].add(
            jnp.uint32(1) << (entry & 31).astype(jnp.uint32)
        )
    elif mode.startswith("bloom"):
        bbits = int(mode[5:])
        n_words = (1 << bbits) // 32
        he = (entry.astype(jnp.uint32) * jnp.uint32(2654435761)) >> (32 - bbits)
        visited = jnp.zeros(Q * n_words, jnp.uint32)
        visited = visited.at[rows * n_words + (he >> 5)].add(
            jnp.uint32(1) << (he & 31)
        )
    else:
        n_words = 1
        visited = jnp.zeros(1, jnp.uint32)

    def cond(state):
        i, *_, alive = state
        return (i < max_iters) & alive

    def body(state):
        i, cand_d, cand_s, expanded, visited, _ = state
        unexp_d = jnp.where(expanded | (cand_s == SENT), INF, cand_d)
        worst = cand_d[:, ef - 1]
        if expand == 1:
            best_pos = jnp.argmin(unexp_d, axis=1)[:, None]
        else:
            _, best_pos = lax.top_k(-unexp_d, expand)
        best_d = jnp.take_along_axis(unexp_d, best_pos, axis=1)
        active = (best_d[:, 0] < INF) & (best_d[:, 0] <= worst)
        do_expand = active[:, None] & (best_d < INF)
        expanded = expanded.at[rows[:, None], best_pos].max(do_expand)
        nodes = jnp.where(do_expand, jnp.take_along_axis(cand_s, best_pos, axis=1), 0)
        neigh = jnp.where(do_expand[:, :, None], adj[nodes], -1).reshape(Q, -1)
        nc = jnp.maximum(neigh, 0)

        # in-iteration duplicate mask (same slot from several parents)
        if expand > 1:
            sort_idx = jnp.argsort(neigh, axis=1, stable=True)
            sorted_n = jnp.take_along_axis(neigh, sort_idx, axis=1)
            rep_sorted = jnp.concatenate(
                [jnp.zeros((Q, 1), bool), sorted_n[:, 1:] == sorted_n[:, :-1]],
                axis=1,
            )
            dup = jnp.zeros_like(rep_sorted)
            dup = dup.at[rows[:, None], sort_idx].set(rep_sorted)
        else:
            dup = jnp.zeros(neigh.shape, bool)

        if mode == "flat":
            idx = rows[:, None] * (cap // 32) + (nc >> 5)
            words = visited[idx]
            bits = jnp.uint32(1) << (nc & 31).astype(jnp.uint32)
            seen = (words & bits) != 0
            fresh = (neigh >= 0) & ~seen & ~dup
            visited = visited.at[idx].add(jnp.where(fresh, bits, jnp.uint32(0)))
        elif mode.startswith("bloom"):
            bbits = int(mode[5:])
            h1 = (nc.astype(jnp.uint32) * jnp.uint32(2654435761)) >> (32 - bbits)
            idx = rows[:, None] * ((1 << bbits) // 32) + (h1 >> 5)
            words = visited[idx]
            bits = jnp.uint32(1) << (h1 & 31)
            seen = (words & bits) != 0
            fresh = (neigh >= 0) & ~seen & ~dup
            visited = visited.at[idx].add(jnp.where(fresh, bits, jnp.uint32(0)))
        else:
            fresh = (neigh >= 0) & ~dup

        vecs = vectors[nc]
        ip = jnp.einsum(
            "qd,qwd->qw", queries, vecs,
            preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
        )
        nd = jnp.maximum(qn + sqnorms[nc] - 2.0 * ip, 0.0)
        nd = jnp.where(fresh, nd, INF)
        ns = jnp.where(fresh, neigh, SENT)

        md = jnp.concatenate([cand_d, nd], axis=1)
        ms = jnp.concatenate([cand_s, ns], axis=1)
        me = jnp.concatenate([expanded, jnp.zeros_like(fresh)], axis=1).astype(jnp.int8)
        if mode == "dedup":
            ss, sd, se = lax.sort((ms, md, -me), dimension=1, num_keys=3)
            dup2 = jnp.concatenate(
                [jnp.zeros((Q, 1), bool), ss[:, 1:] == ss[:, :-1]], axis=1
            )
            sd = jnp.where(dup2, INF, sd)
            ss = jnp.where(dup2, SENT, ss)
            sd, ss, se = lax.sort((sd, ss, -se), dimension=1, num_keys=2)
            se = -se
        else:
            sd, ss, se = lax.sort((md, ms, me), dimension=1, num_keys=1)
        cand_d, cand_s, expanded = sd[:, :ef], ss[:, :ef], se[:, :ef].astype(bool)
        return (i + 1, cand_d, cand_s, expanded, visited, jnp.any(active))

    state = (jnp.int32(0), cand_d, cand_s, expanded, visited, jnp.bool_(True))
    state = lax.while_loop(cond, body, state)
    cand_d, cand_s = state[1], state[2]
    sd, ss = lax.sort((cand_d, cand_s), dimension=1, num_keys=2)
    return sd[:, :k], ss[:, :k], state[0]


print("loading fixture...", flush=True)
data = np.load("/tmp/hnsw_fixture.npz")
corpus, queries = data["corpus"], data["queries"]
gt_ids = data["gt_ids"]

idx = HNSWIndex(128, DistanceKind.L2)
with open("/tmp/hnsw200k_efc200.bin", "rb") as f:
    idx.read_from(f)
idx._ensure_device()
adj = idx._dev_adj0
vectors = idx._dev_vectors
sqnorms = idx._dev_sqnorms
ids_arr = idx._store.ids
print(f"graph: cap={adj.shape[0]} W={adj.shape[1]} n={idx._store.n}", flush=True)

entries_np = idx._descend(queries)


def run(tag, mode, ef, E, Q, reps=3, k=100):
    max_iters = (3 * ef) // E + 24
    qn = queries.shape[0]
    outs = []
    t = None
    for rep in range(reps + 1):
        if rep == 1:
            t = time.perf_counter()
        res = []
        for q0 in range(0, qn, Q):
            qc = jnp.asarray(queries[q0 : q0 + Q])
            ec = jnp.asarray(entries_np[q0 : q0 + Q])
            res.append(beam_v2(qc, ec, adj, vectors, sqnorms, ef, k, E, max_iters, mode))
        res = jax.device_get(res)
        outs = res
    dt = (time.perf_counter() - t) / reps
    slots = np.concatenate([r[1] for r in outs])
    iters = max(int(r[2]) for r in outs)
    found = np.where(slots == int(SENT), 0, ids_arr[np.clip(slots, 0, None)])
    hits = sum(
        len(set(f.tolist()) & set(tr.tolist())) for f, tr in zip(found, gt_ids)
    )
    r100 = hits / gt_ids.size
    qps = qn / dt
    print(f"{tag:42s} {qps:9.0f} QPS  r@100={r100:.4f}  iters={iters}", flush=True)
    return qps, r100


for mode in ("flat", "dedup", "bloom16", "bloom18"):
    run(f"{mode} ef=160 E=4 Q=1024", mode, 160, 4, 1024)
run("flat  ef=160 E=1 Q=1024 (round-1 shape)", "flat", 160, 1, 1024)
for E in (2, 4, 8):
    run(f"dedup ef=192 E={E} Q=2048", "dedup", 192, E, 2048)
for ef in (128, 160, 256):
    run(f"dedup ef={ef} E=4 Q=2048", "dedup", ef, 4, 2048)
run("flat  ef=160 E=4 Q=2048", "flat", 160, 4, 2048)
run("bloom18 ef=160 E=4 Q=2048", "bloom18", 160, 4, 2048)
