"""Round 2 of beam variants on the real 200k graph: neighborhood-blocked
bf16 vector gathers (one 8KB row per expanded node instead of W 512B rows),
dedup-in-merge (no visited buffers), iteration caps, exact f32 rerank."""

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


@partial(jax.jit, static_argnames=("ef", "k", "expand", "max_iters", "rerank"))
def beam_v3(
    queries, entry, adj, nbr_vecs, nbr_sqn, vectors, sqnorms,
    ef, k, expand, max_iters, rerank=True,
):
    """Blocked-gather lockstep beam with dedup-in-merge.

    nbr_vecs: [cap, W, d] bf16 — node p's row carries its neighbors'
    vectors (blocked: ONE row gather per expansion, not W).
    nbr_sqn:  [cap, W] f32 neighbor squared norms.
    """
    Q, d = queries.shape
    cap, W = adj.shape
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    rows = jnp.arange(Q)
    qb = queries.astype(jnp.bfloat16)

    ev = vectors[entry]
    e_d = jnp.maximum(
        qn[:, 0] + sqnorms[entry]
        - 2.0 * jnp.einsum("qd,qd->q", queries, ev,
                           preferred_element_type=jnp.float32),
        0.0,
    )
    cand_d = jnp.full((Q, ef), INF, jnp.float32).at[:, 0].set(e_d)
    cand_s = jnp.full((Q, ef), SENT, jnp.int32).at[:, 0].set(entry)
    expanded = jnp.zeros((Q, ef), jnp.int8)

    def cond(state):
        i, *_, alive = state
        return (i < max_iters) & alive

    def body(state):
        i, cand_d, cand_s, expanded, _ = state
        unexp_d = jnp.where((expanded != 0) | (cand_s == SENT), INF, cand_d)
        worst = cand_d[:, ef - 1]
        if expand == 1:
            best_pos = jnp.argmin(unexp_d, axis=1)[:, None]
        else:
            _, best_pos = lax.top_k(-unexp_d, expand)
        best_d = jnp.take_along_axis(unexp_d, best_pos, axis=1)
        active = (best_d[:, 0] < INF) & (best_d[:, 0] <= worst)
        do_expand = active[:, None] & (best_d < INF)
        expanded = expanded.at[rows[:, None], best_pos].max(
            do_expand.astype(jnp.int8)
        )
        nodes = jnp.where(
            do_expand, jnp.take_along_axis(cand_s, best_pos, axis=1), 0
        )
        neigh = jnp.where(do_expand[:, :, None], adj[nodes], -1).reshape(Q, -1)

        nv = nbr_vecs[nodes]                      # [Q, E, W, d] bf16 (blocked)
        nsq = nbr_sqn[nodes].reshape(Q, -1)       # [Q, E*W]
        ip = jnp.einsum(
            "qd,qewd->qew", qb, nv, preferred_element_type=jnp.float32
        ).reshape(Q, -1)
        nd = jnp.maximum(qn + nsq - 2.0 * ip, 0.0)
        ok = neigh >= 0
        nd = jnp.where(ok, nd, INF)
        ns = jnp.where(ok, neigh, SENT)

        # merge with slot-keyed dedup (kills in-beam AND in-iteration dups)
        md = jnp.concatenate([cand_d, nd], axis=1)
        ms = jnp.concatenate([cand_s, ns], axis=1)
        me = jnp.concatenate(
            [expanded, jnp.zeros(ns.shape, jnp.int8)], axis=1
        )
        ss, sd, se = lax.sort((ms, md, -me.astype(jnp.int32)), dimension=1, num_keys=2)
        dup = jnp.concatenate(
            [jnp.zeros((Q, 1), bool), ss[:, 1:] == ss[:, :-1]], axis=1
        )
        sd = jnp.where(dup, INF, sd)
        ss = jnp.where(dup, SENT, ss)
        sd, ss, se = lax.sort((sd, ss, se), dimension=1, num_keys=2)
        cand_d, cand_s = sd[:, :ef], ss[:, :ef]
        expanded = (-se[:, :ef]).astype(jnp.int8)
        return (i + 1, cand_d, cand_s, expanded, jnp.any(active))

    state = (jnp.int32(0), cand_d, cand_s, expanded, jnp.bool_(True))
    state = lax.while_loop(cond, body, state)
    cand_d, cand_s = state[1], state[2]
    if rerank:
        # exact f32 distances for the final beam prefix
        kk = min(2 * k, ef)
        sd, ss = lax.sort((cand_d, cand_s), dimension=1, num_keys=2)
        top_s = ss[:, :kk]
        tv = vectors[jnp.maximum(top_s, 0)]
        ip = jnp.einsum("qd,qkd->qk", queries, tv,
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
        td = jnp.maximum(qn + sqnorms[jnp.maximum(top_s, 0)] - 2.0 * ip, 0.0)
        td = jnp.where(top_s == SENT, INF, td)
        sd2, ss2 = lax.sort((td, top_s), dimension=1, num_keys=2)
        return sd2[:, :k], ss2[:, :k], state[0]
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
cap, W = adj.shape
print(f"graph: cap={cap} W={W} n={idx._store.n}", flush=True)


@jax.jit
def build_blocked(adj, vectors, sqnorms):
    nc = jnp.maximum(adj, 0)
    nv = vectors[nc].astype(jnp.bfloat16)     # [cap, W, d]
    nsq = jnp.where(adj >= 0, sqnorms[nc], -INF)  # -inf -> dist=+inf later? no:
    # invalid neighbors masked by adj>=0 in the loop; sqn value irrelevant
    return nv, jnp.where(adj >= 0, sqnorms[nc], 0.0)


nbr_vecs, nbr_sqn = build_blocked(adj, vectors, sqnorms)
jax.block_until_ready(nbr_sqn)
print("blocked tables built", flush=True)

entries_np = idx._descend(queries)


def run(tag, ef, E, Q, max_iters, reps=3, k=100, rerank=True):
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
            res.append(
                beam_v3(qc, ec, adj, nbr_vecs, nbr_sqn, vectors, sqnorms,
                        ef, k, E, max_iters, rerank)
            )
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
    print(f"{tag:44s} {qps:9.0f} QPS  r@100={r100:.4f}  iters={iters}",
          flush=True)
    return qps, r100


# iteration-cap sweep at E=4 ef=256
for cap_i in (999, 128, 96, 80, 64):
    run(f"blk ef=256 E=4 Q=2048 cap={cap_i}", 256, 4, 2048, cap_i)
# expansion width at fixed cap budget
run("blk ef=256 E=8  Q=2048 cap=64", 256, 8, 2048, 64)
run("blk ef=256 E=8  Q=2048 cap=48", 256, 8, 2048, 48)
run("blk ef=256 E=16 Q=2048 cap=32", 256, 16, 2048, 32)
run("blk ef=192 E=8  Q=2048 cap=48", 192, 8, 2048, 48)
# rerank ablation (bf16 routing error)
run("blk ef=256 E=8 Q=2048 cap=64 NO-rerank", 256, 8, 2048, 64, rerank=False)
# bigger chunk
run("blk ef=256 E=8 Q=4096 cap=64", 256, 8, 4096, 64)
