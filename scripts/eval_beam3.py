"""Ablate beam_v3's per-iteration cost on the real graph (fixed 64 iters,
E=8, ef=256, Q=2048): which stage eats the 5 ms/iter?"""

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
EF, E, ITERS, Q = 256, 8, 64, 2048


@partial(
    jax.jit,
    static_argnames=("do_gather", "do_sorts", "do_select", "gdtype", "gdim"),
)
def ablate(
    queries, entry, adj, nbr_vecs, nbr_sqn,
    do_gather=True, do_sorts=2, do_select=True, gdtype="bf16", gdim=128,
):
    Q, d = queries.shape
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    rows = jnp.arange(Q)
    qb = queries[:, :gdim].astype(
        jnp.bfloat16 if gdtype == "bf16" else jnp.float32
    )

    cand_d = jnp.full((Q, EF), INF, jnp.float32).at[:, 0].set(0.0)
    cand_s = jnp.full((Q, EF), SENT, jnp.int32).at[:, 0].set(entry)
    expanded = jnp.zeros((Q, EF), jnp.int8)

    def body(i, state):
        cand_d, cand_s, expanded = state
        unexp_d = jnp.where((expanded != 0) | (cand_s == SENT), INF, cand_d)
        if do_select:
            _, best_pos = lax.top_k(-unexp_d, E)
        else:
            best_pos = (
                jnp.arange(E)[None, :] + i % 16
            ) * jnp.ones((Q, 1), jnp.int32)
        best_d = jnp.take_along_axis(unexp_d, best_pos, axis=1)
        do_expand = best_d < INF
        expanded = expanded.at[rows[:, None], best_pos].max(
            do_expand.astype(jnp.int8)
        )
        nodes = jnp.where(
            do_expand, jnp.take_along_axis(cand_s, best_pos, axis=1), 0
        )
        nodes = jnp.minimum(nodes, adj.shape[0] - 1)
        neigh = jnp.where(do_expand[:, :, None], adj[nodes], -1).reshape(Q, -1)
        if do_gather:
            nv = nbr_vecs[nodes]
            nsq = nbr_sqn[nodes].reshape(Q, -1)
            ip = jnp.einsum(
                "qd,qewd->qew", qb, nv.astype(qb.dtype),
                preferred_element_type=jnp.float32,
            ).reshape(Q, -1)
            nd = jnp.maximum(qn + nsq - 2.0 * ip, 0.0)
        else:
            nd = (neigh % 1000).astype(jnp.float32) + 0.5
        ok = neigh >= 0
        nd = jnp.where(ok, nd, INF)
        ns = jnp.where(ok, neigh, SENT)

        md = jnp.concatenate([cand_d, nd], axis=1)
        ms = jnp.concatenate([cand_s, ns], axis=1)
        me = jnp.concatenate([expanded, jnp.zeros(ns.shape, jnp.int8)], axis=1)
        if do_sorts == 2:
            ss, sd, se = lax.sort(
                (ms, md, -me.astype(jnp.int32)), dimension=1, num_keys=2
            )
            dup = jnp.concatenate(
                [jnp.zeros((Q, 1), bool), ss[:, 1:] == ss[:, :-1]], axis=1
            )
            sd = jnp.where(dup, INF, sd)
            ss = jnp.where(dup, SENT, ss)
            sd, ss, se = lax.sort((sd, ss, se), dimension=1, num_keys=2)
            cand_d, cand_s = sd[:, :EF], ss[:, :EF]
            expanded = (-se[:, :EF]).astype(jnp.int8)
        elif do_sorts == 1:
            sd, ss, se = lax.sort(
                (md, ms, me.astype(jnp.int32)), dimension=1, num_keys=2
            )
            cand_d, cand_s = sd[:, :EF], ss[:, :EF]
            expanded = se[:, :EF].astype(jnp.int8)
        else:
            cand_d = jnp.minimum(cand_d, nd[:, :EF])
        return cand_d, cand_s, expanded

    state = lax.fori_loop(0, ITERS, body, (cand_d, cand_s, expanded))
    return state[0], state[1]


data = np.load("/tmp/hnsw_fixture.npz")
queries = data["queries"][:Q]
idx = HNSWIndex(128, DistanceKind.L2)
with open("/tmp/hnsw200k_efc200.bin", "rb") as f:
    idx.read_from(f)
idx._ensure_device()
adj, vectors, sqnorms = idx._dev_adj0, idx._dev_vectors, idx._dev_sqnorms


@partial(jax.jit, static_argnames=("dtype", "gdim"))
def build_blocked(adj, vectors, sqnorms, dtype="bf16", gdim=128):
    nc = jnp.maximum(adj, 0)
    v = vectors[nc][..., :gdim]
    if dtype == "bf16":
        nv = v.astype(jnp.bfloat16)
    elif dtype == "int8":
        nv = jnp.clip(jnp.round(v * (127.0 / 300.0)), -128, 127).astype(jnp.int8)
    else:
        nv = v
    nsq = jnp.where(adj >= 0, jnp.sum(v * v, axis=-1), 0.0)
    return nv, nsq


entries = jnp.asarray(idx._descend(queries))
qd = jnp.asarray(queries)


def run(tag, dtype="bf16", gdim=128, **kw):
    nv, nsq = build_blocked(adj, vectors, sqnorms, dtype, gdim)
    jax.block_until_ready(nsq)
    args = (qd, entries, adj, nv, nsq)
    kw2 = dict(kw)
    kw2["gdtype"] = dtype
    kw2["gdim"] = gdim
    np.asarray(ablate(*args, **kw2)[0])
    t0 = time.perf_counter()
    np.asarray(ablate(*args, **kw2)[0])
    dt = time.perf_counter() - t0
    print(f"{tag:52s} {dt*1e3:8.1f} ms  {dt/ITERS*1e3:6.3f} ms/iter  "
          f"{Q/dt:7.0f} q/s", flush=True)


if not os.environ.get("QSCALE"):
    run("full bf16 d=128 (baseline)")
    run("no-gather", do_gather=False)
    run("one-sort (no dedup)", do_sorts=1)
    run("no-sorts", do_sorts=0)
    run("no-select (fixed positions)", do_select=False)
    run("int8 d=128", dtype="int8")
    run("int8 d=64 (half-dim routing)", dtype="int8", gdim=64)
    run("bf16 d=64", dtype="bf16", gdim=64)


def runq(q):
    global qd, entries, Q
    Qs = q
    qdl = jnp.asarray(data["queries"][:q])
    el = jnp.asarray(idx._descend(data["queries"][:q]))
    nv, nsq = build_blocked(adj, vectors, sqnorms, "bf16", 128)
    jax.block_until_ready(nsq)
    np.asarray(ablate(qdl, el, adj, nv, nsq, gdtype="bf16", gdim=128)[0])
    t0 = time.perf_counter()
    np.asarray(ablate(qdl, el, adj, nv, nsq, gdtype="bf16", gdim=128)[0])
    dt = time.perf_counter() - t0
    print(f"Q={q:5d}  {dt*1e3:8.1f} ms  {dt/ITERS*1e3:6.3f} ms/iter  {q/dt:7.0f} q/s", flush=True)


if os.environ.get("QSCALE"):
    for q in (256, 512, 1024, 2048):
        runq(q)
