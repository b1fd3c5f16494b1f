"""Evaluate the production Pallas beam (ops/beam_kernel.beam_search_blocked)
on the real 200k graph: QPS + recall@100 sweeps."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comet_tpu.indexes.hnsw import HNSWIndex
from comet_tpu.ops.beam_kernel import beam_search_blocked, build_blocked_tables
from comet_tpu.types import DistanceKind

SENT = 2**31 - 1

data = np.load("/tmp/hnsw_fixture.npz")
corpus, queries = data["corpus"], data["queries"]
gt_ids = data["gt_ids"]

idx = HNSWIndex(128, DistanceKind.L2)
with open("/tmp/hnsw200k_efc200.bin", "rb") as f:
    idx.read_from(f)
idx._ensure_device()
adj, vectors, sqnorms = idx._dev_adj0, idx._dev_vectors, idx._dev_sqnorms
ids_arr = idx._store.ids
if idx._dev_nbr_vecs is None:
    idx._dev_nbr_vecs, idx._dev_nbr_sqn = build_blocked_tables(adj, vectors, sqnorms)
nbr_vecs, nbr_sqn = idx._dev_nbr_vecs, idx._dev_nbr_sqn
allowed = jnp.ones(adj.shape[0], dtype=bool)
print(f"graph: cap={adj.shape[0]} W={adj.shape[1]} n={idx._store.n}", flush=True)

entries_np = idx._descend(queries)


def run(tag, ef, E, Q, max_iters, reps=3, k=100, fused=False):
    qn = queries.shape[0]
    outs = None
    t = None
    for rep in range(reps + 1):
        if rep == 1:
            t = time.perf_counter()
        res = []
        for q0 in range(0, qn, Q):
            qc = jnp.asarray(queries[q0 : q0 + Q])
            ec = jnp.asarray(entries_np[q0 : q0 + Q])
            res.append(
                beam_search_blocked(
                    qc, ec, adj, nbr_vecs, nbr_sqn, vectors, sqnorms,
                    allowed, jnp.asarray(np.float32(np.inf)),
                    ef, k, E, max_iters, fused,
                )
            )
        res = jax.device_get(res)
        outs = res
    dt = (time.perf_counter() - t) / reps
    slots = np.concatenate([r[1] for r in outs])
    safe = np.where(slots == SENT, 0, slots)
    found = np.where(slots == SENT, 0, ids_arr[safe])
    hits = sum(
        len(set(f.tolist()) & set(tr.tolist())) for f, tr in zip(found, gt_ids)
    )
    r100 = hits / gt_ids.size
    qps = qn / dt
    print(f"{tag:44s} {qps:9.0f} QPS  r@100={r100:.4f}", flush=True)
    return qps, r100


import sys as _s

cases = _s.argv[1:] or ["a"]
if "a" in cases:
    run("pallas ef=256 E=8 Q=2048 cap=64", 256, 8, 2048, 64)
if "b" in cases:
    run("pallas ef=256 E=8 Q=2048 cap=48", 256, 8, 2048, 48)
    run("pallas ef=256 E=16 Q=2048 cap=32", 256, 16, 2048, 32)
if "i" in cases:
    for it in (128, 96, 64, 48, 40, 32):
        run(f"pallas ef=256 E=8 iters={it}", 256, 8, 2048, it)
    for it in (48, 32):
        run(f"pallas ef=256 E=8 iters={it} fused", 256, 8, 2048, it, fused=True)
if "c" in cases:
    run("pallas ef=128 E=8 Q=2048 cap=48", 128, 8, 2048, 48)
    run("pallas ef=128 E=8 Q=2048 cap=48 fused", 128, 8, 2048, 48, fused=True)
    run("pallas ef=256 E=8 Q=2048 cap=64 fused", 256, 8, 2048, 64, fused=True)
