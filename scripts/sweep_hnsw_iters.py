"""Recall@100 / QPS vs beam iteration count on the bulk-built 200k graph.

Builds (or loads from /tmp) the fixture: 200k bench-corpus slice, exact
flat ground truth for 512 queries, and a bulk-built HNSW graph. Then
sweeps HNSWConfig.search_iters at fixed kernel shapes (ef_pad=256, E=8)
— max_iters is a traced scalar, so the sweep reuses one compiled
executable.

Usage: python scripts/sweep_hnsw_iters.py [iters ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex
from comet_tpu.types import DistanceKind

N = 200_000
NQ = 2048
FIX = "/tmp/hnsw_fixture.npz"
GRAPH = "/tmp/hnsw200k_bulk.bin"


def get_fixture():
    if os.path.exists(FIX):
        z = np.load(FIX)
        return z["corpus"], z["queries"], z["ids"], z["gt_ids"]
    corpus, queries = bench.gen_data(n=1_000_000, dim=128, seed=0)
    corpus = corpus[:N]
    queries = queries[:NQ]
    ids = np.arange(1, N + 1, dtype=np.uint32)
    print("computing exact ground truth (flat oracle)...", flush=True)
    oracle = FlatIndex(128, DistanceKind.L2)
    oracle.add_batch(corpus, ids=ids)
    gt_ids, _ = oracle.search_batch(queries, k=100)
    np.savez(FIX, corpus=corpus, queries=queries, ids=ids, gt_ids=gt_ids)
    return corpus, queries, ids, gt_ids


corpus, queries, ids, gt_ids = get_fixture()

if os.path.exists(GRAPH):
    idx = HNSWIndex(128, DistanceKind.L2)
    with open(GRAPH, "rb") as f:
        idx.read_from(f)
    print(f"loaded {GRAPH}", flush=True)
else:
    idx = HNSWIndex(128, DistanceKind.L2, HNSWConfig(m=16, ef_construction=200))
    t0 = time.perf_counter()
    idx.add_batch(corpus, ids=ids)
    dt = time.perf_counter() - t0
    print(f"bulk build({N}): {dt:.1f}s ({N / dt:.0f} vec/s)", flush=True)
    with open(GRAPH, "wb") as f:
        idx.write_to(f)

sweep = [int(a) for a in sys.argv[1:]] or [24, 32, 40, 48, 56, 64]
gt = gt_ids[:NQ, :100]
rounds = 8
for iters in sweep:
    idx.config.search_iters = iters
    sids, _ = idx.search_batch(queries, k=100, ef_search=256)  # warm
    t0 = time.perf_counter()
    outs = list(idx.search_stream([queries] * rounds, k=100, ef_search=256))
    dt = time.perf_counter() - t0
    sids = outs[-1][0]
    qps = rounds * NQ / dt
    r100 = bench.recall(sids[:, :100], gt)
    t0 = time.perf_counter()
    sids2, _ = idx.search_batch(queries, k=100, ef_search=256)
    dt1 = time.perf_counter() - t0
    print(
        f"iters={iters:3d}: stream {qps:8.1f} QPS  single-batch "
        f"{NQ / dt1:8.1f} QPS  recall@100={r100:.4f}",
        flush=True,
    )
