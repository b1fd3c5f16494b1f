"""Recall@100 / QPS of the IVF-SEEDED beam vs iteration count (200k fixture).

Loads the fixture + bulk-built graph produced by sweep_hnsw_iters.py and
sweeps HNSWConfig.search_iters with seed_search on. Compare against the
classic entry-point rows from sweep_hnsw_iters.py.

Usage: python scripts/sweep_hnsw_seeded.py [iters ...]
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
from comet_tpu.indexes.hnsw import HNSWConfig, HNSWIndex
from comet_tpu.types import DistanceKind

NQ = 2048
FIX = "/tmp/hnsw_fixture.npz"
GRAPH = "/tmp/hnsw200k_bulk.bin"

z = np.load(FIX)
corpus, queries, ids, gt_ids = z["corpus"], z["queries"], z["ids"], z["gt_ids"]
queries = queries[:NQ]

idx = HNSWIndex(128, DistanceKind.L2)
with open(GRAPH, "rb") as f:
    idx.read_from(f)
print(f"loaded {GRAPH}", flush=True)
idx.config.seed_search = True

sweep = [int(a) for a in sys.argv[1:]] or [8, 12, 16, 20, 24, 32]
gt = gt_ids[:NQ, :100]
rounds = 8
t0 = time.perf_counter()
idx.search_batch(queries[:128], k=100, ef_search=256)  # seed build + compile
print(f"first search (seed state + compile): {time.perf_counter() - t0:.1f}s",
      flush=True)
for iters in sweep:
    idx.config.search_iters = iters
    sids, _ = idx.search_batch(queries, k=100, ef_search=256)  # warm
    t0 = time.perf_counter()
    outs = list(idx.search_stream([queries] * rounds, k=100, ef_search=256))
    dt = time.perf_counter() - t0
    qps = rounds * NQ / dt
    r100 = bench.recall(sids[:, :100], gt)
    t0 = time.perf_counter()
    sids2, _ = idx.search_batch(queries, k=100, ef_search=256)
    dt1 = time.perf_counter() - t0
    print(
        f"seeded iters={iters:3d}: stream {qps:8.1f} QPS  single-batch "
        f"{NQ / dt1:8.1f} QPS  recall@100={r100:.4f}",
        flush=True,
    )
