"""One-time fixture: build a 200k-node HNSW graph on the bench corpus and
save (index file + corpus/queries/ground-truth npz) to /tmp for kernel
iteration. Run in background; takes ~5-8 min at round-1 build rates."""

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
corpus, queries = bench.gen_data(n=1_000_000, dim=128, seed=0)
corpus = corpus[:N]
ids = np.arange(1, N + 1, dtype=np.uint32)

print("computing exact ground truth (flat oracle)...", flush=True)
oracle = FlatIndex(128, DistanceKind.L2)
oracle.add_batch(corpus, ids=ids)
t0 = time.perf_counter()
gt_ids, gt_scores = oracle.search_batch(queries, k=100)
print(f"oracle done in {time.perf_counter() - t0:.1f}s", flush=True)
np.savez(
    "/tmp/hnsw_fixture.npz",
    corpus=corpus, queries=queries, ids=ids, gt_ids=gt_ids, gt_scores=gt_scores,
)
del oracle

idx = HNSWIndex(128, DistanceKind.L2, HNSWConfig(m=16, ef_construction=200, ef_search=128))
t0 = time.perf_counter()
idx.add_batch(corpus, ids=ids)
dt = time.perf_counter() - t0
print(f"hnsw build({N}) efc=200: {dt:.1f}s ({N / dt:.0f} vec/s)", flush=True)

with open("/tmp/hnsw200k_efc200.bin", "wb") as f:
    idx.write_to(f)
print("saved /tmp/hnsw200k_efc200.bin", flush=True)
