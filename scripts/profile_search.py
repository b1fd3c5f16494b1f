"""Where does FlatIndex._search_batch lose time vs the raw pipeline?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comet_tpu.indexes.flat import FlatIndex
from comet_tpu.types import DistanceKind

N, D, Q, K = 1 << 20, 128, 2048, 100
rng = np.random.default_rng(0)
corpus = rng.normal(size=(N, D)).astype(np.float32)
queries = rng.normal(size=(Q, D)).astype(np.float32)

idx = FlatIndex(D, DistanceKind.L2)
t0 = time.perf_counter()
idx.add_batch(corpus)
print(f"add: {time.perf_counter() - t0:.2f}s", flush=True)

# warmup / compile
ids, sc = idx.search_batch(queries, k=K)
for r in range(3):
    t0 = time.perf_counter()
    ids, sc = idx.search_batch(queries, k=K)
    dt = time.perf_counter() - t0
    print(f"search_batch: {dt * 1e3:.1f} ms -> {Q / dt:.0f} QPS", flush=True)

# step-by-step with syncs
from comet_tpu.ops.distance import preprocess
from comet_tpu.ops.pallas_scan import flat_topk_pipeline
from comet_tpu.indexes.base import pad_queries, next_pow2

store = idx._store
vecs, sqnorms, valid = idx._device_arrays()
corpus_t = idx._device_corpus_t(vecs)

t0 = time.perf_counter(); qprep = preprocess(queries, DistanceKind.L2); print(f"preprocess: {(time.perf_counter()-t0)*1e3:.1f} ms")
t0 = time.perf_counter(); qpad, q_real = pad_queries(qprep); print(f"pad: {(time.perf_counter()-t0)*1e3:.1f} ms  shape={qpad.shape}")
t0 = time.perf_counter(); mask_vec = jax.block_until_ready(jnp.where(valid, sqnorms, jnp.inf)); np.asarray(mask_vec[:1]); print(f"mask: {(time.perf_counter()-t0)*1e3:.1f} ms")
t0 = time.perf_counter(); qdev = jax.block_until_ready(jnp.asarray(qpad)); np.asarray(qdev[0, :1]); print(f"query upload 1MB: {(time.perf_counter()-t0)*1e3:.1f} ms")
thr = jnp.float32(np.inf)
kp = next_pow2(K)
s, i = flat_topk_pipeline(qdev, corpus_t, mask_vec, thr, kp, sqrt_out=True)
np.asarray(s[0, :1])
t0 = time.perf_counter()
s, i = flat_topk_pipeline(qdev, corpus_t, mask_vec, thr, kp, sqrt_out=True)
np.asarray(s[0, :1])
print(f"pipeline device: {(time.perf_counter()-t0)*1e3:.1f} ms")
t0 = time.perf_counter(); out = jax.device_get((s, i)); print(f"device_get 2MB: {(time.perf_counter()-t0)*1e3:.1f} ms")
