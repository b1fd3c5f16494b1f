"""Stage-level timings for the fused flat pipeline on the TPU."""

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

from comet_tpu.ops.pallas_scan import flat_topk_pipeline, fused_dist_select
from comet_tpu.ops.sortnet import topk_cl

N, D, Q, K = 1 << 20, 128, 256, 128
G = N // 128


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timeit(name, fn, *args, rounds=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / rounds
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    corpus_t = jnp.asarray(np.ascontiguousarray(
        rng.normal(size=(N, D)).astype(np.float32).T))
    q = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    xn = jnp.asarray(rng.uniform(50, 200, size=N).astype(np.float32))
    thr = jnp.float32(np.inf)

    timeit("pipeline Q=256 k=128", lambda: flat_topk_pipeline(q, corpus_t, xn, thr, K))
    timeit("kernelA (dist+in-kernel select)",
           lambda: fused_dist_select(q, corpus_t, xn, thr, K))

    # batch-scale: Q=2048 in one dispatch
    q8 = jnp.asarray(rng.normal(size=(2048, D)).astype(np.float32))
    dt = timeit("pipeline Q=2048 k=128 (one dispatch)",
                lambda: flat_topk_pipeline(q8, corpus_t, xn, thr, K), rounds=5)
    print(f"    -> {2048 / dt:.0f} QPS")


if __name__ == "__main__":
    main()
