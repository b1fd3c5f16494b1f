"""Measure XLA TPU row-gather throughput vs row size / dtype / count —
decides the HNSW routing-data layout (f32 rows vs bf16/int8 vs
neighborhood-blocked rows)."""

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

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)


@partial(jax.jit, static_argnames=("iters",))
def gather_loop(table, idx, iters):
    # accumulate a per-column max so XLA cannot factor the reduction
    # through the gather (a plain sum becomes a precomputed-rowsum gather)
    def body(i, acc):
        g = table[(idx + i) % table.shape[0]]
        return jnp.maximum(acc, g.astype(jnp.float32).max(axis=0) + i)
    return jax.lax.fori_loop(
        0, iters, body, jnp.zeros(table.shape[1], jnp.float32)
    )


def run(tag, n_rows, row_elems, dtype, n_idx, iters=20):
    table = jnp.asarray(
        rng.integers(0, 100, size=(n_rows, row_elems)).astype(dtype)
    )
    idx = jnp.asarray(rng.integers(0, n_rows, size=n_idx, dtype=np.int32))
    np.asarray(gather_loop(table, idx, iters))  # warmup + real sync
    t0 = time.perf_counter()
    np.asarray(gather_loop(table, idx, iters))  # tunnel: must transfer to sync
    dt = (time.perf_counter() - t0) / iters
    row_bytes = row_elems * np.dtype(dtype).itemsize
    gb = n_idx * row_bytes / dt / 1e9
    print(f"{tag:44s} {dt*1e3:7.3f} ms/gather  {gb:7.1f} GB/s  "
          f"({n_idx} rows x {row_bytes} B)", flush=True)


N = 1 << 20
# the beam-search shape: ~0.5M small rows per iteration
run("f32 d=128 (512B rows), 512k idx", N, 128, np.float32, 512 * 1024)
run("f32 d=128 (512B rows), 64k idx", N, 128, np.float32, 64 * 1024)
run("f32 d=128 (512B rows), 16k idx", N, 128, np.float32, 16 * 1024)
run("bf16 d=128 (256B rows), 512k idx", N, 128, jnp.bfloat16, 512 * 1024)
run("int8 d=128 (128B rows), 512k idx", N, 128, np.int8, 512 * 1024)
# neighborhood-blocked: one row per EXPANDED node carrying all W neighbors
run("blocked f32 W*d=4096 (16KB rows), 16k idx", N // 16, 4096, np.float32, 16 * 1024)
run("blocked int8 W*d=4096 (4KB rows), 16k idx", N // 4, 4096, np.int8, 16 * 1024)
run("blocked int8 W*d=4096 (4KB rows), 64k idx", N // 4, 4096, np.int8, 64 * 1024)
run("blocked pq  W*m=512  (512B rows), 16k idx", N, 512, np.int8, 16 * 1024)
