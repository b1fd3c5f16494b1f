"""Profile the flat-scan components on the real TPU (axon tunnel).

Timing rule (CLAUDE.md): block_until_ready doesn't sync through the tunnel;
every timed region ends with a tiny host transfer.
"""

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

from comet_tpu.ops.pallas_scan import TQ, fused_dist_groupmin, finish_block_select
from comet_tpu.ops.topk import block_topk
from comet_tpu.types import DistanceKind

N, D, Q, K = 1 << 20, 128, 256, 128
ROUNDS = 5


def sync(x):
    # force a real host transfer of a small slice
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(name, fn, *args, rounds=ROUNDS):
    sync(fn(*args))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / rounds
    print(f"{name:45s} {dt * 1e3:9.2f} ms   ({Q / dt:9.0f} QPS/chunk-eq)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    xn = jnp.sum(corpus * corpus, axis=1)
    valid = jnp.ones(N, dtype=bool)
    thr = jnp.float32(np.inf)

    # speed of light reference points
    cb = corpus.astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(qq, cc):
        return jnp.einsum("qd,nd->qn", qq, cc, preferred_element_type=jnp.float32)

    @jax.jit
    def mm_f32_highest(qq, cc):
        return jnp.einsum(
            "qd,nd->qn", qq, cc,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @jax.jit
    def mm_reduce_bf16(qq, cc):
        # matmul + row-min only: no [Q, N] HBM write
        d = jnp.einsum("qd,nd->qn", qq, cc, preferred_element_type=jnp.float32)
        return jnp.min(d.reshape(Q, -1, 128), axis=2)

    timeit("bf16 matmul [256,1M] (writes 1GB dist)", mm_bf16, qb, cb)
    timeit("f32 HIGHEST matmul [256,1M]", mm_f32_highest, q, corpus)
    timeit("bf16 matmul+groupmin (XLA fused?)", mm_reduce_bf16, qb, cb)

    # current pallas path, split
    t_kern = timeit("pallas fused_dist_groupmin", lambda: fused_dist_groupmin(q, corpus, xn, thr))
    dist, gmin_t = fused_dist_groupmin(q, corpus, xn, thr)
    sync((dist, gmin_t))
    t_fin = timeit("finish_block_select(k=128)", lambda: finish_block_select(dist, gmin_t, K))

    def full():
        d2, g2 = fused_dist_groupmin(q, corpus, xn, thr)
        return finish_block_select(d2, g2, K)

    timeit("pallas path end-to-end", full)

    # XLA block_topk path
    timeit(
        "XLA block_topk st=2^20",
        lambda: block_topk(q, corpus, xn, valid, thr, K, DistanceKind.L2_SQUARED, super_tile=1 << 20),
    )

    # selection-only: what does top_k on gmin cost, and the sort?
    gmin = gmin_t.T  # [Q, G]
    sync(gmin)
    timeit("lax.top_k(gmin [256,8192], 128)", jax.jit(lambda g: jax.lax.top_k(-g, K)), gmin)

    ss = jnp.asarray(rng.normal(size=(Q, K * 128)).astype(np.float32))
    ii = jnp.asarray(rng.integers(0, N, size=(Q, K * 128)).astype(np.int32))
    timeit(
        "2-key lax.sort [256, 16384]",
        jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=2)),
        ss, ii,
    )
    dist3 = dist.reshape(Q, N // 128, 128)
    sel = jax.lax.top_k(-gmin, K)[1]
    sync(sel)
    timeit(
        "take_along_axis gather [256,128,128]",
        jax.jit(lambda d3, s: jnp.take_along_axis(d3, s[:, :, None], axis=1)),
        dist3, sel,
    )


if __name__ == "__main__":
    main()
