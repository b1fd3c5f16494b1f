"""Honest component timings: every timed fn returns SMALL outputs only."""

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

from comet_tpu.ops.pallas_scan import fused_dist_groupmin, finish_block_select

N, D, Q, K, G = 1 << 20, 128, 256, 128, (1 << 20) // 128
ROUNDS = 10


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[0])  # scalar transfer only


def timeit(name, fn, *args, rounds=ROUNDS):
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
    corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    xn = jnp.sum(corpus * corpus, axis=1)
    thr = jnp.float32(np.inf)
    cb, qb = corpus.astype(jnp.bfloat16), q.astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16_sum(qq, cc):
        d = jnp.einsum("qd,nd->qn", qq, cc, preferred_element_type=jnp.float32)
        return jnp.sum(d)  # no [Q,N] HBM write if XLA fuses the reduce

    @jax.jit
    def mm_f32h_sum(qq, cc):
        d = jnp.einsum("qd,nd->qn", qq, cc, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(d)

    @jax.jit
    def mm_f32h_gmin(qq, cc):
        d = jnp.einsum("qd,nd->qn", qq, cc, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.min(d.reshape(Q, G, 128), axis=2)  # [Q, G] = 8MB out

    timeit("bf16 matmul+sum (fused, no dist write)", mm_bf16_sum, qb, cb)
    timeit("f32 HIGHEST matmul+sum", mm_f32h_sum, q, corpus)
    timeit("f32 HIGHEST matmul+groupmin [Q,G] out", mm_f32h_gmin, q, corpus)

    timeit("pallas kernel (dist+gmin to HBM)", lambda: fused_dist_groupmin(q, corpus, xn, thr))

    dist, gmin_t = jax.block_until_ready(fused_dist_groupmin(q, corpus, xn, thr))
    sync((dist, gmin_t))
    timeit("finish_block_select(k=128)", lambda: finish_block_select(dist, gmin_t, K))

    gmin = jax.block_until_ready(gmin_t.T.copy())

    timeit("lax.top_k(gmin [256,8192], 128)", jax.jit(lambda g: jax.lax.top_k(-g, K)), gmin)
    timeit("lax.approx_min_k(gmin, 128)",
           jax.jit(lambda g: jax.lax.approx_min_k(g, K)), gmin)
    timeit("lax.approx_min_k(gmin,128,recall=.99,aggr)",
           jax.jit(lambda g: jax.lax.approx_min_k(g, K, recall_target=0.99)), gmin)
    timeit("sort gmin 1-key values only", jax.jit(lambda g: jax.lax.sort(g, dimension=1)), gmin)
    timeit("variadic 2-key sort gmin+iota",
           jax.jit(lambda g: jax.lax.sort(
               (g, jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)), dimension=1, num_keys=2)), gmin)

    # the gather, honest (reduce output to scalar-ish)
    dist3 = dist.reshape(Q, G, 128)
    sel = jax.block_until_ready(jax.lax.top_k(-gmin, K)[1])

    @jax.jit
    def gather_sum(d3, s):
        g = jnp.take_along_axis(d3, s[:, :, None], axis=1)  # [Q, K, 128]
        return jnp.sum(g)

    timeit("take_along_axis gather [256,128,128]+sum", gather_sum, dist3, sel)

    # candidate-phase final selection candidates [Q, K*128]
    cand = jax.block_until_ready(
        jnp.take_along_axis(dist3, sel[:, :, None], axis=1).reshape(Q, K * 128))
    gidx = jax.block_until_ready(
        (sel[:, :, None] * 128 + jax.lax.broadcasted_iota(jnp.int32, (Q, K, 128), 2)
         ).reshape(Q, K * 128))

    timeit("2-key sort cand [256,16384]",
           jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=2)), cand, gidx)
    timeit("top_k(cand [256,16384], 128)",
           jax.jit(lambda a: jax.lax.top_k(-a, K)), cand)
    timeit("approx_min_k(cand, 128)",
           jax.jit(lambda a: jax.lax.approx_min_k(a, K)), cand)

    # approx_min_k exactness probe vs true top-k on gmin
    am_v, am_i = jax.jit(lambda g: jax.lax.approx_min_k(g, K))(gmin)
    tk_v, tk_i = jax.jit(lambda g: jax.lax.top_k(-g, K))(gmin)
    same = np.mean(np.sort(np.asarray(am_i), 1) == np.sort(np.asarray(tk_i), 1))
    print(f"approx_min_k default == exact top_k indices: {same:.4f}")
    am_v2, am_i2 = jax.jit(lambda g: jax.lax.approx_min_k(g, K, recall_target=0.999))(gmin)
    same2 = np.mean(np.sort(np.asarray(am_i2), 1) == np.sort(np.asarray(tk_i), 1))
    print(f"approx_min_k r=.999 == exact top_k indices: {same2:.4f}")


if __name__ == "__main__":
    main()
