"""Isolate dispatch-floor overhead vs real compute; test matmul layouts."""

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

N, D, Q = 1 << 20, 128, 256


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timeit(name, fn, *args, rounds=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / rounds
    print(f"{name:56s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    timeit("trivial x+1 [8,128] (dispatch floor)", jax.jit(lambda a: a + 1.0), x)

    big = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    timeit("sum(big [4096,4096]) 64MB read", jax.jit(lambda a: jnp.sum(a)), big)

    corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    corpus_t = jnp.asarray(np.ascontiguousarray(
        rng.normal(size=(N, D)).astype(np.float32).T))  # [D, N]
    q = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    cb_t = corpus_t.astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)

    @jax.jit
    def mm_t_bf16(qq, cc_t):
        d = jnp.einsum("qd,dn->qn", qq, cc_t, preferred_element_type=jnp.float32)
        return jnp.sum(d)

    @jax.jit
    def mm_t_f32h(qq, cc_t):
        d = jnp.einsum("qd,dn->qn", qq, cc_t, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(d)

    timeit("bf16 matmul TRANSPOSED corpus [d,N]", mm_t_bf16, qb, cb_t)
    timeit("f32H matmul TRANSPOSED corpus [d,N]", mm_t_f32h, q, corpus_t)

    for qsz in (512, 1024, 2048):
        qq = jnp.asarray(rng.normal(size=(qsz, D)).astype(np.float32))

        @jax.jit
        def mm_big(a, cc):
            d = jnp.einsum("qd,nd->qn", a, cc, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(d)

        dt = timeit(f"f32H matmul Q={qsz} [nd layout]", mm_big, qq, corpus, rounds=5)
        print(f"    -> {qsz * N * D * 2 / dt / 1e12:.1f} TFLOPS", flush=True)

    # chained dispatches: does a 2-op chain cost 2 floors or pipeline?
    f1 = jax.jit(lambda a: a * 2.0)
    sync(f1(x))

    def chain4(a):
        for _ in range(4):
            a = f1(a)
        return a

    timeit("4 chained trivial dispatches", chain4, x)


if __name__ == "__main__":
    main()
