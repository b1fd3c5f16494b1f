"""Bisect the Pallas merge kernel's 463ms anomaly: which phase is slow?"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comet_tpu.ops import beam_kernel as bk

EF, EW, Q, L = 256, 256, 2048, 128
C = 512
rng = np.random.default_rng(0)
bd = jnp.asarray(np.sort(rng.random((EF, Q)).astype(np.float32), axis=0))
bs = jnp.asarray(rng.permutation(EF * Q).reshape(EF, Q).astype(np.int32))
be = jnp.asarray(np.zeros((EF, Q), np.int32))
nd = jnp.asarray(rng.random((EW, Q)).astype(np.float32))
ns = jnp.asarray(rng.integers(0, 100000, size=(EW, Q), dtype=np.int32))


def spec(rows):
    return pl.BlockSpec((rows, L), lambda b: (0, b), memory_space=pltpu.VMEM)


def mk(mode):
    def kern(bd_r, bs_r, be_r, nd_r, ns_r, od, osl, oe):
        d = jnp.concatenate([bd_r[:], nd_r[:]], axis=0)
        s = jnp.concatenate([bs_r[:], ns_r[:]], axis=0)
        e = jnp.concatenate(
            [be_r[:], jnp.zeros((EW, L), jnp.int32)], axis=0
        )
        if mode == "phase1":
            s, e, d = bk._sort_chunks_multi((s, e, d), bk._less_slot, C)
        elif mode == "phase1_2arr":
            s, d = bk._sort_chunks_multi(
                (s, d), lambda a, b: (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1])), C
            )
        elif mode == "phase2":
            d, s, e = bk._topk_multi((d, s, e), bk._less_score3, EF)
        elif mode == "phase2_2arr":
            d, s = bk._topk_multi((d, s), bk._less_score, EF)
        elif mode == "prefix":
            r = bk._prefix_sum_rows((d > 0.5).astype(jnp.int32))
            s = s + r
        elif mode == "full":
            s, e, d = bk._sort_chunks_multi((s, e, d), bk._less_slot, C)
            prev = bk._roll_sub(s, 1)
            dup = (s == prev) & (bk._rows_iota(C) > 0)
            d = jnp.where(dup, jnp.inf, d)
            pos = bk._rows_iota(C) + jnp.zeros((C, L), jnp.int32)
            s = jnp.where(d == jnp.inf, bk.FAKE_BASE + pos, s)
            d, s, e = bk._topk_multi((d, s, e), bk._less_score3, EF)
        od[:] = d[:EF]
        osl[:] = s[:EF]
        oe[:] = e[:EF] if mode != "phase2_2arr" else jnp.zeros((EF, L), jnp.int32)
        return

    return kern


def run(mode):
    fn = jax.jit(
        lambda *a: pl.pallas_call(
            mk(mode),
            grid=(Q // L,),
            in_specs=[spec(EF), spec(EF), spec(EF), spec(EW), spec(EW)],
            out_specs=[spec(EF), spec(EF), spec(EF)],
            out_shape=[
                jax.ShapeDtypeStruct((EF, Q), jnp.float32),
                jax.ShapeDtypeStruct((EF, Q), jnp.int32),
                jax.ShapeDtypeStruct((EF, Q), jnp.int32),
            ],
        )(*a)
    )
    t0 = time.perf_counter()
    out = fn(bd, bs, be, nd, ns)
    np.asarray(out[0])
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(bd, bs, be, nd, ns)
    np.asarray(out[0])
    warm = (time.perf_counter() - t0) / 10
    print(f"{mode:14s} compile {compile_t:7.1f}s  warm {warm*1e3:8.2f} ms/call",
          flush=True)


for mode in sys.argv[1:] or ["prefix", "phase2_2arr", "phase2", "phase1_2arr", "phase1", "full"]:
    run(mode)
