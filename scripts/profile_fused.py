"""Per-iteration split of the packed-table lockstep beam at the bench
operating shapes (W=32, d=128, Q=2048, E=8): how much of one while_loop
iteration is (a) the packed-row gather, (b) gather+score (_gather_score),
(c) the Pallas merge step, (d) the whole loop body — and the A/B of the
new fully fused expand+score+merge kernel (fused_expand_merge) against
the split path, including a bit-parity check.

Synthetic random graph: identical memory behavior to a real one (the
gather is row-count-bound, the merge shape-bound). CAP = 512k keeps the
packed table + f32 vectors + transients inside the v5e's HBM.
"""

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

from comet_tpu.ops import beam_kernel as bk

CAP = 1 << 19
D = 128
W = 32
Q = 2048
E = 8
EW = E * W

rng = np.random.default_rng(0)
print("building synthetic packed table...", flush=True)
vecs_np = rng.normal(size=(CAP, D)).astype(np.float32)
vectors = jnp.asarray(vecs_np)
del vecs_np
sqnorms = jnp.sum(vectors * vectors, axis=1)
adj = jnp.asarray(rng.integers(0, CAP, size=(CAP, W), dtype=np.int32))
packed = bk.build_packed_table_chunked(adj, vectors, sqnorms)
packed.block_until_ready()
NDIG = bk._aux_digits(CAP)
print(f"packed table: {packed.shape} {packed.dtype}"
      f" = {packed.size * 2 / 1e9:.2f} GB, ndig={NDIG}", flush=True)

queries = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
qn = jnp.sum(queries * queries, axis=1)
qb = queries.astype(jnp.bfloat16)
nodes = jnp.asarray(rng.integers(0, CAP, size=(E, Q), dtype=np.int32))
allowed = jnp.ones(CAP, dtype=bool)


def _sync(out):
    # the axon tunnel does not actually sync on block_until_ready: a small
    # host transfer is the only honest fence (CLAUDE.md)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(tag, fn, *args, reps=20, iters=1):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:46s} {dt * 1e3 / iters:8.3f} ms", flush=True)
    return dt


@jax.jit
def gather_only(packed, nodes):
    nc = jnp.maximum(nodes.T, 0)
    return jnp.sum(packed[nc].astype(jnp.float32), axis=(1, 2))


@jax.jit
def gather_score(qb, qn, packed, nodes):
    return bk._gather_score(qb, qn, packed, None, nodes, EW)


@jax.jit
def fused_step(qb, qn, packed, nodes, beam_d, beam_s, beam_e):
    nc = jnp.maximum(nodes, 0)
    rows = packed[nc]                                  # [E, Q, row_len]
    return bk.fused_expand_merge(
        nodes, rows, qb, qn, beam_d, beam_s, beam_e,
        ef=beam_d.shape[0], W=W, d=D, ndig=NDIG, expand=E, stop=None,
    )


timeit("gather only (packed rows, E*Q=16384 rows)", gather_only, packed, nodes)
nd, ns, ok = gather_score(qb, qn, packed, nodes)
timeit("gather + score (_gather_score)", gather_score, qb, qn, packed, nodes)

for ef in (128, 256):
    beam_d = jnp.full((ef, Q), jnp.inf, jnp.float32).at[0].set(0.0)
    beam_s = jnp.full((ef, Q), bk.SENT, jnp.int32).at[0].set(0)
    beam_e = jnp.zeros((ef, Q), jnp.int32).at[0].set(1)
    merge = partial(
        bk.beam_merge_step, ef=ef, ew=EW, expand=E, fused=False,
        stop=None, use_pallas=True,
    )
    timeit(f"split: merge step          ef={ef}", merge,
           beam_d, beam_s, beam_e, nd, ns)

    # bit-parity: fused kernel vs split path on identical inputs
    sd, ss, se, smisc, _, _ = bk.beam_merge_step(
        beam_d, beam_s, beam_e, nd, ns, ef=ef, ew=EW, expand=E,
        fused=False, stop=None, use_pallas=True,
    )
    fd, fs, fe, fmisc = fused_step(qb, qn, packed, nodes,
                                   beam_d, beam_s, beam_e)
    same = all(
        bool(jnp.array_equal(a, b))
        for a, b in ((sd, fd), (ss, fs), (se, fe), (smisc, fmisc))
    )
    print(f"fused == split (ef={ef}): {same}", flush=True)
    timeit(f"fused: gather+score+merge  ef={ef}", fused_step,
           qb, qn, packed, nodes, beam_d, beam_s, beam_e)

# full loop at fixed iteration counts -> ms/iter
for fuse in (False, True):
    for ef, iters in ((128, 32), (256, 32)):
        def full(it=iters, ef=ef, fuse=fuse):
            return bk._beam_search_jit(
                queries, jnp.zeros(Q, jnp.int32), packed, None, vectors,
                sqnorms, allowed, jnp.float32(np.inf),
                ef=ef, k=100, expand=E, max_iters=jnp.int32(it),
                fused=False, stop=None, fuse=fuse,
            )
        tag = "fused" if fuse else "split"
        timeit(f"{tag} full loop ef={ef} iters={iters} (ms/iter)", full,
               reps=5, iters=iters)
