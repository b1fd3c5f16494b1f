"""Ablate one beam iteration at production shape: merge-only vs gather
variants vs full body, 64 fixed iterations, Q=2048. All arrays passed as
jit ARGS (closure capture bloats compiles with GB-scale constants)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from comet_tpu.ops.beam_kernel import beam_merge_step

CAP = 1 << 18
D = 128
W = 32
Q = 2048
EF = 256
E = 8
EW = E * W
ITERS = 64

rng = np.random.default_rng(0)
adj_np = rng.integers(0, CAP, size=(CAP, W)).astype(np.int32)
vectors_np = rng.normal(size=(CAP, D)).astype(np.float32)
sqn_np = (vectors_np * vectors_np).sum(1)
packed_np = np.zeros((CAP, 2176), np.float32)
pv = vectors_np[adj_np].astype(np.float32)  # placeholder payload
packed_np[:, :2048] = pv.reshape(CAP, -1)[:, :4096:2]
packed_np[:, 2048:2080] = sqn_np[adj_np]
packed_np[:, 2080:2112] = adj_np.view(np.float32)
ARGS = dict(
    adj=jnp.asarray(adj_np),
    nbr_vecs=jnp.asarray(vectors_np[adj_np], dtype=jnp.bfloat16),
    nbr_sqn=jnp.asarray(sqn_np[adj_np]),
    packed=jnp.asarray(packed_np),
)
queries = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
qb = queries.astype(jnp.bfloat16)
qn = jnp.sum(queries * queries, axis=1)


@partial(jax.jit, static_argnames=("mode",))
def loop(qb_, qn_, adj, nbr_vecs, nbr_sqn, packed, mode="full"):
    beam_d = jnp.full((EF, Q), jnp.inf, jnp.float32).at[0].set(0.0)
    beam_s = jnp.full((EF, Q), 2**31 - 1, jnp.int32).at[0].set(
        jnp.arange(Q, dtype=jnp.int32) % CAP
    )
    beam_e = jnp.zeros((EF, Q), jnp.int32).at[0].set(1)
    nodes = jnp.arange(E * Q, dtype=jnp.int32).reshape(E, Q) % CAP

    def body(i, state):
        beam_d, beam_s, beam_e, nodes = state
        nc = jnp.maximum(nodes, 0)
        if mode == "gatherpacked":
            # ONE gather for vecs+sqn+adj (row-count-bound hypothesis)
            row = packed[nc]                      # [E, Q, 2176] f32
            nvp = jax.lax.bitcast_convert_type(
                row[..., :2048], jnp.bfloat16
            ).reshape(E, Q, W, D)                 # [E, Q, W, d] bf16
            nsq = row[..., 2048:2080]
            neigh = jax.lax.bitcast_convert_type(
                row[..., 2080:2112], jnp.int32
            ).reshape(E, Q, W)
            ip = jnp.einsum(
                "qd,eqwd->ewq", qb_, nvp, preferred_element_type=jnp.float32
            )
            nd = jnp.maximum(
                qn_[None, None, :] + nsq.transpose(0, 2, 1) - 2.0 * ip, 0.0
            ).reshape(EW, Q)
            ns = neigh.transpose(0, 2, 1).reshape(EW, Q)
        elif mode in ("full", "gather", "gathermul", "fullmul", "gatheronly"):
            neigh = adj[nc]                       # [E, Q, W]
            nv = nbr_vecs[nc]                     # [E, Q, W, d]
            nsq = nbr_sqn[nc]
            if mode == "gatheronly":
                # raw gather cost: touch the gathered block, no dot
                nd = (
                    nv[..., 0].astype(jnp.float32) + nsq
                ).transpose(0, 2, 1).reshape(EW, Q)
            elif mode in ("gathermul", "fullmul"):
                # elementwise multiply-reduce (VPU) instead of the
                # batch-2048 matvec einsum (MXU-hostile)
                ip = jnp.sum(
                    (qb_[None, :, None, :] * nv).astype(jnp.float32), axis=-1
                )                                  # [E, Q, W]
                nd = jnp.maximum(
                    qn_[None, :, None] + nsq - 2.0 * ip, 0.0
                ).transpose(0, 2, 1).reshape(EW, Q)
            else:
                ip = jnp.einsum(
                    "qd,eqwd->ewq", qb_, nv, preferred_element_type=jnp.float32
                )
                nd = jnp.maximum(
                    qn_[None, None, :] + nsq.transpose(0, 2, 1) - 2.0 * ip, 0.0
                ).reshape(EW, Q)
            ns = neigh.transpose(0, 2, 1).reshape(EW, Q)
        else:
            nd = beam_d[:EW] * 1.0001 + i * 1e-6
            ns = (beam_s[:EW] + i + 1) % CAP
        if mode in ("full", "fullmul", "merge"):
            beam_d, beam_s, beam_e, misc, _, _ = beam_merge_step(
                beam_d, beam_s, beam_e, nd, ns,
                ef=EF, ew=EW, expand=E, fused=False,
            )
            nodes = misc[:E]
        else:
            beam_d = beam_d.at[0].add(jnp.min(nd, axis=0) * 0)
            nodes = jnp.abs(ns[:E]) % CAP
        return beam_d, beam_s, beam_e, nodes

    state = lax.fori_loop(0, ITERS, body, (beam_d, beam_s, beam_e, nodes))
    return state[0][0]


modes = sys.argv[1:] or ["merge", "gather", "gathermul", "full", "fullmul"]
for mode in modes:
    out = np.asarray(loop(qb, qn, mode=mode, **ARGS))  # compile+run
    t = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = np.asarray(loop(qb, qn, mode=mode, **ARGS))
    dt = (time.perf_counter() - t) / reps
    print(f"{mode:10s}: {dt*1e3:8.1f} ms total, {dt/ITERS*1e3:6.2f} ms/iter", flush=True)
