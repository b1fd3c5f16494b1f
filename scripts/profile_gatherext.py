"""Ablate the beam iteration's gather+score formulations at production
shape (Q=2048, E=8, W=32, 64 iters): the 3-gather blocked layout (current)
vs ONE extended-row gather [cap, W, D+8] whose last 8 bf16 columns carry
sqn (hi/lo split) and adj (three 7-bit digits) so the einsum runs straight
off the gathered row (query zero-padded) and no separate adj/sqn gathers
are needed. Tables are built ON DEVICE (host page-fault rate on this box
makes GB-scale numpy materialization minutes-slow)."""

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
EXT = 8
W = 32
Q = 2048
EF = 256
E = 8
EW = E * W
ITERS = 64

rng = np.random.default_rng(0)
adj_np = rng.integers(0, CAP, size=(CAP, W)).astype(np.int32)
vectors_np = rng.normal(size=(CAP, D)).astype(np.float32)


@jax.jit
def build_tables(adj, vectors):
    sqn = jnp.sum(vectors * vectors, axis=1)
    nc = jnp.maximum(adj, 0)
    nbr_vecs = vectors[nc].astype(jnp.bfloat16)         # [cap, W, D]
    nbr_sqn = jnp.where(adj >= 0, sqn[nc], 0.0)         # [cap, W] f32
    hi = nbr_sqn.astype(jnp.bfloat16)
    lo = (nbr_sqn - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    a1 = adj + 1                                        # sentinel -1 -> 0
    p0 = (a1 & 127).astype(jnp.bfloat16)
    p1 = ((a1 >> 7) & 127).astype(jnp.bfloat16)
    p2 = (a1 >> 14).astype(jnp.bfloat16)
    zero = jnp.zeros_like(hi, dtype=jnp.bfloat16)
    aux = jnp.stack([hi, lo, p0, p1, p2, zero, zero, zero], axis=2)
    ext = jnp.concatenate([nbr_vecs, aux], axis=2)      # [cap, W, D+8] bf16
    # one [cap, 4*W] bf16 aux row: [sqn | p0 | p1 | p2] — replaces the two
    # narrow (row-count-bound) adj + sqn gathers with a single gather
    auxrow = jnp.concatenate(
        [nbr_sqn.astype(jnp.bfloat16), p0, p1, p2], axis=1
    )                                                    # [cap, 128] bf16
    # one-table layout: [cap, W+1, D] bf16, row W = the aux plane — the
    # WHOLE expansion (vectors + sqn + adj) is a single gathered row; the
    # aux row's garbage distances are computed by the matmul and discarded
    one = jnp.concatenate([nbr_vecs, auxrow[:, None, :]], axis=1)
    return sqn, nbr_vecs, nbr_sqn, ext, auxrow, one


t0 = time.perf_counter()
adj = jnp.asarray(adj_np)
vectors = jnp.asarray(vectors_np)
sqn, nbr_vecs, nbr_sqn, ext, auxrow, one = jax.block_until_ready(build_tables(adj, vectors))
print(f"table build: {time.perf_counter() - t0:.1f}s", flush=True)

queries = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
qb = queries.astype(jnp.bfloat16)
qbe = jnp.pad(qb, ((0, 0), (0, EXT)))
qn = jnp.sum(queries * queries, axis=1)


@partial(jax.jit, static_argnames=("mode",))
def loop(qb_, qbe_, qn_, adj, nbr_vecs, nbr_sqn, ext, auxrow, one, mode="full"):
    beam_d = jnp.full((EF, Q), jnp.inf, jnp.float32).at[0].set(0.0)
    beam_s = jnp.full((EF, Q), 2**31 - 1, jnp.int32).at[0].set(
        jnp.arange(Q, dtype=jnp.int32) % CAP
    )
    beam_e = jnp.zeros((EF, Q), jnp.int32).at[0].set(1)
    nodes = jnp.arange(E * Q, dtype=jnp.int32).reshape(E, Q) % CAP

    def body(i, state):
        beam_d, beam_s, beam_e, nodes = state
        nc = jnp.maximum(nodes, 0)
        if mode in ("gatherext", "fullext"):
            row = ext[nc]                          # [E, Q, W, D+8] bf16
            ip = jnp.einsum(
                "qd,eqwd->ewq", qbe_, row, preferred_element_type=jnp.float32
            )                                      # ext cols hit zero-padded q
            aux = row[..., D:D + 5].astype(jnp.float32)   # [E, Q, W, 5]
            nsq = aux[..., 0] + aux[..., 1]
            neigh = (
                aux[..., 2] + aux[..., 3] * 128.0 + aux[..., 4] * 16384.0
            ).astype(jnp.int32) - 1
            nd = jnp.maximum(
                qn_[None, None, :] + nsq.transpose(0, 2, 1) - 2.0 * ip, 0.0
            ).reshape(EW, Q)
            ns = jnp.where(neigh >= 0, neigh, 2**31 - 1).transpose(0, 2, 1).reshape(EW, Q)
        elif mode in ("gatheraux", "fullaux"):
            nv = nbr_vecs[nc]                      # [E, Q, W, D]
            ar = auxrow[nc].astype(jnp.float32)    # [E, Q, 4W]
            nsq = ar[..., :W]
            neigh = (
                ar[..., W:2 * W] + ar[..., 2 * W:3 * W] * 128.0
                + ar[..., 3 * W:] * 16384.0
            ).astype(jnp.int32) - 1
            ip = jnp.einsum(
                "qd,eqwd->ewq", qb_, nv, preferred_element_type=jnp.float32
            )
            nd = jnp.maximum(
                qn_[None, None, :] + nsq.transpose(0, 2, 1) - 2.0 * ip, 0.0
            ).reshape(EW, Q)
            ns = jnp.where(neigh >= 0, neigh, 2**31 - 1).transpose(0, 2, 1).reshape(EW, Q)
        elif mode.startswith(("gathergroup", "fullgroup")):
            # G queries share ONE real matmul [G, D] x [D, G*E*W]: the MXU
            # computes GxG*E*W distances (waste factor G) but a [1,128]
            # matvec wastes 127/128 of the array anyway; cross terms are
            # discarded by a diagonal extract.
            G = int(mode.split("group")[-1])       # gathergroup8 -> 8
            ng = Q // G
            nodes_t = nodes.T                      # [Q, E]
            nv = nbr_vecs[jnp.maximum(nodes_t, 0)]  # [Q, E, W, D]
            ar = auxrow[jnp.maximum(nodes_t, 0)].astype(jnp.float32)  # [Q,E,4W]
            rhs = nv.reshape(ng, G * E * W, D)
            lhs = qb_.reshape(ng, G, D)
            ipg = jnp.einsum(
                "gqd,gkd->gqk", lhs, rhs, preferred_element_type=jnp.float32
            )                                      # [ng, G, G*E*W]
            # own-block diagonal: [ng, G, G, EW] -> [ng, G, EW]
            ipd = jnp.diagonal(
                ipg.reshape(ng, G, G, E * W), axis1=1, axis2=2
            )                                      # [ng, EW, G]
            ip = ipd.transpose(0, 2, 1).reshape(Q, E * W)
            nsq = ar[..., :W].reshape(Q, E * W)
            neigh = (
                ar[..., W:2 * W] + ar[..., 2 * W:3 * W] * 128.0
                + ar[..., 3 * W:] * 16384.0
            ).astype(jnp.int32).reshape(Q, E * W) - 1
            nd = jnp.maximum(qn_[:, None] + nsq - 2.0 * ip, 0.0).T  # [EW, Q]
            ns = jnp.where(neigh >= 0, neigh, 2**31 - 1).T
        elif mode.startswith(("gatherone", "fullone")):
            G = int(mode.split("one")[-1])
            ng = Q // G
            nodes_t = nodes.T                        # [Q, E]
            node_ok = nodes_t >= 0
            row = one[jnp.maximum(nodes_t, 0)]       # [Q, E, W+1, D]
            rhs = row.reshape(ng, G * E * (W + 1), D)
            lhs = qb_.reshape(ng, G, D)
            ipg = jnp.einsum(
                "gqd,gkd->gqk", lhs, rhs, preferred_element_type=jnp.float32
            )
            ipd = jnp.diagonal(
                ipg.reshape(ng, G, G, E * (W + 1)), axis1=1, axis2=2
            )                                        # [ng, E*(W+1), G]
            ip = (
                ipd.transpose(0, 2, 1)
                .reshape(Q, E, W + 1, 1)[:, :, :W, 0]
                .reshape(Q, E * W)
            )
            ar = row[:, :, W, :].astype(jnp.float32)  # [Q, E, D]
            nsq = ar[..., :W]
            neigh3 = (
                ar[..., W:2 * W] + ar[..., 2 * W:3 * W] * 128.0
                + ar[..., 3 * W:].astype(jnp.float32) * 16384.0
            ).astype(jnp.int32) - 1                  # [Q, E, W]
            ok3 = node_ok[:, :, None] & (neigh3 >= 0)
            nsq = nsq.reshape(Q, E * W)
            okf = ok3.reshape(Q, E * W)
            neigh = neigh3.reshape(Q, E * W)
            nd = jnp.maximum(qn_[:, None] + nsq - 2.0 * ip, 0.0)
            nd = jnp.where(okf, nd, jnp.inf).T
            ns = jnp.where(okf, neigh, 2**31 - 1).T
        elif mode == "merge":
            nd = beam_d[:EW] * 1.0001 + i * 1e-6
            ns = (beam_s[:EW] + i + 1) % CAP
        elif mode == "gatheronly":
            neigh = adj[nc]
            nv = nbr_vecs[nc]
            nsq = nbr_sqn[nc]
            nd = (
                nv[..., 0].astype(jnp.float32) + nsq
            ).transpose(0, 2, 1).reshape(EW, Q)
            ns = neigh.transpose(0, 2, 1).reshape(EW, Q)
        elif mode == "gathervec":
            nv = nbr_vecs[nc]                      # vec gather + einsum only
            ip = jnp.einsum(
                "qd,eqwd->ewq", qb_, nv, preferred_element_type=jnp.float32
            )
            nd = ip.reshape(EW, Q)
            ns = (beam_s[:EW] + i + 1) % CAP
        else:
            neigh = adj[nc]                        # [E, Q, W]
            nv = nbr_vecs[nc]                      # [E, Q, W, D]
            nsq = nbr_sqn[nc]
            ip = jnp.einsum(
                "qd,eqwd->ewq", qb_, nv, preferred_element_type=jnp.float32
            )
            nd = jnp.maximum(
                qn_[None, None, :] + nsq.transpose(0, 2, 1) - 2.0 * ip, 0.0
            ).reshape(EW, Q)
            ns = neigh.transpose(0, 2, 1).reshape(EW, Q)
        if mode in ("full", "fullext", "fullaux", "merge") or mode.startswith(("fullgroup", "fullone")):
            beam_d, beam_s, beam_e, misc, _, _ = beam_merge_step(
                beam_d, beam_s, beam_e, nd, ns,
                ef=EF, ew=EW, expand=E, fused=False,
            )
            nodes = misc[:E]
        else:
            beam_d = beam_d.at[0].add(jnp.min(nd, axis=0) * 0)
            nodes = jnp.abs(jnp.where(ns == 2**31 - 1, 0, ns)[:E]) % CAP
        return beam_d, beam_s, beam_e, nodes

    state = lax.fori_loop(0, ITERS, body, (beam_d, beam_s, beam_e, nodes))
    return state[0][0]


modes = sys.argv[1:] or ["gather", "gatheraux", "full", "fullaux"]
for mode in modes:
    out = np.asarray(loop(qb, qbe, qn, adj, nbr_vecs, nbr_sqn, ext, auxrow, one, mode=mode))
    t = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = np.asarray(loop(qb, qbe, qn, adj, nbr_vecs, nbr_sqn, ext, auxrow, one, mode=mode))
    dt = (time.perf_counter() - t) / reps
    print(f"{mode:10s}: {dt*1e3:8.1f} ms total, {dt/ITERS*1e3:6.2f} ms/iter", flush=True)
