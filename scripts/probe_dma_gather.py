"""Decide the one-kernel-beam architecture: can an in-kernel Pallas DMA
gather beat XLA's row gather?

The HNSW beam iteration is ROW-COUNT-bound on its neighbor gather (~29
ns/row on the v5e regardless of row size, CLAUDE.md). The fused-kernel
roadmap item (VERDICT r4 #1) proposes DMA'ing the packed rows HBM->VMEM
inside the kernel. This probe measures the per-row cost of:

  a) XLA gather of R rows (the current split/fused paths' producer),
  b) a Pallas kernel issuing one async DMA per row from an HBM-resident
     table into VMEM scratch (double-buffered in waves),

at the bench shapes (row_len 4224 bf16 = 8448 B, R = 16384 rows/iter).
If (b) is not meaningfully faster than (a), the one-kernel design must
keep the XLA gather as producer and the win must come from somewhere else
(fewer HBM round-trips of the gathered block, fewer iterations).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

CAP = 1 << 19
ROW = 4224            # bf16 payload per row (W=32 packed table at d=128)
R = 16384             # rows gathered per beam iteration (E*Q = 8*2048)
LANE = 128
WAVE = 16             # DMAs in flight per wave

CAP = int(os.environ.get("PROBE_CAP", CAP))
# generate ON DEVICE: the tunnel has multi-hour slow regimes where a GB
# upload takes minutes (r5 measured ~10 MB/s incompressible); synthetic
# bytes must never cross the wire
key = jax.random.PRNGKey(0)
table = jax.jit(
    lambda k: jax.random.randint(k, (CAP, ROW), 0, 8, jnp.int32).astype(
        jnp.bfloat16
    )
)(key)
idx = jax.jit(
    lambda k: jax.random.randint(k, (R,), 0, CAP, jnp.int32)
)(jax.random.PRNGKey(1))


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def timeit(tag, fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:42s} {dt * 1e3:8.3f} ms  ({dt / R * 1e9:6.1f} ns/row)",
          flush=True)


@jax.jit
def xla_gather(table, idx):
    return table[idx].astype(jnp.float32).sum(axis=1)


def dma_kernel(idx_ref, table_ref, out_ref, scratch, sems):
    """Gather `block` rows per program: waves of WAVE outstanding DMAs."""
    rows_here = scratch.shape[0]  # == block rows of out
    g0 = pl.program_id(0) * rows_here

    def wave(w, _):
        base = w * WAVE

        def start(i, _):
            r = base + i
            pltpu.make_async_copy(
                table_ref.at[idx_ref[g0 + r]], scratch.at[r], sems.at[i]
            ).start()
            return 0

        jax.lax.fori_loop(0, WAVE, start, 0)

        def wait(i, _):
            r = base + i
            pltpu.make_async_copy(
                table_ref.at[idx_ref[g0 + r]], scratch.at[r], sems.at[i]
            ).wait()
            return 0

        jax.lax.fori_loop(0, WAVE, wait, 0)
        return 0

    jax.lax.fori_loop(0, rows_here // WAVE, wave, 0)
    out_ref[:] = scratch[:].astype(jnp.float32).sum(axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("block",))
def dma_gather(table, idx, block=128):
    grid = (R // block,)
    return pl.pallas_call(
        dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (block, 1), lambda b, idx_ref: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((block, ROW), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((WAVE,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(idx, table)


print(f"table {table.shape} bf16 = {table.size * 2 / 1e9:.2f} GB", flush=True)
timeit("xla gather (R=16384 x 8448B)", xla_gather, table, idx)
ok = False
try:
    got = dma_gather(table, idx)
    want = xla_gather(table, idx)
    ok = bool(jnp.allclose(got.ravel(), want, rtol=1e-2))
    print("dma == xla:", ok, flush=True)
    timeit("pallas per-row DMA gather", dma_gather, table, idx)
except Exception as e:  # noqa: BLE001
    print("dma gather failed:", repr(e)[:4000], flush=True)
