import faulthandler, signal
faulthandler.dump_traceback_later(60, exit=True)
import time

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from comet_tpu.ops import beam_kernel as bk

C, L = 32, 128
rng = np.random.default_rng(0)
a = jnp.asarray(rng.random((C, L)).astype(np.float32))
b = jnp.asarray(rng.random((C, L)).astype(np.float32))


def spec(rows):
    return pl.BlockSpec((rows, L), lambda q: (0, q), memory_space=pltpu.VMEM)


def k_trivial(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] + b_ref[:]


def k_concat(a_ref, b_ref, o_ref):
    x = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
    o_ref[:] = x[:C, :] + x[C:, :]


def k_sort(a_ref, b_ref, o_ref):
    x = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
    s = (x * 100).astype(jnp.int32)
    e = jnp.zeros_like(s)
    s2, e2, d2 = bk._sort_chunks_multi((s, e, x), bk._less_slot, 2 * C)
    o_ref[:] = d2[:C]


def k_prefix(a_ref, b_ref, o_ref):
    p = bk._prefix_sum_rows((a_ref[:] > 0.5).astype(jnp.int32))
    o_ref[:] = p.astype(jnp.float32)


for name, kern in (
    ("trivial", k_trivial), ("concat", k_concat),
    ("prefix", k_prefix), ("sort", k_sort),
):
    t0 = time.perf_counter()
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[spec(C), spec(C)],
        out_specs=spec(C),
        out_shape=jax.ShapeDtypeStruct((C, L), jnp.float32),
        interpret=True,
    )(a, b)
    np.asarray(out)
    print(name, time.perf_counter() - t0, flush=True)
