"""Pallas fused scan kernel: interpreter-mode numerics vs the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.ops.pallas_scan import (
    GROUP,
    TN,
    TQ,
    finish_block_select,
    fused_dist_groupmin,
)

from oracle import distances_np, topk_np


def test_fused_kernel_matches_oracle(rng):
    Q, N, d, k = TQ, 2 * TN, 16, 10
    q = rng.normal(size=(Q, d)).astype(np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    sqn = (x * x).sum(axis=1).astype(np.float32)
    valid = np.ones(N, dtype=bool)
    valid[::7] = False
    xn_masked = np.where(valid, sqn, np.inf).astype(np.float32)

    dist, gmin_t = fused_dist_groupmin(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(xn_masked),
        jnp.asarray(np.float32(np.inf)), interpret=True,
    )
    want = distances_np(q, x, "l2_squared")
    want = np.where(valid[None, :], want, np.inf)
    got = np.asarray(dist)
    fin = np.isfinite(want)
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-4, atol=1e-4)
    assert np.all(np.isinf(got[~fin]))
    # group minima
    want_gmin = want.reshape(Q, N // GROUP, GROUP).min(axis=2)
    np.testing.assert_allclose(np.asarray(gmin_t).T, want_gmin, rtol=1e-4, atol=1e-4)

    # end-to-end selection matches the stable oracle
    s, i = finish_block_select(dist, gmin_t, k)
    ws, wi = topk_np(want, k)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-4, atol=1e-4)


def test_fused_kernel_threshold(rng):
    Q, N, d = TQ, TN, 8
    q = np.zeros((Q, d), dtype=np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    sqn = (x * x).sum(axis=1).astype(np.float32)
    thr = np.float32(np.median(sqn))
    dist, _ = fused_dist_groupmin(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sqn),
        jnp.asarray(thr), interpret=True,
    )
    got = np.asarray(dist)[0]
    assert np.all(np.isinf(got[sqn > thr]))
    assert np.all(np.isfinite(got[sqn <= thr]))
