"""Pallas fused scan + pipeline: interpreter-mode numerics vs the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.ops.pallas_scan import (
    TN,
    TQ,
    IDX_SENTINEL,
    flat_topk_pipeline,
    fused_dist_select,
)

from oracle import distances_np, topk_np


def _xt(x):
    return jnp.asarray(np.ascontiguousarray(x.T))


def test_fused_kernel_matches_oracle(rng):
    Q, N, d, kb, group = TQ, 2 * TN, 16, 16, 32
    q = rng.normal(size=(Q, d)).astype(np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    sqn = (x * x).sum(axis=1).astype(np.float32)
    valid = np.ones(N, dtype=bool)
    valid[::7] = False
    xn_masked = np.where(valid, sqn, np.inf).astype(np.float32)

    dist, gsel = fused_dist_select(
        jnp.asarray(q), _xt(x), jnp.asarray(xn_masked),
        jnp.asarray(np.float32(np.inf)), kb, group=group, interpret=True,
    )
    want = distances_np(q, x, "l2_squared")
    want = np.where(valid[None, :], want, np.inf)
    got = np.asarray(dist)
    fin = np.isfinite(want)
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-4, atol=1e-4)
    assert np.all(np.isinf(got[~fin]))
    # group selection: exact top-kb groups by (min, group id) per query
    gmin = want.reshape(Q, N // group, group).min(axis=2)  # [Q, G]
    order = np.lexsort(
        (np.broadcast_to(np.arange(gmin.shape[1]), gmin.shape), gmin), axis=1
    )[:, :kb]
    got_sel = np.sort(np.asarray(gsel)[0].T, axis=1)
    np.testing.assert_array_equal(got_sel, np.sort(order, axis=1))


def test_fused_kernel_threshold(rng):
    Q, N, d = TQ, TN, 8
    q = np.zeros((Q, d), dtype=np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    sqn = (x * x).sum(axis=1).astype(np.float32)
    thr = np.float32(np.median(sqn))
    dist, _ = fused_dist_select(
        jnp.asarray(q), _xt(x), jnp.asarray(sqn),
        jnp.asarray(thr), 8, interpret=True,
    )
    got = np.asarray(dist)[0]
    assert np.all(np.isinf(got[sqn > thr]))
    assert np.all(np.isfinite(got[sqn <= thr]))


@pytest.mark.parametrize("k", [1, 10, 100])
def test_pipeline_matches_oracle(rng, k):
    Q, N, d = TQ, 2 * TN, 16
    q = rng.normal(size=(Q, d)).astype(np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    sqn = (x * x).sum(axis=1).astype(np.float32)
    valid = np.ones(N, dtype=bool)
    valid[::5] = False
    xn_masked = np.where(valid, sqn, np.inf).astype(np.float32)

    s, i = flat_topk_pipeline(
        jnp.asarray(q), _xt(x),
        jnp.asarray(xn_masked), jnp.asarray(np.float32(np.inf)),
        k, interpret=True,
    )
    want = distances_np(q, x, "l2_squared")
    want = np.where(valid[None, :], want, np.inf)
    ws, wi = topk_np(want, k)
    np.testing.assert_array_equal(np.asarray(i), wi)
    fin = np.isfinite(ws)
    np.testing.assert_allclose(np.asarray(s)[fin], ws[fin], rtol=1e-4, atol=1e-4)


def test_pipeline_cosine_and_multichunk(rng):
    # two query chunks exercise the lax.map path; cosine exercises the
    # 1 - q.x distance mode with the 0/+inf additive mask
    Q, N, d, k = 2 * TQ, TN, 16, 7
    q = rng.normal(size=(Q, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    x = rng.normal(size=(N, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    valid = np.ones(N, dtype=bool)
    valid[1::3] = False
    mask_vec = np.where(valid, 0.0, np.inf).astype(np.float32)

    s, i = flat_topk_pipeline(
        jnp.asarray(q), _xt(x),
        jnp.asarray(mask_vec), jnp.asarray(np.float32(np.inf)),
        k, cosine=True, interpret=True,
    )
    want = distances_np(q, x, "cosine")
    want = np.where(valid[None, :], want, np.inf)
    ws, wi = topk_np(want, k)
    np.testing.assert_array_equal(np.asarray(i), wi)
    fin = np.isfinite(ws)
    np.testing.assert_allclose(np.asarray(s)[fin], ws[fin], rtol=1e-4, atol=1e-4)


def test_pipeline_threshold_empties(rng):
    Q, N, d, k = TQ, TN, 8, 5
    q = rng.normal(size=(Q, d)).astype(np.float32) * 100.0
    x = rng.normal(size=(N, d)).astype(np.float32)
    sqn = (x * x).sum(axis=1).astype(np.float32)
    s, i = flat_topk_pipeline(
        jnp.asarray(q), _xt(x),
        jnp.asarray(sqn), jnp.asarray(np.float32(1e-12)),
        k, interpret=True,
    )
    assert np.all(np.isinf(np.asarray(s)))
    assert np.all(np.asarray(i) == int(IDX_SENTINEL))


def test_cand_topk_hier_bit_identical(rng):
    """The hierarchical candidate select must be BIT-identical to the flat
    formulation (gather-all + one topk_cl), including tie order, for any
    kept-group set — random values and a tie-heavy duplicate grid."""
    from jax import lax

    from comet_tpu.ops.sortnet import cand_topk_hier, topk_cl

    Q, G, group, kb, k = 128, 32, 128, 16, 16
    for case in ("random", "ties"):
        if case == "random":
            d = rng.normal(size=(Q, G, group)).astype(np.float32)
        else:
            # few distinct values -> massive cross-group ties
            d = rng.integers(0, 4, size=(Q, G, group)).astype(np.float32)
        # arbitrary kept-group ids, unsorted, per query
        gsel = np.stack(
            [rng.permutation(G)[:kb] for _ in range(Q)], axis=1
        ).astype(np.int32)

        d_j, g_j = jnp.asarray(d), jnp.asarray(gsel)
        hv, hi = cand_topk_hier(d_j, g_j, k, sub=32, interpret=True)

        # flat oracle: gather all kb*group rows, one topk_cl
        gsel_s = jnp.sort(g_j, axis=0)
        cand = jnp.take_along_axis(
            d_j, gsel_s.T[:, :, None], axis=1
        ).reshape(Q, kb * group).T
        cidx = (
            gsel_s[:, None, :] * group
            + lax.broadcasted_iota(jnp.int32, (kb, group, Q), 1)
        ).reshape(kb * group, Q)
        fv, fi = topk_cl(cand, cidx, k, interpret=True)

        np.testing.assert_array_equal(np.asarray(hv), np.asarray(fv), case)
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(fi), case)
