"""Streaming masked top-k tests: exactness vs numpy oracle, tie-breaking,
tiling, thresholds, masks."""

import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.ops.topk import IDX_SENTINEL, merge_topk, scan_topk
from comet_tpu.types import DistanceKind

from oracle import distances_np, topk_np


def run_scan(q, x, valid=None, threshold=np.inf, k=4, kind=DistanceKind.L2, tile=None):
    n = x.shape[0]
    tile = tile or n
    sqn = (x * x).sum(axis=1)
    if valid is None:
        valid = np.ones(n, dtype=bool)
    s, i = scan_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sqn), jnp.asarray(valid),
        jnp.asarray(np.float32(threshold)), k, kind, tile,
    )
    return np.asarray(s), np.asarray(i)


@pytest.mark.parametrize("tile_frac", [1, 2, 4])
@pytest.mark.parametrize("kind", [DistanceKind.L2, DistanceKind.L2_SQUARED])
def test_scan_topk_matches_oracle(tile_frac, kind, rng):
    Q, N, d, k = 5, 64, 8, 7
    q = rng.normal(size=(Q, d)).astype(np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    s, i = run_scan(q, x, k=k, kind=kind, tile=N // tile_frac)
    ws, wi = topk_np(distances_np(q, x, kind.value), k)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-4, atol=1e-4)


def test_tie_break_prefers_lower_index():
    # Three identical corpus rows: ties must resolve to ascending slot index.
    x = np.tile(np.array([[1.0, 0.0]], dtype=np.float32), (8, 1))
    q = np.array([[1.0, 0.0]], dtype=np.float32)
    s, i = run_scan(q, x, k=3)
    np.testing.assert_array_equal(i[0], [0, 1, 2])


def test_tie_break_across_tiles():
    x = np.tile(np.array([[1.0, 0.0]], dtype=np.float32), (8, 1))
    q = np.array([[1.0, 0.0]], dtype=np.float32)
    s, i = run_scan(q, x, k=3, tile=2)  # 4 tiles
    np.testing.assert_array_equal(i[0], [0, 1, 2])


def test_mask_excludes_rows(rng):
    q = rng.normal(size=(2, 4)).astype(np.float32)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    valid = np.ones(16, dtype=bool)
    valid[[0, 3, 7]] = False
    s, i = run_scan(q, x, valid=valid, k=16)
    for row in i:
        hits = set(int(v) for v in row if v != int(IDX_SENTINEL))
        assert not hits & {0, 3, 7}
        assert len(hits) == 13


def test_all_masked_returns_sentinels():
    q = np.zeros((1, 4), dtype=np.float32)
    x = np.ones((8, 4), dtype=np.float32)
    s, i = run_scan(q, x, valid=np.zeros(8, dtype=bool), k=4)
    assert np.all(i == int(IDX_SENTINEL))
    assert np.all(np.isinf(s))


def test_threshold_masks_far_rows():
    q = np.array([[0.0, 0.0]], dtype=np.float32)
    x = np.array([[1.0, 0.0], [2.0, 0.0], [5.0, 0.0]], dtype=np.float32)
    x = np.vstack([x, np.full((5, 2), 100.0, dtype=np.float32)])
    s, i = run_scan(q, x, threshold=2.5, k=8)
    kept = [int(v) for v in i[0] if v != int(IDX_SENTINEL)]
    assert kept == [0, 1]  # distances 1, 2 pass; 5 and 100s fail


def test_merge_topk_lexicographic():
    sa = jnp.array([[1.0, 3.0]], dtype=jnp.float32)
    ia = jnp.array([[5, 9]], dtype=jnp.int32)
    sb = jnp.array([[1.0, 2.0]], dtype=jnp.float32)
    ib = jnp.array([[2, 7]], dtype=jnp.int32)
    s, i = merge_topk(sa, ia, sb, ib, 3)
    np.testing.assert_allclose(np.asarray(s)[0], [1.0, 1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(i)[0], [2, 5, 7])


def test_cosine_scan(rng):
    q = rng.normal(size=(3, 8)).astype(np.float32)
    x = rng.normal(size=(32, 8)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    s, i = run_scan(qn, xn, k=5, kind=DistanceKind.COSINE, tile=8)
    ws, wi = topk_np(distances_np(qn, xn, "cosine"), 5)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# block_topk (fast exact path)
# ---------------------------------------------------------------------------

from comet_tpu.ops.topk import block_topk


def run_block(q, x, valid=None, threshold=np.inf, k=4, kind=DistanceKind.L2,
              block=4, super_tile=None):
    n = x.shape[0]
    st = super_tile or n
    sqn = (x * x).sum(axis=1)
    if valid is None:
        valid = np.ones(n, dtype=bool)
    s, i = block_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sqn), jnp.asarray(valid),
        jnp.asarray(np.float32(threshold)), k, kind, block, st,
    )
    return np.asarray(s), np.asarray(i)


@pytest.mark.parametrize("super_frac", [1, 2, 4])
@pytest.mark.parametrize("kind", [DistanceKind.L2, DistanceKind.L2_SQUARED, DistanceKind.COSINE])
def test_block_topk_matches_oracle(super_frac, kind, rng):
    Q, N, d, k = 5, 256, 8, 9
    q = rng.normal(size=(Q, d)).astype(np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    if kind == DistanceKind.COSINE:
        q = q / np.linalg.norm(q, axis=1, keepdims=True)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
    s, i = run_block(q, x, k=k, kind=kind, block=8, super_tile=N // super_frac)
    ws, wi = topk_np(distances_np(q, x, kind.value), k)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-4, atol=1e-4)


def test_block_topk_tie_determinism_with_duplicates(rng):
    # Corpus of repeated rows: ties everywhere; order must still be ascending
    # global index, matching the stable oracle.
    base = rng.normal(size=(8, 4)).astype(np.float32)
    x = np.tile(base, (16, 1))  # 128 rows, every row duplicated 16x
    q = rng.normal(size=(3, 4)).astype(np.float32)
    s, i = run_block(q, x, k=20, block=8, super_tile=32)
    ws, wi = topk_np(distances_np(q, x, "l2"), 20)
    np.testing.assert_array_equal(i, wi)


def test_block_topk_mask_and_threshold(rng):
    q = np.array([[0.0, 0.0]], dtype=np.float32)
    x = np.stack([np.arange(64, dtype=np.float32), np.zeros(64, dtype=np.float32)], axis=1)
    valid = np.ones(64, dtype=bool)
    valid[1] = False
    s, i = run_block(q, x, valid=valid, threshold=4.5, k=10, block=8)
    kept = [int(v) for v in i[0] if v != int(IDX_SENTINEL)]
    assert kept == [0, 2, 3, 4]  # 1 masked, >4.5 thresholded


def test_block_topk_agrees_with_scan_topk(rng):
    Q, N, d, k = 4, 512, 16, 17
    q = rng.normal(size=(Q, d)).astype(np.float32)
    x = rng.normal(size=(N, d)).astype(np.float32)
    s1, i1 = run_block(q, x, k=k, block=16, super_tile=128)
    s2, i2 = run_scan(q, x, k=k, tile=64)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_block_topk_k_exceeds_candidates(rng):
    # k larger than block*groups coverage edge: k > N
    q = rng.normal(size=(2, 4)).astype(np.float32)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    s, i = run_block(q, x, k=32, block=4)
    assert i.shape == (2, 32)
    assert np.all(i[:, 16:] == int(IDX_SENTINEL))
    ws, wi = topk_np(distances_np(q, x, "l2"), 32)
    np.testing.assert_array_equal(np.where(i == int(IDX_SENTINEL), -1, i), wi)
