"""K-means clustering on TPU.

Behavioral port of the reference's shared trainer (clustering.go:119-243):

- Deterministic init: uniform-stride sampling — centroid j = vectors[j * (n//k)]
  (clustering.go:144-162), so training is reproducible without RNG.
- Assignment: argmin over distances; ties go to the lowest centroid index
  (Go's strict `<` comparison == argmin first-occurrence).
- Convergence: stop when no assignment changed, checked BEFORE the centroid
  update (clustering.go:203-205).
- Empty clusters keep their old centroid (clustering.go:236-238).

TPU-native design: the assignment step is a tiled [N, d] x [d, k] MXU matmul
+ argmin; the update step is a segment-sum (one pass, like the reference's
single-pass accumulation but data-parallel). Large N streams through a
lax.scan so the [N, k] distance matrix never fully materializes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from comet_tpu.ops.distance import pairwise_scores
from comet_tpu.types import DistanceKind

DEFAULT_MAX_ITER = 20  # clustering.go:14
ASSIGN_TILE = 1 << 16


@partial(jax.jit, static_argnames=("kind", "tile"))
def _kmeans_step(
    vectors: jax.Array,   # [Npad, d] f32 (padded rows are garbage)
    valid: jax.Array,     # [Npad] bool
    prev_assign: jax.Array,  # [Npad] int32
    centroids: jax.Array,    # [k, d] f32
    kind: DistanceKind,
    tile: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One assignment + update step. Returns (assign, sums, counts, changed)."""
    n_pad, d = vectors.shape
    k = centroids.shape[0]
    num_tiles = n_pad // tile

    def tile_assign(x_tile, valid_tile):
        dist = pairwise_scores(x_tile, centroids, kind)  # [tile, k]
        a = jnp.argmin(dist, axis=1).astype(jnp.int32)
        # padded rows go to segment k (dropped)
        return jnp.where(valid_tile, a, k)

    if num_tiles <= 1:
        assign = tile_assign(vectors, valid)
    else:
        xs = vectors.reshape(num_tiles, tile, d)
        vs = valid.reshape(num_tiles, tile)
        _, assign_t = lax.scan(
            lambda c, inp: (c, tile_assign(*inp)), None, (xs, vs)
        )
        assign = assign_t.reshape(n_pad)

    w = valid.astype(jnp.float32)
    sums = jax.ops.segment_sum(vectors * w[:, None], assign, num_segments=k + 1)[:k]
    counts = jax.ops.segment_sum(w, assign, num_segments=k + 1)[:k]
    changed = jnp.any((assign != prev_assign) & valid)
    return assign, sums, counts, changed


def _pad_rows(x: np.ndarray, multiple: int) -> tuple[np.ndarray, np.ndarray]:
    n = x.shape[0]
    n_pad = ((n + multiple - 1) // multiple) * multiple
    if n_pad == n:
        return x, np.ones(n, dtype=bool)
    out = np.zeros((n_pad, x.shape[1]), dtype=x.dtype)
    out[:n] = x
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    return out, valid


def init_centroids(vectors: np.ndarray, k: int) -> np.ndarray:
    """Uniform-stride deterministic init (clustering.go:144-162)."""
    n = len(vectors)
    step = max(n // k, 1)
    idx = np.minimum(np.arange(k) * step, n - 1)
    return vectors[idx].astype(np.float32).copy()


def kmeans(
    vectors: np.ndarray,
    k: int,
    kind: DistanceKind = DistanceKind.L2_SQUARED,
    max_iter: int = DEFAULT_MAX_ITER,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd's k-means with reference-parity init/convergence/empty-cluster
    rules. Returns (centroids [k, d] f32, assignments [n] int64)."""
    vectors = np.ascontiguousarray(np.asarray(vectors, dtype=np.float32))
    n = len(vectors)
    if n == 0 or k <= 0:
        return np.zeros((0, vectors.shape[1] if vectors.ndim == 2 else 0), np.float32), np.zeros(0, np.int64)
    k = min(k, n)
    if max_iter <= 0:
        max_iter = DEFAULT_MAX_ITER

    tile = min(ASSIGN_TILE, 1 << (max(n - 1, 1)).bit_length())
    x_pad, valid = _pad_rows(vectors, tile)
    x_dev = jnp.asarray(x_pad)
    valid_dev = jnp.asarray(valid)

    centroids = jnp.asarray(init_centroids(vectors, k))
    assign = jnp.full(len(x_pad), -1, dtype=jnp.int32)

    for _ in range(max_iter):
        new_assign, sums, counts, changed = _kmeans_step(
            x_dev, valid_dev, assign, centroids, kind, tile
        )
        assign = new_assign
        if not bool(changed):
            break  # converged before updating centroids (clustering.go:203-205)
        # empty clusters keep the old centroid (clustering.go:236-238)
        counts_col = counts[:, None]
        centroids = jnp.where(counts_col > 0, sums / jnp.maximum(counts_col, 1.0), centroids)

    cent_np = np.asarray(centroids)
    assign_np = np.asarray(assign)[:n].astype(np.int64)
    return cent_np, assign_np


def kmeans_subspace(
    vectors: np.ndarray,  # [n, M, dsub]
    k: int,
    max_iter: int = DEFAULT_MAX_ITER,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-subspace k-means for PQ codebooks (clustering.go:112-115 forces
    L2^2). Returns (codebooks [M, k, dsub], assignments [n, M])."""
    n, m, dsub = vectors.shape
    codebooks = np.zeros((m, min(k, n), dsub), dtype=np.float32)
    assigns = np.zeros((n, m), dtype=np.int64)
    for sub in range(m):
        c, a = kmeans(vectors[:, sub, :], k, DistanceKind.L2_SQUARED, max_iter)
        codebooks[sub] = c
        assigns[:, sub] = a
    return codebooks, assigns


@partial(jax.jit, static_argnames=("kind",))
def _nearest_centroid(vectors: jax.Array, centroids: jax.Array, kind: DistanceKind):
    dist = pairwise_scores(vectors, centroids, kind)
    return jnp.argmin(dist, axis=1).astype(jnp.int32), jnp.min(dist, axis=1)


def find_nearest_centroid(
    vectors: np.ndarray,
    centroids: np.ndarray,
    kind: DistanceKind = DistanceKind.L2_SQUARED,
) -> np.ndarray:
    """Index of the nearest centroid per vector (clustering.go:259-272)."""
    v = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
    idx, _ = _nearest_centroid(jnp.asarray(v), jnp.asarray(centroids, dtype=jnp.float32), kind)
    return np.asarray(idx).astype(np.int64)
