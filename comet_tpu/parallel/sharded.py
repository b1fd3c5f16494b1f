"""Corpus sharding across a TPU device mesh.

The reference is a single Go process; its only "parallelism" is mutexes and
goroutines (SURVEY.md §2 checklist). The TPU-native scaling axis is SPMD over
an ICI mesh (jax.sharding + shard_map):

- Search: the corpus [N, d] is row-sharded over a 1-D mesh. Each device runs
  the same streaming masked top-k on its local shard, offsets local slot
  indices to global slots, then an `all_gather` of the per-shard [Q, k]
  (score, slot) pairs rides the ICI and a two-key sort merges them — exactly
  the per-shard-top-k + gather/merge plan from SURVEY.md §5.8.
- K-means training: per-shard partial centroid sums/counts are combined with
  `psum` over the mesh, so IVF/PQ training scales to corpora that don't fit
  one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from comet_tpu.ops.distance import pairwise_scores
from comet_tpu.ops.topk import IDX_SENTINEL, scan_topk
from comet_tpu.types import DistanceKind

AXIS = "shard"


def make_corpus_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; the corpus rows shard over it."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def shard_rows(mesh: Mesh, *arrays):
    """Place arrays with their leading axis sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(AXIS) if a.ndim >= 1 else P()
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def make_sharded_search(mesh: Mesh, k: int, kind: DistanceKind, tile: int):
    """Build a jitted sharded exact-search step.

    fn(queries [Q, d] replicated, corpus [N, d] row-sharded, sqnorms [N],
    valid [N], threshold scalar) -> (scores [Q, k], global_slots [Q, k]),
    replicated on every device.
    """

    def local(queries, corpus, sqnorms, valid, threshold):
        n_local = corpus.shape[0]
        s, i = scan_topk(queries, corpus, sqnorms, valid, threshold, k, kind, tile)
        base = lax.axis_index(AXIS).astype(jnp.int32) * n_local
        gi = jnp.where(i == IDX_SENTINEL, IDX_SENTINEL, i + base)
        # All-gather the tiny [Q, k] candidate sets over ICI and merge.
        all_s = lax.all_gather(s, AXIS, axis=1, tiled=True)   # [Q, n_dev*k]
        all_i = lax.all_gather(gi, AXIS, axis=1, tiled=True)
        ss, ii = lax.sort((all_s, all_i), dimension=1, num_keys=2)
        return ss[:, :k], ii[:, :k]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_kmeans_step(mesh: Mesh, kind: DistanceKind):
    """Build a jitted distributed k-means step (assignment + psum'd update).

    fn(vectors [N, d] row-sharded, valid [N] row-sharded, prev_assign [N]
    row-sharded, centroids [k, d] replicated)
      -> (assign [N] sharded, new_centroids [k, d] replicated,
          changed scalar replicated)
    Empty clusters keep their previous centroid (clustering.go:236-238).
    """

    def local(vectors, valid, prev_assign, centroids):
        k = centroids.shape[0]
        dist = pairwise_scores(vectors, centroids, kind)
        assign = jnp.argmin(dist, axis=1).astype(jnp.int32)
        assign = jnp.where(valid, assign, k)
        w = valid.astype(jnp.float32)
        sums = jax.ops.segment_sum(vectors * w[:, None], assign, num_segments=k + 1)[:k]
        counts = jax.ops.segment_sum(w, assign, num_segments=k + 1)[:k]
        sums = lax.psum(sums, AXIS)
        counts = lax.psum(counts, AXIS)
        changed = lax.pmax(
            jnp.any((assign != prev_assign) & valid).astype(jnp.int32), AXIS
        )
        counts_col = counts[:, None]
        new_centroids = jnp.where(
            counts_col > 0, sums / jnp.maximum(counts_col, 1.0), centroids
        )
        return assign, new_centroids, changed

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedFlatSearcher:
    """Convenience wrapper: shard a corpus once, search many times.

    This is the multi-chip serving path for the flat index: corpus rows live
    sharded across the mesh's HBM; every search broadcasts the (small) query
    batch, runs per-shard scans in parallel, and merges k-candidates over ICI.
    """

    def __init__(
        self,
        mesh: Mesh,
        corpus: np.ndarray,
        kind: DistanceKind = DistanceKind.L2,
        tile: int = 1 << 17,
    ):
        n_dev = mesh.devices.size
        n = corpus.shape[0]
        shard = -(-n // n_dev)
        # pad so rows divide evenly over devices and tiles
        shard = max(((shard + tile - 1) // tile) * tile, tile) if shard > tile else shard
        n_pad = shard * n_dev
        pad = np.zeros((n_pad, corpus.shape[1]), dtype=np.float32)
        pad[:n] = corpus
        valid = np.zeros(n_pad, dtype=bool)
        valid[:n] = True
        self.mesh = mesh
        self.kind = DistanceKind(kind)
        self.tile = min(tile, shard)
        self.n = n
        self.corpus, self.valid = shard_rows(mesh, pad, valid)
        self.sqnorms = shard_rows(mesh, (pad * pad).sum(axis=1).astype(np.float32))
        self._search_fns: dict[int, object] = {}

    def search(self, queries: np.ndarray, k: int):
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        fn = self._search_fns.get(k)
        if fn is None:
            fn = make_sharded_search(self.mesh, k, self.kind, self.tile)
            self._search_fns[k] = fn
        s, i = fn(
            jnp.asarray(queries), self.corpus, self.sqnorms, self.valid,
            jnp.asarray(np.float32(np.inf)),
        )
        return np.asarray(s), np.asarray(i)
