"""Multi-chip sharding: corpus-sharded search + distributed k-means over a
jax.sharding Mesh."""

from comet_tpu.parallel.sharded import (
    ShardedFlatSearcher,
    ShardedHNSWSearcher,
    ShardedHybridSearcher,
    ShardedIVFPQSearcher,
    ShardedIVFSearcher,
    ShardedPQSearcher,
    ShardedSeededHNSWSearcher,
    make_corpus_mesh,
    make_sharded_ivf_search,
    make_sharded_kmeans_step,
    make_sharded_search,
    shard_rows,
)

__all__ = [
    "ShardedFlatSearcher",
    "ShardedHNSWSearcher",
    "ShardedHybridSearcher",
    "ShardedIVFPQSearcher",
    "ShardedIVFSearcher",
    "ShardedPQSearcher",
    "ShardedSeededHNSWSearcher",
    "make_corpus_mesh",
    "make_sharded_ivf_search",
    "make_sharded_kmeans_step",
    "make_sharded_search",
    "shard_rows",
]
