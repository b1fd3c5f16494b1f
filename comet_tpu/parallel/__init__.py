"""Multi-chip sharding: corpus-sharded search + distributed k-means over a
jax.sharding Mesh."""
