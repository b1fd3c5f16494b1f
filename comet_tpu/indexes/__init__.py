"""Index engines: flat / IVF / PQ / IVFPQ / HNSW vector indexes, BM25 text,
and the roaring+BSI-equivalent metadata index."""
