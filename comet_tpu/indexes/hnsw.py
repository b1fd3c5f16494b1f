"""HNSW index — placeholder, implemented in a later milestone."""


class HNSWIndex:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("HNSWIndex: coming in the HNSW milestone")


class HNSWConfig:  # pragma: no cover - stub
    pass
