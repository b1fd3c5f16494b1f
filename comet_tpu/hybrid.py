"""Hybrid coordinator — placeholder, implemented in a later milestone."""


class HybridSearchIndex:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("HybridSearchIndex: coming in the hybrid milestone")


def new_hybrid_search_index(*a, **k):  # pragma: no cover - stub
    raise NotImplementedError
