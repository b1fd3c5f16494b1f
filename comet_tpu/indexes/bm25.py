"""BM25 text index — placeholder, implemented in a later milestone."""


class BM25SearchIndex:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("BM25SearchIndex: coming in the BM25 milestone")
