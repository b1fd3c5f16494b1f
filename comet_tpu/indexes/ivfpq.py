"""IVFPQ index — placeholder, implemented in a later milestone."""


class IVFPQIndex:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("IVFPQIndex: coming in the IVFPQ milestone")
