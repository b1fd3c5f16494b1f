"""IVF index — placeholder, implemented in a later milestone."""


class IVFIndex:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("IVFIndex: coming in the IVF milestone")
