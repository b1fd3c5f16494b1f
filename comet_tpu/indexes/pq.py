"""PQ index — placeholder, implemented in a later milestone."""


class PQIndex:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("PQIndex: coming in the PQ milestone")


def calculate_pq_params(*a, **k):  # pragma: no cover - stub
    raise NotImplementedError
