"""Metadata index — placeholder, implemented in a later milestone."""


class RoaringMetadataIndex:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("RoaringMetadataIndex: coming in the metadata milestone")


class Filter:  # pragma: no cover - stub
    pass


class FilterGroup:  # pragma: no cover - stub
    pass


def _stub(*a, **k):  # pragma: no cover - stub
    raise NotImplementedError


eq = ne = gt = gte = lt = lte = range_filter = in_filter = not_in = exists = not_exists = _stub
