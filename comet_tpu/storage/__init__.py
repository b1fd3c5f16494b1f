"""LSM-style persistent storage — placeholder, implemented in a later milestone."""


class StorageConfig:  # pragma: no cover - stub
    pass


def default_storage_config():  # pragma: no cover - stub
    raise NotImplementedError


class PersistentHybridIndex:  # pragma: no cover - stub
    pass


def open_persistent_hybrid_index(*a, **k):  # pragma: no cover - stub
    raise NotImplementedError
