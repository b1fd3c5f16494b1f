"""Corrupt-payload fuzz for every index read_from (VERDICT r2 missing #3).

The reference's serialization tests only round-trip clean payloads; the
durability contract here is stronger: a corrupted blob must either raise a
member of the documented error set or deserialize into an index that still
answers count()/search without crashing — never hang, never segfault,
never silently half-load (docs/PERSISTENCE.md, format registry).
"""

import io

import numpy as np
import pytest

from comet_tpu import (
    BM25SearchIndex,
    DistanceKind,
    FlatIndex,
    HNSWIndex,
    IVFIndex,
    IVFPQIndex,
    PQIndex,
    RoaringMetadataIndex,
)
from comet_tpu.core.node import new_metadata_node_with_id
from comet_tpu.io.serial import SerializationError

ALLOWED = (SerializationError, EOFError, OSError, ValueError, KeyError,
           IndexError, MemoryError)

DIM = 8
N = 24


def _vec_data(rng):
    return rng.normal(size=(N, DIM)).astype(np.float32)


def _populate(kind, rng):
    if kind == "flat":
        idx = FlatIndex(DIM, DistanceKind.L2)
        idx.add_batch(_vec_data(rng), ids=range(1, N + 1))
    elif kind == "hnsw":
        idx = HNSWIndex(DIM, DistanceKind.L2)
        idx.add_batch(_vec_data(rng), ids=range(1, N + 1))
    elif kind == "ivf":
        idx = IVFIndex(DIM, 2, DistanceKind.L2)
        idx.train(_vec_data(rng))
        idx.add_batch(_vec_data(rng), ids=range(1, N + 1))
    elif kind == "pq":
        idx = PQIndex(DIM, DistanceKind.L2, m=2, nbits=4)
        idx.train(_vec_data(rng))
        idx.add_batch(_vec_data(rng), ids=range(1, N + 1))
    elif kind == "ivfpq":
        idx = IVFPQIndex(DIM, DistanceKind.L2, nlist=2, m=2, nbits=4)
        idx.train(_vec_data(rng))
        idx.add_batch(_vec_data(rng), ids=range(1, N + 1))
    elif kind == "bm25":
        idx = BM25SearchIndex()
        words = ["alpha", "bravo", "charlie", "delta", "echo"]
        for i in range(1, N + 1):
            idx.add(i, " ".join(rng.choice(words, size=6)))
    elif kind == "metadata":
        idx = RoaringMetadataIndex()
        idx.add_batch(
            [
                new_metadata_node_with_id(
                    i, {"cat": f"c{i % 3}", "rank": int(i)}
                )
                for i in range(1, N + 1)
            ]
        )
    else:  # pragma: no cover
        raise AssertionError(kind)
    return idx


def _fresh(kind):
    return {
        "flat": lambda: FlatIndex(DIM, DistanceKind.L2),
        "hnsw": lambda: HNSWIndex(DIM, DistanceKind.L2),
        "ivf": lambda: IVFIndex(DIM, 2, DistanceKind.L2),
        "pq": lambda: PQIndex(DIM, DistanceKind.L2, m=2, nbits=4),
        "ivfpq": lambda: IVFPQIndex(DIM, DistanceKind.L2, nlist=2, m=2, nbits=4),
        "bm25": BM25SearchIndex,
        "metadata": RoaringMetadataIndex,
    }[kind]()


def _poke(idx, kind, rng):
    """Exercise the loaded index; any crash here fails the fuzz case."""
    try:
        n = idx.count()
        assert 0 <= n <= 10 * N
        if kind == "bm25":
            idx.new_search().with_query("alpha").with_k(5).execute()
        elif kind == "metadata":
            from comet_tpu.indexes.metadata import eq

            idx.new_search().with_filters(eq("cat", "c1")).execute()
        else:
            q = rng.normal(size=DIM).astype(np.float32)
            idx.new_search().with_query(q).with_k(3).execute()
    except ALLOWED:
        pass  # detected the corruption late — still a clean failure


KINDS = ["flat", "hnsw", "ivf", "pq", "ivfpq", "bm25", "metadata"]


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(7)
    out = {}
    for kind in KINDS:
        buf = io.BytesIO()
        _populate(kind, rng).write_to(buf)
        out[kind] = buf.getvalue()
    return out


@pytest.mark.parametrize("kind", KINDS)
def test_truncation_ladder(kind, blobs, rng):
    blob = blobs[kind]
    cuts = sorted({max(1, len(blob) * i // 9) for i in range(1, 9)})
    for cut in cuts:
        fresh = _fresh(kind)
        try:
            fresh.read_from(io.BytesIO(blob[:cut]))
        except ALLOWED:
            continue
        _poke(fresh, kind, rng)  # loaded despite the cut: must stay sane


@pytest.mark.parametrize("kind", KINDS)
def test_byteflip_fuzz(kind, blobs, rng):
    blob = blobs[kind]
    fuzz_rng = np.random.default_rng(13)
    positions = sorted(
        set(fuzz_rng.integers(0, len(blob), size=24).tolist())
        | set(range(min(8, len(blob))))
    )
    for pos in positions:
        raw = bytearray(blob)
        raw[pos] ^= 0xFF
        fresh = _fresh(kind)
        try:
            fresh.read_from(io.BytesIO(bytes(raw)))
        except ALLOWED:
            continue
        _poke(fresh, kind, rng)


@pytest.mark.parametrize("kind", KINDS)
def test_magic_corruption_is_rejected(kind, blobs):
    raw = bytearray(blobs[kind])
    raw[0] ^= 0xFF
    with pytest.raises(ALLOWED):
        _fresh(kind).read_from(io.BytesIO(bytes(raw)))


@pytest.mark.parametrize("kind", KINDS)
def test_wrong_family_blob_is_rejected(kind, blobs):
    """Feeding index A's blob to index B must raise, not half-load."""
    other = KINDS[(KINDS.index(kind) + 1) % len(KINDS)]
    with pytest.raises(ALLOWED):
        _fresh(kind).read_from(io.BytesIO(blobs[other]))


@pytest.mark.parametrize("kind", KINDS)
def test_roundtrip_then_trailing_garbage(kind, blobs, rng):
    """Trailing garbage after a valid payload must not corrupt the load
    (formats are length-delimited, not EOF-delimited)."""
    fresh = _fresh(kind)
    fresh.read_from(io.BytesIO(blobs[kind] + b"\xde\xad\xbe\xef" * 8))
    assert fresh.count() == N
    _poke(fresh, kind, rng)
