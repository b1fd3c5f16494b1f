"""Node model + global ID generation (counterpart of the reference's
node.go surface; the Go repo exercises it implicitly — here it gets a
dedicated file because storage recovery depends on the counter contract)."""

import threading

import numpy as np
import pytest

from comet_tpu.core.node import (
    MetadataNode,
    VectorNode,
    _reset_node_id_counter,
    ensure_node_id_at_least,
    new_metadata_node,
    new_metadata_node_with_id,
    new_vector_node,
    new_vector_node_with_id,
    next_node_id,
    reserve_node_ids,
)


@pytest.fixture(autouse=True)
def _fresh_counter():
    _reset_node_id_counter()
    yield
    _reset_node_id_counter()


def test_auto_ids_monotonic_from_one():
    assert next_node_id() == 1
    assert next_node_id() == 2
    assert new_vector_node(np.zeros(4)).id == 3
    assert new_metadata_node({"a": 1}).id == 4


def test_reserve_block_is_consecutive_and_advances():
    first = reserve_node_ids(10)
    assert first == 1
    assert next_node_id() == 11


def test_reserve_zero_reserves_nothing():
    first = reserve_node_ids(0)
    assert first == 1  # "first" of an empty block
    assert next_node_id() == 1


def test_ensure_at_least_bumps_but_never_rewinds():
    ensure_node_id_at_least(100)
    assert next_node_id() == 101
    ensure_node_id_at_least(5)  # rewind attempt ignored
    assert next_node_id() == 102


def test_concurrent_allocation_is_collision_free():
    ids: list[int] = []
    lock = threading.Lock()

    def worker():
        got = [next_node_id() for _ in range(200)]
        with lock:
            ids.extend(got)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(ids) == len(set(ids)) == 1600
    assert max(ids) == 1600


def test_concurrent_reserve_blocks_do_not_overlap():
    blocks: list[tuple[int, int]] = []
    lock = threading.Lock()

    def worker():
        for _ in range(50):
            first = reserve_node_ids(7)
            with lock:
                blocks.append((first, first + 7))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    blocks.sort()
    for (a0, a1), (b0, _b1) in zip(blocks, blocks[1:]):
        assert a1 <= b0, "overlapping reserved ID blocks"


def test_vector_node_fields_and_parity_aliases():
    v = np.arange(4, dtype=np.float64)
    node = new_vector_node(v)
    assert node.vector.dtype == np.float32  # coerced like the Go float32 slices
    assert node.ID() == node.id
    np.testing.assert_array_equal(node.Vector(), node.vector)

    explicit = new_vector_node_with_id(0, v)  # 0 is a valid explicit ID
    assert explicit.id == 0


def test_metadata_node_copies_the_dict():
    src = {"k": "v"}
    node = new_metadata_node_with_id(7, src)
    src["k"] = "mutated"
    assert node.Metadata() == {"k": "v"}
    assert node.ID() == 7


def test_nodes_are_frozen():
    node = VectorNode(1, np.zeros(2, np.float32))
    with pytest.raises(Exception):
        node.id = 2  # type: ignore[misc]
    meta = MetadataNode(1, {})
    with pytest.raises(Exception):
        meta.id = 2  # type: ignore[misc]
