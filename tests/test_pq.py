"""PQIndex tests (mirrors pq_index_test.go + pq_index_search_test.go
coverage, plus an exact numpy-ADC-oracle harness)."""

import io

import numpy as np
import pytest

from comet_tpu.indexes.pq import PQIndex, calculate_pq_params
from comet_tpu.types import (
    DistanceKind,
    InvalidConfigError,
    NotTrainedError,
    VectorIndexKind,
)

from oracle import recall_at_k, topk_np, distances_np


def np_adc_oracle(queries, codebooks, codes):
    """Numpy ADC: LUT of squared subspace distances, sum, sqrt."""
    Q = len(queries)
    n, m = codes.shape
    ksub, dsub = codebooks.shape[1], codebooks.shape[2]
    qs = queries.reshape(Q, m, dsub)
    lut = ((qs[:, :, None, :] - codebooks[None]) ** 2).sum(axis=3)  # [Q, M, K]
    dist = np.zeros((Q, n), dtype=np.float32)
    for mm in range(m):
        dist += lut[:, mm, codes[:, mm]]
    return np.sqrt(dist)


def np_encode(vectors, codebooks):
    n = len(vectors)
    m, ksub, dsub = codebooks.shape
    vs = vectors.reshape(n, m, dsub)
    codes = np.zeros((n, m), dtype=np.int32)
    for mm in range(m):
        d = ((vs[:, mm, None, :] - codebooks[mm][None]) ** 2).sum(axis=2)
        codes[:, mm] = d.argmin(axis=1)
    return codes


def trained_pq(rng, n=300, dim=16, m=4, nbits=4):
    idx = PQIndex(dim, DistanceKind.L2, m=m, nbits=nbits)
    data = rng.normal(size=(n, dim)).astype(np.float32)
    idx.train(data)
    idx.add_batch(data, ids=list(range(1, n + 1)))
    return idx, data


def test_params_validation():
    with pytest.raises(InvalidConfigError):
        PQIndex(10, DistanceKind.L2, m=3)  # 10 % 3 != 0
    with pytest.raises(InvalidConfigError):
        PQIndex(16, DistanceKind.L2, m=4, nbits=0)
    with pytest.raises(InvalidConfigError):
        PQIndex(16, DistanceKind.L2, m=4, nbits=17)
    idx = PQIndex(16, DistanceKind.L2, m=4, nbits=4)
    assert idx.kind() == VectorIndexKind.PQ
    assert idx.m == 4 and idx.nbits == 4 and idx.ksub == 16


def test_calculate_pq_params():
    assert calculate_pq_params(128) == (8, 8)
    assert calculate_pq_params(96) == (8, 8)
    m, nbits = calculate_pq_params(36)  # not divisible by 8 -> 9, 12, ...
    assert 36 % m == 0 and nbits == 8


def test_untrained_errors():
    idx = PQIndex(16, DistanceKind.L2, m=4, nbits=4)
    with pytest.raises(NotTrainedError):
        idx.add_batch(np.zeros((1, 16), dtype=np.float32))
    with pytest.raises(NotTrainedError):
        idx.new_search().with_query([0.0] * 16).execute()


def test_train_needs_ksub_vectors(rng):
    idx = PQIndex(16, DistanceKind.L2, m=4, nbits=8)  # needs 256
    with pytest.raises(InvalidConfigError):
        idx.train(rng.normal(size=(100, 16)).astype(np.float32))


def test_adc_scores_match_numpy_oracle(rng):
    idx, data = trained_pq(rng)
    codebooks = idx._codebooks
    codes = np_encode(data, codebooks)
    np.testing.assert_array_equal(idx._codes[: len(data)], codes)

    q = rng.normal(size=(3, 16)).astype(np.float32)
    want = np_adc_oracle(q, codebooks, codes)
    ws, wi = topk_np(want, 10)
    for qi in range(3):
        res = idx.new_search().with_query(q[qi]).with_k(10).execute()
        got_ids = [r.node.id for r in res]
        assert got_ids == [int(j) + 1 for j in wi[qi]]
        np.testing.assert_allclose(
            [r.score for r in res], ws[qi], rtol=1e-4, atol=1e-4
        )


def test_recall_vs_exact(rng):
    """PQ is approximate but must be decent: recall@10 over exact L2."""
    idx, data = trained_pq(rng, n=500, dim=32, m=8, nbits=6)
    q = rng.normal(size=(8, 32)).astype(np.float32)
    _, wi = topk_np(distances_np(q, data, "l2"), 10)
    found = []
    for qi in range(8):
        res = idx.new_search().with_query(q[qi]).with_k(10).execute()
        found.append([r.node.id for r in res])
    rec = recall_at_k(found, wi + 1)
    assert rec > 0.5, rec


def test_soft_delete_flush_filter_threshold(rng):
    idx, data = trained_pq(rng)
    idx.remove(1)
    res = idx.new_search().with_query(data[0]).with_k(20).execute()
    assert 1 not in [r.node.id for r in res]
    idx.flush()
    assert idx.count() == len(data) - 1

    res = (
        idx.new_search().with_query(data[1]).with_k(20)
        .with_document_ids([2, 3]).execute()
    )
    assert sorted(r.node.id for r in res) == [2, 3]

    res = idx.new_search().with_query(data[1]).with_k(300).with_threshold(2.0).execute()
    assert all(r.score <= 2.0 for r in res)


def test_with_node_uses_decoded_vector(rng):
    idx, data = trained_pq(rng)
    res = idx.new_search().with_node(5).with_k(3).execute()
    # decoded query of node 5 should rank node 5 at (or very near) the top
    assert 5 in [r.node.id for r in res]


def test_result_nodes_carry_decoded_vectors(rng):
    idx, data = trained_pq(rng)
    res = idx.new_search().with_query(data[0]).with_k(1).execute()
    v = res[0].node.vector
    assert v.shape == (16,)
    # decoded vector approximates the original
    assert np.linalg.norm(v - data[res[0].node.id - 1]) < np.linalg.norm(data[res[0].node.id - 1])


def test_serialization_roundtrip(rng):
    idx, data = trained_pq(rng)
    buf = io.BytesIO()
    idx.write_to(buf)
    buf.seek(0)
    idx2 = PQIndex(16, DistanceKind.L2, m=4, nbits=4)
    idx2.read_from(buf)
    assert idx2.count() == idx.count()
    r1 = idx.new_search().with_query(data[0]).with_k(5).execute()
    r2 = idx2.new_search().with_query(data[0]).with_k(5).execute()
    assert [r.node.id for r in r1] == [r.node.id for r in r2]
    np.testing.assert_allclose(
        [r.score for r in r1], [r.score for r in r2], rtol=1e-5
    )


def test_serialization_param_mismatch(rng):
    idx, _ = trained_pq(rng)
    buf = io.BytesIO()
    idx.write_to(buf)
    from comet_tpu.io.serial import SerializationError

    buf.seek(0)
    with pytest.raises(SerializationError):
        PQIndex(16, DistanceKind.L2, m=8, nbits=4).read_from(buf)


def test_cosine_pq(rng):
    idx = PQIndex(16, DistanceKind.COSINE, m=4, nbits=4)
    data = rng.normal(size=(200, 16)).astype(np.float32)
    idx.train(data)
    idx.add_batch(data, ids=list(range(1, 201)))
    res = idx.new_search().with_query(data[0]).with_k(5).execute()
    assert len(res) == 5
    # normalized self-query should be near the top with small distance
    assert res[0].score < 0.5


def test_pq_opq_roundtrip_and_recall(rng):
    """PQ OPQ extension: orthogonal rotation internal to the model; search
    serves user-space queries, decode returns user-space vectors, recall on
    anisotropic data improves vs the unrotated split, and CPQX v3
    round-trips the rotation."""
    import io as _io

    n, dim = 800, 16
    base = rng.normal(size=(n, dim)).astype(np.float32)
    scalemat = np.diag(np.linspace(0.05, 3.0, dim).astype(np.float32))
    mix = np.linalg.qr(rng.normal(size=(dim, dim)))[0].astype(np.float32)
    data = (base @ scalemat @ mix).astype(np.float32)
    q = rng.normal(size=(16, dim)).astype(np.float32) @ scalemat @ mix

    from oracle import distances_np, recall_at_k, topk_np

    _, wi = topk_np(distances_np(q, data, "l2"), 10)
    true_ids = wi + 1

    def build(opq):
        idx = PQIndex(dim, DistanceKind.L2, m=4, nbits=6, opq=opq,
                      opq_iters=4)
        idx.train(data)
        idx.add_batch(data, ids=list(range(1, n + 1)))
        return idx

    plain, rotated = build(False), build(True)
    assert rotated._rot is not None
    np.testing.assert_allclose(rotated._rot @ rotated._rot.T, np.eye(dim),
                               atol=1e-4)

    def rec(idx):
        found, _ = idx.search_batch(q, k=10)
        return recall_at_k(found, true_ids)

    assert rec(rotated) >= rec(plain) - 0.02  # never meaningfully worse
    # decode is user-space: reconstruction correlates with the original
    s0 = rotated._store.id_to_slot[1]
    rec0 = rotated._decode(rotated._codes[s0][None, :])[0]
    assert np.linalg.norm(rec0 - data[0]) < np.linalg.norm(data[0])

    buf = _io.BytesIO()
    rotated.write_to(buf)
    buf.seek(0)
    idx2 = PQIndex(dim, DistanceKind.L2, m=4, nbits=6)
    idx2.read_from(buf)
    np.testing.assert_array_equal(idx2._rot, rotated._rot)
    a, _ = rotated.search_batch(q, k=5)
    b, _ = idx2.search_batch(q, k=5)
    np.testing.assert_array_equal(a, b)
