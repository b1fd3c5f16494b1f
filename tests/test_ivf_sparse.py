"""Block-sparse IVF scan (ops/ivf_sparse): layout, chunk lists, and the
full pipeline vs a numpy probed-lists oracle (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.ops import ivf_sparse as sp
from comet_tpu.ops.ivf_sparse import (
    CHUNK,
    QG,
    build_cluster_major,
    default_budgets,
    ivf_sparse_pipeline,
)

from oracle import distances_np


def _layout(assign, nlist):
    lay = build_cluster_major(assign, nlist)
    return lay


def test_cluster_major_layout_properties(rng):
    nlist = 7
    n = 1000
    assign = rng.integers(-1, nlist, size=n).astype(np.int32)  # -1 = dropped
    lay = _layout(assign, nlist)
    perm = lay["perm"]
    cs = lay["chunk_start"]
    assert len(perm) % CHUNK == 0
    # every assigned slot appears exactly once; dropped slots never appear
    live = np.flatnonzero(assign >= 0)
    got = perm[perm >= 0]
    assert sorted(got.tolist()) == sorted(live.tolist())
    # rows of cluster c sit inside its chunk range, nowhere else
    for c in range(nlist):
        lo, hi = cs[c] * CHUNK, cs[c + 1] * CHUNK
        rows = perm[lo:hi]
        members = rows[rows >= 0]
        assert np.all(assign[members] == c)
        assert len(members) == (assign == c).sum()
    assert lay["max_chunks"] == max(int(lay["nchunks"].max()), 1)


def test_cluster_major_empty_and_single():
    lay = _layout(np.full(4, -1, np.int32), 3)
    assert np.all(lay["perm"] == -1)
    lay = _layout(np.zeros(1, np.int32), 1)
    assert (lay["perm"] >= 0).sum() == 1


def _probes_oracle(queries, cents, nprobe):
    cd = distances_np(queries, cents, "l2_squared")
    order = np.lexsort(
        (np.broadcast_to(np.arange(cd.shape[1]), cd.shape), cd), axis=1
    )
    return order[:, :nprobe]


def _run_pipeline(queries, corpus, assign, cents, nprobe, k, *,
                  threshold=np.inf, fmask=None, cosine=False, S=None,
                  kb_cap=0):
    nlist = len(cents)
    lay = _layout(assign, nlist)
    perm = lay["perm"]
    pc = np.maximum(perm, 0)
    sqn = (corpus * corpus).sum(axis=1).astype(np.float32)
    base = np.zeros_like(sqn) if cosine else sqn
    mask = np.where(perm >= 0, base[pc], np.inf).astype(np.float32)
    if fmask is not None:
        mask = np.where(fmask[pc] & (perm >= 0), mask, np.inf).astype(np.float32)
    Sd, UC, MC = default_budgets(
        nprobe, nlist, int(lay["chunk_start"][-1]), lay["max_chunks"]
    )
    if S is not None:
        Sd = S
        UC = min(S, nlist)
    order_key = np.zeros(nlist, np.int32)  # single super: pure id order
    # L2 threshold rides the kernel's squared-distance domain
    thr_k = threshold if cosine or not np.isfinite(threshold) else threshold**2
    s, i, ov = ivf_sparse_pipeline(
        jnp.asarray(queries), jnp.asarray(corpus[pc].T.copy()),
        jnp.asarray(mask), jnp.asarray(perm),
        jnp.asarray(np.float32(thr_k)),
        jnp.asarray(cents), jnp.asarray(order_key),
        jnp.asarray(lay["chunk_start"]), jnp.asarray(lay["nchunks"]),
        k=k, nprobe=nprobe, S=Sd, UC=UC, MC=MC, nlist=nlist,
        coarse_cosine=cosine, cosine=cosine, sqrt_out=not cosine,
        kb_cap=kb_cap, interpret=True,
    )
    return np.asarray(s), np.asarray(i), np.asarray(ov)


def _oracle_probed(queries, corpus, assign, cents, nprobe, k, *,
                   threshold=np.inf, fmask=None, cosine=False):
    """Exact top-k restricted to probed clusters (reference semantics)."""
    probes = _probes_oracle(queries, cents, nprobe)
    kind = "cosine" if cosine else "l2_squared"
    d = distances_np(queries, corpus, kind)
    if not cosine:
        d = np.sqrt(np.maximum(d, 0.0))
        lim = threshold
    else:
        lim = threshold
    member = np.zeros_like(d, dtype=bool)
    for qi in range(len(queries)):
        member[qi] = np.isin(assign, probes[qi])
    ok = member
    if fmask is not None:
        ok = ok & fmask[None, :]
    if not cosine:
        ok = ok & (d * d <= lim * lim if np.isfinite(lim) else np.ones_like(member))
    else:
        ok = ok & (d <= lim)
    d = np.where(ok, d, np.inf)
    order = np.lexsort(
        (np.broadcast_to(np.arange(d.shape[1]), d.shape), d), axis=1
    )[:, :k]
    sc = np.take_along_axis(d, order, axis=1)
    order = np.where(np.isinf(sc), -1, order)
    return sc, order


@pytest.mark.parametrize("nprobe", [2, 5])
def test_sparse_pipeline_matches_probed_oracle(rng, nprobe):
    nlist, n, d, k = 8, 1500, 16, 10
    cents = rng.normal(scale=8.0, size=(nlist, d)).astype(np.float32)
    assign = rng.integers(0, nlist, size=n).astype(np.int32)
    corpus = (cents[assign] + rng.normal(size=(n, d))).astype(np.float32)
    queries = (cents[rng.integers(0, nlist, QG)] + rng.normal(size=(QG, d))).astype(np.float32)

    s, i, ov = _run_pipeline(queries, corpus, assign, cents, nprobe, k)
    ws, wi = _oracle_probed(queries, corpus, assign, cents, nprobe, k)
    assert ov.max() == 0
    for q in range(QG):
        got = set(i[q][i[q] != sp.IDX_SENTINEL].tolist())
        want = set(wi[q][wi[q] >= 0].tolist())
        assert got == want, q
    fin = np.isfinite(ws[:, :k])
    np.testing.assert_allclose(s[:, :k][fin], ws[:, :k][fin], rtol=1e-4, atol=1e-4)


def test_sparse_pipeline_threshold_and_filter(rng):
    nlist, n, d, k = 8, 800, 8, 8
    cents = rng.normal(scale=6.0, size=(nlist, d)).astype(np.float32)
    assign = rng.integers(0, nlist, size=n).astype(np.int32)
    corpus = (cents[assign] + rng.normal(size=(n, d))).astype(np.float32)
    queries = corpus[rng.integers(0, n, QG)].copy()
    fmask = np.ones(n, bool)
    fmask[::3] = False
    thr = 4.0

    s, i, ov = _run_pipeline(
        queries, corpus, assign, cents, 3, k, threshold=thr, fmask=fmask
    )
    ws, wi = _oracle_probed(
        queries, corpus, assign, cents, 3, k, threshold=thr, fmask=fmask
    )
    for q in range(QG):
        got = set(i[q][i[q] != sp.IDX_SENTINEL].tolist())
        want = set(wi[q][wi[q] >= 0].tolist())
        assert got == want, q


def test_sparse_pipeline_cosine(rng):
    nlist, n, d, k = 4, 600, 8, 5
    cents = rng.normal(size=(nlist, d)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    assign = np.argmax(corpus @ cents.T, axis=1).astype(np.int32)
    queries = corpus[rng.integers(0, n, QG)].copy()

    s, i, ov = _run_pipeline(
        queries, corpus, assign, cents, 2, k, cosine=True
    )
    ws, wi = _oracle_probed(
        queries, corpus, assign, cents, 2, k, cosine=True
    )
    for q in range(QG):
        got = set(i[q][i[q] != sp.IDX_SENTINEL].tolist())
        want = set(wi[q][wi[q] >= 0].tolist())
        assert got == want, q
    fin = np.isfinite(ws[:, :k])
    np.testing.assert_allclose(s[:, :k][fin], ws[:, :k][fin], rtol=1e-4, atol=1e-4)


def test_sparse_pipeline_budget_overflow_degrades_gracefully(rng):
    """With S below the group's true chunk count, the worst-RANKED probes'
    chunks are dropped: results must equal the oracle restricted to the
    best-rank prefix of probed clusters that fits the budget.

    S must stay >= kb/2 (the pipeline bumps it otherwise), so the corpus
    gives every cluster 2 chunks and the budget covers exactly the first
    two probes (S = 4 = kb/2 for k = 8)."""
    nlist, n, d, k = 16, 16 * 500, 8, 8
    cents = rng.normal(scale=10.0, size=(nlist, d)).astype(np.float32)
    assign = np.repeat(np.arange(nlist, dtype=np.int32), 500)  # 2 chunks each
    corpus = (cents[assign] + rng.normal(size=(n, d))).astype(np.float32)
    # all queries identical -> the group's chunk list is one query's list
    q1 = (cents[3] + rng.normal(size=d)).astype(np.float32)
    queries = np.tile(q1, (QG, 1))

    nprobe = 8
    lay = _layout(assign, nlist)
    assert int(lay["max_chunks"]) == 2
    probes = _probes_oracle(queries[:1], cents, nprobe)[0]
    nch = lay["nchunks"][probes]
    # budget covering exactly the first 2 probes' chunks (= 4 = kb/2)
    S = int(nch[:2].sum())
    s, i, ov = _run_pipeline(
        queries, corpus, assign, cents, nprobe, k, S=S
    )
    assert ov.max() > 0
    ws, wi = _oracle_probed(queries[:1], corpus, assign, cents, 2, k)
    got = set(i[0][i[0] != sp.IDX_SENTINEL].tolist())
    want = set(wi[0][wi[0] >= 0].tolist())
    assert got == want


def test_kb_cap_prefix_exact(rng):
    """kb_cap below k (the HNSW seed-scan shortcut) keeps the top-kb_cap
    prefix EXACT (block-select bound holds per prefix) and every returned
    (distance, slot) pair carries the true distance, sorted ascending —
    only ranks kb_cap+1..k may differ from the oracle."""
    nlist, n, d, k, cap = 8, 1500, 16, 32, 8
    cents = rng.normal(scale=8.0, size=(nlist, d)).astype(np.float32)
    assign = rng.integers(0, nlist, size=n).astype(np.int32)
    corpus = (cents[assign] + rng.normal(size=(n, d))).astype(np.float32)
    queries = (cents[rng.integers(0, nlist, QG)]
               + rng.normal(size=(QG, d))).astype(np.float32)

    s, i, ov = _run_pipeline(queries, corpus, assign, cents, 3, k,
                             kb_cap=cap)
    ws, wi = _oracle_probed(queries, corpus, assign, cents, 3, k)
    assert ov.max() == 0
    dfull = np.sqrt(np.maximum(
        distances_np(queries, corpus, "l2_squared"), 0.0))
    for q in range(QG):
        # exact prefix
        assert i[q][:cap].tolist() == wi[q][:cap].tolist(), q
        # tail: true distances at the returned slots, ascending order
        real = i[q] != sp.IDX_SENTINEL
        np.testing.assert_allclose(
            s[q][real], dfull[q][i[q][real]], rtol=1e-4, atol=1e-4)
        assert np.all(np.diff(s[q][real]) >= 0), q


def test_default_budgets_monotone():
    S1, _, _ = default_budgets(8, 1024, 4096, 8)
    S2, _, _ = default_budgets(32, 1024, 4096, 8)
    assert S2 >= S1
    # capped at the table size
    S3, UC, MC = default_budgets(64, 16, 32, 4)
    assert S3 <= 64 and UC <= 32


def test_overflow_counts_uc_truncated_clusters():
    """Distinct probed clusters dropped by the UC cap must appear in the
    returned overflow, not silently vanish (ADVICE r3)."""
    import jax.numpy as jnp

    nlist = 8
    nchunks = np.full(nlist, 2, np.int32)
    chunk_start = np.zeros(nlist + 1, np.int32)
    chunk_start[1:] = np.cumsum(nchunks)
    # every query in the group probes all 8 distinct clusters
    probes = np.tile(np.arange(8, dtype=np.int32)[None, :], (QG, 1))
    chunk_ids, cluster_ids, n_real, overflow = sp._group_chunk_lists(
        jnp.asarray(probes), jnp.asarray(chunk_start), jnp.asarray(nchunks),
        S=16, UC=4, MC=2, nlist=nlist,
    )
    # 8 clusters x 2 chunks = 16 wanted; UC=4 keeps 8 chunks despite S=16
    assert int(n_real[0]) == 8
    assert int(overflow[0]) == 8
    # with UC ample the same walk fits and overflow is zero
    _, _, n_real2, overflow2 = sp._group_chunk_lists(
        jnp.asarray(probes), jnp.asarray(chunk_start), jnp.asarray(nchunks),
        S=16, UC=8, MC=2, nlist=nlist,
    )
    assert int(n_real2[0]) == 16
    assert int(overflow2[0]) == 0


def test_pipeline_slices_oversized_batches(rng, monkeypatch):
    """The memory-envelope wrapper must split the batch into QG-group
    slices and return identical results to the single-dispatch path."""
    monkeypatch.setenv("COMET_SPARSE_MEM_GB", "1000")
    nlist, n, d, k = 8, 1200, 16, 8
    cents = rng.normal(scale=8.0, size=(nlist, d)).astype(np.float32)
    assign = rng.integers(0, nlist, size=n).astype(np.int32)
    corpus = (cents[assign] + rng.normal(size=(n, d))).astype(np.float32)
    queries = (
        cents[rng.integers(0, nlist, 2 * QG)]
        + rng.normal(size=(2 * QG, d))
    ).astype(np.float32)
    s1, i1, ov1 = _run_pipeline(queries, corpus, assign, cents, 3, k)
    # force a one-group-per-dispatch envelope
    monkeypatch.setenv("COMET_SPARSE_MEM_GB", "1e-9")
    s2, i2, ov2 = _run_pipeline(queries, corpus, assign, cents, 3, k)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(ov1, ov2)
