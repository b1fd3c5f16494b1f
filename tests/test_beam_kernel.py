"""Unit tests for the fused Pallas beam kernel (interpret mode on CPU).

The merge step is pinned to a per-query numpy oracle: slot dedup keeping
expanded copies, (score, slot) top-ef ordering, first-E-unexpanded
selection, the active/termination flag, and the fused result-set merge.
"""

import numpy as np
import pytest

from comet_tpu.ops.beam_kernel import (
    LANE,
    MISC_ROWS,
    beam_merge_step,
    beam_search_blocked,
    build_blocked_tables,
)

SENT = 2**31 - 1
INF = np.inf


def make_state(rng, ef, ew, q, cap=1000):
    """Random-but-valid beam state: sorted ascending, unique slots."""
    beam_d = np.full((ef, q), INF, np.float32)
    beam_s = np.full((ef, q), SENT, np.int32)
    beam_e = np.zeros((ef, q), np.int32)
    new_d = np.full((ew, q), INF, np.float32)
    new_s = np.full((ew, q), SENT, np.int32)
    for col in range(q):
        nb = rng.integers(1, ef + 1)
        slots = rng.choice(cap, size=nb, replace=False)
        dists = np.sort(rng.random(nb).astype(np.float32) * 10)
        beam_d[:nb, col] = dists
        beam_s[:nb, col] = slots
        beam_e[:nb, col] = rng.integers(0, 2, size=nb)
        nn = rng.integers(0, ew + 1)
        # new candidates: mix of fresh slots, beam dups, in-batch dups
        pool = np.concatenate([slots, rng.choice(cap, size=ew, replace=False)])
        picks = rng.choice(pool, size=nn, replace=True)
        for j, s in enumerate(picks):
            # same slot must carry the same distance (same vector)
            inbeam = np.where(beam_s[:, col] == s)[0]
            if len(inbeam):
                d = beam_d[inbeam[0], col]
            else:
                prev = np.where(new_s[:j, col] == s)[0]
                d = (
                    new_d[prev[0], col]
                    if len(prev)
                    else np.float32(rng.random() * 10)
                )
            new_d[j, col] = d
            new_s[j, col] = s
    return beam_d, beam_s, beam_e, new_d, new_s


def oracle_merge(beam_d, beam_s, beam_e, new_d, new_s, ef, E,
                 res_d=None, res_s=None, adm=None, kr=0):
    q = beam_d.shape[1]
    od = np.full((ef, q), INF, np.float32)
    osl = np.full((ef, q), SENT, np.int32)
    oe = np.zeros((ef, q), np.int32)
    nodes = np.full((E, q), -1, np.int32)
    active = np.zeros(q, np.int32)
    ord_ = np.full((kr, q), INF, np.float32) if kr else None
    ors = np.full((kr, q), SENT, np.int32) if kr else None
    for col in range(q):
        # kernel contract: ONE (d, s, e desc) sort over beam+new INCLUDING
        # duplicate copies, kill all-but-first copy per slot, COMPACT, then
        # truncate to ef -> a dense sorted distinct window (lower copies
        # back-fill killed slots)
        entries = []
        for d, s, e in zip(beam_d[:, col], beam_s[:, col], beam_e[:, col]):
            if s != SENT and np.isfinite(d):
                entries.append((float(d), int(s), int(e)))
        for d, s in zip(new_d[:, col], new_s[:, col]):
            if s != SENT and np.isfinite(d):
                entries.append((float(d), int(s), 0))
        entries.sort(key=lambda t: (t[0], t[1], -t[2]))
        seen: set = set()
        rows = []
        for d, s, e in entries:
            if s not in seen:
                seen.add(s)
                rows.append((d, s, e))
        rows = rows[:ef]
        for i, (d, s, e) in enumerate(rows):
            od[i, col], osl[i, col], oe[i, col] = d, s, e
        worst = od[ef - 1, col]
        unexp = [
            (d, s, i) for i, (d, s, e) in enumerate(rows)
            if not e and s != SENT
        ]
        act = bool(unexp) and unexp[0][0] <= worst
        active[col] = int(act)
        if act:
            for j, (d, s, i) in enumerate(unexp[:E]):
                nodes[j, col] = s
                oe[i, col] = 1
        if kr:
            # kernel contract: sorted DISTINCT top-kr of res + admitted
            ritems = []
            for d, s in zip(res_d[:, col], res_s[:, col]):
                if s != SENT and np.isfinite(d):
                    ritems.append((float(d), int(s)))
            for d, s, a in zip(new_d[:, col], new_s[:, col], adm[:, col]):
                if a and s != SENT and np.isfinite(d):
                    ritems.append((float(d), int(s)))
            rseen: set = set()
            i = 0
            for d, s in sorted(ritems):
                if s in rseen:
                    continue
                rseen.add(s)
                if i >= kr:
                    break
                ord_[i, col], ors[i, col] = d, s
                i += 1
    return od, osl, oe, nodes, active, ord_, ors


@pytest.mark.parametrize("ef,ew,E", [(32, 32, 4), (64, 32, 8), (32, 64, 2)])
def test_merge_step_matches_oracle(rng, ef, ew, E):
    q = LANE
    beam_d, beam_s, beam_e, new_d, new_s = make_state(rng, ef, ew, q)
    od, osl, oe, misc, _, _ = beam_merge_step(
        beam_d, beam_s, beam_e, new_d, new_s,
        ef=ef, ew=ew, expand=E, fused=False, use_pallas=False,
    )
    w_d, w_s, w_e, w_nodes, w_active, _, _ = oracle_merge(
        beam_d, beam_s, beam_e, new_d, new_s, ef, E
    )
    np.testing.assert_allclose(np.asarray(od), w_d, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(osl), w_s)
    np.testing.assert_array_equal(np.asarray(oe), w_e)
    misc = np.asarray(misc)
    np.testing.assert_array_equal(misc[:E], w_nodes)
    np.testing.assert_array_equal(misc[E], w_active)


def test_merge_step_fused_result_set(rng):
    ef, ew, E, kr, q = 32, 32, 4, 64, LANE
    beam_d, beam_s, beam_e, new_d, new_s = make_state(rng, ef, ew, q)
    res_d = np.full((kr, q), INF, np.float32)
    res_s = np.full((kr, q), SENT, np.int32)
    for col in range(q):
        nr = rng.integers(0, kr // 2)
        res_d[:nr, col] = np.sort(rng.random(nr).astype(np.float32) * 10)
        res_s[:nr, col] = rng.choice(5000, size=nr, replace=False) + 2000
    adm = rng.integers(0, 2, size=(ew, q)).astype(np.int32)
    od, osl, oe, misc, ord_, ors = beam_merge_step(
        beam_d, beam_s, beam_e, new_d, new_s, res_d, res_s, adm,
        ef=ef, ew=ew, expand=E, fused=True, kr=kr, use_pallas=False,
    )
    w = oracle_merge(
        beam_d, beam_s, beam_e, new_d, new_s, ef, E,
        res_d=res_d, res_s=res_s, adm=adm, kr=kr,
    )
    np.testing.assert_allclose(np.asarray(ord_), w[5], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ors), w[6])


def test_full_search_small_graph_exact(rng):
    """ef >= n on a connected graph explores everything: the beam search
    must return the exact top-k with oracle tie order and exact scores."""
    n, d, k, W = 60, 16, 10, 8
    cap = 64
    vectors = np.zeros((cap, d), np.float32)
    vectors[:n] = rng.normal(size=(n, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1)
    # ring + random edges -> connected
    adj = np.full((cap, W), -1, np.int32)
    for i in range(n):
        adj[i, 0] = (i + 1) % n
        adj[i, 1] = (i - 1) % n
        adj[i, 2:] = rng.choice(n, size=W - 2, replace=False)
    queries = rng.normal(size=(LANE, d)).astype(np.float32)
    entry = np.zeros(LANE, np.int32)

    import jax.numpy as jnp

    nbr_vecs, aux = build_blocked_tables(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    allowed = np.zeros(cap, bool)
    allowed[:n] = True
    sd, ss = beam_search_blocked(
        queries, entry, nbr_vecs, aux, vectors, sqn,
        allowed, np.float32(np.inf),
        ef=64, k=k, expand=4, max_iters=256, fused=False, use_pallas=False,
    )
    sd, ss = np.asarray(sd), np.asarray(ss)
    dist = ((queries[:, None, :] - vectors[None, :n, :]) ** 2).sum(axis=2)
    order = np.argsort(dist, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(ss, order)
    np.testing.assert_allclose(
        sd, np.take_along_axis(dist, order, axis=1), rtol=1e-4, atol=1e-3
    )


def test_full_search_fused_filter(rng):
    """Admission mask: only even slots allowed; beam still routes through
    all nodes, results contain only allowed ones (exact on full explore)."""
    n, d, k, W = 64, 8, 8, 8
    cap = 64
    vectors = rng.normal(size=(cap, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1)
    adj = np.full((cap, W), -1, np.int32)
    for i in range(n):
        adj[i, 0] = (i + 1) % n
        adj[i, 1] = (i - 1) % n
        adj[i, 2:] = rng.choice(n, size=W - 2, replace=False)
    queries = rng.normal(size=(LANE, d)).astype(np.float32)
    entry = np.zeros(LANE, np.int32)

    import jax.numpy as jnp

    nbr_vecs, aux = build_blocked_tables(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    allowed = np.arange(cap) % 2 == 0
    sd, ss = beam_search_blocked(
        queries, entry, nbr_vecs, aux, vectors, sqn,
        allowed, np.float32(np.inf),
        ef=64, k=k, expand=4, max_iters=128, fused=True, use_pallas=False,
    )
    sd, ss = np.asarray(sd), np.asarray(ss)
    dist = ((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(axis=2)
    dist[:, ~allowed] = np.inf
    order = np.argsort(dist, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(ss, order)
    assert (ss % 2 == 0).all()


def _seed_from_bf16_domain(queries, vectors, sqn, n, ef):
    """Top-ef seeds per query in the kernel's bf16 distance domain,
    (dist, slot)-sorted with (inf, SENT) padding — what the seed scan
    (ops/ivf_sparse bf16_domain) produces at full probe."""
    import jax.numpy as jnp

    qb = jnp.asarray(queries).astype(jnp.bfloat16)
    xb = jnp.asarray(vectors[:n]).astype(jnp.bfloat16)
    ip = jnp.einsum("qd,nd->qn", qb, xb, preferred_element_type=jnp.float32)
    qn = jnp.sum(jnp.asarray(queries) * jnp.asarray(queries), axis=1)
    nsq = jnp.asarray(sqn[:n]).astype(jnp.bfloat16).astype(jnp.float32)
    dist = jnp.maximum(qn[:, None] + nsq[None, :] - 2.0 * ip, 0.0)
    dist = np.asarray(dist)
    q = queries.shape[0]
    seed_d = np.full((q, ef), INF, np.float32)
    seed_s = np.full((q, ef), SENT, np.int32)
    order = np.lexsort((np.arange(n)[None, :].repeat(q, 0), dist), axis=1)
    take = min(ef, n)
    rows = np.arange(q)[:, None]
    seed_d[:, :take] = dist[rows, order[:, :take]]
    seed_s[:, :take] = order[:, :take]
    return seed_d, seed_s


def test_full_search_seeded_exact(rng):
    """Seeded start + k-window stop bound on a connected graph with full
    exploration still returns the exact top-k with oracle tie order."""
    n, d, k, W = 60, 16, 10, 8
    cap = 64
    vectors = np.zeros((cap, d), np.float32)
    vectors[:n] = rng.normal(size=(n, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1)
    adj = np.full((cap, W), -1, np.int32)
    for i in range(n):
        adj[i, 0] = (i + 1) % n
        adj[i, 1] = (i - 1) % n
        adj[i, 2:] = rng.choice(n, size=W - 2, replace=False)
    queries = rng.normal(size=(LANE, d)).astype(np.float32)
    entry = np.zeros(LANE, np.int32)

    import jax.numpy as jnp

    nbr_vecs, aux = build_blocked_tables(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    allowed = np.zeros(cap, bool)
    allowed[:n] = True
    seeds = _seed_from_bf16_domain(queries, vectors, sqn, n, 64)
    sd, ss = beam_search_blocked(
        queries, entry, nbr_vecs, aux, vectors, sqn,
        allowed, np.float32(np.inf),
        ef=64, k=k, expand=4, max_iters=64, fused=False, use_pallas=False,
        seeds=seeds, stop=16,
    )
    sd, ss = np.asarray(sd), np.asarray(ss)
    dist = ((queries[:, None, :] - vectors[None, :n, :]) ** 2).sum(axis=2)
    order = np.argsort(dist, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(ss, order)
    np.testing.assert_allclose(
        sd, np.take_along_axis(dist, order, axis=1), rtol=1e-4, atol=1e-3
    )


def test_full_search_seeded_starved_fallback(rng):
    """Queries whose seed rows are ALL empty (probe-budget starvation in
    the seed scan) must fall back to the entry point and still search the
    graph — not return empty results."""
    n, d, k, W = 60, 16, 10, 8
    cap = 64
    vectors = np.zeros((cap, d), np.float32)
    vectors[:n] = rng.normal(size=(n, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1)
    adj = np.full((cap, W), -1, np.int32)
    for i in range(n):
        adj[i, 0] = (i + 1) % n
        adj[i, 1] = (i - 1) % n
        adj[i, 2:] = rng.choice(n, size=W - 2, replace=False)
    queries = rng.normal(size=(LANE, d)).astype(np.float32)
    entry = np.full(LANE, 7, np.int32)

    import jax.numpy as jnp

    nbr_vecs, aux = build_blocked_tables(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    allowed = np.zeros(cap, bool)
    allowed[:n] = True
    seed_d, seed_s = _seed_from_bf16_domain(queries, vectors, sqn, n, 64)
    # starve half the queries entirely
    starved = np.arange(LANE) % 2 == 0
    seed_d[starved] = INF
    seed_s[starved] = SENT
    sd, ss = beam_search_blocked(
        queries, entry, nbr_vecs, aux, vectors, sqn,
        allowed, np.float32(np.inf),
        ef=64, k=k, expand=4, max_iters=64, fused=False, use_pallas=False,
        seeds=(seed_d, seed_s), stop=16,
    )
    sd, ss = np.asarray(sd), np.asarray(ss)
    dist = ((queries[:, None, :] - vectors[None, :n, :]) ** 2).sum(axis=2)
    order = np.argsort(dist, axis=1, kind="stable")[:, :k]
    # seeded rows: exact. starved rows: the entry fallback searches under
    # the k-window stop bound (weaker than a full-ef run), so assert
    # non-empty, all-real ids with high ground-truth overlap instead.
    np.testing.assert_array_equal(ss[~starved], order[~starved])
    assert (ss != SENT).all(), "starved rows must not return empty results"
    for i in np.nonzero(starved)[0]:
        assert len(np.intersect1d(ss[i], order[i])) >= 7, (i, ss[i], order[i])


def test_full_search_seeded_fused_filter(rng):
    """Seeded + fused admission: seed-only nodes (never rediscovered) must
    still reach the result set via the init-time admission merge."""
    n, d, k, W = 64, 8, 8, 8
    cap = 64
    vectors = rng.normal(size=(cap, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1)
    adj = np.full((cap, W), -1, np.int32)
    for i in range(n):
        adj[i, 0] = (i + 1) % n
        adj[i, 1] = (i - 1) % n
        adj[i, 2:] = rng.choice(n, size=W - 2, replace=False)
    queries = rng.normal(size=(LANE, d)).astype(np.float32)
    entry = np.zeros(LANE, np.int32)

    import jax.numpy as jnp

    nbr_vecs, aux = build_blocked_tables(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    allowed = np.arange(cap) % 2 == 0
    seeds = _seed_from_bf16_domain(queries, vectors, sqn, n, 64)
    sd, ss = beam_search_blocked(
        queries, entry, nbr_vecs, aux, vectors, sqn,
        allowed, np.float32(np.inf),
        ef=64, k=k, expand=4, max_iters=64, fused=True, use_pallas=False,
        seeds=seeds, stop=16,
    )
    sd, ss = np.asarray(sd), np.asarray(ss)
    dist = ((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(axis=2)
    dist[:, ~allowed] = np.inf
    order = np.argsort(dist, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(ss, order)
    assert (ss % 2 == 0).all()


def test_packed_table_matches_blocked(rng):
    """The PACKED single-gather routing table must produce bit-identical
    search results to the blocked (nbr_vecs, aux) pair — same bf16 values,
    same aux decode, one gather instead of two."""
    from comet_tpu.ops.beam_kernel import build_packed_table

    n, d, k, W = 200, 16, 10, 8
    cap = 256  # > 128 so the slot+1 encoding needs 2 base-128 digits
    vectors = np.zeros((cap, d), np.float32)
    vectors[:n] = rng.normal(size=(n, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1)
    adj = np.full((cap, W), -1, np.int32)
    for i in range(n):
        adj[i, 0] = (i + 1) % n
        adj[i, 1] = (i - 1) % n
        adj[i, 2:] = rng.choice(n, size=W - 2, replace=False)
    queries = rng.normal(size=(LANE, d)).astype(np.float32)
    entry = np.zeros(LANE, np.int32)
    allowed = np.zeros(cap, bool)
    allowed[:n] = True

    import jax.numpy as jnp

    nbr_vecs, aux = build_blocked_tables(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    packed = build_packed_table(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    assert packed.shape == (cap, W * d + 3 * W)  # ndig=2 at cap=256

    kw = dict(ef=32, k=k, expand=4, max_iters=64, use_pallas=False)
    for fused in (False, True):
        sd_b, ss_b = beam_search_blocked(
            queries, entry, nbr_vecs, aux, vectors, sqn,
            allowed, np.float32(np.inf), fused=fused, **kw,
        )
        sd_p, ss_p = beam_search_blocked(
            queries, entry, packed, None, vectors, sqn,
            allowed, np.float32(np.inf), fused=fused, **kw,
        )
        np.testing.assert_array_equal(np.asarray(ss_p), np.asarray(ss_b))
        np.testing.assert_array_equal(np.asarray(sd_p), np.asarray(sd_b))


def test_packed_row_update_matches_rebuild(rng):
    """update_packed_rows after adjacency edits == a fresh build_packed_table."""
    from comet_tpu.ops.beam_kernel import build_packed_table, update_packed_rows

    cap, d, W = 128, 8, 8
    vectors = rng.normal(size=(cap, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1)
    adj = rng.integers(-1, cap, size=(cap, W)).astype(np.int32)

    import jax.numpy as jnp

    packed = build_packed_table(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    rows = np.array([3, 17, 64, 101], np.int64)
    adj2 = adj.copy()
    adj2[rows] = rng.integers(-1, cap, size=(len(rows), W)).astype(np.int32)
    packed2 = update_packed_rows(
        packed, jnp.asarray(rows), jnp.asarray(adj2[rows]),
        jnp.asarray(vectors), jnp.asarray(sqn),
    )
    fresh = build_packed_table(
        jnp.asarray(adj2), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    np.testing.assert_array_equal(np.asarray(packed2), np.asarray(fresh))


def test_fused_expand_merge_matches_split(rng):
    """The fully fused expand+score+merge kernel (interpret mode) must be
    bit-identical to the split path (_gather_score + beam_merge_step) on
    the same packed table. Integer-valued vectors make every inner product
    exact in bf16/f32, so accumulation order cannot blur the comparison —
    this pins the kernel's plumbing (group transposes, diagonal extract,
    aux-plane decode, scratch accumulation, merge wiring)."""
    import jax.numpy as jnp

    from comet_tpu.ops.beam_kernel import (
        _aux_digits,
        _gather_score,
        build_packed_table,
        fused_expand_merge,
    )

    cap, d, W, E, ef, q = 512, 16, 4, 4, 32, LANE
    ew = E * W
    vectors = rng.integers(-2, 3, size=(cap, d)).astype(np.float32)
    sqn = (vectors * vectors).sum(axis=1).astype(np.float32)
    adj = rng.integers(0, cap, size=(cap, W)).astype(np.int32)
    adj[rng.random(size=adj.shape) < 0.2] = -1  # holes in the lists
    packed = build_packed_table(
        jnp.asarray(adj), jnp.asarray(vectors), jnp.asarray(sqn)
    )
    ndig = _aux_digits(cap)

    queries = rng.integers(-2, 3, size=(q, d)).astype(np.float32)
    qb = jnp.asarray(queries).astype(jnp.bfloat16)
    qn = jnp.asarray((queries * queries).sum(axis=1).astype(np.float32))
    nodes = rng.integers(0, cap, size=(E, q)).astype(np.int32)
    nodes[rng.random(size=nodes.shape) < 0.15] = -1  # finished queries

    beam_d, beam_s, beam_e, _, _ = make_state(rng, ef, ew, q, cap=cap)

    nd, ns, _ = _gather_score(qb, qn, packed, None, jnp.asarray(nodes), ew)

    nc = jnp.maximum(jnp.asarray(nodes), 0)
    rows = packed[nc]                                  # [E, q, row_len]
    # both the classic bound (stop=None) and the seeded k-window bound
    # (stop=next_pow2(k)) — the stop branch changes _phase_select's
    # termination row and must stay bit-identical too (ADVICE r4)
    for stop in (None, 16):
        sd, ss, se, smisc, _, _ = beam_merge_step(
            np.asarray(beam_d), beam_s, beam_e,
            np.asarray(nd), np.asarray(ns),
            ef=ef, ew=ew, expand=E, fused=False, stop=stop,
            use_pallas=False,
        )
        fd, fs, fe, fmisc = fused_expand_merge(
            jnp.asarray(nodes), rows, qb, qn,
            jnp.asarray(beam_d), jnp.asarray(beam_s), jnp.asarray(beam_e),
            ef=ef, W=W, d=d, ndig=ndig, expand=E, stop=stop, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(fd), np.asarray(sd))
        np.testing.assert_array_equal(np.asarray(fs), np.asarray(ss))
        np.testing.assert_array_equal(np.asarray(fe), np.asarray(se))
        np.testing.assert_array_equal(np.asarray(fmisc), np.asarray(smisc))
