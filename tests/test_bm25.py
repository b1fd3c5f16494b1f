"""BM25 tests (mirrors bm25_index_test.go + bm25_index_search_test.go
coverage, with a numpy formula oracle)."""

import io
import math

import numpy as np
import pytest

from comet_tpu.indexes.bm25 import B, K1, BM25SearchIndex, normalize, tokenize
from comet_tpu.types import InvalidConfigError, NodeNotFoundError


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "a quick brown dog runs in the park",
    3: "the lazy cat sleeps all day",
    4: "foxes are quick and clever animals",
    5: "dogs are loyal and friendly animals",
}


def sample_index():
    idx = BM25SearchIndex()
    for doc_id, text in CORPUS.items():
        idx.add(doc_id, text)
    return idx


def bm25_oracle(corpus, deleted=()):
    """Reference formula, straight from bm25_index_search.go:299-327."""
    docs = {i: tokenize(normalize(t)) for i, t in corpus.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n

    def score(query, doc_id):
        if doc_id in deleted:
            return None
        qtokens = tokenize(normalize(query))
        total = 0.0
        for t in qtokens:
            df = sum(1 for toks in docs.values() if t in toks)
            if df == 0:
                continue
            tf = docs[doc_id].count(t)
            if tf == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            dl = len(docs[doc_id])
            total += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))
        return total

    return score


def test_normalize_and_tokenize():
    """UAX#29 semantics: ALL segments, matching the reference's unfiltered
    words.FromString loop (bm25_index.go:159-166) — whitespace and
    punctuation runs are tokens too."""
    assert normalize("HeLLo WORLD") == "hello world"
    assert tokenize("the quick-brown fox!") == [
        "the", " ", "quick", "-", "brown", " ", "fox", "!",
    ]
    assert tokenize("café 123 a_b") == ["café", " ", "123", " ", "a_b"]
    # NFKC folds full-width forms
    assert tokenize(normalize("ＱＵＩＣＫ")) == ["quick"]
    # contractions / numerics / domains stay single tokens (uax29, not \\w+)
    assert tokenize("don't") == ["don't"]
    assert tokenize("1,000.50") == ["1,000.50"]
    assert tokenize("example.com") == ["example.com"]


def test_basic_search_scores_match_oracle():
    idx = sample_index()
    oracle = bm25_oracle(CORPUS)
    res = idx.new_search().with_query("quick fox").with_k(10).execute()
    assert res  # non-empty
    for r in res:
        assert r.score == pytest.approx(oracle("quick fox", r.id), rel=1e-5)
    # descending order
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)
    # doc 1 and 4 contain both/most terms -> top hits contain them
    top_ids = {r.id for r in res[:2]}
    assert 1 in top_ids and 4 in top_ids


def test_k_limits_results():
    idx = sample_index()
    res = idx.new_search().with_query("the").with_k(2).execute()
    assert len(res) == 2


def test_no_match_returns_empty():
    idx = sample_index()
    # single absent term: nothing to score
    assert idx.new_search().with_query("zebra").execute() == []
    # "zebra unicorn" tokenizes to ["zebra", " ", "unicorn"]; the whitespace
    # segment IS an indexed term (reference behavior: every doc containing a
    # space matches weakly), so this returns every doc with tiny scores
    res = idx.new_search().with_query("zebra unicorn").with_k(10).execute()
    assert len(res) == len(CORPUS)
    assert all(r.score < 0.2 for r in res)


def test_requires_query_or_node():
    idx = sample_index()
    with pytest.raises(InvalidConfigError):
        idx.new_search().with_k(5).execute()


def test_add_replaces_existing():
    idx = sample_index()
    idx.add(1, "completely different content now")
    res = idx.new_search().with_query("fox").with_k(10).execute()
    assert 1 not in [r.id for r in res]
    res = idx.new_search().with_query("different content").with_k(10).execute()
    assert [r.id for r in res][0] == 1
    assert idx.count() == 5  # still 5 docs


def test_soft_delete_and_flush():
    idx = sample_index()
    idx.remove(1)
    assert idx.count() == 4
    res = idx.new_search().with_query("fox").with_k(10).execute()
    assert 1 not in [r.id for r in res]
    # N still counts the soft-deleted doc until flush (reference parity):
    oracle_pre = bm25_oracle(CORPUS, deleted={1})
    for r in res:
        assert r.score == pytest.approx(oracle_pre("fox", r.id), rel=1e-5)
    idx.flush()
    # after flush the doc is gone from N/df/avgdl
    corpus_post = {i: t for i, t in CORPUS.items() if i != 1}
    oracle_post = bm25_oracle(corpus_post)
    res = idx.new_search().with_query("fox").with_k(10).execute()
    for r in res:
        assert r.score == pytest.approx(oracle_post("fox", r.id), rel=1e-5)


def test_remove_nonexistent_is_noop():
    idx = sample_index()
    idx.remove(999)
    assert idx.count() == 5


def test_document_filter():
    idx = sample_index()
    res = (
        idx.new_search().with_query("quick").with_k(10)
        .with_document_ids([2, 4]).execute()
    )
    assert sorted(r.id for r in res) == [2, 4]


def test_more_like_this_with_node():
    idx = sample_index()
    res = idx.new_search().with_node(1).with_k(5).execute()
    assert res[0].id == 1  # doc is most similar to itself
    with pytest.raises(NodeNotFoundError):
        idx.new_search().with_node(999).execute()
    idx.remove(2)
    with pytest.raises(NodeNotFoundError):
        idx.new_search().with_node(2).execute()


def test_multi_query_aggregation_sum():
    idx = sample_index()
    r_a = {r.id: r.score for r in idx.new_search().with_query("fox").with_k(10).execute()}
    r_b = {r.id: r.score for r in idx.new_search().with_query("dog").with_k(10).execute()}
    res = idx.new_search().with_query("fox").with_query("dog").with_k(10).execute()
    for r in res:
        want = r_a.get(r.id, 0.0) + r_b.get(r.id, 0.0)
        assert r.score == pytest.approx(want, rel=1e-5)


def test_autocut():
    idx = BM25SearchIndex()
    idx.add(1, "target target target target")
    idx.add(2, "target target target other")
    idx.add(3, "unrelated words entirely here")
    idx.add(4, "more unrelated filler text")
    res = idx.new_search().with_query("target").with_k(10).with_cutoff(1).execute()
    assert all(r.id in (1, 2) for r in res)


def test_avg_doc_len():
    idx = sample_index()
    want = sum(len(tokenize(normalize(t))) for t in CORPUS.values()) / len(CORPUS)
    assert idx.avg_doc_len == pytest.approx(want)


def test_serialization_roundtrip():
    idx = sample_index()
    idx.remove(5)  # write flushes
    buf = io.BytesIO()
    idx.write_to(buf)
    buf.seek(0)
    idx2 = BM25SearchIndex()
    idx2.read_from(buf)
    assert idx2.count() == 4
    r1 = idx.new_search().with_query("quick fox").with_k(10).execute()
    r2 = idx2.new_search().with_query("quick fox").with_k(10).execute()
    assert [(r.id, pytest.approx(r.score, rel=1e-6)) for r in r1] == [
        (r.id, r.score) for r in r2
    ]


def test_empty_query_tokens():
    idx = sample_index()
    # punctuation-only query with no whitespace: "!" and "." are segments,
    # but no corpus doc contains them, so nothing scores
    assert idx.new_search().with_query("!!!...").execute() == []
    assert idx.new_search().with_query("").execute() == []
    # with a space in the query, the whitespace term matches every doc
    # (reference parity — every segment is indexed, bm25_index.go:159-166)
    assert len(idx.new_search().with_query("!!! ...").with_k(10).execute()) == len(CORPUS)


def test_unicode_content():
    idx = BM25SearchIndex()
    idx.add(1, "Der schnelle braune Fuchs überspringt den faulen Hund")
    idx.add(2, "café au lait")
    res = idx.new_search().with_query("ÜBERSPRINGT").with_k(5).execute()
    assert [r.id for r in res] == [1]
    res = idx.new_search().with_query("café").with_k(5).execute()
    assert [r.id for r in res] == [2]


def test_device_search_batch_matches_host():
    idx = sample_index()
    queries = ["quick fox", "lazy dog", "electronics nothing", "animals"]
    ids, scores = idx.search_batch(queries, k=5)
    for qi, q in enumerate(queries):
        host = idx.new_search().with_query(q).with_k(5).execute()
        got = [(int(i), float(s)) for i, s in zip(ids[qi], scores[qi]) if i != 0xFFFFFFFF]
        want = [(r.id, r.score) for r in host]
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-4)


def test_device_search_batch_respects_delete_and_filter():
    idx = sample_index()
    idx.remove(1)
    ids, scores = idx.search_batch(["fox"], k=10)
    found = [int(i) for i in ids[0] if i != 0xFFFFFFFF]
    assert 1 not in found
    ids, scores = idx.search_batch(["quick"], k=10, document_ids=[2, 4])
    found = [int(i) for i in ids[0] if i != 0xFFFFFFFF]
    assert sorted(found) == [2, 4]


def test_device_search_batch_empty_index():
    idx = BM25SearchIndex()
    ids, scores = idx.search_batch(["anything"], k=5)
    assert (ids == 0xFFFFFFFF).all()


def test_native_batch_matches_device_fallback(rng, monkeypatch):
    """The C scorer and the JAX scatter path must agree (ids and scores)."""
    from comet_tpu import native
    from comet_tpu.indexes.bm25 import BM25SearchIndex

    if not native.available():
        import pytest

        pytest.skip("no C compiler")
    idx = BM25SearchIndex()
    words = ["kiwi", "mango", "papaya", "guava", "lychee", "fig"]
    for i in range(300):
        doc = " ".join(rng.choice(words, size=rng.integers(2, 8)))
        idx.add(i + 1, doc)
    idx.remove(5)
    queries = ["kiwi mango", "fig", "papaya guava lychee", "absentterm", ""]
    sub = list(range(1, 200, 3))

    for doc_ids in (None, sub):
        n_ids, n_sc = idx.search_batch(queries, k=7, document_ids=doc_ids)
        monkeypatch.setattr(
            BM25SearchIndex, "_native_search_batch", lambda *a, **k_: None
        )
        d_ids, d_sc = idx.search_batch(queries, k=7, document_ids=doc_ids)
        monkeypatch.undo()
        assert np.array_equal(n_ids, d_ids), (doc_ids is None, n_ids, d_ids)
        np.testing.assert_allclose(n_sc, d_sc, rtol=1e-5, atol=1e-6)
