"""sanitize_k / limit / autocut tests (mirrors limiter_test.go coverage)."""

from comet_tpu.core.limiter import autocut, limit_results, sanitize_k


def test_sanitize_k():
    assert sanitize_k(5, 10) == 5
    assert sanitize_k(0, 10) == 10
    assert sanitize_k(-3, 10) == 10
    assert sanitize_k(15, 10) == 10
    assert sanitize_k(10, 10) == 10


def test_limit_results():
    r = list(range(10))
    assert limit_results(r, 3) == [0, 1, 2]
    assert limit_results(r, 0) == r
    assert limit_results(r, 100) == r
    assert limit_results([], 5) == []


def test_autocut_short_inputs():
    assert autocut([], 1) == 0
    assert autocut([1.0], 1) == 1


def test_autocut_all_equal_returns_all():
    assert autocut([2.0, 2.0, 2.0, 2.0], 1) == 4


def test_autocut_clear_jump():
    # Tight cluster then a big jump: cut right at the jump.
    scores = [0.10, 0.11, 0.12, 0.13, 5.0, 5.1, 5.2]
    cut = autocut(scores, 1)
    assert cut == 4


def test_autocut_linear_no_extremum():
    # Perfectly linear scores have no local maximum -> keep everything.
    scores = [float(i) for i in range(8)]
    assert autocut(scores, 1) == 8


def test_autocut_second_extremum():
    # Two jumps; cutoff=2 should cut at the second.
    scores = [0.1, 0.11, 1.0, 1.01, 1.02, 2.0, 2.01]
    first = autocut(scores, 1)
    second = autocut(scores, 2)
    assert first < second <= len(scores)
