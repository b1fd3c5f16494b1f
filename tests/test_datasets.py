"""fvecs/bvecs/ivecs loader round-trips on tiny generated files."""

import numpy as np
import pytest

from comet_tpu.io.datasets import load_sift_dir, read_bvecs, read_fvecs, read_ivecs


def _write_fvecs(path, arr):
    n, d = arr.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = arr.astype(np.float32).view(np.int32)
    out.tofile(path)


def _write_ivecs(path, arr):
    n, d = arr.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = arr
    out.tofile(path)


def _write_bvecs(path, arr):
    n, d = arr.shape
    out = np.empty((n, 4 + d), dtype=np.uint8)
    out[:, :4] = np.frombuffer(
        np.int32(d).tobytes(), dtype=np.uint8
    )
    out[:, 4:] = arr
    out.tofile(path)


def test_fvecs_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(37, 16)).astype(np.float32)
    p = tmp_path / "x.fvecs"
    _write_fvecs(p, arr)
    np.testing.assert_array_equal(read_fvecs(p), arr)
    np.testing.assert_array_equal(read_fvecs(p, limit=5), arr[:5])


def test_ivecs_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 10**6, size=(11, 100)).astype(np.int32)
    p = tmp_path / "gt.ivecs"
    _write_ivecs(p, arr)
    np.testing.assert_array_equal(read_ivecs(p), arr)


def test_bvecs_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 256, size=(9, 128)).astype(np.uint8)
    p = tmp_path / "x.bvecs"
    _write_bvecs(p, arr)
    np.testing.assert_array_equal(read_bvecs(p), arr.astype(np.float32))


def test_load_sift_dir(tmp_path, rng):
    base = rng.normal(size=(50, 8)).astype(np.float32)
    queries = rng.normal(size=(7, 8)).astype(np.float32)
    gt = rng.integers(0, 50, size=(7, 10)).astype(np.int32)
    _write_fvecs(tmp_path / "sift_base.fvecs", base)
    _write_fvecs(tmp_path / "sift_query.fvecs", queries)
    _write_ivecs(tmp_path / "sift_groundtruth.ivecs", gt)
    b, q, g = load_sift_dir(tmp_path)
    np.testing.assert_array_equal(b, base)
    np.testing.assert_array_equal(q, queries)
    np.testing.assert_array_equal(g, gt)
    b2, q2, g2 = load_sift_dir(tmp_path, max_base=10, max_queries=3)
    assert b2.shape == (10, 8) and q2.shape == (3, 8) and g2.shape == (3, 10)


def test_load_sift_dir_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_sift_dir(tmp_path)


def test_corrupt_fvecs(tmp_path, rng):
    arr = rng.normal(size=(5, 8)).astype(np.float32)
    p = tmp_path / "x.fvecs"
    _write_fvecs(p, arr)
    raw = np.fromfile(p, dtype=np.int32)
    raw[9] = 99  # corrupt a dim header mid-file
    raw.tofile(p)
    with pytest.raises(ValueError):
        read_fvecs(p)
