"""Scalar quantizer tests (mirrors quantizer_test.go coverage)."""

import numpy as np
import pytest

from comet_tpu.ops.quantizer import (
    BFloat16Quantizer,
    FullPrecisionQuantizer,
    HalfPrecisionQuantizer,
    Int8Quantizer,
    NotTrainedQuantizerError,
    QuantizerType,
    new_quantizer,
)
from comet_tpu.types import InvalidConfigError


def test_factory():
    assert isinstance(new_quantizer("float32"), FullPrecisionQuantizer)
    assert isinstance(new_quantizer("float16"), HalfPrecisionQuantizer)
    assert isinstance(new_quantizer("bfloat16"), BFloat16Quantizer)
    assert isinstance(new_quantizer(QuantizerType.INT8), Int8Quantizer)
    with pytest.raises(ValueError):
        new_quantizer("int4")


def test_float32_roundtrip(rng):
    q = FullPrecisionQuantizer()
    v = rng.normal(size=(5, 8)).astype(np.float32)
    np.testing.assert_array_equal(q.dequantize(q.quantize(v)), v)
    assert q.is_trained()
    assert q.type() == QuantizerType.FLOAT32


def test_float16_roundtrip(rng):
    q = HalfPrecisionQuantizer()
    v = rng.normal(size=(5, 8)).astype(np.float32)
    out = q.dequantize(q.quantize(v))
    np.testing.assert_allclose(out, v, rtol=1e-3)
    assert q.quantize(v).dtype == np.float16


def test_bfloat16_roundtrip(rng):
    q = BFloat16Quantizer()
    v = rng.normal(size=(5, 8)).astype(np.float32)
    out = q.dequantize(q.quantize(v))
    np.testing.assert_allclose(out, v, rtol=1e-2)


def test_int8_requires_training():
    q = Int8Quantizer()
    assert not q.is_trained()
    with pytest.raises(NotTrainedQuantizerError):
        q.quantize([1.0, 2.0])
    with pytest.raises(NotTrainedQuantizerError):
        q.dequantize(np.zeros(2, dtype=np.int8))


def test_int8_symmetric_absmax(rng):
    q = Int8Quantizer()
    v = np.array([[1.0, -2.0, 4.0, -8.0]], dtype=np.float32)
    q.train(v)
    assert q.get_abs_max() == 8.0
    coded = q.quantize(v)
    assert coded.dtype == np.int8
    # 8.0 -> 127, -8.0 -> -127, 4.0 -> 64 (round(4/8*127)=64)
    np.testing.assert_array_equal(coded[0], [16, -32, 64, -127])
    out = q.dequantize(coded)
    np.testing.assert_allclose(out, v, atol=q.get_abs_max() / 127)


def test_int8_roundtrip_error_bound(rng):
    q = Int8Quantizer()
    v = rng.normal(size=(100, 16)).astype(np.float32)
    q.train(v)
    out = q.dequantize(q.quantize(v))
    assert np.max(np.abs(out - v)) <= q.get_abs_max() / 127 / 2 + 1e-6


def test_int8_set_abs_max():
    q = Int8Quantizer()
    q.set_abs_max(10.0)
    assert q.is_trained()
    np.testing.assert_array_equal(q.quantize([10.0, -10.0, 5.0]), [127, -127, 64])
