"""Protocol conformance: every index satisfies its interface contract
(the Go compile-time `var _ VectorIndex = ...` checks, index.go:42)."""

from comet_tpu.indexes.contracts import check_contracts


def test_all_indexes_satisfy_contracts():
    check_contracts()
